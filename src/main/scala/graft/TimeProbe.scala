package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev measurement harness (guide §1: measure first): for each named
  * query, split wall time into the three phases that look identical in
  * a bench total but need opposite fixes —
  *   build = DataFrame construction (operator code, driver-side jobs
  *           like approxQuantile/bloom builds run HERE),
  *   plan  = analysis + optimization + physical planning + codegen
  *           lookup (`executedPlan` forced),
  *   exec  = the noop-sink run of the prepared plan.
  * Each query runs `reps` times in one warm session (first rep is the
  * codegen-compile pass; read the later reps). Optionally dumps the
  * formatted plan to a file (the plans/r20 deliverable), from a session
  * configured EXACTLY like Bench (extensions + shuffle.partitions).
  *
  * Usage: runMain graft.TimeProbe <q1,q2,...> [sfDir] [reps] [planOutDir]
  */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val planOut = args.lift(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // per-stage wall/task accounting (GRAFT_PROBE_STAGES=1): where inside
    // a query the time goes — job count is visible here too (each stage
    // logs its job's first stage boundary)
    if (sys.env.contains("GRAFT_PROBE_STAGES"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = sc.stageInfo
            val ms = (for {a <- i.completionTime; b <- i.submissionTime}
              yield a - b).getOrElse(-1L)
            println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
              f"wall=${ms / 1000.0}%7.3f s  ${i.name.takeWhile(_ != '\n')}")
          }
        })
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9
    names.foreach { name =>
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuild = secs(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val tPlan = secs(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = secs(t2)
        println(f"[timeprobe] $name rep$rep build=$tBuild%.3f " +
          f"plan=$tPlan%.3f exec=$tExec%.3f total=${tBuild + tPlan + tExec}%.3f")
        if (rep == reps) planOut.foreach { dir =>
          new java.io.File(dir).mkdirs()
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$dir/$name.txt"),
            df.queryExecution.explainString(FormattedMode))
        }
      }
    }
    spark.stop()
  }
}
