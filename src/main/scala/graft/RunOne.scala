package graft

import org.apache.spark.sql.SparkSession

/** Debug/bench harness for a single query: `runMain graft.RunOne <name>
  * [sfDir]` — runs it with the Bench session config, prints timing and row
  * count, and lets exceptions surface (Bench swallows them by design).
  * `<name>` may be a COMMA-SEPARATED list (round 16): each entry runs in
  * sequence inside ONE warm session — the A/B alternation shape the
  * bench watch items need (same binary, same JVM, interleaved runs). */
object RunOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"$name: $secs%.3f s")
    }
    spark.stop()
  }
}
