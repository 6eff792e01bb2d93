package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Methodology: every query is executed once at sf0.001 first (compiles
  * the codegen + JITs the hot loops — we measure the engine, not the JVM
  * interpreter), then timed at the target SF with a `noop` sink so the
  * WHOLE plan materializes (a bare `.count()` lets Catalyst prune the
  * computed columns away and under-reports real work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // None = the query failed; failures are reported, never summed or
    // min()'d against a successful pass (a -1 sentinel would both win the
    // best-of-2 min and silently shrink the total).
    def run(name: String, dir: String): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        // NonFatal only: after an OutOfMemoryError/StackOverflowError the
        // JVM is in an unknown state and every subsequent timing would be
        // untrustworthy — let fatal errors abort the whole run loudly.
        case scala.util.control.NonFatal(_) => None
      }
    }
    def best(a: Option[Double], b: Option[Double]): Option[Double] =
      (a.toList ::: b.toList).minOption

    val names = SparkEntry.queries.keys.toSeq.sorted
    names.foreach(run(_, "/root/testdata/sf0.001")) // warmup
    // best-of-2: JIT noise on the first timed pass is real but not the
    // steady-state throughput the number is meant to represent
    val pass1 = names.map(n => n -> run(n, sfDir)).toMap
    val results = names.map(n => n -> best(pass1(n), run(n, sfDir)))
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val failed = results.collect { case (k, None) => k }
    val qs = ok.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
