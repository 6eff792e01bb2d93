package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q_funnel", "q_retention", "q_session_window", "q_profile", "q_dedup_canonical")
    def run(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    qs.foreach(q => run(q, "/root/testdata/sf0.001")) // JIT warm-up
    for (q <- qs) {
      val a = math.min(run(q, "/root/testdata/sf0.01"), run(q, "/root/testdata/sf0.01"))
      val b = math.min(run(q, "/root/testdata/sf0.1"), run(q, "/root/testdata/sf0.1"))
      println(f"PROBE $q%-22s sf0.01=$a%.2fs sf0.1=$b%.2fs ratio=${b / a}%.1fx")
    }
    spark.stop()
  }
}
