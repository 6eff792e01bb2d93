package graft

import org.apache.spark.sql.SparkSession

/** Round-10 probe (VERDICT r9 item 8): BPE training cost vs merge count
  * at production-ish round counts. Scratch harness — results land in
  * SURVEY §8. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1"); merges <- Seq(20, 100, 300)) {
      val docs = graft.sources.Tables.documents(spark, s"/root/testdata/$sf")
      val t0 = System.nanoTime()
      val (mt, _) = graft.operators.BpeOps.trainPieces(docs, merges)
      val n = mt.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $sf merges=$merges%-4d rows=$n wall=$secs%.2f s " +
        f"perRound=${secs / merges}%.3f s")
    }
    spark.stop()
  }
}
