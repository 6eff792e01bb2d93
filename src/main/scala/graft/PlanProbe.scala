package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Print the formatted physical plan of one `SparkEntry.queries` entry —
  * the `.explain` loop the build discipline calls for, runnable as
  * `sbt "runMain graft.PlanProbe <query> [sfDir]"`. Prints scan/exchange
  * tallies first (the numbers that matter at 100 TB), then the plan. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: PlanProbe <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .appName("graft-plan-probe").master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val names =
        if (name == "--all") SparkEntry.queries.keys.toSeq.sorted
        else Seq(name)
      names.foreach { n =>
        try {
          val df = SparkEntry.queries(n)(spark, sfDir)
          val p = df.queryExecution.explainString(FormattedMode)
          val scans = p.linesIterator.count(_.contains("Scan parquet"))
          val hashEx = p.linesIterator.count(
            _.trim.startsWith("Arguments: hashpartitioning("))
          val rangeEx = p.linesIterator.count(
            _.trim.startsWith("Arguments: rangepartitioning("))
          println(s"== $n: parquet scans=$scans hashExchanges=$hashEx " +
            s"rangeExchanges=$rangeEx ==")
          if (names.length == 1) println(p)
        } catch {
          case scala.util.control.NonFatal(e) =>
            println(s"== $n: PROBE FAILED ${e.getClass.getSimpleName}: " +
              s"${e.getMessage} ==")
        }
      }
    } finally spark.stop()
  }
}
