package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing = pay the fact-table shuffle once at ingest, never per query.
  * The join of two tables bucketed by the same key must plan with NO
  * Exchange on either side. */
class BucketedJoinSpec extends SparkSpec {

  test("co-bucketed fact tables join without any Exchange") {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    Tables.writeBucketed(li, "li_bucketed", "l_orderkey", buckets = 8)
    Tables.writeBucketed(ord, "ord_bucketed", "o_orderkey", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      // the ONLY permissible exchange is none before the join; the groupBy
      // on the same key also reuses the bucketing → zero exchanges total
      val exchanges = p.linesIterator.count(_.matches("""\(\d+\) Exchange.*"""))
      assert(exchanges == 0, s"$exchanges Exchanges:\n$p")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
