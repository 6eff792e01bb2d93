package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketing = pay the fact-table shuffle once at ingest, never per query.
  * The join of two tables bucketed by the same key must plan with NO
  * Exchange on either side. */
class BucketedJoinSpec extends SparkSpec {

  test("backfill-scale incremental dedup: co-bucketed band indexes join exchange-free") {
    import graft.operators.DedupOps
    val docs = Tables.documents(spark, sfDir)
    val bk = DedupOps.minhashBandKeys(docs, graft.operators.DedupOps.MinhashK,
      graft.operators.DedupOps.Bands)
    val m = DedupOps.IncrementalDeltaMod
    // a backfill delta is corpus-sized — broadcast is off the table; the
    // answer is the persisted layout: both band indexes bucketed by the
    // join key, so the per-batch join never re-shuffles the corpus
    Tables.writeBucketed(bk.filter(pmod(col("doc_id"), lit(m)) =!= 0),
      "corpus_band_idx", "band", buckets = 8, moreKeys = Seq("key"))
    Tables.writeBucketed(bk.filter(pmod(col("doc_id"), lit(m)) === 0),
      "delta_band_idx", "band", buckets = 8, moreKeys = Seq("key"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("delta_band_idx").as("d")
        .join(spark.table("corpus_band_idx").as("c"), Seq("band", "key"))
        .select(col("d.doc_id").as("doc_new"), col("c.doc_id").as("doc_corpus"))
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 0,
        s"unexpected Exchange:\n$p")
      // and the bucketed path computes the same pair universe as the
      // inline operator
      val got = joined.distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = DedupOps.dedupIncremental(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS corpus_band_idx")
      spark.sql("DROP TABLE IF EXISTS delta_band_idx")
    }
  }

  test("backfill-scale incremental passage dedup: co-bucketed fingerprint indexes join exchange-free") {
    import graft.operators.DedupOps
    graft.plans.GraftFunctions.register(spark)
    val docs = Tables.documents(spark, sfDir)
    val m = DedupOps.IncrementalDeltaMod
    val fps = docs
      .select(col("doc_id"), graft.functions.TextFuns.norm(col("text")).as("t"))
      .filter(length(col("t")) >= DedupOps.WinnowK + DedupOps.WinnowW - 1)
      .select(col("doc_id"), explode(call_function("winnow_fingerprints",
        col("t"), lit(DedupOps.WinnowK), lit(DedupOps.WinnowW))).as("f"))
    Tables.writeBucketed(fps.filter(pmod(col("doc_id"), lit(m)) =!= 0),
      "corpus_fp_idx", "f", buckets = 8)
    Tables.writeBucketed(fps.filter(pmod(col("doc_id"), lit(m)) === 0),
      "delta_fp_idx", "f", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("delta_fp_idx").as("d")
        .join(spark.table("corpus_fp_idx").as("c"), Seq("f"))
        .select(col("d.doc_id").as("doc_new"), col("c.doc_id").as("doc_corpus"))
      val p = joined.queryExecution.explainString(FormattedMode)
      assert(p.contains("SortMergeJoin"), p)
      assert(p.linesIterator.count(_.matches("""\(\d+\) Exchange.*""")) == 0,
        s"unexpected Exchange:\n$p")
      // pair universe ≡ the inline operator (cap wide open on both so
      // the df-cap asymmetry cannot bind)
      val got = joined.groupBy("doc_new", "doc_corpus").count()
        .filter(col("count") >= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = DedupOps.dedupSubstringIncremental(docs, dfCap = 100000)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected,
        s"extra=${got -- expected} missing=${expected -- got}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS corpus_fp_idx")
      spark.sql("DROP TABLE IF EXISTS delta_fp_idx")
    }
  }

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
