package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table contract (see /root/repo/TESTDATA.md).
  *
  * One parquet file-or-directory per table under a scale-factor dir. At
  * cluster scale the same contract holds with partitioned directories —
  * `spark.read.parquet` handles both, and Catalyst prunes partitions/columns
  * from the declarative plan, so nothing here changes at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Generic accessor — routes `events` through its typed reader (the raw
    * parquet stores INT64 TIMESTAMP(NANOS), which the default reader
    * rejects; see [[events]]), everything else reads directly. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else raw(spark, dir, name)

  private def raw(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Persist a fact table bucketed (and sorted) by its join key.
    *
    * Two tables bucketed by the same key into the same bucket count join
    * with NO Exchange (and no Sort if sortBy matches) — at 100 TB this is
    * the difference between re-shuffling the fact table per query and
    * paying the shuffle once at ingest. See `BucketedJoinSpec` for the
    * asserted plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 32, moreKeys: Seq[String] = Nil): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .saveAsTable(table)

  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  /** `events.parquet` stores `ts` as naive micros (TIMESTAMP_NTZ) in the
    * current testdata layout; earlier layouts used INT64 TIMESTAMP(NANOS)
    * (which Spark's vectorized reader rejects) or UTC-adjusted
    * TIMESTAMP(MICROS). Normalize all three to TIMESTAMP_NTZ — the exact
    * type DuckDB's naive TIMESTAMP has, so oracle values match without any
    * session-timezone dependence. The current layout passes through
    * UNTOUCHED: `ts` stays the stored column, so time-range predicates on
    * it push down to the parquet scan (row-group/page skipping). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = raw(spark, dir, "events")
    df.schema("ts").dataType match {
      case TimestampNTZType => df
      case LongType =>
        // nanos-as-long: truncate ns→us with exact integer division (DIV,
        // not `/` — nanos-since-2024 ≈ 1.7e18 exceeds double's 53-bit
        // mantissa), then rebuild the naive timestamp with pure integer
        // arithmetic (timezone never enters).
        df.withColumn("ts", expr(
          "timestampadd(MICROSECOND, ts DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case TimestampType =>
        // UTC-adjusted micros: unix_micros extracts the instant's epoch
        // micros (timezone-independent), timestampadd rebuilds NTZ.
        df.withColumn("ts", expr(
          "timestampadd(MICROSECOND, unix_micros(ts), TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
      case other =>
        throw new IllegalStateException(s"events.ts: unexpected type $other")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
