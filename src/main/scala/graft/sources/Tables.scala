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
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read the nanos as a plain long and truncate
    * to a micros timestamp with exact integer division (`DIV`, not `/` —
    * nanos-since-2024 ≈ 1.7e18 exceeds double's 53-bit mantissa). DuckDB
    * truncates ns→us the same way, so both engines see identical
    * timestamps. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw(spark, dir, "events")
      // keep the RAW nano column: predicates on `ts_ns` are plain long
      // comparisons on a stored column, so they push down to the parquet
      // scan (row-group/page skipping) — predicates on the derived
      // timestamp cannot. Operators with time-range filters use ts_ns.
      .withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
