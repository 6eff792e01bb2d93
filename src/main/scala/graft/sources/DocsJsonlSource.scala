package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-Lines document ingest with CORRUPT-RECORD QUARANTINE — the
  * real-world shape of a documents drop (one JSON object per line,
  * produced by dozens of upstream scrapers, some of which ship broken
  * lines, truncated files, or schema drift).
  *
  * Spark-first rules applied:
  *  - EXPLICIT schema, never inference (inference is a full extra pass
  *    at 100 TB, and worse: it SILENTLY adapts to upstream drift — the
  *    drift should be a quarantined row, not a changed schema);
  *  - PERMISSIVE mode with `columnNameOfCorruptRecord`: a broken line
  *    becomes a row whose corrupt column holds the raw text, instead of
  *    killing the job (FAILFAST) or silently vanishing (DROPMALFORMED —
  *    the worst choice for a data pipeline: loss without a ledger);
  *  - [[split]] routes rows into (clean, quarantine) frames in ONE pass
  *    semantics — quarantine keeps the raw line + file for re-scrape
  *    accounting (`q_drop_diff`'s ingestion-side sibling).
  *
  * Caveat encoded here so callers can't hit it: Spark refuses a filter
  * that references ONLY the corrupt column over a pristine scan
  * (the "queries from raw JSON files are disallowed" analyzer rule), so
  * [[split]] materializes the parsed frame first (cache) — also the
  * right call operationally, since both halves are consumed. */
object DocsJsonlSource {

  /** The documents-table schema (TESTDATA.md) as the ingest contract. */
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val CorruptCol = "_corrupt_record"

  /** Parse JSONL under `path` (schema-checked, corrupt lines captured). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema.add(StructField(CorruptCol, StringType)))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .withColumn("input_file", input_file_name())

  /** Route a [[read]] frame into (clean, quarantine). Clean drops the
    * corrupt column; quarantine is (file, raw line) — the re-scrape
    * ledger. A line that parses as JSON but misses `doc_id` (schema
    * drift, not syntax breakage) is ALSO quarantined: a null key would
    * silently break every downstream join/dedup. */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val cached = parsed.cache()
    val bad = cached.filter(col(CorruptCol).isNotNull || col("doc_id").isNull)
      .select(col("input_file"),
        coalesce(col(CorruptCol), to_json(struct(
          col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))))
          .as("raw"))
    val clean = cached.filter(col(CorruptCol).isNull && col("doc_id").isNotNull)
      .drop(CorruptCol, "input_file")
    (clean, bad)
  }
}
