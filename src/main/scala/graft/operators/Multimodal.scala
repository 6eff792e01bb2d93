package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2-B row 35 + §2-C).
  *
  * The contract for image/audio/video at 100 TB: payloads are opaque
  * `binary` columns that the PLAN never decodes — metadata lives in typed
  * sibling columns so Catalyst prunes the (huge) payload column whenever a
  * query only touches metadata. Decode runs batched per-partition at the
  * very edge (here a deterministic stub: no codec libraries in this
  * container — the schema/partitioning/batch plumbing is the real,
  * tested part).
  */
object MultimodalOps {

  /** §2-35 `q_multimodal_meta`: binary payload + typed metadata derivation.
    * The payload is the utf-8 bytes of `text` (deterministic stand-in for
    * image bytes); metadata (byte count, sha256, mime, dimensions) is
    * computed WITHOUT shipping the payload through a shuffle — row-level
    * expressions only. */
  def multimodalMeta(documents: DataFrame): DataFrame =
    documents
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        sha2(col("payload"), 256).as("sha256"),
        when(col("doc_id") % 3 === 0, "image/png")
          .when(col("doc_id") % 3 === 1, "audio/wav")
          .otherwise("video/mp4").as("mime"),
        (lit(16) + (col("doc_id") % 16) * 4).cast("int").as("width"),
        (lit(16) + (col("doc_id") % 9) * 4).cast("int").as("height"))
      .orderBy("doc_id")

  /** Decoded-feature schema produced by [[decodeBatches]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("mime", StringType),
    StructField("n_bytes", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  /** §2-C `Multimodal.decodeBatches`: batched per-partition decode of the
    * binary column into fixed-size feature vectors.
    *
    * Spark-side plumbing is real: `mapPartitions` over an iterator (bounded
    * memory — never materializes a partition), typed output schema, payload
    * column pruned everywhere else. The CODEC is a deterministic stub
    * (first-16-bytes → float features); swap `decodeStub` for a real
    * image/audio decoder (e.g. a JNI codec or `mapInPandas` + PIL on a
    * cluster with the libs installed) without touching the plumbing. */
  def decodeBatches(withPayload: DataFrame, dim: Int = 16): DataFrame = {
    val spark = withPayload.sparkSession
    val rdd = withPayload
      .select(col("doc_id").cast("long"), col("mime"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val mime = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          Row(id, mime, bytes.length, decodeStub(bytes, dim))
        }
      }
    spark.createDataFrame(rdd, decodedSchema)
  }

  /** Deterministic fake decoder: byte i (cyclic) scaled to [0, 1). */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i =>
      if (bytes.isEmpty) 0f else (bytes(i % bytes.length) & 0xff) / 256f)

  /** §2-C frame sampling as a DECLARATIVE plan: split the binary payload
    * into fixed-size frames and keep every `everyNth` — `substring` works
    * on BinaryType, so the whole thing is a codegen'd row-level
    * transform + explode, no UDF and no decode. This is the video
    * pattern: frame boundaries are byte-offset arithmetic (real codecs
    * index frames the same way via a keyframe table), decode happens
    * AFTER sampling, on 1/everyNth of the bytes. */
  def frameSample(withPayload: DataFrame, frameBytes: Int = 32,
                  everyNth: Int = 4): DataFrame =
    withPayload
      .select(col("doc_id"), col("payload"),
        floor(octet_length(col("payload")) / frameBytes).as("n_frames"))
      .select(col("doc_id"),
        // n_frames = 0 must emit NO rows: sequence(0, -1) is the DESCENDING
        // sequence [0, -1] in Spark, so the upper bound is clamped and the
        // lambda re-checks i < n_frames — otherwise a truncated partial
        // frame leaks through the i % N filter for short payloads.
        explode(expr(
          s"transform(filter(sequence(0, greatest(int(n_frames), 1) - 1), " +
            s"i -> i < n_frames AND i % $everyNth = 0), " +
            s"i -> struct(i as frame_idx, " +
            s"substring(payload, i * $frameBytes + 1, $frameBytes) as frame))"))
          .as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame").as("frame"))

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  strlen(text) AS n_bytes,
        |  sha256(text) AS sha256,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |       WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |       ELSE 'video/mp4' END AS mime,
        |  CAST(16 + (doc_id % 16) * 4 AS INTEGER) AS width,
        |  CAST(16 + (doc_id % 9) * 4 AS INTEGER) AS height
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
