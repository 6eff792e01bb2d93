package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The MEDIA INVENTORY — round 18's deployment glue: one pass over a
  * WARC record frame that names every response's bytes
  * ([[graft.plans.MagicMime]], the declared-vs-sniffed audit) AND
  * reads the metadata of every format the estate has a walk for —
  * MP4/M4A ([[Mp4Ops]]), MP3 ([[Mp3Ops]]), WebP ([[WebpOps]]) — in one
  * frame a crawl operator actually consumes: "what media did this
  * segment fetch, what are its dimensions/durations, and which
  * declarations lie". Images (PNG/GIF/BMP/JPEG) measure from their
  * HEADERS alone ([[ImageHeaders]], round 19) — O(header) bytes, no
  * pixel decode, geometry parity-specced against the full decoders;
  * the full routes (decodeBatches, the dataset builders,
  * pdfDocumentsOf) remain the feature/dHash path. Fonts (WOFF/WOFF2)
  * are named but
  * deliberately not measured — a font file carries no training-data
  * signal beyond its mime, so naming is the whole triage (policy, not
  * a gap).
  *
  * Scale shape: header fields stay codegen'd Columns; ONE mapPartitions
  * carries the body split + sniff + the per-format walk, payload dies
  * in-task, zero shuffles — the whole inventory fuses into the record
  * scan. */
object MediaOps {

  private val outSchema = StructType(Seq(
    StructField("canon_url", StringType),
    StructField("declared_mime", StringType),
    StructField("sniffed_mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("media_format", StringType),
    StructField("media_reason", StringType)))

  /** Per-response inventory: (canon_url, declared_mime, sniffed_mime,
    * mismatch, mojibake_risk, width, height, duration_ms, media_format,
    * media_reason). Geometry/duration populate for the walked formats;
    * `media_reason` carries a walk's quarantine verdict (a declared-
    * or-sniffed media payload whose bytes do not parse); both stay NULL
    * for non-media formats (fonts, archives, text). */
  def mediaInventoryOf(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val l1 = decode(col("payload"), "ISO-8859-1")
    val declared = lower(regexp_extract(l1,
      "(?im)^content-type:[ \\t]*([a-z0-9.+/-]+)", 1))
    val base = records.filter(col("warc_type") === "response")
      .select(UrlOps.canonIdn(col("target_uri")).as("canon_url"),
        nullif(declared, lit("")).as("declared_mime"),
        col("payload"))
    val walked = spark.createDataFrame(base.rdd.mapPartitions { it =>
      it.map { r =>
        val url = r.getString(0)
        val decl = if (r.isNullAt(1)) null else r.getString(1)
        val body = PdfOps.httpBody(r.getAs[Array[Byte]](2))
        val sniffed = graft.plans.MagicMime.sniff(
          java.util.Arrays.copyOf(body, math.min(body.length, 512)))
        def row(w: Any, h: Any, d: Any, f: Any, reason: Any): Row =
          Row(url, decl, sniffed, w, h, d, f, reason)
        sniffed match {
          case "video/mp4" | "audio/mp4" => Mp4Ops.mp4Walk(body) match {
            case Right(m) => row(
              if (m.width >= 0) m.width else null,
              if (m.height >= 0) m.height else null,
              if (m.durationMs >= 0) m.durationMs else null,
              m.majorBrand, null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case "audio/mpeg" => Mp3Ops.mp3Walk(body) match {
            case Right(m) => row(null, null, m.durationMs,
              s"mpeg${m.mpegVersion}-l${m.layer}-${m.bitrateKbps}k", null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case "image/webp" => WebpOps.webpWalk(body) match {
            case Right(m) => row(m.width, m.height, null, m.format, null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case "application/ogg" => OggOps.oggWalk(body) match {
            case Right(m) => row(null, null, m.durationMs, m.codec, null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          // the web's dominant media type measures from its header alone
          // (round 19): PNG IHDR / GIF LSD / BMP info header / JPEG SOFn
          // — O(header) bytes, no pixel decode, geometry parity-specced
          // against the full decoders
          case "image/png" | "image/gif" | "image/bmp" | "image/jpeg" =>
            ImageHeaders.probe(body) match {
              case Right((w, h, fmt)) => row(w, h, null, fmt, null)
              case Left(reason) => row(null, null, null, null, reason)
            }
          // RIFF/QOI headers likewise (round 19): the movi/data payload
          // bytes are skipped by declared size, never copied
          case "audio/wav" => MediaHeaders.wav(body) match {
            case Right((d, fmt)) => row(null, null, d, fmt, null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case "video/avi" => MediaHeaders.avi(body) match {
            case Right((w, h, d, handler)) => row(w, h, d, handler, null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case "image/qoi" => MediaHeaders.qoi(body) match {
            case Right((w, h)) => row(w, h, null, "qoi", null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          case _ => row(null, null, null, null, null)
        }
      }
    }, outSchema)
    walked
      .withColumn("mismatch",
        col("declared_mime").isNotNull &&
          col("declared_mime") =!= col("sniffed_mime"))
      .withColumn("mojibake_risk",
        !col("sniffed_mime").isin("text/plain", "text/html") &&
          (col("declared_mime").isNull ||
            col("declared_mime").startsWith("text/")))
      .select(col("canon_url"), col("declared_mime"), col("sniffed_mime"),
        col("mismatch"), col("mojibake_risk"), col("width"), col("height"),
        col("duration_ms"), col("media_format"), col("media_reason"))
  }
}
