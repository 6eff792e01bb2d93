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
            case Right(m) => row(m.width, m.height,
              if (m.durationMs >= 0) m.durationMs else null, m.format, null)
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
              case Right((w, h, fmt)) =>
                // ANIMATED images measure their run time too (round 19):
                // GIF via GCE delays, APNG via fcTL delays — block/chunk
                // walks, no pixel decode
                val anim =
                  if (fmt.startsWith("gif")) ImageHeaders.gifAnimation(body)
                  else if (fmt == "png") ImageHeaders.pngAnimation(body)
                  else None
                anim match {
                  case Some((frames, dur)) if frames > 1 =>
                    row(w, h, dur, s"$fmt-anim", null)
                  case _ => row(w, h, null, fmt, null)
                }
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
          // ICO (round 19): largest-entry geometry off the directory,
          // icon count in the format name — favicons are on every root
          case "image/x-icon" => ImageHeaders.ico(body) match {
            case Right((w, h, n)) => row(w, h, null, s"ico-$n", null)
            case Left(reason) => row(null, null, null, null, reason)
          }
          // SVG (round 19): geometry off the root tag's width/height
          // attributes (px), falling back to the viewBox extent — a
          // dimensionless SVG (scales to its container) keeps NULL
          // geometry with no quarantine
          case "image/svg+xml" =>
            val head = new String(body, 0, math.min(body.length, 4096),
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val tag = "(?is)<svg[^>]*>".r.findFirstIn(head).getOrElse("")
            def dim(name: String): Option[Int] =
              ("(?i)\\b" + name +
                "\\s*=\\s*[\"']\\s*([0-9]+(?:\\.[0-9]+)?)\\s*(?:px)?\\s*[\"']").r
                .findFirstMatchIn(tag)
                .map(m => math.round(m.group(1).toDouble).toInt)
            val wh = (dim("width"), dim("height")) match {
              case (Some(w), Some(h)) => Some((w, h))
              case _ =>
                ("(?i)viewBox\\s*=\\s*[\"']\\s*[-0-9.]+[\\s,]+[-0-9.]+" +
                  "[\\s,]+([0-9.]+)[\\s,]+([0-9.]+)").r
                  .findFirstMatchIn(tag)
                  .map(m => (math.round(m.group(1).toDouble).toInt,
                    math.round(m.group(2).toDouble).toInt))
            }
            row(wh.map(x => Int.box(x._1)).orNull,
              wh.map(x => Int.box(x._2)).orNull, null, "svg", null)
          // PDFs NAME their version in the header; measurement (text,
          // pages) stays with the richer pdfDocumentsOf route
          case "application/pdf" =>
            val head = new String(body, 0,
              math.min(16, body.length),
              java.nio.charset.StandardCharsets.ISO_8859_1)
            val v = "%PDF-(\\d\\.\\d)".r.findFirstMatchIn(head).map(_.group(1))
            row(null, null, null, v.map("pdf-" + _).orNull, null)
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

  // ---------- oracle instantiation (q_media_inventory) ----------

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Deterministic synthetic WAV — PCM16 mono at 8 kHz,
    * `80 × (doc_id % 29 + 1)` frames = `10 × (doc_id % 29 + 1)` ms
    * (integer-exact in both engines). */
  private[graft] def wavSynth(docId: Long): Array[Byte] = {
    val nFrames = 80 * (docId % 29 + 1).toInt
    val dataLen = nFrames * 2
    val ascii = (s: String) =>
      s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    ascii("RIFF") ++ le32(4L + 24 + 8 + dataLen) ++ ascii("WAVE") ++
      ascii("fmt ") ++ le32(16L) ++
      le16(1) ++ le16(1) ++ le32(8000L) ++ le32(16000L) ++ le16(2) ++ le16(16) ++
      ascii("data") ++ le32(dataLen.toLong) ++ new Array[Byte](dataLen)
  }

  /** The synthetic mixed-media WARC record frame behind
    * `q_media_inventory`: one HTTP response per doc, format by
    * doc_id % 6 — MP4 / MP3 / WebP / Ogg / WAV / AVI, each riding its
    * format's existing planted-truth synth (so the class arithmetic is
    * shared with the per-format oracles). The WebP class declares
    * `text/html` — the real web's most common media lie — so the
    * mismatch AND mojibake flags are both genuinely exercised; every
    * other class declares honestly. */
  private[graft] def mediaRecordsSynth(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val schema = StructType(Seq(
      StructField("warc_type", StringType),
      StructField("target_uri", StringType),
      StructField("payload", BinaryType)))
    spark.createDataFrame(
      documents.select(col("doc_id").cast("long")).rdd.map { r =>
        val id = r.getLong(0)
        val (ctype, body) = (id % 6).toInt match {
          case 0 => ("video/mp4", Mp4Ops.mp4Synth(id))
          case 1 => ("audio/mpeg", Mp3Ops.mp3Synth(id))
          case 2 => ("text/html", WebpOps.webpSynth(id)) // the lie
          case 3 => ("application/ogg", OggOps.oggSynth(id))
          case 4 => ("audio/wav", wavSynth(id))
          case _ => ("video/avi", AviOps.buildAvi(
            Seq(Array.tabulate[Byte](64)(i => ((id + i) & 0x7f).toByte)),
            16 + (id % 8).toInt * 2, 10 + (id % 9).toInt * 2,
            usPerFrame = 40000L, handler = "MJPG")) // 1 frame = 40 ms
        }
        val payload =
          (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
            .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) ++ body
        Row("response", s"http://synth.example/$id", payload)
      }, schema)
  }

  /** §2 `q_media_inventory`: the UNIFIED inventory under the ORACLE —
    * the capstone of the planted-truth media estate: a mixed corpus
    * (all six walked/probed families plus one lying declaration) runs
    * the REAL one-pass inventory — sniff, declared-vs-sniffed audit,
    * per-format walk/probe — while DuckDB states every class's
    * construction arithmetic. Any drift in the sniff routing, the flag
    * logic, or any single format's measurement breaks the hash. */
  def mediaInventory(documents: DataFrame): DataFrame =
    mediaInventoryOf(mediaRecordsSynth(documents))
      .select(
        regexp_extract(col("canon_url"), "([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("declared_mime"), col("sniffed_mime"),
        col("mismatch"), col("mojibake_risk"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("duration_ms"), col("media_format"))
      .orderBy("doc_id")

  val oracles: Map[String, String] = Map(
    "q_media_inventory" ->
      """SELECT doc_id,
        |  CASE doc_id % 6 WHEN 0 THEN 'video/mp4' WHEN 1 THEN 'audio/mpeg'
        |       WHEN 2 THEN 'text/html' WHEN 3 THEN 'application/ogg'
        |       WHEN 4 THEN 'audio/wav' ELSE 'video/avi' END AS declared_mime,
        |  CASE doc_id % 6 WHEN 0 THEN 'video/mp4' WHEN 1 THEN 'audio/mpeg'
        |       WHEN 2 THEN 'image/webp' WHEN 3 THEN 'application/ogg'
        |       WHEN 4 THEN 'audio/wav' ELSE 'video/avi' END AS sniffed_mime,
        |  (doc_id % 6 = 2) AS mismatch,
        |  (doc_id % 6 = 2) AS mojibake_risk,
        |  CASE doc_id % 6 WHEN 0 THEN 16 + (doc_id % 16) * 4
        |       WHEN 2 THEN 16 + (doc_id % 16) * 4
        |       WHEN 5 THEN 16 + (doc_id % 8) * 2 ELSE NULL END AS width,
        |  CASE doc_id % 6 WHEN 0 THEN 16 + (doc_id % 9) * 4
        |       WHEN 2 THEN 16 + (doc_id % 9) * 4
        |       WHEN 5 THEN 10 + (doc_id % 9) * 2 ELSE NULL END AS height,
        |  CASE doc_id % 6 WHEN 0 THEN 40 * (doc_id % 977 + 25)
        |       WHEN 1 THEN 36 * (doc_id % 29 + 1)
        |       WHEN 3 THEN 100 * (doc_id % 29 + 1)
        |       WHEN 4 THEN 10 * (doc_id % 29 + 1)
        |       WHEN 5 THEN 40 ELSE NULL END AS duration_ms,
        |  CASE doc_id % 6 WHEN 0 THEN 'isom' WHEN 1 THEN 'mpeg1-l3-64k'
        |       WHEN 2 THEN 'extended' WHEN 3 THEN 'vorbis'
        |       WHEN 4 THEN 'pcm16' ELSE 'MJPG' END AS media_format
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
