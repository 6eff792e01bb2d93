package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) source — the container format web-crawl
  * corpora (Common Crawl and anything wget/heritrix writes) ship in, and
  * the raw input of every from-the-web training-data pipeline.
  *
  * Spark-first ingestion shape: `binaryFile` scan → per-file record walk
  * in `mapPartitions` (the one genuinely imperative step: WARC records
  * are length-prefixed by a `Content-Length` header, so no line-based
  * reader can split them safely) → a flat typed DataFrame any downstream
  * operator (lang-id, dedup, curate) consumes columnar.
  *
  * Scale contract: parallelism is PER FILE — exactly the Common Crawl
  * layout (tens of thousands of ~1 GB segment files per crawl), so a
  * 1000-executor cluster saturates without splitting inside a file.
  * Records inside one file are parsed streaming off one byte walk (no
  * per-record copies of the whole buffer). Gzip is handled in its
  * real-world form: CC WARCs are CONCATENATED per-record gzip members,
  * which one `GZIPInputStream` decompresses end-to-end. A `maxRecord`
  * guard drops pathological records (a declared Content-Length past the
  * buffer — truncated file or bomb) instead of throwing mid-job; the
  * malformed tail is skipped, prior records survive (spec-asserted).
  *
  * NOT copied from the reference — the reference ingests StatsBomb JSON
  * only; this is the corpus-scale source its pipeline estate needs.
  */
object WarcSource {

  /** One parsed WARC record. `payload` is the raw record block (for
    * `response` records: HTTP headers + body — see [[httpResponses]]). */
  case class WarcRecord(
      file: String,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Long,
      payload: Array[Byte])

  /** Read every WARC (or .warc.gz) file under `path` into a record frame. */
  def read(spark: SparkSession, path: String,
           maxRecord: Int = 64 << 20): DataFrame = {
    import spark.implicits._
    val files: Dataset[(String, Array[Byte])] = spark.read.format("binaryFile")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    files.flatMap { case (p, bytes) => parseFile(p, bytes, maxRecord) }.toDF()
  }

  /** Parse one file's bytes (gzip-sniffed) into records. */
  def parseFile(path: String, raw: Array[Byte],
                maxRecord: Int = 64 << 20): Seq[WarcRecord] = {
    val bytes =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw)
      else raw
    parseRecords(path, bytes, maxRecord)
  }

  /** Decompress a stream of CONCATENATED gzip members (the CC layout —
    * one member per record). */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(raw))
    val out = new java.io.ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](64 << 10)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private val Magic = "WARC/".getBytes(StandardCharsets.US_ASCII)

  private def startsWith(b: Array[Byte], off: Int, pat: Array[Byte]): Boolean =
    off + pat.length <= b.length &&
      pat.indices.forall(i => b(off + i) == pat(i))

  /** Walk the record chain: version line, header lines to the blank line,
    * `Content-Length` bytes of payload, trailing CRLFCRLF. A record that
    * does not parse (bad magic, missing/oversized length) ends the walk —
    * records before it are kept. */
  private def parseRecords(path: String, bytes: Array[Byte],
                           maxRecord: Int): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CR/LF padding
      while (pos < bytes.length && (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
      if (pos >= bytes.length) ok = false
      else if (!startsWith(bytes, pos, Magic)) ok = false
      else {
        val headerEnd = findBlankLine(bytes, pos)
        if (headerEnd < 0) ok = false
        else {
          val headerText = new String(bytes, pos, headerEnd - pos, StandardCharsets.UTF_8)
          val headers = parseHeaders(headerText)
          val len = headers.getOrElse("content-length", "-1").trim.toLongOption.getOrElse(-1L)
          val bodyStart = headerEnd + blankLen(bytes, headerEnd)
          if (len < 0 || len > maxRecord || bodyStart + len > bytes.length) ok = false
          else {
            val payload = java.util.Arrays.copyOfRange(bytes, bodyStart, bodyStart + len.toInt)
            out += WarcRecord(
              file = path,
              warc_type = headers.getOrElse("warc-type", ""),
              record_id = headers.getOrElse("warc-record-id", ""),
              target_uri = headers.getOrElse("warc-target-uri", ""),
              warc_date = headers.getOrElse("warc-date", ""),
              content_type = headers.getOrElse("content-type", ""),
              content_length = len,
              payload = payload)
            pos = bodyStart + len.toInt
          }
        }
      }
    }
    out.result()
  }

  /** Offset of the blank line ending the header block (handles \r\n\r\n
    * and bare \n\n), or -1. Returns the offset OF the blank separator. */
  private def findBlankLine(bytes: Array[Byte], from: Int): Int = {
    var i = from
    while (i < bytes.length - 1) {
      if (bytes(i) == '\n' &&
          (bytes(i + 1) == '\n' ||
           (bytes(i + 1) == '\r' && i + 2 < bytes.length && bytes(i + 2) == '\n')))
        return i + 1
      i += 1
    }
    -1
  }

  private def blankLen(bytes: Array[Byte], at: Int): Int =
    if (bytes(at) == '\n') 1 else 2 // "\n" or "\r\n"

  /** Case-insensitive `Name: value` header map (first occurrence wins —
    * duplicate WARC headers are malformed). */
  private def parseHeaders(text: String): Map[String, String] =
    text.linesIterator.drop(1) // the WARC/1.x version line
      .flatMap { line =>
        val i = line.indexOf(':')
        if (i <= 0) None
        else Some(line.substring(0, i).trim.toLowerCase -> line.substring(i + 1).trim)
      }
      .foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
        if (m.contains(k)) m else m.updated(k, v)
      }

  /** Project `response` records into (uri, HTTP status, body text) — the
    * frame a text-extraction pipeline starts from. The HTTP header block
    * is split off row-level (`split` on the first blank line, codegen'd);
    * charset handling is UTF-8-lossy, the pragmatic crawl default. */
  def httpResponses(records: DataFrame): DataFrame = {
    val asText = decode(col("payload"), "UTF-8")
    records
      .filter(col("warc_type") === "response")
      .withColumn("_txt", asText)
      .withColumn("http_status",
        regexp_extract(col("_txt"), "^HTTP/[0-9.]+ ([0-9]{3})", 1).cast("int"))
      // body = everything after the FIRST blank line; a payload with no
      // blank line is a bare header block → empty body
      .withColumn("body",
        when(regexp_extract(col("_txt"), "(?s)\\r?\\n\\r?\\n", 0) === "", lit(""))
          .otherwise(regexp_replace(col("_txt"), "(?s)^.*?\\r?\\n\\r?\\n", "")))
      .select(col("file"), col("target_uri"), col("warc_date"),
        col("http_status"), col("body"))
  }
}
