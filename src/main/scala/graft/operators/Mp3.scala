package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MP3 METADATA — round 18, the audio twin of [[Mp4Ops]]: the round-18
  * `magic_mime` extension can NAME `audio/mpeg` bytes (the
  * shape-validated ID3v2 magic); this walk READS them — the ID3v2 text
  * frames a corpus builder actually filters on (title / artist /
  * album) plus the first MPEG audio frame header (version, layer,
  * bitrate, sample rate) and the duration. No sample decode (MP3's
  * hybrid filterbank has no pure-JVM decoder on the offline
  * classpath — the brotli precedent; G.711/WAV remain the decodable
  * audio routes). Duration: a Xing/Info VBR header's exact frame count
  * when present (frames × 1152 / rate), else the CBR estimate
  * `(bytes after the tag) × 8 / bitrate` — exact for constant-bitrate
  * files, priced as approximate for headerless VBR.
  *
  * ID3v2 grammar honored: v2.3 (plain 32-bit frame sizes) AND v2.4
  * (sync-safe frame sizes) — the two the real web ships; v2.2's
  * 3-byte grammar is recognized and skipped (tag fields null, audio
  * still parsed). Extended headers skipped per the flag bit. Text
  * frames decode latin-1 / UTF-16(BOM) / UTF-8 by their encoding byte.
  *
  * Scale shape: the codec convention — one mapPartitions walk per
  * payload, payload dies in-task, zero shuffles. */
object Mp3Ops {

  /** Parsed metadata. `tagVersion` = 2/3/4 (ID3v2), 1 (only the legacy
    * v1 trailer), or -1 when the file opens straight at a frame sync
    * with no tag at all. Strings are null-empty "" when the field is
    * absent in every tag present. */
  final case class Mp3Info(tagVersion: Int, title: String, artist: String,
                           album: String, bitrateKbps: Int, sampleRate: Int,
                           durationMs: Long)

  /** MPEG1 Layer III bitrate table (kbps, index 1-14; 0 = free, 15 =
    * bad). */
  private val BitrateL3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320, -1)
  private val SampleRateMpeg1 = Array(44100, 48000, 32000, -1)

  private def syncSafe(b: Array[Byte], off: Int): Int =
    ((b(off) & 0x7f) << 21) | ((b(off + 1) & 0x7f) << 14) |
      ((b(off + 2) & 0x7f) << 7) | (b(off + 3) & 0x7f)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) << 24 | (b(off + 1) & 0xffL) << 16 |
      (b(off + 2) & 0xffL) << 8 | (b(off + 3) & 0xffL)

  /** Decode one ID3v2 text-frame payload by its encoding byte. */
  private def textOf(b: Array[Byte], off: Int, len: Int): String = {
    if (len <= 1) return ""
    val enc = b(off) & 0xff
    val cs = enc match {
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // with BOM
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case 3 => java.nio.charset.StandardCharsets.UTF_8
      case _ => java.nio.charset.StandardCharsets.ISO_8859_1
    }
    val s = new String(b, off + 1, len - 1, cs)
    // text frames are NUL-terminated lists; the first value is the field
    val cut = s.indexOf('\u0000')
    if (cut >= 0) s.substring(0, cut) else s
  }

  /** Walk one payload: Left(reason) or Right(info). Reasons: `not_mp3`
    * (neither a shape-valid ID3v2 header nor an immediate MPEG frame
    * sync), `no_frames` (tag parsed but no audio frame follows within
    * the scan bound). Never throws on hostile bytes. */
  def mp3Walk(bytes: Array[Byte]): Either[String, Mp3Info] = {
    val hasId3 = bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3' && (bytes(3) & 0xff) < 0x20 && (bytes(4) & 0xff) < 0x20 &&
      (bytes(5) & 0x0f) == 0 && (bytes(6) & 0x80) == 0 && (bytes(7) & 0x80) == 0 &&
      (bytes(8) & 0x80) == 0 && (bytes(9) & 0x80) == 0
    var tagVersion = -1
    var title = ""; var artist = ""; var album = ""
    var audioStart = 0
    if (hasId3) {
      tagVersion = bytes(3) & 0xff
      val tagSize = syncSafe(bytes, 6)
      val tagEnd = math.min(10L + tagSize, bytes.length.toLong).toInt
      audioStart = tagEnd
      if (tagVersion == 3 || tagVersion == 4) {
        var off = 10
        // extended header: skip by its declared size (v2.3: plain u32
        // EXCLUDING its own 4 size bytes; v2.4: sync-safe INCLUDING)
        if ((bytes(5) & 0x40) != 0 && off + 4 <= tagEnd) {
          val es =
            if (tagVersion == 4) syncSafe(bytes, off)
            else u32(bytes, off).toInt + 4
          off += math.max(es, 4)
        }
        var ok = true
        while (ok && off + 10 <= tagEnd) {
          val id = new String(bytes, off, 4,
            java.nio.charset.StandardCharsets.ISO_8859_1)
          if (id(0) == 0) ok = false // padding reached
          else {
            val fs =
              if (tagVersion == 4) syncSafe(bytes, off + 4)
              else u32(bytes, off + 4)
            if (fs < 0 || off + 10 + fs > tagEnd) ok = false
            else {
              id match {
                case "TIT2" => title = textOf(bytes, off + 10, fs.toInt)
                case "TPE1" => artist = textOf(bytes, off + 10, fs.toInt)
                case "TALB" => album = textOf(bytes, off + 10, fs.toInt)
                case _ => ()
              }
              off += 10 + fs.toInt
            }
          }
        }
      }
    }
    // ID3v1 fallback (the 128-byte "TAG" trailer — the legacy tag many
    // files still carry): fills fields v2 left empty; a v1-only file
    // reports tagVersion 1. The trailer is NOT audio, so it also bounds
    // the CBR byte estimate.
    var audioEnd = bytes.length
    if (bytes.length >= 128) {
      val t = bytes.length - 128
      if (bytes(t) == 'T' && bytes(t + 1) == 'A' && bytes(t + 2) == 'G') {
        def field(off: Int, len: Int): String = {
          var e = off + len
          while (e > off && (bytes(e - 1) == 0 || bytes(e - 1) == ' ')) e -= 1
          new String(bytes, off, e - off,
            java.nio.charset.StandardCharsets.ISO_8859_1)
        }
        if (tagVersion < 0) tagVersion = 1
        if (title.isEmpty) title = field(t + 3, 30)
        if (artist.isEmpty) artist = field(t + 33, 30)
        if (album.isEmpty) album = field(t + 63, 30)
        audioEnd = t
      }
    }
    // first MPEG frame header at/after audioStart (bounded scan — real
    // files open the frame immediately; 4 KiB absorbs padding/junk;
    // the v1 trailer is excluded — its latin-1 text is not frame space)
    var p = audioStart
    val bound = math.min(audioEnd - 4, audioStart + 4096)
    var hdr = -1
    while (hdr < 0 && p <= bound) {
      if ((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xe0) == 0xe0) hdr = p
      else p += 1
    }
    if (hdr < 0) return if (hasId3) Left("no_frames") else Left("not_mp3")
    val b1 = bytes(hdr + 1) & 0xff
    val b2 = bytes(hdr + 2) & 0xff
    val mpeg1 = (b1 & 0x18) == 0x18
    val layer3 = (b1 & 0x06) == 0x02
    val brIdx = (b2 >> 4) & 0x0f
    val srIdx = (b2 >> 2) & 0x03
    if (!mpeg1 || !layer3 || brIdx == 0 || brIdx == 15 || srIdx == 3)
      return if (hasId3) Left("no_frames") else Left("not_mp3")
    val kbps = BitrateL3(brIdx)
    val sr = SampleRateMpeg1(srIdx)
    // VBR: a Xing/Info header in the first frame's side-info region
    // carries the exact frame count — frames × 1152 samples over the
    // sample rate beats the CBR estimate (which under/over-shoots on
    // VBR by design). Offset per the spec: 4-byte header + side info
    // (MPEG1: 17 bytes mono, 32 otherwise).
    val chMode = (bytes(hdr + 3) & 0xff) >> 6
    val xing = hdr + 4 + (if (chMode == 3) 17 else 32)
    def u32be(off: Int): Long =
      (bytes(off) & 0xffL) << 24 | (bytes(off + 1) & 0xffL) << 16 |
        (bytes(off + 2) & 0xffL) << 8 | (bytes(off + 3) & 0xffL)
    def tag4(off: Int, s: String): Boolean =
      off + 4 <= bytes.length && bytes(off) == s(0).toByte &&
        bytes(off + 1) == s(1).toByte && bytes(off + 2) == s(2).toByte &&
        bytes(off + 3) == s(3).toByte
    val vbrFrames =
      if ((tag4(xing, "Xing") || tag4(xing, "Info")) &&
        xing + 12 <= bytes.length && (u32be(xing + 4) & 1L) == 1L)
        u32be(xing + 8)
      else -1L
    val durationMs =
      if (vbrFrames >= 0) vbrFrames * 1152L * 1000L / sr
      else math.max(audioEnd - hdr, 0).toLong * 8000L / (kbps * 1000L)
    Right(Mp3Info(tagVersion, title, artist, album, kbps, sr, durationMs))
  }

  // ---------- operator faces ----------

  private val cleanSchema = StructType(Seq(
    StructField("url", StringType),
    StructField("tag_version", IntegerType),
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType),
    StructField("bitrate_kbps", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Metadata of a (url, payload) frame — (clean, quarantine) pair, the
    * [[Mp4Ops.mp4MetaOf]] discipline. Absent tag fields are NULL. */
  def mp3MetaOf(payloads: DataFrame): (DataFrame, DataFrame) = {
    val spark = payloads.sparkSession
    val walked = spark.createDataFrame(
      payloads.select(col("url").cast("string"), col("payload"))
        .rdd.mapPartitions { it =>
          it.map { r =>
            val url = r.getString(0)
            mp3Walk(r.getAs[Array[Byte]](1)) match {
              case Right(m) => Row(url,
                if (m.tagVersion >= 0) m.tagVersion else null,
                if (m.title.nonEmpty) m.title else null,
                if (m.artist.nonEmpty) m.artist else null,
                if (m.album.nonEmpty) m.album else null,
                m.bitrateKbps, m.sampleRate, m.durationMs, null)
              case Left(reason) =>
                Row(url, null, null, null, null, null, null, null, reason)
            }
          }
        }, StructType(cleanSchema.fields :+ StructField("reason", StringType)))
    (walked.filter(col("reason").isNull).drop("reason"),
      walked.filter(col("reason").isNotNull).select(col("url"), col("reason")))
  }

  /** The WARC adapter ([[Mp4Ops.mp4MetaOfRecords]]'s shape): responses
    * routed by DECLARATION OR CONTENT (`audio/mpeg` header, or a body
    * whose shape-valid ID3v2 magic sniffs `audio/mpeg` behind a lying
    * header — the walk re-validates). */
  def mp3MetaOfRecords(records: DataFrame): (DataFrame, DataFrame) = {
    val spark = records.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val l1 = decode(col("payload"), "ISO-8859-1")
    val p1 = instr(l1, "\r\n\r\n")
    val p2 = instr(l1, "\n\n")
    val big = lit(Int.MaxValue)
    val bodyStart = least(
      coalesce(nullif(p1, lit(0)) + 4, big),
      coalesce(nullif(p2, lit(0)) + 2, big))
    val declared = lower(regexp_extract(l1,
      "(?im)^content-type:[ \\t]*([a-z0-9.+/-]+)", 1))
    val sniffed = call_function("magic_mime",
      substring(col("payload"), bodyStart, lit(16)))
    val isMp3 = declared === "audio/mpeg" || sniffed === "audio/mpeg"
    val rdd = records
      .filter(col("warc_type") === "response" && isMp3)
      .select(col("target_uri").cast("string"), col("payload"))
      .rdd.mapPartitions { it =>
        it.map(r => Row(r.getString(0), PdfOps.httpBody(r.getAs[Array[Byte]](1))))
      }
    mp3MetaOf(spark.createDataFrame(rdd, StructType(Seq(
      StructField("url", StringType), StructField("payload", BinaryType)))))
  }

  // ---------- oracle instantiation (q_mp3_meta) ----------

  private def ss(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
    ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)
  private def be32(v: Int): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def latin1(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private def textFrame(id: String, text: String, v4: Boolean): Array[Byte] = {
    val payload = Array[Byte](0) ++ latin1(text) // encoding 0 = latin-1
    latin1(id) ++ (if (v4) ss(payload.length) else be32(payload.length)) ++
      Array[Byte](0, 0) ++ payload
  }

  /** Deterministic synthetic MP3 — ID3v2.3 (even doc_id, plain frame
    * sizes) or v2.4 (odd, sync-safe frame sizes) tag carrying
    * TIT2/TPE1, then `10 × (doc_id % 29 + 1)` ms of 128 kbps MPEG1
    * Layer III CBR frames (160 bytes per 10 ms at 128 kbps — integer-
    * exact duration arithmetic in both engines). */
  private[graft] def mp3Synth(docId: Long): Array[Byte] = {
    val v4 = docId % 2 == 1
    val frames = textFrame("TIT2", s"title $docId", v4) ++
      textFrame("TPE1", s"artist ${docId % 50}", v4)
    val tag = latin1("ID3") ++
      Array[Byte](if (v4) 4 else 3, 0, 0) ++ ss(frames.length) ++ frames
    // 0xFF 0xFB = MPEG1 Layer III no-CRC; 0x90 = bitrate idx 9
    // (128 kbps) + sample-rate idx 0 (44100); frame body zero-filled
    val nBytes = 160 * (docId % 29 + 1).toInt
    val audio = new Array[Byte](nBytes)
    audio(0) = 0xff.toByte; audio(1) = 0xfb.toByte
    audio(2) = 0x90.toByte; audio(3) = 0x00
    tag ++ audio
  }

  /** §2 `q_mp3_meta`: MP3 metadata under the ORACLE — the planted-truth
    * pattern: each doc rides a deterministic synthetic MP3
    * ([[mp3Synth]], v2.3/v2.4 alternating so BOTH frame-size grammars
    * grade), Spark re-reads tag fields and the frame header through the
    * REAL walk while DuckDB states the construction arithmetic. */
  def mp3Meta(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("payload", BinaryType)))
    val payloads = spark.createDataFrame(
      documents.select(col("doc_id").cast("long")).rdd.map { r =>
        Row(r.getLong(0), mp3Synth(r.getLong(0)))
      }, schema)
    val (clean, _) = mp3MetaOf(payloads.select(
      col("doc_id").cast("string").as("url"), col("payload")))
    clean
      .select(col("url").cast("long").as("doc_id"),
        col("tag_version").cast("long").as("tag_version"),
        col("title"), col("artist"),
        col("bitrate_kbps").cast("long").as("bitrate_kbps"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("duration_ms"))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q_mp3_meta" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 1 THEN 4 ELSE 3 END AS tag_version,
        |  'title ' || doc_id AS title,
        |  'artist ' || (doc_id % 50) AS artist,
        |  128 AS bitrate_kbps, 44100 AS sample_rate,
        |  10 * (doc_id % 29 + 1) AS duration_ms
        |FROM documents ORDER BY doc_id""".stripMargin
  )
}
