package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.{MediaOps, Mp3Ops, Mp4Ops, WebpOps}

/** The unified media inventory (SURVEY §2-C): one pass naming every
  * response's bytes and reading the walked formats' metadata. */
class MediaInventorySpec extends SparkSpec {

  private def warcRecord(uri: String, payload: Array[Byte]): Array[Byte] = {
    val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
    hdr ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }
  private def http(ctype: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
      .getBytes(ISO_8859_1) ++ body

  test("mediaInventoryOf: names, measures, and flags one mixed segment in one pass") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_media")
    val recs =
      warcRecord("http://m.example/clip.mp4",
        http("video/mp4", Mp4Ops.mp4Synth(1L))) ++
      warcRecord("http://m.example/song.mp3",
        http("audio/mpeg", Mp3Ops.mp3Synth(6L))) ++
      // the lie: WebP behind text/html — mojibake risk AND measured
      warcRecord("http://m.example/hero.img",
        http("text/html", WebpOps.webpSynth(4L))) ++
      // a declared mp4 whose bytes are junk: sniffs octet-stream, so
      // the mismatch audit flags it; no walk runs (the sniff routes)
      warcRecord("http://m.example/broken.mp4",
        http("video/mp4", "junk bytes here".getBytes(ISO_8859_1))) ++
      // honest html: no media columns
      warcRecord("http://m.example/page.html",
        http("text/html",
          "<html><body>a page body</body></html>".getBytes(ISO_8859_1)))
    java.nio.file.Files.write(dir.resolve("seg.warc"), recs)
    val got = MediaOps.mediaInventoryOf(
      graft.sources.WarcSource.read(spark, dir.toString))
      .collect().map(r => r.getString(0) -> r).toMap
    val clip = got("http://m.example/clip.mp4")
    assert(clip.getAs[String]("sniffed_mime") == "video/mp4")
    assert(!clip.getAs[Boolean]("mismatch"))
    assert(clip.getAs[Int]("width") == 20 &&
      clip.getAs[Long]("duration_ms") == 40L * 26)
    assert(clip.getAs[String]("media_format") == "mp42")
    val song = got("http://m.example/song.mp3")
    assert(song.getAs[String]("sniffed_mime") == "audio/mpeg")
    assert(song.getAs[Long]("duration_ms") == 70L)
    assert(song.getAs[String]("media_format") == "mpeg1-l3-128k")
    val hero = got("http://m.example/hero.img")
    assert(hero.getAs[String]("sniffed_mime") == "image/webp")
    assert(hero.getAs[Boolean]("mismatch") &&
      hero.getAs[Boolean]("mojibake_risk"))
    assert(hero.getAs[Int]("width") == 32)
    val broken = got("http://m.example/broken.mp4")
    assert(broken.getAs[String]("sniffed_mime") == "text/plain" ||
      broken.getAs[String]("sniffed_mime") == "application/octet-stream")
    assert(broken.getAs[Boolean]("mismatch"))
    assert(broken.isNullAt(broken.fieldIndex("width")))
    val page = got("http://m.example/page.html")
    assert(page.getAs[String]("sniffed_mime") == "text/html")
    assert(!page.getAs[Boolean]("mismatch") &&
      !page.getAs[Boolean]("mojibake_risk"))
    assert(page.isNullAt(page.fieldIndex("duration_ms")) &&
      page.isNullAt(page.fieldIndex("media_reason")))
    // the plan: zero exchanges — the whole inventory is one record pass
    val p = MediaOps.mediaInventoryOf(
      graft.sources.WarcSource.read(spark, dir.toString))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("mediaInventoryStream: per-trigger inventory equals the batch face") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val fixture =
      warcRecord("http://m.example/clip.mp4",
        http("video/mp4", Mp4Ops.mp4Synth(0L))) ++
      warcRecord("http://m.example/song.ogg",
        http("application/ogg", graft.operators.OggOps.oggSynth(2L))) ++
      warcRecord("http://m.example/page.html",
        http("text/html",
          "<html><body>a page body</body></html>".getBytes(ISO_8859_1)))
    val recs = graft.sources.WarcSource.parseFile("mem", fixture).toSeq
    val sunk = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.sources.WarcSource.WarcRecord]
    val q = graft.streaming.EventStream.mediaInventoryStream(input.toDF()) {
      (inv, _) => sunk.synchronized { sunk ++= inv.collect() }
    }
    try {
      input.addData(recs.take(1))
      q.processAllAvailable()
      input.addData(recs.drop(1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val got = sunk.synchronized {
      sunk.map(r => r.getString(0) -> r.getAs[String]("sniffed_mime")).toMap
    }
    assert(got == Map(
      "http://m.example/clip.mp4" -> "video/mp4",
      "http://m.example/song.ogg" -> "application/ogg",
      "http://m.example/page.html" -> "text/html"), got.toString)
    // batch ≡ stream (union of triggers)
    val batch = MediaOps.mediaInventoryOf(spark.createDataset(recs).toDF())
      .collect().map(r => r.getString(0) -> r.getAs[String]("sniffed_mime")).toMap
    assert(batch == got)
    val ogg = sunk.synchronized {
      sunk.find(_.getString(0) == "http://m.example/song.ogg").get
    }
    assert(ogg.getAs[String]("media_format") == "opus" &&
      ogg.getAs[Long]("duration_ms") == 30L, ogg.toString)
  }

  test("mediaInventoryOf: a sniffed-media payload that fails its walk carries the reason") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_media2")
    // real ftyp magic so the sniff routes to the MP4 walk, but no moov
    val bare = Mp4Ops.mp4Synth(0L).take(20).toArray
    java.nio.file.Files.write(dir.resolve("seg.warc"),
      warcRecord("http://m.example/frag.mp4",
        http("video/mp4", bare)))
    val r = MediaOps.mediaInventoryOf(
      graft.sources.WarcSource.read(spark, dir.toString)).collect().head
    assert(r.getAs[String]("sniffed_mime") == "video/mp4")
    assert(r.getAs[String]("media_reason") == "no_moov", r.toString)
    assert(r.isNullAt(r.fieldIndex("width")))
  }
}
