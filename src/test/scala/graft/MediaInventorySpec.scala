package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.{MediaOps, Mp3Ops, Mp4Ops, MultimodalOps, WebpOps}

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
    assert(song.getAs[Long]("duration_ms") == 36L * 7)
    assert(song.getAs[String]("media_format") == "mpeg1-l3-64k")
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

  test("image geometry from headers alone: png/gif/bmp/jpeg measured in the inventory") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def jdk(fmt: String, w: Int, h: Int,
            kind: Int = BufferedImage.TYPE_INT_RGB): Array[Byte] = {
      val img = new BufferedImage(w, h, kind)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
      out.toByteArray
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_imgeo")
    val recs =
      warcRecord("http://i.example/a.png", http("image/png", jdk("png", 33, 21))) ++
      warcRecord("http://i.example/b.gif",
        http("image/gif", jdk("gif", 17, 9, BufferedImage.TYPE_BYTE_INDEXED))) ++
      warcRecord("http://i.example/c.bmp", http("image/bmp", jdk("bmp", 24, 11))) ++
      warcRecord("http://i.example/d.jpg", http("image/jpeg", jdk("jpg", 40, 25))) ++
      // a torn JPEG: SOI+APP0 only, no SOF — named, not measured
      warcRecord("http://i.example/torn.jpg",
        http("image/jpeg", jdk("jpg", 8, 8).take(18).toArray))
    java.nio.file.Files.write(dir.resolve("seg.warc"), recs)
    val got = MediaOps.mediaInventoryOf(
      graft.sources.WarcSource.read(spark, dir.toString))
      .collect().map(r => r.getString(0) -> r).toMap
    def geo(u: String): (Int, Int, String) = {
      val r = got(u)
      (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("media_format"))
    }
    assert(geo("http://i.example/a.png") == ((33, 21, "png")))
    assert(geo("http://i.example/b.gif") == ((17, 9, "gif89a")))
    assert(geo("http://i.example/c.bmp") == ((24, 11, "bmp")))
    assert(geo("http://i.example/d.jpg") == ((40, 25, "jpeg-baseline")))
    val torn = got("http://i.example/torn.jpg")
    assert(torn.getAs[String]("sniffed_mime") == "image/jpeg")
    assert(torn.isNullAt(torn.fieldIndex("width")))
    assert(torn.getAs[String]("media_reason") != null, torn.toString)
  }

  test("header geometry ≡ full-decode geometry on every payload the decoders accept") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    import graft.operators.{ImageHeaders, MultimodalOps}
    def jdk(fmt: String, w: Int, h: Int, kind: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, kind)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { img.setRGB(x, y, (x * 7 + y * 13) & 0xffffff); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, out), s"JDK must encode $fmt")
      out.toByteArray
    }
    class Counter extends MultimodalOps.PixelSink {
      override def start(w: Int, h: Int): Unit = ()
      override def px(r: Int, g: Int, b: Int): Unit = ()
    }
    val cases: Seq[(String, Array[Byte], Option[(Int, Int)])] = Seq(
      "png" -> jdk("png", 19, 27, BufferedImage.TYPE_INT_RGB),
      "bmp" -> jdk("bmp", 31, 13, BufferedImage.TYPE_INT_RGB),
      "gif" -> jdk("gif", 23, 15, BufferedImage.TYPE_BYTE_INDEXED),
      "jpg" -> jdk("jpg", 44, 18, BufferedImage.TYPE_INT_RGB)
    ).map { case (fmt, bytes) =>
      val full = fmt match {
        case "png" => MultimodalOps.pngWalk(bytes, new Counter)
        case "bmp" => MultimodalOps.bmpWalk(bytes, new Counter)
        case "gif" => graft.operators.GifDecode.walk(bytes, new Counter)
        case "jpg" => graft.operators.JpegDecode.walk(bytes, new Counter)
      }
      (fmt, bytes, full)
    }
    cases.foreach { case (fmt, bytes, full) =>
      assert(full.nonEmpty, s"$fmt: full decoder must accept the JDK fixture")
      val probe = ImageHeaders.probe(bytes)
      assert(probe.isRight, s"$fmt: $probe")
      val Right((w, h, _)) = probe: @unchecked
      assert((w, h) == full.get, s"$fmt: header $probe vs decode ${full.get}")
    }
    // junk never throws, names the reason
    assert(ImageHeaders.probe("not an image at all".getBytes("US-ASCII")) ==
      Left("not_image"))
    assert(ImageHeaders.probe(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 0, 0, 0, 9)) == Left("bad_image_header"))
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
