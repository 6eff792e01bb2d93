package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.Mp3Ops

/** MP3 metadata (SURVEY §2 `q_mp3_meta`): ID3v2.3/v2.4 frame grammars,
  * the MPEG frame-header parse, quarantine routing, and the WARC
  * adapter. */
class Mp3Spec extends SparkSpec {

  test("mp3Walk: both synth tag versions round-trip the construction truth") {
    val even = Mp3Ops.mp3Walk(Mp3Ops.mp3Synth(6L))
    assert(even == Right(Mp3Ops.Mp3Info(3, "title 6", "artist 6", "",
      128, 44100, 10L * 7)), even)
    val odd = Mp3Ops.mp3Walk(Mp3Ops.mp3Synth(7L))
    assert(odd == Right(Mp3Ops.Mp3Info(4, "title 7", "artist 7", "",
      128, 44100, 10L * 8)), odd)
  }

  test("mp3Walk: tagless frame-sync files parse; hostile shapes quarantine") {
    // a bare CBR stream with no ID3 tag: still an mp3, fields empty
    val bare = new Array[Byte](320)
    bare(0) = 0xff.toByte; bare(1) = 0xfb.toByte; bare(2) = 0x90.toByte
    val got = Mp3Ops.mp3Walk(bare)
    assert(got == Right(Mp3Ops.Mp3Info(-1, "", "", "", 128, 44100, 20L)), got)
    assert(Mp3Ops.mp3Walk("plain text file".getBytes(ISO_8859_1)) ==
      Left("not_mp3"))
    assert(Mp3Ops.mp3Walk(Array.empty[Byte]) == Left("not_mp3"))
    // a valid tag followed by no audio frame: no_frames
    val tagOnly = Mp3Ops.mp3Synth(6L).takeWhile(_ != 0xff.toByte)
    assert(Mp3Ops.mp3Walk(tagOnly.toArray) == Left("no_frames"))
    // a UTF-8 encoded title (encoding byte 3) decodes
    val payload = Array[Byte](3) ++ "café dot".getBytes("UTF-8")
    val frame = "TIT2".getBytes(ISO_8859_1) ++
      Array[Byte](0, 0, 0, payload.length.toByte, 0, 0) ++ payload
    val utf8Title = "ID3".getBytes(ISO_8859_1) ++
      Array[Byte](3, 0, 0) ++ Array[Byte](0, 0, 0, frame.length.toByte) ++
      frame ++
      { val a = new Array[Byte](160)
        a(0) = 0xff.toByte; a(1) = 0xfb.toByte; a(2) = 0x90.toByte; a }
    val u = Mp3Ops.mp3Walk(utf8Title)
    assert(u.exists(_.title == "café dot"), u)
    // torn prefixes never throw (walk contract)
    val full = Mp3Ops.mp3Synth(3L)
    (0 until full.length).foreach(n => Mp3Ops.mp3Walk(full.take(n)))
  }

  test("mp3Walk: the ID3v1 trailer fills fields v2 left empty, and bounds the estimate") {
    // a v1-only file: frame sync at 0, "TAG" trailer with padded fields
    val audio = new Array[Byte](1600 + 128)
    audio(0) = 0xff.toByte; audio(1) = 0xfb.toByte; audio(2) = 0x90.toByte
    val t = audio.length - 128
    System.arraycopy("TAG".getBytes(ISO_8859_1), 0, audio, t, 3)
    System.arraycopy("Legacy Song".getBytes(ISO_8859_1), 0, audio, t + 3, 11)
    System.arraycopy("Old Artist".getBytes(ISO_8859_1), 0, audio, t + 33, 10)
    val got = Mp3Ops.mp3Walk(audio)
    // the 128 trailer bytes are NOT audio: 1600 bytes at 128 kbps = 100 ms
    assert(got == Right(Mp3Ops.Mp3Info(1, "Legacy Song", "Old Artist", "",
      128, 44100, 100L)), got)
    // v2 wins where it speaks; v1 fills the rest (album here)
    val both = Mp3Ops.mp3Synth(6L) ++ {
      val tr = new Array[Byte](128)
      System.arraycopy("TAG".getBytes(ISO_8859_1), 0, tr, 0, 3)
      System.arraycopy("v1 title ignored".getBytes(ISO_8859_1), 0, tr, 3, 16)
      System.arraycopy("The Album".getBytes(ISO_8859_1), 0, tr, 63, 9)
      tr
    }
    val merged = Mp3Ops.mp3Walk(both)
    assert(merged.exists(m => m.tagVersion == 3 && m.title == "title 6" &&
      m.album == "The Album"), merged)
  }

  test("mp3Walk: a Xing VBR header's exact frame count beats the CBR estimate") {
    // stereo MPEG1 L3 frame: Xing lives at header + 4 + 32
    val audio = new Array[Byte](2000)
    audio(0) = 0xff.toByte; audio(1) = 0xfb.toByte; audio(2) = 0x90.toByte
    val xing = 4 + 32
    System.arraycopy("Xing".getBytes(ISO_8859_1), 0, audio, xing, 4)
    audio(xing + 7) = 1 // flags: frames present
    // 441 frames × 1152 samples at 44100 Hz = exactly 11520 ms
    audio(xing + 10) = 1; audio(xing + 11) = (441 - 256).toByte
    val got = Mp3Ops.mp3Walk(audio)
    assert(got.exists(_.durationMs == 11520L), got)
    // without the header the same bytes read the CBR estimate
    val cbr = audio.clone(); cbr(xing) = 0
    assert(Mp3Ops.mp3Walk(cbr).exists(_.durationMs == 2000L * 8000 / 128000),
      Mp3Ops.mp3Walk(cbr))
  }

  test("mp3MetaOf routes every payload to exactly one of clean/quarantine") {
    import spark.implicits._
    val rows = Seq(
      ("u1", Mp3Ops.mp3Synth(1L)),
      ("u2", "GIF89a junk".getBytes(ISO_8859_1)))
      .toDF("url", "payload")
    val (clean, quarantine) = Mp3Ops.mp3MetaOf(rows)
    val c = clean.collect()
    assert(c.length == 1 && c.head.getString(0) == "u1")
    assert(c.head.getAs[String]("title") == "title 1")
    assert(c.head.getAs[Int]("tag_version") == 4)
    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.toSeq == Seq(("u2", "not_mp3")), q.toSeq)
  }

  test("mp3MetaOfRecords: declaration OR content routes; the lying header sniffs in") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mp3")
    def warcRecord(uri: String, payload: Array[Byte]): Array[Byte] = {
      val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
      hdr ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
    }
    def http(ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n")
        .getBytes(ISO_8859_1) ++ body
    val recs =
      warcRecord("http://a.example/song.mp3",
        http("audio/mpeg", Mp3Ops.mp3Synth(2L))) ++
      warcRecord("http://a.example/lying.bin",
        http("application/octet-stream", Mp3Ops.mp3Synth(3L))) ++
      warcRecord("http://a.example/broken.mp3",
        http("audio/mpeg", "junk body".getBytes(ISO_8859_1))) ++
      warcRecord("http://a.example/page.html",
        http("text/html", "<html><body>nope</body></html>".getBytes(ISO_8859_1)))
    java.nio.file.Files.write(dir.resolve("seg.warc"), recs)
    val records = graft.sources.WarcSource.read(spark, dir.toString)
    val (clean, quarantine) = Mp3Ops.mp3MetaOfRecords(records)
    val c = clean.collect().map(r =>
      r.getString(0) -> r.getAs[String]("title")).toMap
    assert(c == Map("http://a.example/song.mp3" -> "title 2",
      "http://a.example/lying.bin" -> "title 3"), c.toString)
    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.toSeq == Seq(("http://a.example/broken.mp3", "not_mp3")), q.toSeq)
  }
}
