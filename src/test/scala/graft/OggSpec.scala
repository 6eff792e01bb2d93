package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.OggOps

/** Ogg container metadata (SURVEY §2 `q_ogg_meta`): both codec ID
  * headers, the granule duration arithmetic, and quarantine routing. */
class OggSpec extends SparkSpec {

  test("oggWalk: both synth codecs round-trip the construction truth") {
    val opus = OggOps.oggWalk(OggOps.oggSynth(4L)) // k = 5
    assert(opus == Right(OggOps.OggInfo("opus", 2, 48000, 50L,
      "title 4", "artist 4", "")), opus)
    val vorbis = OggOps.oggWalk(OggOps.oggSynth(7L)) // k = 8
    assert(vorbis == Right(OggOps.OggInfo("vorbis", 2, 44100, 800L,
      "title 7", "artist 7", "")), vorbis)
  }

  test("oggWalk: VorbisComment fields parse on both codecs; torn lists never throw") {
    def le32(v: Long): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    // an ALBUM comment plus an unknown key: both parse, unknown ignored
    val full = OggOps.oggSynth(2L)
    assert(OggOps.oggWalk(full).exists(m =>
      m.title == "title 2" && m.artist == "artist 2" && m.album == ""))
    // a comment header whose list is torn mid-entry: fields read so far
    // survive, nothing throws (walk contract); every prefix is safe
    (0 until full.length).foreach(n => OggOps.oggWalk(full.take(n)))
    // a hand-built OpusTags page with ALBUM and a lying length
    val vendor = "v".getBytes(ISO_8859_1)
    val c1 = "ALBUM=The Album".getBytes(ISO_8859_1)
    val tags = "OpusTags".getBytes(ISO_8859_1) ++
      le32(vendor.length.toLong) ++ vendor ++ le32(2L) ++
      le32(c1.length.toLong) ++ c1 ++
      le32(999999L) // second entry lies about its length: stop cleanly
    // splice: reuse the synth id page, replace its comment page
    val idPage = OggOps.oggSynth(0L) // opus
    val walk = OggOps.oggWalk(idPage)
    assert(walk.exists(_.title == "title 0"), walk)
    val spliced = {
      // rebuild: id page only (strip at second OggS), then custom tags page
      val bytes = idPage
      var second = -1
      var i = 4
      while (second < 0 && i + 4 <= bytes.length) {
        if (bytes(i) == 'O' && bytes(i + 1) == 'g' && bytes(i + 2) == 'g' &&
          bytes(i + 3) == 'S') second = i
        else i += 1
      }
      bytes.take(second) ++
        ("OggS".getBytes(ISO_8859_1) ++ Array[Byte](0, 0) ++
          new Array[Byte](8) ++ le32(7) ++ le32(1) ++ le32(0) ++
          Array(1.toByte, tags.length.toByte) ++ tags)
    }
    val got = OggOps.oggWalk(spliced)
    assert(got.exists(m => m.album == "The Album" && m.title == ""), got)
  }

  test("oggWalk: quarantine reasons; torn tails keep the last intact page") {
    assert(OggOps.oggWalk("not an ogg".getBytes(ISO_8859_1)) ==
      Left("not_ogg"))
    assert(OggOps.oggWalk(Array.empty[Byte]) == Left("not_ogg"))
    // an OggS page whose payload is neither OpusHead nor Vorbis
    val garbagePage = "OggS".getBytes(ISO_8859_1) ++
      Array[Byte](0, 2) ++ new Array[Byte](8) ++ new Array[Byte](12) ++
      Array[Byte](1, 4) ++ "junk".getBytes(ISO_8859_1)
    assert(OggOps.oggWalk(garbagePage) == Left("bad_codec"))
    // a torn final page: duration reads from the last INTACT page (the
    // BOS page carries granule 0 → duration 0, never a throw)
    val full = OggOps.oggSynth(4L)
    val torn = full.take(full.length - 2).toArray
    val got = OggOps.oggWalk(torn)
    assert(got.exists(m => m.codec == "opus" && m.durationMs == 0L), got)
    // every torn prefix returns, never throws
    (0 until full.length).foreach(n => OggOps.oggWalk(full.take(n)))
    // and the sniffer names the bytes
    assert(graft.plans.MagicMime.sniff(full) == "application/ogg")
  }

  test("oggMetaOf routes every payload to exactly one of clean/quarantine") {
    import spark.implicits._
    val rows = Seq(
      ("u1", OggOps.oggSynth(1L)),
      ("u2", "RIFFxxxxWAVE".getBytes(ISO_8859_1)))
      .toDF("url", "payload")
    val (clean, quarantine) = OggOps.oggMetaOf(rows)
    val c = clean.collect()
    assert(c.length == 1 && c.head.getString(0) == "u1")
    assert(c.head.getAs[String]("codec") == "vorbis")
    assert(c.head.getAs[Long]("duration_ms") == 200L)
    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1)))
    assert(q.toSeq == Seq(("u2", "not_ogg")), q.toSeq)
  }
}
