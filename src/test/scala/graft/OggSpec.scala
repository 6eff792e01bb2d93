package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.operators.OggOps

/** Ogg container metadata (SURVEY §2 `q_ogg_meta`): both codec ID
  * headers, the granule duration arithmetic, and quarantine routing. */
class OggSpec extends SparkSpec {

  test("oggWalk: both synth codecs round-trip the construction truth") {
    val opus = OggOps.oggWalk(OggOps.oggSynth(4L)) // k = 5
    assert(opus == Right(OggOps.OggInfo("opus", 2, 48000, 50L)), opus)
    val vorbis = OggOps.oggWalk(OggOps.oggSynth(7L)) // k = 8
    assert(vorbis == Right(OggOps.OggInfo("vorbis", 2, 44100, 800L)), vorbis)
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
