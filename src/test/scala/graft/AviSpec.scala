package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1

import javax.imageio.ImageIO

import graft.operators.{AviOps, MultimodalOps}

/** AVI (RIFF) container parse + MJPEG frame hashing (SURVEY §2-C, the
  * round-14 video slot). Second-implementation discipline: containers
  * are hand-built byte-by-byte around ImageIO-encoded JPEG frames — the
  * parse must round-trip the built truth, and a frame must hash
  * identically standalone and in-container. */
class AviSpec extends SparkSpec {

  // --- RIFF builders (the spec-side second implementation) ---

  private def le32(n: Long): Array[Byte] = Array(
    (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
    ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = if (data.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    id.getBytes(ISO_8859_1) ++ le32(data.length) ++ data ++ pad
  }

  private def list(typ: String, parts: Array[Byte]*): Array[Byte] =
    chunk("LIST", typ.getBytes(ISO_8859_1) ++ parts.flatten.toArray)

  private def avih(w: Int, h: Int, usPerFrame: Long, n: Int): Array[Byte] = {
    val d = new Array[Byte](56)
    def put(off: Int, v: Long): Unit = System.arraycopy(le32(v), 0, d, off, 4)
    put(0, usPerFrame); put(16, n); put(32, w); put(36, h)
    chunk("avih", d)
  }

  private def strh(handler: String): Array[Byte] = {
    val d = new Array[Byte](56)
    System.arraycopy("vids".getBytes(ISO_8859_1), 0, d, 0, 4)
    System.arraycopy(handler.getBytes(ISO_8859_1), 0, d, 4, 4)
    chunk("strh", d)
  }

  private def avi(frames: Seq[Array[Byte]], w: Int, h: Int,
                  usPerFrame: Long = 40000L,
                  movi: Seq[Array[Byte]] => Array[Byte] = null): Array[Byte] = {
    val hdrl = list("hdrl", avih(w, h, usPerFrame, frames.length),
      list("strl", strh("MJPG"), chunk("strf", new Array[Byte](40))))
    val moviList =
      if (movi != null) movi(frames)
      else list("movi", frames.map(chunk("00dc", _)): _*)
    val body = "AVI ".getBytes(ISO_8859_1) ++ hdrl ++ moviList ++
      chunk("idx1", new Array[Byte](16)) // present and deliberately ignored
    "RIFF".getBytes(ISO_8859_1) ++ le32(body.length) ++ body
  }

  /** A 96×80 block-gradient image derived from `seed` — block value gaps
    * of ±80 levels survive JPEG quantization, so distinct seeds give
    * distinct stable dHashes. */
  private def blockImage(seed: Int): BufferedImage = {
    val img = new BufferedImage(96, 80, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 80; x <- 0 until 96) {
      val bx = x / 12 // 8 block columns
      val v = if (((seed >> (bx % 8)) & 1) == 1) 60 + (bx % 2) * 80
      else 180 - (bx % 2) * 80
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def jpeg(seed: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(blockImage(seed), "jpg", out), "JDK must encode")
    out.toByteArray
  }

  test("aviWalk round-trips the hand-built container byte-exactly") {
    // an ODD-size frame exercises RIFF word padding
    val f0 = Array.tabulate[Byte](101)(i => (i * 7).toByte)
    val f1 = Array.tabulate[Byte](64)(i => (i * 13).toByte)
    val f2 = Array.tabulate[Byte](33)(i => (i * 31).toByte)
    // frames split between a bare movi entry and a nested 'rec ' LIST;
    // a junk chunk inside movi must be skipped, not treated as a frame
    val bytes = avi(Seq(f0, f1, f2), w = 96, h = 80, usPerFrame = 33367L,
      movi = fs => list("movi", chunk("00dc", fs(0)),
        list("rec ", chunk("00db", fs(1)), chunk("00dc", fs(2))),
        chunk("JUNK", new Array[Byte](6))))
    val info = AviOps.aviWalk(bytes).get
    assert(info.width == 96 && info.height == 80)
    assert(info.usPerFrame == 33367L && info.declaredFrames == 3L)
    assert(info.handler == "MJPG")
    assert(info.frames.map(_.toSeq) == Vector(f0.toSeq, f1.toSeq, f2.toSeq))
  }

  test("aviWalk rejects junk, truncation, and non-AVI RIFF") {
    assert(AviOps.aviWalk("not a riff at all".getBytes(ISO_8859_1)).isEmpty)
    assert(AviOps.aviWalk(Array.emptyByteArray).isEmpty)
    val wave = "RIFF".getBytes(ISO_8859_1) ++ le32(4) ++
      "WAVE".getBytes(ISO_8859_1)
    assert(AviOps.aviWalk(wave).isEmpty, "a WAV is not a video")
    val good = avi(Seq(Array[Byte](1, 2, 3, 4)), 8, 8)
    assert(AviOps.aviWalk(good).nonEmpty)
    // a chunk whose declared size runs past the end = torn framing
    assert(AviOps.aviWalk(good.dropRight(5)).isEmpty, "truncated mid-chunk")
  }

  test("videoFrames samples every Nth frame with container geometry") {
    import spark.implicits._
    val frames = (0 until 5).map(i => Array.fill[Byte](16)(i.toByte))
    val docs = Seq(
      (1L, avi(frames, 32, 24, usPerFrame = 40000L)),
      (2L, "not a video".getBytes(ISO_8859_1))) // drops out
      .toDF("doc_id", "payload")
    val got = AviOps.videoFrames(docs, everyNth = 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).head,
        r.getInt(3), r.getInt(4), r.getLong(5))).sortBy(_._2)
    assert(got.toSeq == Seq(
      (1L, 0, 0.toByte, 32, 24, 40000L),
      (1L, 2, 2.toByte, 32, 24, 40000L),
      (1L, 4, 4.toByte, 32, 24, 40000L)), got.toSeq)
  }

  test("uncompressed-DIB frames hash like their standalone BMP (00db route)") {
    import spark.implicits._
    // a 24-bpp bottom-up BMP built by hand; its DIB = everything after
    // the 14-byte file header — exactly what a '00db' AVI frame carries
    val w = 18; val h = 16
    val rowBytes = (w * 3 + 3) / 4 * 4
    val dib = new Array[Byte](40 + rowBytes * h)
    def le32(off: Int, v: Long): Unit = for (k <- 0 until 4)
      dib(off + k) = ((v >> (8 * k)) & 0xff).toByte
    le32(0, 40); le32(4, w); le32(8, h)
    dib(12) = 1; dib(14) = 24 // planes, bpp (compression stays 0)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (40 + 12 * (x / 3) + 7 * (y / 4)).toByte // a gradient
      val off = 40 + y * rowBytes + x * 3
      dib(off) = v; dib(off + 1) = v; dib(off + 2) = v
    }
    val bmp = {
      val out = new Array[Byte](14 + dib.length)
      out(0) = 'B'; out(1) = 'M'
      for (k <- 0 until 4) {
        out(2 + k) = ((out.length >> (8 * k)) & 0xff).toByte
        out(10 + k) = ((54 >> (8 * k)) & 0xff).toByte
      }
      System.arraycopy(dib, 0, out, 14, dib.length)
      out
    }
    val want = MultimodalOps.dhashOf(bmp).get
    val docs = Seq((7L, avi(Seq(dib), w, h,
      movi = fs => list("movi", chunk("00db", fs(0))))))
      .toDF("doc_id", "payload")
    val got = AviOps.videoDhashes(docs, everyNth = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq((7L, 0, want)), got.toSeq)
  }

  test("MJPEG frames hash identically in-container; shared-frame videos cluster") {
    import spark.implicits._
    val j1 = jpeg(0x35); val j2 = jpeg(0x4a); val j3 = jpeg(0x59)
    val j4 = jpeg(0x66)
    // standalone hashes through the existing image route (the second
    // implementation: same bytes, container must not change the hash)
    val standalone = Seq(j1, j2, j3, j4).map(b => MultimodalOps.dhashOf(b).get)
    assert(standalone.distinct.length == 4, "fixture seeds must separate")
    val docs = Seq(
      (10L, avi(Seq(j1, j2), 96, 80)), // shares j2 with 20L
      (20L, avi(Seq(j2, j3), 96, 80)),
      (30L, avi(Seq(j4), 96, 80))) // distinct — stays a singleton
      .toDF("doc_id", "payload")
    val hashes = AviOps.videoDhashes(docs, everyNth = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(hashes == Map(
      (10L, 0) -> standalone(0), (10L, 1) -> standalone(1),
      (20L, 0) -> standalone(1), (20L, 1) -> standalone(2),
      (30L, 0) -> standalone(3)), hashes)
    val clusters = AviOps.videoDedupRepresentative(docs, everyNth = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.toSeq == Seq(
      (10L, 2L, Seq(standalone(0), standalone(1), standalone(2)).min),
      (30L, 1L, standalone(3))), clusters.toSeq)
  }

  test("videoDhashIncremental + videoDedupStream probe the persisted frame index") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val j1 = jpeg(0x35); val j2 = jpeg(0x4a); val j3 = jpeg(0x59)
    val j4 = jpeg(0x66)
    // the persisted corpus frame-hash index: video 1 (j1, j2), video 2 (j3)
    val corpusDocs = Seq(
      (1L, avi(Seq(j1, j2), 96, 80)),
      (2L, avi(Seq(j3), 96, 80))).toDF("doc_id", "payload")
    val corpusIdx = AviOps.videoDhashes(corpusDocs, everyNth = 1)
      .select("doc_id", "dhash").distinct()
    // delta: video 10 shares j2 with corpus video 1; video 11 is new
    val delta = Seq(
      (10L, AviOps.buildAvi(Seq(j2, j4), 96, 80)),
      (11L, AviOps.buildAvi(Seq(j4), 96, 80))).toDF("doc_id", "payload")
    val inc = AviOps.videoDhashIncremental(delta, corpusIdx, everyNth = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong))
    assert(inc.toSeq == Seq((10L, 1L, 0L)),
      s"one evidence row per (delta, corpus) pair at min hamming: ${inc.toSeq}")
    // corpus×corpus never forms: no (1, 2) row can exist by construction
    // stream face: the same probe per trigger against the thunk
    val results = new scala.collection.concurrent.TrieMap[Long, Seq[(Long, Long)]]
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Byte])]
    val q = AviOps.videoDedupStream(
      input.toDF().toDF("doc_id", "payload"),
      () => corpusIdx, everyNth = 1) { (df, id) =>
      results.put(id, df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    }
    try {
      input.addData((20L, AviOps.buildAvi(Seq(j1), 96, 80)))
      q.processAllAvailable()
      assert(results(0L) == Seq((20L, 1L)), results.toMap.toString)
      input.addData((21L, AviOps.buildAvi(Seq(j4), 96, 80)))
      q.processAllAvailable()
      assert(results(1L).isEmpty, "an unseen video hits nothing")
    } finally q.stop()
  }

  test("frame-frequency guard: a ubiquitous junk frame never chains groups") {
    import spark.implicits._
    // 30 videos in 15 true pairs (i, i+15) sharing a planted distinctive
    // frame — plus the SAME boilerplate frame (an intro card / logo) in
    // EVERY video. Ungarded, the junk frame's pairs close transitively
    // into ONE cluster of 30; the df guard (df=30 > n/10=3 and > floor)
    // drops the junk hash from pairing while true-pair evidence
    // (df=2 ≤ floor) survives.
    val junk = MultimodalOps.plantedImage(99, 100) // hash 99·REP, high rep
    val docs = (0L until 30L).map { id =>
      (id, AviOps.buildAvi(
        Seq(MultimodalOps.plantedImage(id, 15), junk), 9, 8))
    }.toDF("doc_id", "payload")
    val rep = 0x0101010101010101L
    val got = AviOps.videoDedupRepresentative(docs, everyNth = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == (0L until 15L).map(i => (i, 2L, i * rep)),
      got.toSeq)
    // counter-factual: with the guard disabled (floor ≥ corpus) the junk
    // frame chains everything into one cluster — the guard is the only
    // thing standing between boilerplate footage and a monster component
    val unguarded = AviOps.videoDedupRepresentative(docs, everyNth = 1,
      frameDfFloor = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(unguarded.toSeq == Seq((0L, 30L)), unguarded.toSeq)
  }

  test("contaminationVideo flags eval-group members through the container walk") {
    import spark.implicits._
    // groups: 4 (eval, planted TWICE), 13 (eval), 2 (clean); 34 is a
    // brightness variant of group 4 — the frame decode must normalize it
    val docs = Seq(4L, 34L, 13L, 2L).toDF("doc_id")
    val got = graft.operators.AviOps.contaminationVideo(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val k = 72340172838076673L
    assert(got.toSeq == Seq((4L, 4 * k, 2L), (13L, 13 * k, 1L),
      (34L, 4 * k, 2L)), got.toSeq)
  }
}
