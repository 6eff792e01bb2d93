package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import graft.sources.WarcSource

/** WARC ingestion: record walk, gzip members, malformed-tail tolerance,
  * HTTP response projection (SURVEY §2-C). */
class WarcSourceSpec extends SparkSpec {

  private def record(typ: String, uri: String, payload: Array[Byte],
                     id: String = "rec"): Array[Byte] = {
    val hdr = ("WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Record-ID: <urn:test:$id>\r\n" +
      "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
      (if (uri.nonEmpty) s"WARC-Target-URI: $uri\r\n" else "") +
      "Content-Type: application/http\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(US_ASCII)
    hdr ++ payload ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  private val httpPayload =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html>hello corpus</html>").getBytes(US_ASCII)

  private def warcBytes: Array[Byte] =
    record("warcinfo", "", "software: graft-test\r\n".getBytes(US_ASCII), "info") ++
      record("response", "http://example.com/a", httpPayload, "resp") ++
      record("request", "http://example.com/a",
        "GET /a HTTP/1.1\r\n".getBytes(US_ASCII), "req")

  test("parses plain and member-gzipped WARC files with per-file parallelism") {
    val dir = Files.createTempDirectory("graft_warc")
    Files.write(dir.resolve("seg-0.warc"), warcBytes)
    // the Common Crawl layout: one gzip MEMBER per record, concatenated
    val gz = new ByteArrayOutputStream()
    Seq(
      record("warcinfo", "", "software: graft-test\r\n".getBytes(US_ASCII), "info"),
      record("response", "http://example.com/b", httpPayload, "resp2"),
      record("request", "http://example.com/b",
        "GET /b HTTP/1.1\r\n".getBytes(US_ASCII), "req2")
    ).foreach { r =>
      val g = new GZIPOutputStream(gz); g.write(r); g.finish()
    }
    Files.write(dir.resolve("seg-1.warc.gz"), gz.toByteArray)

    val df = WarcSource.read(spark, dir.toString)
    val rows = df.collect()
    assert(rows.length == 6, s"expected 6 records, got ${rows.length}")
    assert(df.rdd.getNumPartitions >= 2, "per-file parallelism")
    val byType = rows.groupBy(_.getAs[String]("warc_type"))
    assert(byType("response").length == 2 && byType("request").length == 2)
    val resp = byType("response").map(_.getAs[String]("target_uri")).toSet
    assert(resp == Set("http://example.com/a", "http://example.com/b"))
    assert(rows.forall(r =>
      r.getAs[Long]("content_length") == r.getAs[Array[Byte]]("payload").length))
  }

  test("cdxIndex records exact offsets; readAt re-reads exactly the indexed record") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_warc_cdx")
    val plain = dir.resolve("seg-0.warc")
    Files.write(plain, warcBytes)
    // gz twin: one gzip member per record (the CC layout)
    val gz = new ByteArrayOutputStream()
    Seq(record("warcinfo", "", "software: graft-test\r\n".getBytes(US_ASCII), "info"),
      record("response", "http://example.com/a", httpPayload, "resp"),
      record("request", "http://example.com/a",
        "GET /a HTTP/1.1\r\n".getBytes(US_ASCII), "req")).foreach { r =>
      val o = new GZIPOutputStream(gz); o.write(r); o.finish()
    }
    val gzPath = dir.resolve("seg-1.warc.gz")
    Files.write(gzPath, gz.toByteArray)

    val records = WarcSource.read(spark, dir.toString)
    // offsets in a PLAIN file are true byte offsets: recompute from the
    // fixture construction (records are back-to-back; length excludes
    // the CRLFCRLF padding, the next offset includes it)
    val r0 = record("warcinfo", "", "software: graft-test\r\n".getBytes(US_ASCII), "info")
    val r1 = record("response", "http://example.com/a", httpPayload, "resp")
    val plainRows = records.filter(col("file").contains("seg-0"))
      .orderBy("offset").collect()
    assert(plainRows.map(_.getAs[Long]("offset")).toSeq ==
      Seq(0L, r0.length.toLong, (r0.length + r1.length).toLong))
    plainRows.foreach { r =>
      assert(r.getAs[Long]("length") > 0)
      // length = record bytes minus the 4-byte inter-record padding
      val expectLen = record(r.getAs[String]("warc_type"),
        r.getAs[String]("target_uri"), r.getAs[Array[Byte]]("payload"),
        "x").length - 4 +
        (r.getAs[String]("record_id").length - "<urn:test:x>".length)
      assert(r.getAs[Long]("length") == expectLen.toLong, r.toString)
    }
    // the index carries no payload and keys on the canonical URL
    val idx = WarcSource.cdxIndex(records).collect()
    assert(!WarcSource.cdxIndex(records).columns.contains("payload"))
    assert(idx.forall(_.getAs[String]("canon_url") != ""))
    // readAt(file, offset) must return EXACTLY the indexed record, on
    // the plain file (buffered skip) and through the gzip route alike
    records.collect().foreach { r =>
      val got = WarcSource.readAt(spark, r.getAs[String]("file"),
        r.getAs[Long]("offset"))
      assert(got.nonEmpty, s"no record at ${r.getAs[Long]("offset")}")
      assert(got.get.record_id == r.getAs[String]("record_id"))
      assert(got.get.target_uri == r.getAs[String]("target_uri"))
      assert(got.get.payload.toSeq == r.getAs[Array[Byte]]("payload").toSeq,
        "payload bytes round-trip")
      assert(got.get.length == r.getAs[Long]("length"))
    }
  }

  test("WARC bodies flow into the text estate: langId + exact dedup end-to-end") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_warc3")
    def resp(uri: String, body: String, id: String): Array[Byte] = {
      val payload = ("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body)
        .getBytes(US_ASCII)
      record("response", uri, payload, id)
    }
    val dup = "the a the a common crawl body repeated verbatim"
    Files.write(dir.resolve("seg.warc"),
      resp("http://x/1", dup, "r1") ++
        resp("http://x/2", dup, "r2") ++ // exact duplicate page
        resp("http://x/3", "table part window batch table part", "r3"))
    // WARC → (uri, body) → the documents shape the whole estate consumes
    val docs = graft.sources.WarcSource.httpResponses(
        graft.sources.WarcSource.read(spark, dir.toString))
      .select(monotonically_increasing_id().as("doc_id"),
        col("body").as("text"), col("target_uri"))
    val lang = graft.operators.TextOps.langId(docs).collect()
    assert(lang.length == 3)
    val deduped = graft.operators.DedupOps.dedupExact(docs).collect()
    assert(deduped.length == 2, "the two identical pages must collapse")
    assert(deduped.map(_.getAs[Long]("n_copies")).sorted.toSeq == Seq(1L, 2L))
  }

  test("record walk is streaming: first record consumes a sliver of the stream") {
    // 200 records of 32 KiB each; an InputStream that counts consumed bytes.
    // If parseFile materialized the decompressed whole (the round-9 weak),
    // pulling record 1 would consume ~all bytes; a streaming walk consumes
    // about one record + read-ahead buffer.
    val payload = Array.fill[Byte](32 << 10)('x'.toByte)
    val all = (0 until 200).map(i =>
      record("response", s"http://x/$i", payload, s"r$i")).reduce(_ ++ _)
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(all)
      override def read(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
    }
    val it = WarcSource.parseStream("mem", counting)
    val first = it.next()
    assert(first.target_uri == "http://x/0")
    // one 32 KiB record + the 64 KiB BufferedInputStream read-ahead, far
    // under the 6.5 MB total
    assert(consumed < (256 << 10),
      s"streaming walk must not slurp the stream: consumed $consumed of ${all.length}")
    assert(it.size == 199, "rest of the stream still parses")
  }

  test("path route is streaming: open → sniff → parse consumes a sliver of the FILE") {
    // the exact composition a read() task runs: FileSystem open, gzip
    // sniff, streaming walk. A whole-file materialization (binaryFile's
    // row, the pre-round-12 shape) would consume ~all 6.5 MB on disk
    // before the first record; the path route must not.
    val payload = Array.fill[Byte](32 << 10)('x'.toByte)
    val all = (0 until 200).map(i =>
      record("response", s"http://x/$i", payload, s"r$i")).reduce(_ ++ _)
    val f = Files.createTempDirectory("graft_warc_path").resolve("big.warc")
    Files.write(f, all)
    var consumed = 0L
    val counting = new java.io.InputStream {
      private val in = new java.io.FileInputStream(f.toFile)
      override def read(): Int = { val b = in.read(); if (b >= 0) consumed += 1; b }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val n = in.read(b, off, len); if (n > 0) consumed += n; n
      }
      override def close(): Unit = in.close()
    }
    val it = WarcSource.parseStream("file", WarcSource.sniffGzip(counting))
    assert(it.next().target_uri == "http://x/0")
    assert(consumed < (256 << 10),
      s"path route must stream, not slurp: consumed $consumed of ${all.length}")
    assert(it.size == 199, "rest of the file still parses")
  }

  test("read() lists paths only, streams off the filesystem, keeps the gz shape") {
    // functional regression for the path-streaming read(): same dir layout
    // as the first test but asserting plan-level independence from
    // binaryFile (no 2 GiB content row anywhere: the scan's input is the
    // driver-listed path strings)
    val dir = Files.createTempDirectory("graft_warc_pathroute")
    Files.write(dir.resolve("seg-0.warc"), warcBytes)
    Files.write(dir.resolve("_SUCCESS"), Array.emptyByteArray) // must be skipped
    Files.write(dir.resolve(".hidden.warc"), warcBytes) // must be skipped
    val df = WarcSource.read(spark, dir.toString)
    assert(df.collect().length == 3, "marker + hidden files skipped")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("binaryFile") && !plan.contains("BinaryFile"), plan)
  }

  test("large multi-member gzip streams record-by-record with exact payload sum") {
    // 1000 gzip members × 64 KiB decompressed (~64 MB total decompressed,
    // tiny compressed) — the CC shape. The fold touches one record at a
    // time; sum and count prove every member inflated intact.
    val payload = Array.fill[Byte](64 << 10)('z'.toByte)
    val gz = new ByteArrayOutputStream()
    (0 until 1000).foreach { i =>
      val g = new GZIPOutputStream(gz)
      g.write(record("response", s"http://big/$i", payload, s"b$i")); g.finish()
    }
    val raw = gz.toByteArray
    val it = WarcSource.parseFile("mem.warc.gz", raw)
    var n = 0; var bytes = 0L
    it.foreach { r => n += 1; bytes += r.payload.length }
    assert(n == 1000)
    assert(bytes == 1000L * (64 << 10), s"payload bytes: $bytes")
  }

  test("torn gzip member mid-stream keeps prior records, never throws") {
    def member(r: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(o); g.write(r); g.finish()
      o.toByteArray
    }
    val good1 = member(record("response", "http://x/ok1", httpPayload, "ok1"))
    val good2 = member(record("response", "http://x/ok2", httpPayload, "ok2"))
    val torn = member(record("response", "http://x/torn", httpPayload, "torn"))
      .dropRight(12) // rip the member's tail: CRC + length trailer gone
    val recs = WarcSource.parseFile("mem.warc.gz", good1 ++ good2 ++ torn).toVector
    assert(recs.map(_.target_uri) == Vector("http://x/ok1", "http://x/ok2"))
  }

  test("WarcSink round-trips: WET conversion records read back by WarcSource") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_wet").resolve("out").toString
    val docs = Seq(
      ("http://a.net/1", "plain ascii text", "2026-08-14T00:00:00Z"),
      ("http://a.net/2", "café naïve — utf-8 survives", "2026-08-14T01:00:00Z"),
      ("http://b.org/3", "", "2026-08-14T02:00:00Z")) // empty text legal
      .toDF("url", "text", "fetch_date").repartition(2)
    graft.sources.WarcSink.writeWet(docs, dir)
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .toArray.map(_.toString)
    assert(files.count(_.endsWith(".warc.gz")) >= 1, files.toSeq)
    assert(!files.exists(_.contains("inprogress")), "no half-written segments")
    val back = WarcSource.read(spark, dir).collect()
    assert(back.length == 3)
    assert(back.forall(_.getAs[String]("warc_type") == "conversion"))
    val byUri = back.map(r => r.getAs[String]("target_uri") ->
      new String(r.getAs[Array[Byte]]("payload"), "UTF-8")).toMap
    assert(byUri == Map(
      "http://a.net/1" -> "plain ascii text",
      "http://a.net/2" -> "café naïve — utf-8 survives",
      "http://b.org/3" -> ""))
    assert(back.forall(r => r.getAs[Long]("content_length") ==
      r.getAs[Array[Byte]]("payload").length))
    assert(back.map(_.getAs[String]("record_id")).distinct.length == 3,
      "deterministic per-url record ids")
    // determinism: a re-run overwrites with byte-identical segments
    val before = files.filter(_.endsWith(".warc.gz")).sorted
      .map(f => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)).toSeq)
    graft.sources.WarcSink.writeWet(docs, dir)
    val after = files.filter(_.endsWith(".warc.gz")).sorted
      .map(f => java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)).toSeq)
    assert(before.toSeq == after.toSeq, "re-run must write byte-identical members")
  }

  test("the full loop: WARC in → warcToDocuments → WET out → WARC in again") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_loop")
    Files.write(dir.resolve("seg.warc"),
      record("response", "http://en.site/x",
        ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
          "<html><p>the loop page body</p></html>").getBytes(US_ASCII), "x"))
    val (clean, _) = graft.operators.HtmlOps.warcToDocuments(
      WarcSource.read(spark, dir.toString))
    val wetDir = dir.resolve("wet").toString
    graft.sources.WarcSink.writeWet(clean, wetDir)
    val again = WarcSource.read(spark, wetDir).collect()
    assert(again.length == 1)
    assert(again.head.getAs[String]("warc_type") == "conversion")
    assert(new String(again.head.getAs[Array[Byte]]("payload"), "UTF-8") ==
      "the loop page body")
    assert(again.head.getAs[String]("target_uri") == "http://en.site/x")
  }

  test("httpResponses splits status and body; malformed tail drops cleanly") {
    val dir = Files.createTempDirectory("graft_warc2")
    // valid records followed by a record whose declared length overruns
    // the buffer (truncated upload) — prior records must survive
    val truncated = record("response", "http://x/y", httpPayload, "trunc")
      .dropRight(40)
    Files.write(dir.resolve("seg.warc"), warcBytes ++ truncated)

    val recs = WarcSource.read(spark, dir.toString)
    assert(recs.count() == 3, "valid prefix kept, malformed tail dropped")
    val http = WarcSource.httpResponses(recs).collect()
    assert(http.length == 1)
    assert(http.head.getAs[Int]("http_status") == 200)
    assert(http.head.getAs[String]("body") == "<html>hello corpus</html>")
    assert(http.head.getAs[String]("target_uri") == "http://example.com/a")
  }

  test("httpResponses: an invalid-UTF-8 body yields NULL, never a job crash") {
    val dir = Files.createTempDirectory("graft_warc_utf8")
    // 0xC3 0x28 is an invalid UTF-8 sequence — Spark 4's strict decode
    // would throw MALFORMED_CHARACTER_CODING and kill the job; the
    // is_valid_utf8 gate must route it to a null body instead
    val badBody = Array[Byte](0xc3.toByte, 0x28, 'x', 'y')
    val bad = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n")
      .getBytes(US_ASCII) ++ badBody
    Files.write(dir.resolve("seg.warc"),
      record("response", "http://example.com/good", httpPayload, "g") ++
        record("response", "http://example.com/bad", bad, "b"))
    val http = WarcSource.httpResponses(WarcSource.read(spark, dir.toString))
      .collect().map(r => r.getAs[String]("target_uri") ->
        Option(r.getAs[String]("body"))).toMap
    assert(http("http://example.com/good").contains("<html>hello corpus</html>"))
    assert(http("http://example.com/bad").isEmpty,
      "invalid bytes must become a null body, not a decode error")
  }
}
