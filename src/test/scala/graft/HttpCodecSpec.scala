package graft

import java.nio.charset.StandardCharsets.US_ASCII

import org.apache.spark.sql.functions._

import graft.plans.{HttpCodec, HttpDechunk}

/** RFC 9112 chunked-body decode — the round-11 `http_dechunk` expression
  * (SURVEY §2-C, warcToDocuments' chunked path): framing happy paths,
  * every malformed-framing null route, and eval ≡ codegen parity. */
class HttpCodecSpec extends SparkSpec {

  private def b(s: String): Array[Byte] = s.getBytes(US_ASCII)
  private def dec(s: String): Array[Byte] = HttpCodec.dechunk(b(s))
  private def decS(s: String): String = new String(dec(s), US_ASCII)

  test("multi-chunk body concatenates in order, terminal chunk ends it") {
    assert(decS("5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n") == "hello world")
    assert(decS("1\r\nx\r\n0\r\n\r\n") == "x")
    // data after the terminal chunk (next response, junk) is ignored
    assert(decS("5\r\nhello\r\n0\r\n\r\ntrailing junk") == "hello")
  }

  test("chunk extensions and trailers are skipped, not decoded") {
    assert(decS("5;name=val;q=\"x\"\r\nhello\r\n0\r\n\r\n") == "hello")
    assert(decS("5\r\nhello\r\n0\r\nX-Checksum: abc\r\nX-More: v\r\n\r\n")
      == "hello")
  }

  test("bare-LF line endings tolerated (crawl-robustness contract)") {
    assert(decS("5\nhello\n6\n world\n0\n\n") == "hello world")
    // mixed CRLF/LF within one body
    assert(decS("5\r\nhello\n6\n world\r\n0\r\n\r\n") == "hello world")
  }

  test("leading zeros in the chunk size are legal (RFC 9112)") {
    assert(decS("000000005\r\nhello\r\n0\r\n\r\n") == "hello")
    // 10 digits, but only 2 significant — must NOT trip the 8-digit cap
    assert(decS("000000001f\r\n" + "a" * 0x1f + "\r\n0\r\n\r\n") == "a" * 0x1f)
  }

  test("malformed framing returns null: every route") {
    assert(dec("") == null) // empty body: no size line
    assert(dec("zz\r\nhi\r\n0\r\n\r\n") == null) // no hex digit first
    assert(dec("5") == null) // size line never terminated
    assert(dec("5\r\nhel") == null) // declared size past the end
    assert(dec("ff\r\nshort\r\n0\r\n\r\n") == null) // declared past end
    assert(dec("5\r\nhelloX0\r\n\r\n") == null) // missing data terminator
    assert(dec("5\r\nhello\r\n") == null) // stream ends before terminal chunk
    assert(dec("fffffffff\r\nx\r\n0\r\n\r\n") == null) // 9 significant digits > 4 GiB
    assert(dec("123456789\r\nx\r\n0\r\n\r\n") == null) // ditto, decimal-looking
  }

  test("binary chunk data survives byte-for-byte") {
    val payload = Array.tabulate[Byte](256)(_.toByte)
    val body = b("100\r\n") ++ payload ++ b("\r\n0\r\n\r\n")
    assert(java.util.Arrays.equals(HttpCodec.dechunk(body), payload))
  }

  test("eval and codegen paths agree on every fixture") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    graft.plans.GraftFunctions.register(spark)
    val cases = Seq(
      "5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n",
      "5;ext=1\r\nhello\r\n0\r\n\r\n",
      "5\nhello\n0\n\n",
      "000000005\r\nhello\r\n0\r\n\r\n",
      "", "zz", "5", "5\r\nhel", "ff\r\nshort\r\n",
      "5\r\nhelloX0\r\n\r\n", "fffffffff\r\nx\r\n0\r\n\r\n")
    // codegen route: whole-stage codegen through a projection
    val viaDf = cases.zipWithIndex.map { case (s, i) => (i, b(s)) }
      .toDF("i", "body")
      .select(col("i"), call_function("http_dechunk", col("body")).as("out"))
      .collect().map(r => r.getInt(0) -> Option(r.getAs[Array[Byte]]("out")))
      .toMap
    cases.zipWithIndex.foreach { case (s, i) =>
      val direct = Option(HttpCodec.dechunk(b(s)))
      // interpreted Expression eval
      val interp = Option(HttpDechunk(Literal(b(s), BinaryType)).eval(null))
        .map(_.asInstanceOf[Array[Byte]])
      assert(direct.map(_.toSeq) == interp.map(_.toSeq), s"interp: <$s>")
      assert(direct.map(_.toSeq) == viaDf(i).map(_.toSeq), s"codegen: <$s>")
    }
    // null input → null out (nullSafeEval contract)
    val nullRow = Seq((0, null: Array[Byte])).toDF("i", "body")
      .select(call_function("http_dechunk", col("body"))).collect().head
    assert(nullRow.isNullAt(0))
  }

  test("http_dechunk rejects non-binary input at analysis time") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val e = intercept[Exception] {
      Seq("s").toDF("s").select(call_function("http_dechunk", col("s")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary") ||
      e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }

  // ---- http_inflate (round 13: Content-Encoding body decode) ----

  private def gzipped(payload: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    bos.toByteArray
  }

  private def zlibbed(payload: Array[Byte], raw: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    d.setInput(payload); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  test("http_inflate decodes gzip, zlib-deflate, and RAW deflate bodies") {
    val payload = b("<html>compressed corpus page</html>")
    assert(HttpCodec.inflate(gzipped(payload)).toSeq == payload.toSeq)
    assert(HttpCodec.inflate(zlibbed(payload, raw = false)).toSeq ==
      payload.toSeq, "zlib wrapper (RFC 1950) sniffed by CMF/FLG checksum")
    assert(HttpCodec.inflate(zlibbed(payload, raw = true)).toSeq ==
      payload.toSeq, "raw deflate (RFC 1951) — the lying-server form")
    // binary payloads survive byte-for-byte
    val bin = Array.tabulate[Byte](4096)(i => (i * 31).toByte)
    assert(HttpCodec.inflate(gzipped(bin)).toSeq == bin.toSeq)
    // concatenated gzip members decode end-to-end
    assert(HttpCodec.inflate(gzipped(b("ab")) ++ gzipped(b("cd"))).toSeq ==
      b("abcd").toSeq)
  }

  test("http_inflate nulls on corrupt, truncated, and bomb streams") {
    // a zero-length entity is a LEGAL empty body (identity), not corrupt
    assert(HttpCodec.inflate(Array.emptyByteArray).length == 0)
    assert(HttpCodec.inflate(b("x")) == null)
    assert(HttpCodec.inflate(b("plain text, not compressed")) == null)
    val good = gzipped(b("hello world hello world"))
    assert(HttpCodec.inflate(good.dropRight(6)) == null, "truncated gzip")
    val corrupt = good.clone()
    corrupt(12) = (corrupt(12) ^ 0xff).toByte
    assert(HttpCodec.inflate(corrupt) == null, "flipped deflate bytes")
    // bomb guard: 1 MiB of zeros gzips to ~1 KB; cap the output at 64 KiB
    val bomb = gzipped(new Array[Byte](1 << 20))
    assert(HttpCodec.inflate(bomb, maxOut = 64 << 10) == null,
      "output past maxOut must null, not allocate")
    assert(HttpCodec.inflate(bomb).length == (1 << 20),
      "same stream under the default cap decodes")
  }

  test("zstd_inflate: roundtrip, corrupt frame nulls, bomb guard holds") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val payload = b("<html>zstd-encoded crawl page</html>")
    val z = com.github.luben.zstd.Zstd.compress(payload)
    assert(HttpCodec.zstd(z).toSeq == payload.toSeq, "roundtrip")
    assert(HttpCodec.zstd(Array.emptyByteArray).length == 0, "empty = identity")
    assert(HttpCodec.zstd(b("not a zstd frame")) == null, "corrupt → null")
    assert(HttpCodec.zstd(z.dropRight(3)) == null, "truncated → null")
    // 1 MiB of zeros compresses tiny; cap the output at 64 KiB
    val bomb = com.github.luben.zstd.Zstd.compress(new Array[Byte](1 << 20))
    assert(HttpCodec.zstd(bomb, maxOut = 64 << 10) == null, "bomb guard")
    assert(HttpCodec.zstd(bomb).length == (1 << 20), "default cap decodes")
    // never-throws contract (the AVI fuzz standard): arbitrary bytes —
    // including ones bearing the zstd magic — decode or null, never throw
    val rnd = new scala.util.Random(15)
    (0 until 200).foreach { _ =>
      val junk = Array.fill[Byte](rnd.nextInt(300))(rnd.nextInt.toByte)
      if (junk.length >= 4) {
        junk(0) = 0x28; junk(1) = 0xB5.toByte
        junk(2) = 0x2F.toByte; junk(3) = 0xFD.toByte
      }
      HttpCodec.zstd(junk) // null or bytes, never a throw
    }
    (0 until z.length).foreach(n => HttpCodec.zstd(z.take(n)))
    // codegen route
    val viaDf = Seq(Tuple1(z)).toDF("b")
      .select(call_function("zstd_inflate", col("b"))).collect().head
      .getAs[Array[Byte]](0)
    assert(viaDf.toSeq == payload.toSeq, "codegen parity")
  }

  test("gzip_compress: inflate-roundtrip identity, magic bytes, codegen parity") {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val payload = ("<urlset>" + "x" * 4096 + "</urlset>").getBytes(US_ASCII)
    val gz = HttpCodec.gzip(payload)
    assert((gz(0) & 0xff) == 0x1f && (gz(1) & 0xff) == 0x8b, "RFC 1952 magic")
    assert(HttpCodec.inflate(gz).toSeq == payload.toSeq, "roundtrip identity")
    assert(HttpCodec.gzip(Array.emptyByteArray).length > 0, "empty body legal")
    // deterministic (MTIME=0) — same input, same bytes
    assert(HttpCodec.gzip(payload).toSeq == gz.toSeq)
    val viaDf = Seq(Tuple1(payload)).toDF("b")
      .select(call_function("http_inflate",
        call_function("gzip_compress", col("b")))).collect().head
      .getAs[Array[Byte]](0)
    assert(viaDf.toSeq == payload.toSeq, "codegen roundtrip")
  }

  test("charset_decode: strict JDK decode, alias map, eval ≡ codegen parity") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{BinaryType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    graft.plans.GraftFunctions.register(spark)
    val ja = "こんにちは"
    val cases: Seq[(Array[Byte], String)] = Seq(
      (ja.getBytes("Shift_JIS"), "shift_jis"),
      (ja.getBytes("Shift_JIS"), "sjis"), // alias
      ("привет".getBytes("windows-1251"), "cp1251"),
      (Array[Byte](0x81.toByte, 0x20), "shift_jis"), // malformed → null
      (ja.getBytes("Shift_JIS"), "no-such-charset"), // unknown → null
      (Array.emptyByteArray, "gbk")) // empty → empty string
    val viaDf = cases.zipWithIndex.map { case ((a, n), i) => (i, a, n) }
      .toDF("i", "b", "n")
      .select(col("i"), call_function("charset_decode", col("b"), col("n")))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getString(1)))).toMap
    cases.zipWithIndex.foreach { case ((a, n), i) =>
      val direct = Option(graft.plans.CharsetCodec.decode(a, n))
      val interp = Option(graft.plans.CharsetDecode(
        Literal(a, BinaryType),
        Literal(UTF8String.fromString(n), StringType)).eval(null))
        .map(_.toString)
      assert(direct == interp, s"interp case $i")
      assert(direct == viaDf(i), s"codegen case $i")
    }
    assert(viaDf(0).contains(ja) && viaDf(1).contains(ja))
    assert(viaDf(2).contains("привет"))
    assert(viaDf(3).isEmpty && viaDf(4).isEmpty)
    assert(viaDf(5).contains(""))
  }

  test("charset_decode: UTF-16 family — BOM auto-endian, fixed endians, strict validity") {
    import graft.plans.CharsetCodec.decode
    val s = "café こんにちは"
    // "utf-16": BOM picks endianness and is consumed; BE default without
    assert(decode(("\uFEFF" + s).getBytes("UTF-16BE"), "utf-16") == s)
    assert(decode(("\uFEFF" + s).getBytes("UTF-16LE"), "utf-16") == s)
    assert(decode(s.getBytes("UTF-16BE"), "utf-16") == s)
    // fixed-endian names decode BOM-less bytes directly
    assert(decode(s.getBytes("UTF-16LE"), "utf-16le") == s)
    assert(decode(s.getBytes("UTF-16BE"), "utf-16be") == s)
    // a fixed-endian decode keeps a BOM as content — callers strip it
    assert(decode(("\uFEFF" + s).getBytes("UTF-16LE"), "utf-16le") == "\uFEFF" + s)
    // strictness: odd byte count and an unpaired surrogate both → null
    assert(decode(s.getBytes("UTF-16BE").dropRight(1), "utf-16be") == null)
    assert(decode(Array[Byte](0xD8.toByte, 0x00, 0x00, 'a'), "utf-16be") == null)
    // WHATWG web labels: BOM-less "unicode"/"ucs-2" mean UTF-16LE (the
    // IE-era pages that declare them are little-endian; JDK UTF-16's
    // BE default would decode them into valid-but-garbage CJK)
    assert(decode(s.getBytes("UTF-16LE"), "unicode") == s)
    assert(decode(s.getBytes("UTF-16LE"), "ucs-2") == s)
    // ... but a BOM of either endianness overrides the label (sniff wins)
    assert(decode(("\uFEFF" + s).getBytes("UTF-16BE"), "unicode") == s)
    assert(decode(("\uFEFF" + s).getBytes("UTF-16LE"), "ucs-2") == s)
  }

  test("http_inflate eval ≡ codegen parity, null propagation, maxOut literal") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    graft.plans.GraftFunctions.register(spark)
    val payload = b("parity fixture")
    val cases: Seq[Array[Byte]] = Seq(
      gzipped(payload), zlibbed(payload, raw = false),
      zlibbed(payload, raw = true), b("junk"), Array.emptyByteArray,
      gzipped(payload).dropRight(4))
    val viaDf = cases.zipWithIndex.map { case (a, i) => (i, a) }
      .toDF("i", "body")
      .select(col("i"), call_function("http_inflate", col("body")).as("out"))
      .collect().map(r => r.getInt(0) -> Option(r.getAs[Array[Byte]]("out")))
      .toMap
    cases.zipWithIndex.foreach { case (a, i) =>
      val direct = Option(HttpCodec.inflate(a))
      val interp = Option(graft.plans.HttpInflate(Literal(a, BinaryType))
        .eval(null)).map(_.asInstanceOf[Array[Byte]])
      assert(direct.map(_.toSeq) == interp.map(_.toSeq), s"interp case $i")
      assert(direct.map(_.toSeq) == viaDf(i).map(_.toSeq), s"codegen case $i")
    }
    val nullRow = Seq((0, null: Array[Byte])).toDF("i", "body")
      .select(call_function("http_inflate", col("body"))).collect().head
    assert(nullRow.isNullAt(0))
    // the 2-arg literal form parameterizes the bomb cap through SQL
    val capped = Seq((0, gzipped(new Array[Byte](1 << 20))))
      .toDF("i", "body")
      .select(call_function("http_inflate", col("body"), lit(1024)))
      .collect().head
    assert(capped.isNullAt(0), "literal maxOut reaches codegen")
  }
}
