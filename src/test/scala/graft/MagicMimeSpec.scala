package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.functions._

import graft.plans.MagicMime

/** Magic-byte MIME sniffing (SURVEY §2 row 166): the first-match walk,
  * and the declared-vs-sniffed WARC audit face. */
class MagicMimeSpec extends SparkSpec {

  test("sniff: every magic in the table, precedence, and the text fallback") {
    def b(s: String): Array[Byte] = s.getBytes(ISO_8859_1)
    assert(MagicMime.sniff(b("%PDF-1.4 junk")) == "application/pdf")
    assert(MagicMime.sniff(Array[Byte](0x89.toByte, 'P', 'N', 'G',
      0x0d, 0x0a, 0x1a, 0x0a, 1, 2)) == "image/png")
    assert(MagicMime.sniff(b("GIF89a....")) == "image/gif")
    assert(MagicMime.sniff(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte)) == "image/jpeg")
    assert(MagicMime.sniff(b("RIFFWAVEfmt ")) == "audio/wav")
    assert(MagicMime.sniff(b("RIFFAVI LIST")) == "video/avi")
    assert(MagicMime.sniff(Array[Byte](0x1f, 0x8b.toByte, 8)) == "application/gzip")
    assert(MagicMime.sniff(b("PKzip")) == "application/zip")
    assert(MagicMime.sniff(b("qoifxxxx")) == "image/qoi")
    assert(MagicMime.sniff(b("  \n<!DOCTYPE html><html>")) == "text/html")
    assert(MagicMime.sniff(b("<HtMl lang=en>")) == "text/html")
    assert(MagicMime.sniff(b("BM....dib")) == "image/bmp")
    assert(MagicMime.sniff(b("plain words, nothing else")) == "text/plain")
    assert(MagicMime.sniff(Array[Byte](0, 1, 2, 3)) == "application/octet-stream")
    assert(MagicMime.sniff(Array.empty[Byte]) == "application/octet-stream")
    // a text page merely MENTIONING html is not html
    assert(MagicMime.sniff(b("the <html> tag explained")) == "text/plain")
  }

  test("warcToDocuments sniff gate: binary-behind-text quarantines, exotic charsets do not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_sniffgate")
    def rec(uri: String, payload: Array[Byte]): Array[Byte] = {
      val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
      hdr ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
    }
    val jpegAsHtml =
      ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n").getBytes(ISO_8859_1) ++
        Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 1, 2, 3)
    // a windows-1251 page: HIGH bytes fail a printable-ASCII test but
    // carry no known magic — the conservative gate must NOT fire
    val cyr = ("HTTP/1.1 200 OK\r\n" +
      "Content-Type: text/html; charset=windows-1251\r\n\r\n" +
      "<html><body>").getBytes(ISO_8859_1) ++
      Array[Byte](0xcf.toByte, 0xf0.toByte, 0xe8.toByte) ++
      "</body></html>".getBytes(ISO_8859_1)
    val honest = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
      "<html><body>plain honest page body</body></html>").getBytes(ISO_8859_1)
    val recs = rec("http://g.example/lie", jpegAsHtml) ++
      rec("http://g.example/cyr", cyr) ++
      rec("http://g.example/ok", honest)
    java.nio.file.Files.write(dir.resolve("seg.warc"), recs)
    val (clean, quarantine) = graft.operators.HtmlOps.warcToDocuments(
      graft.sources.WarcSource.read(spark, dir.toString))
    val q = quarantine.collect()
      .map(r => r.getAs[String]("target_uri") -> r.getAs[String]("reason")).toMap
    assert(q == Map("http://g.example/lie" -> "sniff"), q.toString)
    assert(clean.select("url").collect().map(_.getString(0)).toSet ==
      Set("http://g.example/cyr", "http://g.example/ok"))
  }

  test("sniffedTypesOf: the lying Content-Type is flagged as mojibake risk") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_sniff")
    def rec(uri: String, payload: Array[Byte]): Array[Byte] = {
      val hdr = ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "WARC-Date: 2026-08-14T00:00:00Z\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
      hdr ++ payload ++ "\r\n\r\n".getBytes(ISO_8859_1)
    }
    def http(ctype: String, body: Array[Byte]): Array[Byte] =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $ctype\r\n\r\n").getBytes(ISO_8859_1) ++ body
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte, 9, 9)
    val recs =
      rec("http://m.example/lie", http("text/html", jpeg)) ++
      rec("http://m.example/honest.html",
        http("text/html", "<html><body>fine</body></html>".getBytes(ISO_8859_1))) ++
      rec("http://m.example/honest.pdf",
        http("application/pdf", "%PDF-1.4 x".getBytes(ISO_8859_1)))
    java.nio.file.Files.write(dir.resolve("seg.warc"), recs)
    val got = graft.operators.CrawlOps.sniffedTypesOf(
      graft.sources.WarcSource.read(spark, dir.toString))
      .collect().map(r => r.getString(0) ->
        ((r.getString(1), r.getString(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(got("http://m.example/lie") ==
      (("text/html", "image/jpeg", true, true)), got)
    assert(got("http://m.example/honest.html") ==
      (("text/html", "text/html", false, false)), got)
    assert(got("http://m.example/honest.pdf") ==
      (("application/pdf", "application/pdf", false, false)), got)
  }
}
