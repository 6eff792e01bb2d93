package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction}
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Legacy-charset decode for the WARC ingest path.
  *
  * Spark's `decode` whitelist stops at the unicode family + latin-1 —
  * but a world crawl is full of shift_jis / GBK / Big5 / EUC-KR /
  * windows-1251 pages (most of the pre-UTF-8 CJK and Cyrillic web),
  * which the round-12 bridge could only quarantine. The JDK ships
  * exactly these decode tables; this expression exposes them with the
  * ingest discipline the rest of the bridge uses: STRICT decoding
  * (CodingErrorAction.REPORT) with NULL on malformed/unmappable bytes
  * or an unrecognized charset name — never a thrown error (Spark 4's
  * strict `decode` failure mode), never U+FFFD mojibake smuggled into
  * the corpus.
  *
  * No DuckDB twin exists (DuckDB has no sjis tables), so this is a
  * spec-graded §2-C component: fixtures are JDK-ENCODED bytes decoded
  * back through the expression — the JDK's encoder is the second
  * implementation, the GIF/JPEG codec convention.
  */
object CharsetCodec {

  /** lowercased IANA names/aliases the web actually declares → JDK
    * canonical charset name. The legacy single-purpose encodings plus
    * (round 14) the UTF-16 family — Spark's own `decode` is strict
    * with no `is_valid_utf16` gate, so one unpaired surrogate would
    * kill a job; this expression's REPORT→null discipline is exactly
    * the validity gate UTF-16 needs. The JDK "UTF-16" charset consumes
    * a BOM and picks endianness from it (BE default without one — the
    * RFC 2781 rule); the LE/BE names fix endianness and keep a BOM as
    * content (the bridge strips a leading U+FEFF after decode). UTF-8
    * and the exact-decode latin-1/cp1252 pair stay on the bridge's own
    * branches. */
  val Supported: Map[String, String] = Map(
    "utf-16" -> "UTF-16", "utf16" -> "UTF-16",
    // WHATWG: the IE-era labels "unicode"/"ucs-2" mean UTF-16LE — the
    // pages that declare them are little-endian; a BOM (either order)
    // still wins via the sniff in [[decode]]. JDK "UTF-16" alone would
    // default BOM-less content to BIG-endian (RFC 2781) and decode the
    // real bytes wrong-endian into valid-but-garbage CJK.
    "unicode" -> "UTF-16LE", "ucs-2" -> "UTF-16LE",
    "utf-16le" -> "UTF-16LE", "utf-16be" -> "UTF-16BE",
    "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS",
    "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS",
    "euc-jp" -> "EUC-JP", "eucjp" -> "EUC-JP",
    "gbk" -> "GBK", "gb2312" -> "GBK", "gb-2312" -> "GBK",
    "gb18030" -> "GB18030",
    "big5" -> "Big5", "big-5" -> "Big5",
    "euc-kr" -> "EUC-KR", "euckr" -> "EUC-KR",
    "ks_c_5601-1987" -> "EUC-KR",
    "koi8-r" -> "KOI8-R",
    "windows-1250" -> "windows-1250", "cp1250" -> "windows-1250",
    "windows-1251" -> "windows-1251", "cp1251" -> "windows-1251",
    "windows-1253" -> "windows-1253",
    "windows-1254" -> "windows-1254",
    "windows-1255" -> "windows-1255",
    "windows-1256" -> "windows-1256",
    "windows-1257" -> "windows-1257",
    "windows-874" -> "x-windows-874", "tis-620" -> "TIS-620",
    "iso-8859-2" -> "ISO-8859-2", "latin2" -> "ISO-8859-2",
    "iso-8859-4" -> "ISO-8859-4",
    "iso-8859-5" -> "ISO-8859-5",
    "iso-8859-6" -> "ISO-8859-6",
    "iso-8859-7" -> "ISO-8859-7",
    "iso-8859-8" -> "ISO-8859-8",
    "iso-8859-9" -> "ISO-8859-9", "latin5" -> "ISO-8859-9",
    "iso-8859-13" -> "ISO-8859-13",
    "iso-8859-15" -> "ISO-8859-15", "latin9" -> "ISO-8859-15")

  /** Charset objects are immutable/thread-safe; decoders are not —
    * cache the charset, build a decoder per call (cheap). A JVM without
    * an optional charset (x-windows-874 on minimal JREs) degrades that
    * name to null, not an error. */
  private val cache = new ConcurrentHashMap[String, Charset]()

  private def charsetFor(declared: String): Charset =
    Supported.get(declared) match {
      case None => null
      case Some(jdk) =>
        cache.computeIfAbsent(jdk, n =>
          try { if (Charset.isSupported(n)) Charset.forName(n) else null }
          catch { case _: Exception => null })
    }

  /** Decode `bytes` under the (lowercased) declared charset name; null
    * on unknown name, unavailable charset, or malformed/unmappable
    * bytes. */
  def decode(bytes: Array[Byte], declared: String): String = {
    // BOM sniff for the LE-defaulting web labels: a BOM of either
    // endianness overrides the label (WHATWG decode step 1) — route to
    // the JDK's BOM-consuming "UTF-16" charset. The explicit utf-16le/
    // utf-16be labels keep their fixed endianness (BOM stays content;
    // the bridge strips a leading U+FEFF after decode).
    val hasBom = bytes.length >= 2 &&
      ((bytes(0) == 0xFE.toByte && bytes(1) == 0xFF.toByte) ||
        (bytes(0) == 0xFF.toByte && bytes(1) == 0xFE.toByte))
    val name =
      if (hasBom && (declared == "unicode" || declared == "ucs-2")) "utf-16"
      else declared
    val cs = charsetFor(name)
    if (cs == null) return null
    try {
      cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(bytes))
        .toString
    } catch {
      case _: CharacterCodingException => null
    }
  }
}

/** `charset_decode(binary, charset_name)` → decoded string, null on an
  * unknown/unavailable charset or malformed bytes (see
  * [[CharsetCodec.decode]]). The name may be a per-row column (a crawl
  * declares a different charset on every page). */
case class CharsetDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, string), got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "charset_decode"

  override protected def nullSafeEval(bytes: Any, name: Any): Any = {
    val r = CharsetCodec.decode(bytes.asInstanceOf[Array[Byte]],
      name.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, n) => {
      s"""
         |String r = graft.plans.CharsetCodec.decode($b, $n.toString());
         |${ev.value} = r == null ? null :
         |  org.apache.spark.unsafe.types.UTF8String.fromString(r);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CharsetDecode =
    copy(left = newLeft, right = newRight)
}
