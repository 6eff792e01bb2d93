package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Magic-byte MIME sniffing (round 17) — the ingest routing signal for
  * when the Content-Type header LIES (the exact failure the media-type
  * gate documents: a latin-1-declared JPEG "decodes" into mojibake).
  * Deterministic, content-only, first-match over the estate's own
  * decodable formats plus the common containers; a printable-ASCII
  * head (first 64 bytes ∈ {TAB, LF, CR, 0x20..0x7E}) reads text/plain,
  * anything else application/octet-stream. Pure JVM so the expression
  * codegen calls it directly. */
object MagicMime {

  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && {
      var i = 0
      while (i < s.length && b(off + i) == s.charAt(i).toByte) i += 1
      i == s.length
    }

  def sniff(b: Array[Byte]): String = {
    if (b == null || b.length == 0) return "application/octet-stream"
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && ascii(b, 1, "PNG"))
      return "image/png"
    if (ascii(b, 0, "GIF87a") || ascii(b, 0, "GIF89a")) return "image/gif"
    if (b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff) return "image/jpeg"
    if (ascii(b, 0, "%PDF-")) return "application/pdf"
    if (ascii(b, 0, "RIFF") && b.length >= 12) {
      if (ascii(b, 8, "WAVE")) return "audio/wav"
      if (ascii(b, 8, "AVI ")) return "video/avi"
    }
    if (b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b)
      return "application/gzip"
    if (ascii(b, 0, "PK")) return "application/zip"
    if (ascii(b, 0, "qoif")) return "image/qoi"
    // HTML: optional ASCII whitespace, then <!doctype or <html (any case)
    var w = 0
    while (w < b.length && w < 32 &&
      (b(w) == ' ' || b(w) == '\t' || b(w) == '\n' || b(w) == '\r')) w += 1
    def asciiLower(off: Int, s: String): Boolean =
      b.length >= off + s.length && {
        var i = 0
        while (i < s.length &&
          java.lang.Character.toLowerCase((b(off + i) & 0xff).toChar) ==
            s.charAt(i)) i += 1
        i == s.length
      }
    if (asciiLower(w, "<!doctype") || asciiLower(w, "<html"))
      return "text/html"
    if (ascii(b, 0, "BM")) return "image/bmp"
    var i = 0
    val n = math.min(64, b.length)
    while (i < n) {
      val c = b(i) & 0xff
      if (c != 9 && c != 10 && c != 13 && (c < 0x20 || c > 0x7e))
        return "application/octet-stream"
      i += 1
    }
    "text/plain"
  }

  def sniffUtf8(b: Array[Byte]): UTF8String = UTF8String.fromString(sniff(b))
}

/** `magic_mime(payload)` → the sniffed MIME string ([[MagicMime]]) —
  * row-level, codegen'd; NULL payload reads octet-stream via the
  * null-safe wrapper's null, handled by callers with coalesce. */
case class MagicMimeOf(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "magic_mime"

  override protected def nullSafeEval(input: Any): Any =
    MagicMime.sniffUtf8(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.plans.MagicMime.sniffUtf8($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): MagicMimeOf =
    copy(child = newChild)
}
