package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for the text-ingest path.
  *
  * Real crawl text arrives in mixed normalization forms — the same word
  * as precomposed `é` (U+00E9) or decomposed `e`+U+0301 — which breaks
  * every byte-keyed operator downstream (exact dedup, token counting,
  * contamination screens all see two different strings). NFC-normalize
  * ON INGEST and the whole estate keys consistently. Spark has no
  * built-in; `java.text.Normalizer` implements the Unicode standard
  * algorithm (UAX #15), the same one DuckDB's `nfc_normalize` follows —
  * so the query face is hash-checked cross-engine, not eyeballed.
  */
object UnicodeCodec {

  /** NFC normalization with a fast already-normalized path (the common
    * case for real text — `isNormalized` is a quick-check scan that
    * avoids allocating for ASCII and precomposed input). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `utf8_nfc(string)` → the NFC-normalized string (see [[UnicodeCodec]]). */
case class Utf8Nfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "utf8_nfc"

  override protected def nullSafeEval(input: Any): Any =
    UnicodeCodec.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.UnicodeCodec.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Utf8Nfc =
    copy(child = newChild)
}
