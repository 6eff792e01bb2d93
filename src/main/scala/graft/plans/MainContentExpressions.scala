package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-page MAIN-CONTENT extraction — the link-density / text-density
  * segment scorer that is boilerpipe/trafilatura's actual core, and the
  * step the cross-document route (`q_extract_clean`, which drops
  * segments REPEATED across pages) cannot cover: page-UNIQUE chrome — a
  * related-links sidebar, a per-article tag cloud, comment-nav — repeats
  * nowhere, but its shape gives it away: link-dominated, word-poor.
  *
  * The rule set (shared VERBATIM with the DuckDB twin [[MainContent.extractSql]]
  * — same patterns, same arithmetic, integer-exact):
  *
  *  1. SEGMENT on block-close boundaries
  *     (`</p> </div> </li> … </blockquote>`, case-insensitive) — the
  *     block structure the author already declared;
  *  2. per segment, `text` = tags → space, whitespace collapsed, trimmed
  *     (space-only trim — the Spark/DuckDB `trim` semantics);
  *     `link_chars` = summed length of each `<a>…</a>` inner text with
  *     tags stripped (per-anchor, so a torn tag can never eat across
  *     anchors); `n_words` = single-space token count of `text`;
  *  3. KEEP a segment iff `n_words >= 5` AND `link_chars · 3 <= len(text)`
  *     (at most a third of the visible text is anchor text — the
  *     boilerpipe threshold) — kept texts re-join in order with ' '.
  *
  * One native expression (the `html_text_extract`/`url_resolve`
  * precedent: per-segment work inside a Column chain would re-inline
  * under Catalyst; here every pattern is precompiled and the row
  * crosses the UTF8String boundary once). Composes BEFORE the
  * entity-decode/extraction chain — it consumes raw markup.
  */
object MainContent {

  /** Minimum words for a content segment (boilerpipe's short-block
    * heuristic): headlines survive inside their article's flow, but a
    * bare "Home" / "© 2026" fragment does not. */
  val MinWords = 5

  private val Boundary = Pattern.compile(
    "(?i)</(p|div|li|ul|ol|td|tr|table|h[1-6]|section|article|aside|nav|header|footer|blockquote)>")
  private val Anchor = Pattern.compile("(?is)<a[^>]*>(.*?)</a>")
  private val Tag = Pattern.compile("(?s)<[^>]*>")
  // explicit class, NOT \s: Java's \s includes \x0B (vertical tab)
  // while RE2's does not — the one divergence between the engines'
  // shorthand classes, pinned out by spelling the set in both faces
  private val Ws = Pattern.compile("[ \t\n\f\r]+")

  /** Space-only trim (Java's String.trim strips all ≤U+0020 and would
    * diverge from the SQL twin — the round-13 lesson; after the `\s+`
    * collapse only spaces remain, but the rule stays explicit). */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  def extract(html: String): String = {
    val segs = Boundary.split(html, -1)
    val out = new java.lang.StringBuilder(html.length / 2)
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      var linkChars = 0
      val m = Anchor.matcher(seg)
      while (m.find()) {
        // CODE POINTS, not UTF-16 units — DuckDB len() counts code
        // points, so an astral char must weigh 1 in both faces
        val stripped = Tag.matcher(m.group(1)).replaceAll("")
        linkChars += stripped.codePointCount(0, stripped.length)
      }
      val text = trimSpaces(
        Ws.matcher(Tag.matcher(seg).replaceAll(" ")).replaceAll(" "))
      if (text.nonEmpty) {
        var nWords = 1
        var j = 0
        while (j < text.length) {
          if (text.charAt(j) == ' ') nWords += 1
          j += 1
        }
        if (nWords >= MinWords &&
          linkChars * 3 <= text.codePointCount(0, text.length)) {
          if (out.length > 0) out.append(' ')
          out.append(text)
        }
      }
      i += 1
    }
    out.toString
  }

  /** The DuckDB twin over an expression `e` — the same boundary split,
    * per-anchor link-char sum, collapse/trim, and keep rule,
    * inline-and-repeat (the canonSql discipline). */
  def extractSql(e: String): String = {
    val boundary = "'(?i)</(p|div|li|ul|ol|td|tr|table|h[1-6]|section|" +
      "article|aside|nav|header|footer|blockquote)>'"
    def text(s: String): String =
      s"trim(regexp_replace(regexp_replace($s, '<[^>]*>', ' ', 'g'), " +
        s"'[ \\t\\n\\f\\r]+', ' ', 'g'))"
    def keep(s: String): String = {
      val t = text(s)
      val nWords =
        s"CASE WHEN $t = '' THEN 0 ELSE len(string_split($t, ' ')) END"
      val linkChars = "COALESCE(list_sum(list_transform(" +
        s"regexp_extract_all($s, '(?is)<a[^>]*>(.*?)</a>', 1), " +
        "x -> len(regexp_replace(x, '<[^>]*>', '', 'g')))), 0)"
      s"($nWords >= $MinWords AND $linkChars * 3 <= len($t))"
    }
    s"array_to_string(list_transform(list_filter(" +
      s"regexp_split_to_array($e, $boundary), " +
      s"s -> ${keep("s")}), s -> ${text("s")}), ' ')"
  }
}

/** `main_content(html)` → the page's main text per [[MainContent]].
  * Null in → null out; never fails. */
case class MainContentExtract(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "main_content"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      MainContent.extract(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.MainContent.extract($c.toString()));
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): MainContentExtract =
    copy(child = newChild)
}
