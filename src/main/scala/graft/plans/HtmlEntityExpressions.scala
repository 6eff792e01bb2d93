package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** HTML character-reference decoding for the extraction path.
  *
  * Real pages are full of `&#233;` / `&#x2019;` / `&eacute;` /
  * `&mdash;` — every non-ASCII-clean page carries them, and any that
  * survive verbatim into extracted text poison tokenization, dedup
  * shingles, and quality scores downstream. The round-13 six-string
  * replace chain is completed here with the full grammar: decimal and
  * hex NUMERIC references plus the named set that dominates crawl text.
  *
  * Semantics are SINGLE-PASS (the browser model): the text is tokenized
  * once, left to right, by [[HtmlEntities.TokenRe]]; each token decodes
  * independently and decoded output is never rescanned — so
  * `&amp;lt;` yields the literal text `&lt;`, and `&#38;#x41;` yields
  * `&#x41;`, exactly double-decode avoidance. An unknown name or an
  * invalid codepoint (0, surrogates, > U+10FFFF) emits VERBATIM — a
  * conservative pass-through, never U+FFFD mojibake.
  *
  * One extraction-specific normalization: the space-family codepoints
  * (nbsp U+00A0, en/em/thin space) decode to a plain ASCII space — the
  * downstream whitespace collapse is ASCII-`\s`, and a corpus full of
  * invisible non-breaking spaces is exactly what a cleaning pipeline
  * exists to prevent. Named and numeric forms agree by construction
  * (both route through the same codepoint map).
  *
  * Cross-engine: the tokenization is ONE shared regex in the
  * Java/RE2-common subset (leftmost-first alternation, bounded
  * repetition), and [[HtmlEntities.decodeSql]] emits the DuckDB twin —
  * a split/extract interleave over the SAME pattern with the SAME
  * per-token CASE, generated from the SAME name table, so
  * `q_html_extract` / `q_extract_clean` stay hash-checked.
  *
  * Why native and not a Column chain: the named table alone is ~110
  * replaces; with two numeric regex passes on top the chain would blow
  * far past the ~20-node Catalyst re-inlining limit that made
  * `url_resolve` a measured 16× win (plans/UrlExpressions.scala) —
  * this is the same single-pass precompiled-pattern shape.
  */
object HtmlEntities {

  /** One entity-looking token: `&` + (decimal ref | hex ref | name) +
    * `;`. Bounded repetitions keep both engines linear; alternation is
    * leftmost-first in Java AND RE2, and the three branches are
    * mutually exclusive on their first character anyway. */
  val TokenReStr: String =
    "&(#[0-9]{1,7}|#[xX][0-9a-fA-F]{1,6}|[a-zA-Z][a-zA-Z0-9]{1,31});"

  val TokenRe: Pattern = Pattern.compile(TokenReStr)

  /** Codepoints that decode to a plain ASCII space (extraction
    * normalization — see the scaladoc): nbsp, ensp, emsp, thinsp. */
  val SpaceCodepoints: Set[Int] = Set(0xA0, 0x2002, 0x2003, 0x2009)

  /** The named-entity table (HTML5 subset that dominates crawl text):
    * markup escapes, the full Latin-1 letter estate (both cases),
    * typographic punctuation, and the common symbol/fraction/Greek
    * names. Values are the TRUE codepoints except the space family
    * (normalized per [[SpaceCodepoints]]). Shared verbatim with the
    * DuckDB twin ([[decodeSql]]) — one table, two engines. */
  val Named: Seq[(String, String)] = Seq(
    // markup escapes + space family
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "ensp" -> " ", "emsp" -> " ",
    "thinsp" -> " ",
    // Latin-1 letters, lowercase
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "atilde" -> "ã", "auml" -> "ä", "aring" -> "å",
    "aelig" -> "æ", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î",
    "iuml" -> "ï", "eth" -> "ð", "ntilde" -> "ñ",
    "ograve" -> "ò", "oacute" -> "ó", "ocirc" -> "ô",
    "otilde" -> "õ", "ouml" -> "ö", "oslash" -> "ø",
    "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "thorn" -> "þ",
    "yuml" -> "ÿ", "szlig" -> "ß",
    // Latin-1 letters, uppercase
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â",
    "Atilde" -> "Ã", "Auml" -> "Ä", "Aring" -> "Å",
    "AElig" -> "Æ", "Ccedil" -> "Ç", "Egrave" -> "È",
    "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î",
    "Iuml" -> "Ï", "ETH" -> "Ð", "Ntilde" -> "Ñ",
    "Ograve" -> "Ò", "Oacute" -> "Ó", "Ocirc" -> "Ô",
    "Otilde" -> "Õ", "Ouml" -> "Ö", "Oslash" -> "Ø",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucirc" -> "Û",
    "Uuml" -> "Ü", "Yacute" -> "Ý", "THORN" -> "Þ",
    // ligatures / Latin Extended
    "oelig" -> "œ", "OElig" -> "Œ",
    "scaron" -> "š", "Scaron" -> "Š", "fnof" -> "ƒ",
    // typographic punctuation
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“",
    "rdquo" -> "”", "sbquo" -> "‚", "bdquo" -> "„",
    "prime" -> "′", "Prime" -> "″",
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "middot" -> "·", "bull" -> "•",
    "dagger" -> "†", "Dagger" -> "‡", "permil" -> "‰",
    "lsaquo" -> "‹", "rsaquo" -> "›",
    "laquo" -> "«", "raquo" -> "»",
    "circ" -> "ˆ", "tilde" -> "˜", "shy" -> "\u00AD",
    "zwnj" -> "\u200C", "zwj" -> "\u200D",
    "lrm" -> "\u200E", "rlm" -> "\u200F",
    // symbols, currency, math
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "plusmn" -> "±", "times" -> "×",
    "divide" -> "÷", "frac12" -> "½", "frac14" -> "¼",
    "frac34" -> "¾", "sup1" -> "¹", "sup2" -> "²",
    "sup3" -> "³", "micro" -> "µ", "para" -> "¶",
    "sect" -> "§", "ordm" -> "º", "ordf" -> "ª",
    "iexcl" -> "¡", "iquest" -> "¿",
    "cent" -> "¢", "pound" -> "£", "curren" -> "¤",
    "yen" -> "¥", "euro" -> "€",
    "brvbar" -> "¦", "uml" -> "¨", "macr" -> "¯",
    "acute" -> "´", "cedil" -> "¸", "not" -> "¬",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→",
    "darr" -> "↓", "harr" -> "↔",
    "minus" -> "−", "infin" -> "∞", "ne" -> "≠",
    "le" -> "≤", "ge" -> "≥", "asymp" -> "≈",
    // Greek letters crawl text actually uses
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "delta" -> "δ", "pi" -> "π", "sigma" -> "σ",
    "omega" -> "ω", "mu" -> "μ", "lambda" -> "λ")

  private val byName: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](Named.size * 2)
    Named.foreach { case (k, v) => m.put(k, v) }
    m
  }

  /** Decode one token BODY (the captured group: `#233`, `#x2019`, or a
    * name) — verbatim reconstruction (`&` + body + `;`) for an unknown
    * name or an invalid codepoint. */
  def decodeBody(body: String): String =
    if (body.charAt(0) == '#') {
      // the regex bounds length (≤7 decimal / ≤6 hex digits), so the
      // parse cannot overflow an Int
      val cp =
        if (body.charAt(1) == 'x' || body.charAt(1) == 'X')
          Integer.parseInt(body.substring(2), 16)
        else Integer.parseInt(body.substring(1))
      if (cp >= 1 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
        if (SpaceCodepoints.contains(cp)) " "
        else new String(Character.toChars(cp))
      } else "&" + body + ";"
    } else {
      val v = byName.get(body)
      if (v == null) "&" + body + ";" else v
    }

  /** Single-pass decode of a whole string (see scaladoc). */
  def decode(s: String): String = {
    val m = TokenRe.matcher(s)
    if (!m.find()) return s
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    do {
      sb.append(s, last, m.start())
      sb.append(decodeBody(m.group(1)))
      last = m.end()
    } while (m.find())
    sb.append(s, last, s.length)
    sb.toString
  }

  private def lit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The DuckDB twin of [[decodeBody]] over a SQL expression `e`
    * holding the token body. Generated from the SAME name table and
    * the SAME codepoint guards as the Java path. */
  private def decodeBodySql(e: String): String = {
    val namedArms = Named.map { case (n, v) =>
      s"WHEN $e = ${lit(n)} THEN ${lit(v)}"
    }.mkString("\n      ")
    def num(n: String): String =
      s"""CASE WHEN $n IN (160, 8194, 8195, 8201) THEN ' '
         |        WHEN $n >= 1 AND $n <= 1114111
         |             AND NOT ($n >= 55296 AND $n <= 57343) THEN chr($n)
         |        ELSE '&' || $e || ';' END""".stripMargin
    s"""CASE
       |      WHEN ($e LIKE '#x%' OR $e LIKE '#X%') THEN
       |        ${num(s"CAST(('0x' || substr($e, 3)) AS INT)")}
       |      WHEN $e LIKE '#%' THEN
       |        ${num(s"CAST(substr($e, 2) AS INT)")}
       |      $namedArms
       |      ELSE '&' || $e || ';' END""".stripMargin
  }

  /** The DuckDB twin of [[decode]] over two column names holding
    * `regexp_split_to_array(s, TokenRe)` and
    * `regexp_extract_all(s, TokenRe, 1)` — the standard split/extract
    * interleave (literal runs alternate with decoded tokens; decoded
    * output is never rescanned, the single-pass semantics). */
  def decodeSql(partsCol: String, entsCol: String): String = {
    val e = s"$entsCol[CAST(i AS INT)]"
    s"""array_to_string(list_transform(
       |    generate_series(1, len($partsCol)),
       |    i -> $partsCol[CAST(i AS INT)] ||
       |      CASE WHEN CAST(i AS INT) >= len($partsCol) THEN ''
       |      ELSE ${decodeBodySql(e)}
       |      END), '')""".stripMargin
  }

  /** The tokenizer as a DuckDB regex literal. */
  def tokenReSql: String = lit(TokenReStr)
}

/** `html_entities_decode(string)` → string with HTML character
  * references decoded single-pass (see [[HtmlEntities]]). Null in →
  * null out; never fails. */
case class HtmlEntitiesDecode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_entities_decode"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlEntities.decode(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.HtmlEntities.decode($c.toString()));
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HtmlEntitiesDecode =
    copy(child = newChild)
}

/** The WHOLE extraction chain as one native call — strip blocks/tags,
  * decode character references, collapse whitespace, trim. Runs the
  * SAME java.util.regex patterns in the SAME order as the Column-chain
  * form (and therefore as the DuckDB oracle replay — byte-identical by
  * construction), but crosses the UTF8String↔String boundary ONCE per
  * row instead of once per pass and keeps every Pattern precompiled.
  * The final trim strips the SPACE character only (Spark/DuckDB `trim`
  * semantics — Java's String.trim strips all ≤U+0020 and would
  * diverge, the round-13 lesson). */
object HtmlExtract {

  /** Tag/block strip chain, applied IN ORDER (blocks before bare tags —
    * a script body may contain `<` that is not markup). The single
    * source of truth: [[graft.operators.HtmlOps]] re-exports it for the
    * SQL twin. */
  val StripPatterns: Seq[(String, String)] = Seq(
    "(?s)<!--.*?-->" -> "",
    "(?is)<script[^>]*>.*?</script>" -> "",
    "(?is)<style[^>]*>.*?</style>" -> "",
    "<[^>]*>" -> " ")

  private val compiled: Array[(Pattern, String)] =
    StripPatterns.map { case (p, r) => (Pattern.compile(p), r) }.toArray

  private val ws: Pattern = Pattern.compile("\\s+")

  def extract(html: String): String = {
    var s = html
    var i = 0
    while (i < compiled.length) {
      s = compiled(i)._1.matcher(s).replaceAll(compiled(i)._2)
      i += 1
    }
    s = HtmlEntities.decode(s)
    s = ws.matcher(s).replaceAll(" ")
    // space-only trim (Spark/DuckDB semantics)
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    if (from == 0 && to == s.length) s else s.substring(from, to)
  }
}

/** `html_text_extract(string)` → extracted visible text (see
  * [[HtmlExtract]]). Null in → null out; never fails. */
case class HtmlTextExtract(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "html_text_extract"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.HtmlExtract.extract($c.toString()));
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): HtmlTextExtract =
    copy(child = newChild)
}
