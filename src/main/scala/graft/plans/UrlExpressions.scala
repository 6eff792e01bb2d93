package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native RFC 3986 §5 reference resolution.
  *
  * The composed-Column formulation ([[graft.operators.UrlOps.resolve]]'s
  * original form — ~25 chained regexp nodes whose input subtree repeats
  * four times) is correct but EXPLODES under Catalyst's expression
  * inlining: a filter pushed below the projection re-inlines the whole
  * tree, and a resolve nested inside another resolve (the `<base href>`
  * case) squares the node count — measured 35 s for a 45k-row pure map
  * at sf0.1, with the stage dropping out of whole-stage codegen. This
  * expression is the custom-`Expression` slot of that operator: ONE
  * compiled method per row, patterns compiled once per JVM, immune to
  * inlining because it IS one node.
  *
  * Semantics are the SAME bounded-pass regex chain the DuckDB oracle
  * replays (`UrlOps.resolveSql`) — the patterns and pass counts below
  * are copied verbatim, so `q_link_resolve`'s hash check grades this
  * implementation against the independent SQL replay.
  */
object UrlResolver {

  private val SchemeHost =
    Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*")
  private val SchemeAbs = Pattern.compile("^[a-zA-Z][a-zA-Z0-9+.-]*://")
  private val HttpAbs = Pattern.compile("^[hH][tT][tT][pP][sS]?://")
  private val SchemeOnly = Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*):")
  private val LastSegment = Pattern.compile("[^/]*$")
  // the bounded dot-segment passes — SAME patterns and counts as
  // resolveSql (4× `./`, 8× `segment/../`, 4× leading-`/../` clamp)
  private val Dot = Pattern.compile("/\\.(/|$)")
  private val Up = Pattern.compile("/[^/]+/\\.\\.(/|$)")
  private val Clamp = Pattern.compile("^/\\.\\.(/|$)")

  /** Spark/DuckDB `trim` removes only the SPACE character — Java's
    * String.trim also strips controls, which would diverge from the
    * oracle on a tab-carrying href. */
  private def trimSpaces(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  /** Resolve `href` against `base`; null = not fetchable (empty, bare
    * fragment, non-http(s) scheme). */
  def resolve(base: String, href0: String): String = {
    val h = trimSpaces(href0)
    if (h.isEmpty || h.startsWith("#")) return null
    val resolved0: String =
      if (SchemeAbs.matcher(h).find()) {
        if (HttpAbs.matcher(h).find()) h else return null
      } else if (SchemeOnly.matcher(h).find()) {
        return null // mailto:, javascript:, data:, tel:, …
      } else {
        val om = SchemeHost.matcher(base)
        val origin = if (om.find() && om.start == 0) om.group() else ""
        if (h.startsWith("//")) {
          val sm = SchemeOnly.matcher(base)
          val scheme = if (sm.find() && sm.start == 0) sm.group(1) else ""
          scheme + ":" + h
        } else if (h.startsWith("/")) {
          origin + h
        } else {
          val rest = base.substring(origin.length)
          val cut = {
            val q = rest.indexOf('?'); val f = rest.indexOf('#')
            if (q < 0 && f < 0) rest.length
            else if (q < 0) f else if (f < 0) q else math.min(q, f)
          }
          val basePath = rest.substring(0, cut)
          val baseDir =
            if (basePath.isEmpty) "/"
            else LastSegment.matcher(basePath).replaceFirst("")
          origin + baseDir + h
        }
      }
    // split origin / path / query+fragment, collapse dots in the PATH
    val om2 = SchemeHost.matcher(resolved0)
    val origin2 = if (om2.find() && om2.start == 0) om2.group() else ""
    val rest2 = resolved0.substring(origin2.length)
    val cut2 = {
      val q = rest2.indexOf('?'); val f = rest2.indexOf('#')
      if (q < 0 && f < 0) rest2.length
      else if (q < 0) f else if (f < 0) q else math.min(q, f)
    }
    var p = rest2.substring(0, cut2)
    val tail = rest2.substring(cut2)
    var i = 0
    while (i < 4) { p = Dot.matcher(p).replaceAll("/"); i += 1 }
    i = 0
    while (i < 8) { p = Up.matcher(p).replaceAll("/"); i += 1 }
    i = 0
    while (i < 4) { p = Clamp.matcher(p).replaceAll("/"); i += 1 }
    origin2 + p + tail
  }
}

/** `url_resolve(base, href)` → resolved URL string, null when the href
  * is not fetchable (see [[UrlResolver.resolve]]). */
case class UrlResolve(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "url_resolve"

  override protected def nullSafeEval(base: Any, href: Any): Any = {
    val r = UrlResolver.resolve(base.toString, href.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => {
      s"""
         |String r = graft.plans.UrlResolver.resolve($b.toString(), $h.toString());
         |${ev.value} = r == null ? null :
         |  org.apache.spark.unsafe.types.UTF8String.fromString(r);
         |${ev.isNull} = ${ev.value} == null;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UrlResolve =
    copy(left = newLeft, right = newRight)
}

/** RFC 3986 §6.2.2.2 percent-encoding normalization — the URL-identity
  * rule [[graft.operators.UrlOps.canon]] runs before its other rules:
  *
  *  - an escape of an UNRESERVED character (ALPHA / DIGIT / `-` / `.` /
  *    `_` / `~`) decodes: `%41` → `A`, `%7E` → `~` — the two spellings
  *    are the same URL and producers differ on which they emit;
  *  - every OTHER valid escape keeps its encoding with the hex digits
  *    uppercased (§6.2.2.1): `%2f` → `%2F` — and crucially `%2F` never
  *    becomes `/` (it is data, not a path delimiter);
  *  - a STRAY `%` (one that does not head a valid escape — `%G1`, a
  *    trailing `%4`, a bare `%`) re-encodes as `%25`, its own escape.
  *    This is what makes the pass a true FIXPOINT: the old verbatim
  *    pass-through let a stray `%` capture digits freed by a later
  *    decode (`%%341` → `%41`, which a second pass turned into `A`),
  *    so canonical identity was not stable under re-canonicalization
  *    (frontier output fed back through ingest could shift doc_ids).
  *    After this pass no literal `%` survives: every output `%` heads
  *    a kept escape whose value is non-unreserved, so a re-pass maps
  *    each escape to itself and the output is a fixpoint (property-
  *    checked with the `%%XY` counterexample shapes in
  *    OperatorPropertySpec).
  *
  * Single left-to-right pass; decoded output is never rescanned (so
  * `%2541` → `%41` literal, not `A` — the entity-decode discipline).
  * The DuckDB twin ([[graft.operators.UrlOps.pctSql]]) replays the same
  * semantics via the split/extract interleave over `%([0-9A-Fa-f]{2})`
  * with stray `%`s in the literal runs replaced by `%25`.
  */
object PctCodec {

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  private def hv(c: Char): Int =
    if (c <= '9') c - '0' else (c | 0x20) - 'a' + 10

  private def unreserved(n: Int): Boolean =
    (n >= 'A' && n <= 'Z') || (n >= 'a' && n <= 'z') ||
      (n >= '0' && n <= '9') ||
      n == '-' || n == '.' || n == '_' || n == '~'

  def normalize(s: String): String = {
    if (s.indexOf('%') < 0) return s // common case: no escapes at all
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val n = hv(s.charAt(i + 1)) * 16 + hv(s.charAt(i + 2))
        if (unreserved(n)) b.append(n.toChar)
        else {
          b.append('%')
          b.append(Character.toUpperCase(s.charAt(i + 1)))
          b.append(Character.toUpperCase(s.charAt(i + 2)))
        }
        i += 3
      } else {
        // a stray '%' re-encodes as its own escape — the fixpoint rule
        if (c == '%') b.append("%25") else b.append(c)
        i += 1
      }
    }
    b.toString
  }
}

/** IDN (internationalized domain name) HOST normalization — the last
  * URL-identity rule: `http://bücher.example/x` and
  * `http://xn--bcher-kva.example/x` are the SAME origin (RFC 3490: the
  * wire form of a Unicode host is its Punycode ACE encoding), so a
  * fetch-log identity must unify them or every IDN site splits in two.
  *
  *  - only the HOST converts (userinfo/port preserved; path/query/
  *    fragment untouched — non-ASCII there is data, handled by the
  *    percent/charset layers);
  *  - an all-ASCII host passes through UNTOUCHED (case included —
  *    [[graft.operators.UrlOps.canon]]'s lowercase runs after);
  *  - conversion is the JDK's RFC 3490 ToASCII (`java.net.IDN`,
  *    ALLOW_UNASSIGNED — a crawl sees tomorrow's scripts); a host it
  *    rejects (empty/overlong labels, bidi violations) passes through
  *    verbatim — the rule stays total over crawl garbage, and the
  *    un-convertible spelling still gets a stable identity.
  *
  * NO cross-engine twin exists (DuckDB has no Punycode), so this rule
  * lives in the REAL-FACE identity ([[graft.operators.UrlOps.canonIdn]]
  * — the WARC ingest path) and NOT in the oracle-shared [[graft.operators.UrlOps.canon]];
  * its correctness authority is the spec against RFC 3492 §7.1-style
  * published vectors (bücher→xn--bcher-kva, münchen→xn--mnchen-3ya).
  */
object IdnCodec {

  private val SchemeHost =
    Pattern.compile("^([a-zA-Z][a-zA-Z0-9+.-]*://)([^/?#]*)(.*)$", Pattern.DOTALL)

  private def hasNonAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return true
      i += 1
    }
    false
  }

  def normalizeHost(url: String): String = {
    val m = SchemeHost.matcher(url)
    if (!m.matches()) return url
    val authority = m.group(2)
    if (!hasNonAscii(authority)) return url
    // split authority: [userinfo@]host[:port] — convert the host only
    val at = authority.indexOf('@')
    val userinfo = if (at >= 0) authority.substring(0, at + 1) else ""
    val hostPort = authority.substring(at + 1)
    val colon = hostPort.lastIndexOf(':')
    // RFC 3986 ports are ASCII digits ONLY — Character.isDigit accepts
    // Unicode digits, which would split a non-ASCII trailing segment
    // off as a "port" and leave the authority partially unconverted
    val (host, port) =
      if (colon >= 0 &&
        hostPort.substring(colon + 1).forall(c => c >= '0' && c <= '9'))
        (hostPort.substring(0, colon), hostPort.substring(colon))
      else (hostPort, "")
    if (!hasNonAscii(host)) return url
    val ace =
      try java.net.IDN.toASCII(host, java.net.IDN.ALLOW_UNASSIGNED)
      catch { case scala.util.control.NonFatal(_) => host }
    m.group(1) + userinfo + ace + port + m.group(3)
  }
}

/** `idn_host(string)` → URL with a Unicode host converted to its
  * Punycode ACE form (see [[IdnCodec]]). Null in → null out; never
  * fails. */
case class IdnHostNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "idn_host"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      IdnCodec.normalizeHost(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.IdnCodec.normalizeHost($c.toString()));
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): IdnHostNormalize =
    copy(child = newChild)
}

/** `pct_normalize(string)` → string with percent-encodings normalized
  * (see [[PctCodec]]). Null in → null out; never fails. */
case class PctNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "pct_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      PctCodec.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  graft.plans.PctCodec.normalize($c.toString()));
         |""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PctNormalize =
    copy(child = newChild)
}
