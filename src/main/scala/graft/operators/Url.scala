package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the C4/CCNet FIRST-pass
  * dedup key of a crawl pipeline, run before any content hash exists:
  * lowercase scheme/host, strip the fragment, the default port, and
  * tracking query params, collapse duplicate path slashes, strip the
  * trailing slash. Two fetches of the same page under cosmetically
  * different URLs collapse to one canonical identity.
  *
  * Everything is pure row-level string work in the Java ≡ RE2 regex
  * subset (char classes, anchors, alternations with distinct literal
  * heads), so `q_url_dedup` is fully hash-checked: the oracle replays
  * the same canonicalization rules (replacement backref syntax differs
  * per engine — `$1` vs `\1` — the SEMANTICS are identical).
  *
  * Not a reference capability (the reference has no crawl side) — the
  * natural companion of [[graft.sources.WarcSource]] /
  * [[HtmlOps.warcToDocuments]] in the pipeline estate.
  */
object UrlOps {

  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
  private val Tracking = "[?&](utm_[a-z0-9_]*|gclid|fbclid)=[^&#]*"

  /** RFC 3986 §6.2.2.2 percent-encoding normalization as a Column —
    * the native single-pass [[graft.plans.PctNormalize]] built directly
    * (no registry lookup, so [[canon]] stays a drop-in pure-Column
    * function for sessions that never called GraftFunctions.register).
    * Runs FIRST in [[canon]]: decoding an unreserved escape can never
    * produce a delimiter (`/ ? # & %` are all reserved or non-unreserved),
    * so every later rule — fragment strip, slash collapse, tracking
    * strip, the RFC 9309 path match downstream — composes safely over
    * the normalized spelling. */
  private[graft] def pctNormalize(c: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.PctNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(c)))

  /** The DuckDB twin of [[graft.plans.PctCodec.normalize]] over an
    * expression `e` — the split/extract interleave (literal runs never
    * rescanned, the single-pass semantics): unreserved escapes decode,
    * all other valid escapes keep `%` + UPPERCASED hex, and stray `%`s
    * riding the literal runs re-encode as `%25` (the fixpoint rule —
    * a stray `%` is exactly a `%` in a literal run, since every valid
    * escape was split out). */
  private[graft] def pctSql(e: String): String = {
    val re = "'%([0-9A-Fa-f]{2})'"
    val parts0 = s"regexp_split_to_array($e, $re)"
    val parts = s"list_transform($parts0, p -> replace(p, '%', '%25'))"
    val ents = s"regexp_extract_all($e, $re, 1)"
    val h = s"$ents[CAST(i AS INT)]"
    val n = s"CAST(('0x' || $h) AS INT)"
    val dec = s"CASE WHEN ($n >= 65 AND $n <= 90) OR ($n >= 97 AND $n <= 122)" +
      s" OR ($n >= 48 AND $n <= 57) OR $n IN (45, 46, 95, 126)" +
      s" THEN chr($n) ELSE '%' || upper($h) END"
    s"""array_to_string(list_transform(
       |    generate_series(1, len($parts)),
       |    i -> $parts[CAST(i AS INT)] ||
       |      CASE WHEN CAST(i AS INT) >= len($parts) THEN '' ELSE $dec END),
       |    '')""".stripMargin
  }

  /** The canonicalization as ONE DuckDB SQL expression over `u` — the
    * single source of truth every oracle that canonicalizes builds on
    * (q_url_dedup, q_link_extract), so the SQL face cannot drift from
    * [[canon]] rule by rule. Subexpressions repeat rather than CTE —
    * correctness over elegance; the oracle runs once per verify. */
  private[graft] def canonSql(u: String): String = {
    // percent-encoding normalization FIRST (RFC 3986 §6.2.2.2) — every
    // later rule sees the one true spelling; the no-scheme passthrough
    // below stays the RAW trimmed string (quarantine keeps evidence)
    val norm = s"(${pctSql(s"trim($u)")})"
    val pre0 = s"lower(regexp_extract($norm, '$SchemeHost', 0))"
    val rest0 = s"regexp_replace($norm, '$SchemeHost', '')"
    val pre = s"regexp_replace(regexp_replace($pre0, '^(http://.*):80$$', " +
      s"'\\1'), '^(https://.*):443$$', '\\1')"
    val noFrag = s"regexp_replace($rest0, '(?s)#.*', '')"
    val path = s"regexp_replace(regexp_replace(regexp_extract($noFrag, " +
      s"'^[^?]*', 0), '/{2,}', '/', 'g'), '/+$$', '')"
    val query = s"regexp_replace(regexp_replace(regexp_replace($noFrag, " +
      s"'^[^?]*', ''), '$Tracking', '', 'g'), '^&', '?')"
    s"CASE WHEN $pre0 = '' THEN trim($u) ELSE $pre || $path || $query END"
  }

  /** Canonical form of a URL column. A string with no `scheme://host`
    * prefix is returned trimmed-only (not a fetchable URL — callers
    * route those to quarantine, the rule stays total and deterministic). */
  def canon(url: Column): Column = {
    val raw = trim(url)
    // percent-encoding normalization first — see [[pctNormalize]]
    val u = pctNormalize(raw)
    val pre0 = lower(regexp_extract(u, SchemeHost, 0))
    // default ports carry no information: http://h:80 ≡ http://h
    val pre = regexp_replace(
      regexp_replace(pre0, "^(http://.*):80$", "$1"),
      "^(https://.*):443$", "$1")
    val rest0 = regexp_replace(u, SchemeHost, "")
    val noFrag = regexp_replace(rest0, "(?s)#.*", "")
    // split path/query at the ORIGINAL '?' FIRST — a literal '&' in the
    // path is a legal RFC 3986 character and must never be mistaken for
    // a parameter delimiter (the delimiter repair below runs on the
    // query string alone, where '&' genuinely delimits)
    val path = regexp_replace(
      regexp_replace(regexp_extract(noFrag, "^[^?]*", 0), "/{2,}", "/"),
      "/+$", "")
    val query0 = regexp_replace(noFrag, "^[^?]*", "")
    // drop tracking params (with their delimiter); if the removed pair
    // held the '?', promote the now-leading '&' back to '?'
    val query = regexp_replace(
      regexp_replace(query0, Tracking, ""), "^&", "?")
    when(pre0 === "", raw).otherwise(concat(pre, path, query))
  }

  /** The REAL-FACE canonical identity: [[canon]] plus IDN host
    * normalization ([[graft.plans.IdnCodec]] — `http://bücher.example/`
    * and `http://xn--bcher-kva.example/` are one origin and must be one
    * fetch-log row). IDN runs FIRST (its ACE output is plain ASCII that
    * every later rule handles; canon's host-lowercase covers the
    * ASCII-case residue). This face is what the WARC ingest path keys
    * on; the oracle-shared [[canon]] deliberately EXCLUDES the IDN rule
    * — DuckDB has no Punycode, and the synthetic universes are
    * ASCII-host by construction, so the twin would be untestable there.
    * Correctness authority: the RFC 3492-vector spec. Registration-free
    * like [[pctNormalize]]. */
  def canonIdn(url: Column): Column =
    canon(org.apache.spark.sql.GraftColumnBridge.column(
      graft.plans.IdnHostNormalize(
        org.apache.spark.sql.GraftColumnBridge.expression(trim(url)))))

  /** SURT — the Sort-friendly URI Reordering Transform, the key the
    * public Common Crawl/Wayback CDX indexes sort and prefix-query by:
    * `com,example)/path?a=1`. Host labels reverse (comma-joined) so one
    * registrable domain's captures are CONTIGUOUS under a range scan —
    * at 100 TB that is the difference between "all of example.com" as
    * one sorted-index prefix seek and a full-index predicate scan.
    * Rules (the IA default-canonicalizer subset, documented choices):
    * whole URL lowercased; userinfo dropped; default port dropped
    * (80/http, 443/https), NON-default ports kept as `host:port)`;
    * one leading `www\d*.` label stripped (the IA rule — example.com
    * and www.example.com interleave); empty path → `/`; query kept
    * with `&`-split params SORTED (the IA argument reorder); fragment
    * dropped. A url with no scheme://host yields NULL. Pure builtin
    * expression — no UDF, fuses into the scan. */
  def surt(url: Column): Column = {
    val u = lower(trim(url))
    val scheme = regexp_extract(u, "^([a-z][a-z0-9+.-]*)://", 1)
    val auth = regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    val hostPort = element_at(split(auth, "@"), -1) // userinfo drops
    val port = regexp_extract(hostPort, ":(\\d+)$", 1)
    val keepPort = when(port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443"),
      concat(lit(":"), port)).otherwise(lit(""))
    val host = regexp_replace(
      regexp_replace(hostPort, ":\\d+$", ""), "^www\\d*\\.", "")
    val rev = array_join(reverse(split(host, "\\.")), ",")
    val path0 = regexp_extract(u, "^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = regexp_extract(u, "^[^#]*\\?([^#]*)", 1)
    val qSorted = when(q =!= "",
      concat(lit("?"), array_join(array_sort(split(q, "&")), "&")))
      .otherwise(lit(""))
    when(host =!= "", concat(rev, keepPort, lit(")"), path, qSorted))
  }

  private val SchemeOnly = "^([a-zA-Z][a-zA-Z0-9+.-]*):"

  /** Resolve an href against a base URL — the RFC 3986 §5 merge a real
    * crawled page needs before its links can feed the frontier
    * ([[HtmlOps.linkExtract]]'s synthetic universe is absolute-only;
    * real pages are mostly relative):
    *
    *  - scheme-absolute hrefs pass through; NON-http(s) schemes
    *    (mailto:, javascript:, data:, tel:) resolve to NULL — they are
    *    not fetchable;
    *  - protocol-relative (`//host/x`) takes the base's scheme;
    *  - root-relative (`/x`) takes the base's origin;
    *  - plain relative merges onto the base's path DIRECTORY, then
    *    dot segments collapse (`./` removed, `segment/../` folded,
    *    leading `/../` clamps at the root — RFC 3986 §5.2.4), applied
    *    as BOUNDED regexp passes (4×`./`, 8×`../` — identical
    *    non-overlapping left-to-right semantics in Java and RE2, the
    *    [[canon]] discipline) over the PATH only (a `../` inside a
    *    query string is data, not structure);
    *  - empty hrefs and bare fragments resolve to NULL (same-page).
    *
    * Callers canon() the result — resolve() itself preserves case/
    * ports/params so the two stages stay orthogonal. [[resolveSql]] is
    * the DuckDB twin built from the same patterns.
    *
    * Implementation is the NATIVE codegen'd `url_resolve` expression
    * ([[graft.plans.UrlResolver]] — one compiled method per row, the
    * same patterns precompiled): the composed-Column form was correct
    * but Catalyst's filter pushdown re-inlined its ~25-node tree, and a
    * resolve nested inside another resolve (the `<base href>` case)
    * squared the node count — a 35 s pure map at sf0.1, fixed to
    * sub-second. Callers must have graft functions registered (every
    * query face calls [[graft.plans.GraftFunctions.register]]). */
  def resolve(base: Column, href: Column): Column =
    call_function("url_resolve", base, href)

  /** The resolution as ONE DuckDB SQL expression over base expr `b` and
    * href expr `h` — the [[canonSql]] discipline: same patterns, same
    * pass counts, so the SQL face cannot drift from [[resolve]]. */
  private[graft] def resolveSql(b: String, h0: String): String = {
    val h = s"trim($h0)"
    val origin = s"regexp_extract($b, '$SchemeHost', 0)"
    val scheme = s"regexp_extract($b, '$SchemeOnly', 1)"
    val basePath =
      s"regexp_replace(regexp_replace($b, '$SchemeHost', ''), '[?#].*', '')"
    val baseDir = s"CASE WHEN $basePath = '' THEN '/' " +
      s"ELSE regexp_replace($basePath, '[^/]*$$', '') END"
    val resolved0 =
      s"""CASE
         |  WHEN $h = '' OR $h LIKE '#%' THEN NULL
         |  WHEN regexp_matches($h, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
         |    THEN CASE WHEN regexp_matches($h, '^[hH][tT][tT][pP][sS]?://')
         |              THEN $h END
         |  WHEN regexp_matches($h, '$SchemeOnly') THEN NULL
         |  WHEN $h LIKE '//%' THEN $scheme || ':' || $h
         |  WHEN $h LIKE '/%' THEN $origin || $h
         |  ELSE $origin || ($baseDir) || $h
         |END""".stripMargin
    // inline-and-repeat (the canonSql discipline — correctness over
    // elegance; the oracle runs once per verify)
    val r0 = s"($resolved0)"
    val orig2 = s"regexp_extract($r0, '$SchemeHost', 0)"
    val rest = s"regexp_replace($r0, '$SchemeHost', '')"
    val p0 = s"regexp_extract($rest, '^[^?#]*', 0)"
    val tail = s"regexp_replace($rest, '^[^?#]*', '')"
    var p = p0
    (1 to 4).foreach(_ => p = s"regexp_replace($p, '/\\.(/|$$)', '/', 'g')")
    (1 to 8).foreach(_ =>
      p = s"regexp_replace($p, '/[^/]+/\\.\\.(/|$$)', '/', 'g')")
    (1 to 4).foreach(_ => p = s"regexp_replace($p, '^/\\.\\.(/|$$)', '/', 'g')")
    s"CASE WHEN $r0 IS NULL THEN NULL ELSE $orig2 || $p || $tail END"
  }

  /** §2-120 `q_url_dedup`: URL-level dedup over deterministic synthetic
    * crawl URLs (the corpus stores no URLs; both engines derive the same
    * messy variants — upper-cased scheme/host + default port, duplicate
    * slashes + trailing slash, tracking params, fragments — from
    * (source, doc_id)), keeping the min doc_id per canonical URL with
    * variant accounting. Exactly `q_dedup_exact`'s scale shape: pure
    * row-level canon, ONE hash shuffle on the canonical key. */
  /** URL-level dedup over an existing URL column (the general operator;
    * `q_url_dedup` instantiates it on synthetic variants): one
    * canonical identity per page, min doc_id kept, with (n_docs,
    * n_variants) accounting. Row-level canon + ONE hash shuffle. */
  def urlDedupBy(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .select(col("doc_id"), col(urlCol).as("url"))
      .select(col("doc_id"), col("url"), canon(col("url")).as("canon_url"))
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_variants"))
      .select(col("canon_url"), col("doc_id"), col("n_docs"), col("n_variants"))
      .orderBy(col("canon_url"))

  /** The synthetic messy fetch-log universe (doc_id, url) — path keyed
    * mod 100 → real collapse groups at every SF; the variant cycles on
    * the stride (div 100) so one canonical page accumulates ALL seven
    * messy forms as the corpus grows (round 15 adds the two %-spelling
    * forms: an unreserved-character escape in the path — `%64`→`d`,
    * RFC 3986 §6.2.2.2 — and a %-bearing tracking-param value, the
    * `%20`/`%2B`-in-every-real-query-string case). Shared by
    * `q_url_dedup` and the crawl estate ([[graft.operators.CrawlOps]]);
    * [[urlUniverseSql]] is its SQL twin, so no oracle carries a private
    * copy. */
  private[graft] def syntheticUrls(documents: DataFrame): DataFrame = {
    val host = concat(col("source"), lit(".example.com"))
    val pathId = (col("doc_id") % 100).cast("string")
    val v = expr("(doc_id div 100) % 7")
    val url =
      when(v === 0, concat(lit("http://"), host, lit("/docs/"), pathId))
        .when(v === 1, concat(lit("HTTP://"), upper(host), lit(":80/docs/"), pathId))
        .when(v === 2, concat(lit("http://"), host, lit("//docs//"), pathId, lit("/")))
        .when(v === 3, concat(lit("http://"), host, lit("/docs/"), pathId,
          lit("?utm_source=feed&utm_campaign=x")))
        .when(v === 4, concat(lit("http://"), host, lit("/docs/"), pathId,
          lit("#section-2")))
        .when(v === 5, concat(lit("http://"), host, lit("/%64ocs/"), pathId))
        .otherwise(concat(lit("http://"), host, lit("/docs/"), pathId,
          lit("?gclid=x%2fy%20z")))
    documents.select(col("doc_id"), url.as("url"))
  }

  /** Distinct canonical URLs of the synthetic universe — the cheap form
    * for consumers that need the URL SET only (robots/frontier): a
    * plain one-column hash distinct, none of [[urlDedup]]'s variant
    * accounting aggregates. */
  private[graft] def canonUrls(documents: DataFrame): DataFrame =
    syntheticUrls(documents)
      .select(canon(col("url")).as("canon_url"))
      .distinct()

  /** SQL twin of [[syntheticUrls]]: the `u (doc_id, url)` CTE. */
  private[graft] val urlUniverseSql: String =
    """u AS (
      |  SELECT doc_id,
      |    CASE CAST((doc_id // 100) % 7 AS INTEGER)
      |      WHEN 0 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 1 THEN 'HTTP://' || upper(source || '.example.com') || ':80/docs/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 2 THEN 'http://' || source || '.example.com//docs//' || CAST(doc_id % 100 AS VARCHAR) || '/'
      |      WHEN 3 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
      |      WHEN 4 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '#section-2'
      |      WHEN 5 THEN 'http://' || source || '.example.com/%64ocs/' || CAST(doc_id % 100 AS VARCHAR)
      |      ELSE 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?gclid=x%2fy%20z'
      |    END AS url
      |  FROM documents
      |)""".stripMargin

  def urlDedup(documents: DataFrame): DataFrame =
    urlDedupBy(syntheticUrls(documents))

  /** §2 `q_url_filter` — the URL-level curation gate (round 18; the
    * C4/RefinedWeb URL filter: real pipelines drop a page by its URL
    * BEFORE reading a byte of content): a page whose canonical HOST is
    * on the blocked-domain list (exact match or any subdomain — `d` or
    * `*.d`) or whose RAW fetch URL contains a blocked substring
    * (tracking/adult/spam markers — the published recipes match the
    * URL as fetched, case-insensitively) drops. Parameterized by the
    * caller's lists (the redact/contamination/badwords convention);
    * published blocklists ship one-entry-per-line — load them with
    * [[TextOps.readBadwords]], which reads exactly that shape.
    * Output (doc_id, host, domain_blocked, pattern_blocked, url_ok).
    * Pure row-level map, zero shuffles — the gate fuses into the fetch
    * log scan in front of every content operator. */
  def urlFilterOf(docs: DataFrame, blockedDomains: Seq[String],
                  blockedPatterns: Seq[String],
                  urlCol: String = "url"): DataFrame = {
    graft.plans.GraftFunctions.register(docs.sparkSession)
    val host = regexp_extract(canon(col(urlCol)),
      "^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
    val domBlocked = blockedDomains
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .map(d => col("host") === d || col("host").endsWith("." + d))
      .reduceOption(_ || _).getOrElse(lit(false))
    val patBlocked = blockedPatterns
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .map(p => lower(col(urlCol)).contains(p))
      .reduceOption(_ || _).getOrElse(lit(false))
    docs
      .select(col("doc_id"), col(urlCol), host.as("host"))
      .withColumn("domain_blocked", domBlocked)
      .withColumn("pattern_blocked", patBlocked)
      .select(col("doc_id"), col("host"), col("domain_blocked"),
        col("pattern_blocked"),
        (!col("domain_blocked") && !col("pattern_blocked")).as("url_ok"))
      .orderBy("doc_id")
  }

  /** [[urlFilterOf]] on the synthetic messy URL universe (the
    * `queries()` binding): two sources domain-blocked, the tracking
    * substrings `utm_`/`gclid` pattern-blocked — the raw-URL variants
    * v3/v6 carry them, so both rules genuinely bite at every SF. */
  def urlFilter(documents: DataFrame): DataFrame =
    urlFilterOf(syntheticUrls(documents),
      Seq("src3.example.com", "src7.example.com"),
      Seq("utm_", "gclid"))

  /** §2 `q_link_resolve`: [[resolve]] under the oracle — a synthetic
    * page two directories deep per doc, half the docs carrying a
    * `<base href="/based/">`, and a href set hitting every resolution
    * branch: plain relative, `./`, parent `../`, a `../../../` that
    * clamps at the root, root-relative, protocol-relative, a messy
    * absolute (upper-case + :80 + fragment — canon bites), and two
    * NULL routes (mailto:, bare fragment). Each resolved URL then
    * rides [[canon]] — the exact pipeline real crawled links take into
    * the frontier ([[HtmlOps.linksOf]] is the real-HTML face of the
    * same two stages). Pure row-level string work + ONE distinct
    * shuffle on (doc_id, url). */
  def linkResolve(documents: DataFrame): DataFrame = {
    graft.plans.GraftFunctions.register(documents.sparkSession)
    val host = concat(col("source"), lit(".example.com"))
    val page = concat(lit("http://"), host, lit("/sec/"),
      (col("doc_id") % 5).cast("string"), lit("/sub/page.html"))
    val baseHref = when(col("doc_id") % 2 === 1, lit("/based/"))
      .otherwise(lit(""))
    val effBase = when(baseHref =!= "", resolve(page, baseHref))
      .otherwise(page)
    val m = (col("doc_id") % 7).cast("string")
    val r = (col("doc_id") % 9).cast("string")
    val hrefs = array(
      concat(lit("x/"), m),
      concat(lit("../up/"), m),
      lit("./here"),
      lit("../../../deep"),
      concat(lit("/root/"), r),
      concat(lit("//"), host, lit("/proto")),
      concat(lit("HTTP://"), upper(host), lit(":80/abs#frag")),
      lit("mailto:x@y.example"),
      lit("#top"))
    // 9 resolve+canon chains per doc fuse into the scan's map stage —
    // spread a small scan before them so the regex work uses every core
    // (guide §2.5 input skew; the shuffle carries only doc_id + source)
    graft.sources.Tables.spread(documents.select(col("doc_id"), col("source")))
      .select(col("doc_id"), effBase.as("_base"), explode(hrefs).as("href"))
      .select(col("doc_id"),
        canon(resolve(col("_base"), col("href"))).as("dst_url"))
      .filter(col("dst_url").isNotNull)
      .distinct()
      .orderBy("doc_id", "dst_url")
  }

  /** §2 `q_surt`: [[surt]] under the oracle — a messy-URL universe
    * hitting every canonicalization rule (one variant per `doc_id % 6`:
    * plain; uppercase + `www.` + `:80` + mixed-case path; out-of-order
    * params + fragment; userinfo + non-default port; default-https
    * port with an EMPTY path; a `www2.` label), with the DuckDB twin
    * stating the planted expected key from the same construction
    * arithmetic — any drift in lowercasing, www/userinfo/fragment
    * stripping, port policy, label reversal, param sorting, or the
    * empty-path rule breaks the hash. Pure row-level map, zero
    * shuffles — the key computes inside the index scan it serves. */
  def surtQuery(documents: DataFrame): DataFrame = {
    val v = (col("doc_id") % 6).cast("int")
    val host = concat(col("source"), lit(".example.com"))
    val n = (col("doc_id") % 100).cast("string")
    val url = when(v === 0, concat(lit("http://"), host, lit("/docs/"), n))
      .when(v === 1,
        concat(lit("HTTP://WWW."), upper(host), lit(":80/Docs/"), n))
      .when(v === 2,
        concat(lit("http://"), host, lit("/docs/"), n, lit("?b=2&a=1#frag")))
      .when(v === 3,
        concat(lit("http://u:pw@"), host, lit(":8080/docs/"), n))
      .when(v === 4, concat(lit("https://"), host, lit(":443")))
      .otherwise(concat(lit("http://www2."), host, lit("/docs/"), n))
    documents.select(col("doc_id"), url.as("url"))
      .withColumn("surt", surt(col("url")))
      .orderBy("doc_id")
  }

  val oracles: Map[String, String] = Map(
    "q_surt" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 6 AS INTEGER)
        |      WHEN 0 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
        |      WHEN 1 THEN 'HTTP://WWW.' || upper(source || '.example.com') || ':80/Docs/' || CAST(doc_id % 100 AS VARCHAR)
        |      WHEN 2 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?b=2&a=1#frag'
        |      WHEN 3 THEN 'http://u:pw@' || source || '.example.com:8080/docs/' || CAST(doc_id % 100 AS VARCHAR)
        |      WHEN 4 THEN 'https://' || source || '.example.com:443'
        |      ELSE 'http://www2.' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
        |    END AS url,
        |    CASE CAST(doc_id % 6 AS INTEGER)
        |      WHEN 2 THEN 'com,example,' || source || ')/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?a=1&b=2'
        |      WHEN 3 THEN 'com,example,' || source || ':8080)/docs/' || CAST(doc_id % 100 AS VARCHAR)
        |      WHEN 4 THEN 'com,example,' || source || ')/'
        |      ELSE 'com,example,' || source || ')/docs/' || CAST(doc_id % 100 AS VARCHAR)
        |    END AS surt
        |  FROM documents
        |)
        |SELECT doc_id, url, surt FROM u ORDER BY doc_id""".stripMargin,
    "q_link_resolve" ->
      s"""WITH pages AS (
         |  SELECT doc_id, source,
         |    'http://' || source || '.example.com/sec/' || CAST(doc_id % 5 AS VARCHAR) || '/sub/page.html' AS page,
         |    CASE WHEN doc_id % 2 = 1 THEN '/based/' ELSE '' END AS base_href
         |  FROM documents
         |), based AS (
         |  SELECT doc_id, source,
         |    CASE WHEN base_href <> '' THEN ${resolveSql("page", "base_href")}
         |         ELSE page END AS eff_base
         |  FROM pages
         |), hrefs AS (
         |  SELECT doc_id, eff_base, unnest([
         |    'x/' || CAST(doc_id % 7 AS VARCHAR),
         |    '../up/' || CAST(doc_id % 7 AS VARCHAR),
         |    './here',
         |    '../../../deep',
         |    '/root/' || CAST(doc_id % 9 AS VARCHAR),
         |    '//' || source || '.example.com/proto',
         |    'HTTP://' || upper(source || '.example.com') || ':80/abs#frag',
         |    'mailto:x@y.example',
         |    '#top']) AS href
         |  FROM based
         |), resolved AS (
         |  SELECT doc_id, ${resolveSql("eff_base", "href")} AS rurl FROM hrefs
         |)
         |SELECT DISTINCT doc_id, ${canonSql("rurl")} AS dst_url
         |FROM resolved
         |WHERE rurl IS NOT NULL
         |ORDER BY doc_id, dst_url""".stripMargin,
    "q_url_dedup" ->
      s"""WITH $urlUniverseSql, c3 AS (
         |  SELECT doc_id, url, ${canonSql("url")} AS canon_url FROM u
         |)
         |SELECT canon_url, MIN(doc_id) AS doc_id,
         |  COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_variants
         |FROM c3
         |GROUP BY canon_url
         |ORDER BY canon_url""".stripMargin,
    "q_url_filter" ->
      s"""WITH $urlUniverseSql, j AS (
         |  SELECT d.doc_id, d.source, u.url
         |  FROM documents d JOIN u ON d.doc_id = u.doc_id
         |)
         |SELECT doc_id, source || '.example.com' AS host,
         |  source IN ('src3', 'src7') AS domain_blocked,
         |  (contains(lower(url), 'utm_') OR contains(lower(url), 'gclid'))
         |    AS pattern_blocked,
         |  NOT (source IN ('src3', 'src7') OR
         |       contains(lower(url), 'utm_') OR contains(lower(url), 'gclid'))
         |    AS url_ok
         |FROM j ORDER BY doc_id""".stripMargin
  )
}
