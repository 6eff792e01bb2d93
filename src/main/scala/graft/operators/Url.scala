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

  /** The canonicalization as ONE DuckDB SQL expression over `u` — the
    * single source of truth every oracle that canonicalizes builds on
    * (q_url_dedup, q_link_extract), so the SQL face cannot drift from
    * [[canon]] rule by rule. Subexpressions repeat rather than CTE —
    * correctness over elegance; the oracle runs once per verify. */
  private[graft] def canonSql(u: String): String = {
    val pre0 = s"lower(regexp_extract(trim($u), '$SchemeHost', 0))"
    val rest0 = s"regexp_replace(trim($u), '$SchemeHost', '')"
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
    val u = trim(url)
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
    when(pre0 === "", u).otherwise(concat(pre, path, query))
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
    * the stride (div 100) so one canonical page accumulates ALL five
    * messy forms as the corpus grows. Shared by `q_url_dedup` and the
    * crawl estate ([[graft.operators.CrawlOps]]); [[urlUniverseSql]] is
    * its SQL twin, so no oracle carries a private copy. */
  private[graft] def syntheticUrls(documents: DataFrame): DataFrame = {
    val host = concat(col("source"), lit(".example.com"))
    val pathId = (col("doc_id") % 100).cast("string")
    val v = expr("(doc_id div 100) % 5")
    val url =
      when(v === 0, concat(lit("http://"), host, lit("/docs/"), pathId))
        .when(v === 1, concat(lit("HTTP://"), upper(host), lit(":80/docs/"), pathId))
        .when(v === 2, concat(lit("http://"), host, lit("//docs//"), pathId, lit("/")))
        .when(v === 3, concat(lit("http://"), host, lit("/docs/"), pathId,
          lit("?utm_source=feed&utm_campaign=x")))
        .otherwise(concat(lit("http://"), host, lit("/docs/"), pathId,
          lit("#section-2")))
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
      |    CASE CAST((doc_id // 100) % 5 AS INTEGER)
      |      WHEN 0 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 1 THEN 'HTTP://' || upper(source || '.example.com') || ':80/docs/' || CAST(doc_id % 100 AS VARCHAR)
      |      WHEN 2 THEN 'http://' || source || '.example.com//docs//' || CAST(doc_id % 100 AS VARCHAR) || '/'
      |      WHEN 3 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
      |      ELSE 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '#section-2'
      |    END AS url
      |  FROM documents
      |)""".stripMargin

  def urlDedup(documents: DataFrame): DataFrame =
    urlDedupBy(syntheticUrls(documents))

  val oracles: Map[String, String] = Map(
    "q_url_dedup" ->
      s"""WITH $urlUniverseSql, c3 AS (
         |  SELECT doc_id, url, ${canonSql("url")} AS canon_url FROM u
         |)
         |SELECT canon_url, MIN(doc_id) AS doc_id,
         |  COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_variants
         |FROM c3
         |GROUP BY canon_url
         |ORDER BY canon_url""".stripMargin
  )
}
