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
    val notrack = s"regexp_replace(regexp_replace(regexp_replace($rest0, " +
      s"'(?s)#.*', ''), '$Tracking', '', 'g'), '^([^?&]*)&', '\\1?')"
    s"CASE WHEN $pre0 = '' THEN trim($u) ELSE $pre || " +
      s"regexp_replace(regexp_replace(regexp_extract($notrack, '^[^?]*', 0), " +
      s"'/{2,}', '/', 'g'), '/+$$', '') || " +
      s"regexp_replace($notrack, '^[^?]*', '') END"
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
    // drop tracking params (with their delimiter), then re-point the
    // first surviving param at '?' if the original '?' was consumed
    // `[^?&]*` pins the match to the FIRST '&' (greedy `[^?]*` would
    // repair the last one) and only when no '?' precedes it
    val noTrack = regexp_replace(
      regexp_replace(noFrag, Tracking, ""), "^([^?&]*)&", "$1?")
    val path = regexp_replace(
      regexp_replace(regexp_extract(noTrack, "^[^?]*", 0), "/{2,}", "/"),
      "/+$", "")
    val query = regexp_replace(noTrack, "^[^?]*", "")
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

  def urlDedup(documents: DataFrame): DataFrame = {
    val host = concat(col("source"), lit(".example.com"))
    // path keyed mod 100 → real collapse groups at every SF; the variant
    // cycles on the stride (div 100) so one canonical page accumulates
    // ALL five messy forms as the corpus grows
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
    urlDedupBy(documents.select(col("doc_id"), url.as("url")))
  }

  val oracles: Map[String, String] = Map(
    "q_url_dedup" ->
      s"""WITH u AS (
         |  SELECT doc_id,
         |    CASE CAST((doc_id // 100) % 5 AS INTEGER)
         |      WHEN 0 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
         |      WHEN 1 THEN 'HTTP://' || upper(source || '.example.com') || ':80/docs/' || CAST(doc_id % 100 AS VARCHAR)
         |      WHEN 2 THEN 'http://' || source || '.example.com//docs//' || CAST(doc_id % 100 AS VARCHAR) || '/'
         |      WHEN 3 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
         |      ELSE 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '#section-2'
         |    END AS url
         |  FROM documents
         |), c3 AS (
         |  SELECT doc_id, url, ${canonSql("url")} AS canon_url FROM u
         |)
         |SELECT canon_url, MIN(doc_id) AS doc_id,
         |  COUNT(*) AS n_docs, COUNT(DISTINCT url) AS n_variants
         |FROM c3
         |GROUP BY canon_url
         |ORDER BY canon_url""".stripMargin
  )
}
