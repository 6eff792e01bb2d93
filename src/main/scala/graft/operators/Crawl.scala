package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-politeness + frontier discovery — the two steps that close the
  * crawl loop the round-10 estate built (WARC fetch → HTML extraction →
  * link extraction → THIS → back to fetch):
  *
  *  - [[robotsFilter]]: robots.txt semantics over per-host rule sets —
  *    LONGEST-MATCH-WINS with Allow overriding Disallow at equal-or-
  *    longer prefixes (the Googlebot/RFC 9309 rule, not first-match);
  *    rules match against the PATH + QUERY (RFC 9309's match target),
  *    one convention shared by every matcher in this file;
  *  - [[frontier]]: the not-yet-fetched, robots-allowed outlink set
  *    with referrer counts — what the scheduler actually enqueues.
  *
  * Rules are synthesized deterministically per host from the source
  * name (both engines derive the same table), so both queries are fully
  * hash-checked; the URL and link universes are the SHARED builders
  * ([[UrlOps.urlUniverseSql]], [[HtmlOps.linkUniverseSql]]) — no oracle
  * carries a private copy that could drift. Scale shapes: rules are
  * KBs → broadcast; the frontier anti-join keys on the canonical URL
  * (the fetch log's identity, so the join is exact, not heuristic). */
object CrawlOps {

  /** Per-host synthetic rule set: Disallow `/docs/<d>` (d = source idx
    * mod 10 — a digit prefix, so it blocks ~11 of the 100 paths) and
    * Allow `/docs/<d>3` (longer → re-allows one blocked path, which is
    * exactly the precedence case worth testing). */
  private[graft] def rulesOf(documents: DataFrame): DataFrame = {
    val d = expr("CAST(substr(source, 4, 10) AS INT) % 10").cast("string")
    documents.select(col("source")).distinct()
      .select(col("source"), explode(array(
        struct(concat(lit("/docs/"), d).as("prefix"), lit(false).as("allow")),
        struct(concat(lit("/docs/"), d, lit("3")).as("prefix"),
          lit(true).as("allow")))).as("r"))
      .select(col("source"), col("r.prefix").as("prefix"),
        col("r.allow").as("allow"))
  }

  /** Split a canonical URL frame into (…, source, path) — `path`
    * includes any surviving query (the RFC 9309 match target), so every
    * matcher built on these parts agrees by construction. */
  private def withParts(urls: DataFrame): DataFrame =
    urls
      .withColumn("source",
        regexp_extract(col("canon_url"), "^[a-z]+://([^./]+)\\.", 1))
      .withColumn("path",
        regexp_replace(col("canon_url"), "^[a-z]+://[^/?#]*", ""))

  /** The rule match shared by [[robotsFilter]] and [[frontierCore]]:
    * longest matching prefix per URL via a partial-aggregatable
    * struct-max (no window), unmatched → null `m`. Input needs
    * (canon_url, source, path) + any carry columns in `carry`. */
  private def matchRules(parts: DataFrame, rules: DataFrame,
                         carry: Seq[String]): DataFrame =
    parts
      .join(broadcast(rules),
        parts("source") === rules("source") &&
          col("path").startsWith(col("prefix")), "left")
      .groupBy((col("canon_url") +: carry.map(col)): _*)
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("l"), col("allow").as("allow"),
          col("prefix").as("prefix")))).as("m"))

  /** §2-125 `q_robots_filter`: every canonical URL in the fetch-log
    * universe ([[UrlOps.canonUrls]] — the distinct-set form, none of
    * urlDedup's accounting aggregates) against its host's rules —
    * longest matching prefix decides, Allow wins if it carries,
    * unmatched URLs default allowed. Output (canon_url, rule_prefix,
    * allowed). ONE broadcast join + ONE url-keyed argmax. */
  def robotsFilter(documents: DataFrame): DataFrame =
    matchRules(withParts(UrlOps.canonUrls(documents)),
      rulesOf(documents), Seq.empty)
      .select(col("canon_url"),
        col("m.prefix").as("rule_prefix"),
        coalesce(col("m.allow"), lit(true)).as("allowed"))
      .orderBy("canon_url")

  /** §2-126 `q_frontier`: the crawl scheduler's enqueue set — distinct
    * robots-ALLOWED outlinks ([[HtmlOps.linkExtract]]'s universe) that
    * are NOT in the fetch log (the synthetic log = canonical URLs with
    * path id < 50), with referrer counts for prioritization. Outlink
    * agg is one (url) shuffle; rules broadcast; the fetch-log anti-join
    * keys on the canonical URL. */
  def frontier(documents: DataFrame): DataFrame = {
    val links = HtmlOps.linkExtract(documents)
      .groupBy(col("dst_url").as("canon_url"))
      .agg(countDistinct(col("doc_id")).as("n_referrers"))
    val fetched = UrlOps.canonUrls(documents)
      .filter(expr("CAST(regexp_extract(canon_url, '/docs/([0-9]+)$', 1) AS INT) < 50"))
    frontierCore(links, rulesOf(documents), fetched)
      .orderBy("canon_url")
  }

  /** The frontier computation proper, over ANY (canon_url, n_referrers)
    * link frame + rule set + fetch log — shared by the batch query and
    * [[frontierStream]] so the two cannot drift. */
  private[graft] def frontierCore(links: DataFrame, rules: DataFrame,
                                  fetched: DataFrame): DataFrame =
    matchRules(withParts(links), rules, Seq("n_referrers"))
      .filter(coalesce(col("m.allow"), lit(true)))
      .join(fetched.select(col("canon_url")), Seq("canon_url"), "left_anti")
      .select(col("canon_url"), col("n_referrers"))

  /** §2-C `frontierStream`: live frontier DISCOVERY — each micro-batch
    * of fetched documents yields its outlinks, politeness-filters them,
    * and anti-joins the PERSISTED fetch log (a thunk, so the log the
    * scheduler just appended to is live next trigger — the unified
    * static-side convention). Emits per-trigger discoveries; CROSS-batch
    * dedup is the fetch log's job (the scheduler records enqueues), not
    * stream state — that keeps this operator stateless. */
  def frontierStream(docs: DataFrame, rules: () => DataFrame,
                     fetched: () => DataFrame)
                    (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          val links = HtmlOps.linkExtract(batch)
            .groupBy(col("dst_url").as("canon_url"))
            .agg(countDistinct(col("doc_id")).as("n_referrers"))
          sink(frontierCore(links, rules(), fetched()), id)
      }
      .start()

  private def rulesSql: String =
    """rules AS (
      |  SELECT source, r.prefix, r.allow
      |  FROM (SELECT DISTINCT source FROM documents)
      |  CROSS JOIN LATERAL (
      |    SELECT '/docs/' || CAST(CAST(substr(source, 4, 10) AS INT) % 10 AS VARCHAR) AS prefix, FALSE AS allow
      |    UNION ALL
      |    SELECT '/docs/' || CAST(CAST(substr(source, 4, 10) AS INT) % 10 AS VARCHAR) || '3', TRUE
      |  ) r
      |)""".stripMargin

  /** `urls (canon_url)` + `parts (canon_url, source, path)` over the
    * SHARED url universe CTE. */
  private def partsSql: String =
    s"""urls AS (
       |  SELECT DISTINCT ${UrlOps.canonSql("url")} AS canon_url FROM u
       |), parts AS (
       |  SELECT canon_url,
       |    regexp_extract(canon_url, '^[a-z]+://([^./]+)\\.', 1) AS source,
       |    regexp_replace(canon_url, '^[a-z]+://[^/?#]*', '') AS path
       |  FROM urls
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_robots_filter" ->
      s"""WITH ${UrlOps.urlUniverseSql},
         |$partsSql,
         |$rulesSql,
         |matched AS (
         |  SELECT p.canon_url, r.prefix, r.allow,
         |    ROW_NUMBER() OVER (PARTITION BY p.canon_url
         |      ORDER BY length(r.prefix) DESC, r.allow DESC) AS rk
         |  FROM parts p JOIN rules r
         |    ON p.source = r.source
         |   AND substr(p.path, 1, length(r.prefix)) = r.prefix
         |)
         |SELECT p.canon_url,
         |  m.prefix AS rule_prefix,
         |  COALESCE(m.allow, TRUE) AS allowed
         |FROM parts p LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m
         |  ON m.canon_url = p.canon_url
         |ORDER BY p.canon_url""".stripMargin,
    "q_frontier" ->
      s"""WITH ${HtmlOps.linkUniverseSql}, links AS (
         |  SELECT ${UrlOps.canonSql("href")} AS canon_url,
         |    COUNT(DISTINCT doc_id) AS n_referrers
         |  FROM raw_links
         |  GROUP BY 1
         |), lparts AS (
         |  SELECT canon_url, n_referrers,
         |    regexp_extract(canon_url, '^[a-z]+://([^./]+)\\.', 1) AS source,
         |    regexp_replace(canon_url, '^[a-z]+://[^/?#]*', '') AS path
         |  FROM links
         |),
         |$rulesSql,
         |matched AS (
         |  SELECT p.canon_url, r.allow,
         |    ROW_NUMBER() OVER (PARTITION BY p.canon_url
         |      ORDER BY length(r.prefix) DESC, r.allow DESC) AS rk
         |  FROM lparts p JOIN rules r
         |    ON p.source = r.source
         |   AND substr(p.path, 1, length(r.prefix)) = r.prefix
         |),
         |allowed AS (
         |  SELECT p.canon_url, p.n_referrers
         |  FROM lparts p LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m
         |    ON m.canon_url = p.canon_url
         |  WHERE COALESCE(m.allow, TRUE)
         |),
         |${UrlOps.urlUniverseSql},
         |fetched AS (
         |  SELECT DISTINCT ${UrlOps.canonSql("url")} AS canon_url FROM u
         |  WHERE CAST(regexp_extract(${UrlOps.canonSql("url")}, '/docs/([0-9]+)$$', 1) AS INT) < 50
         |)
         |SELECT a.canon_url, a.n_referrers
         |FROM allowed a
         |WHERE a.canon_url NOT IN (SELECT canon_url FROM fetched)
         |ORDER BY a.canon_url""".stripMargin
  )
}
