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
  *  - [[frontier]]: the not-yet-fetched, robots-allowed outlink set
  *    with referrer counts — what the scheduler actually enqueues.
  *
  * Rules are synthesized deterministically per host from the source
  * name (both engines derive the same table), so both queries are fully
  * hash-checked. Scale shapes: rules are KBs → broadcast; the frontier
  * anti-join keys on the canonical URL (the fetch log's identity, so
  * the join is exact, not heuristic). */
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

  /** Split a canonical URL frame into (canon_url, source, path). */
  private def withParts(urls: DataFrame): DataFrame =
    urls
      .withColumn("source",
        regexp_extract(col("canon_url"), "^[a-z]+://([^./]+)\\.", 1))
      .withColumn("path",
        regexp_replace(col("canon_url"), "^[a-z]+://[^/?#]*", ""))

  /** §2-125 `q_robots_filter`: every canonical URL in the fetch-log
    * universe ([[UrlOps.urlDedup]]'s) against its host's rules —
    * longest matching prefix decides, Allow wins it carries, unmatched
    * URLs default allowed. Output (canon_url, rule_prefix, allowed).
    * ONE broadcast join + ONE url-keyed argmax (the struct-max idiom,
    * partial-aggregatable — no window). */
  def robotsFilter(documents: DataFrame): DataFrame = {
    val urls = withParts(UrlOps.urlDedup(documents).select(col("canon_url")))
    val rules = rulesOf(documents)
    urls
      .join(broadcast(rules),
        urls("source") === rules("source") &&
          substring_index(col("path"), "?", 1)
            .startsWith(col("prefix")), "left")
      .groupBy(col("canon_url"))
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("l"), col("allow").as("allow"),
          col("prefix").as("prefix")))).as("m"))
      .select(col("canon_url"),
        col("m.prefix").as("rule_prefix"),
        coalesce(col("m.allow"), lit(true)).as("allowed"))
      .orderBy("canon_url")
  }

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
    val fetched = UrlOps.urlDedup(documents)
      .select(col("canon_url"))
      .filter(expr("CAST(regexp_extract(canon_url, '/docs/([0-9]+)$', 1) AS INT) < 50"))
    frontierCore(links, rulesOf(documents), fetched)
      .orderBy("canon_url")
  }

  /** The frontier computation proper, over ANY (canon_url, n_referrers)
    * link frame + rule set + fetch log — shared by the batch query and
    * [[frontierStream]] so the two cannot drift. */
  private[graft] def frontierCore(links: DataFrame, rules: DataFrame,
                                  fetched: DataFrame): DataFrame = {
    val parts = withParts(links)
    parts
      .join(broadcast(rules),
        parts("source") === rules("source") &&
          col("path").startsWith(col("prefix")), "left")
      .groupBy(col("canon_url"), col("n_referrers"))
      .agg(max(when(col("prefix").isNotNull,
        struct(length(col("prefix")).as("l"), col("allow").as("allow")))).as("m"))
      .filter(coalesce(col("m.allow"), lit(true)))
      .join(fetched.select(col("canon_url")), Seq("canon_url"), "left_anti")
      .select(col("canon_url"), col("n_referrers"))
  }

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

  private def urlUniverseSql: String =
    s"""u AS (
       |  SELECT doc_id,
       |    CASE CAST((doc_id // 100) % 5 AS INTEGER)
       |      WHEN 0 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR)
       |      WHEN 1 THEN 'HTTP://' || upper(source || '.example.com') || ':80/docs/' || CAST(doc_id % 100 AS VARCHAR)
       |      WHEN 2 THEN 'http://' || source || '.example.com//docs//' || CAST(doc_id % 100 AS VARCHAR) || '/'
       |      WHEN 3 THEN 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '?utm_source=feed&utm_campaign=x'
       |      ELSE 'http://' || source || '.example.com/docs/' || CAST(doc_id % 100 AS VARCHAR) || '#section-2'
       |    END AS url
       |  FROM documents
       |), urls AS (
       |  SELECT DISTINCT ${UrlOps.canonSql("url")} AS canon_url FROM u
       |), parts AS (
       |  SELECT canon_url,
       |    regexp_extract(canon_url, '^[a-z]+://([^./]+)\\.', 1) AS source,
       |    regexp_replace(canon_url, '^[a-z]+://[^/?#]*', '') AS path
       |  FROM urls
       |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_robots_filter" ->
      s"""WITH $urlUniverseSql,
         |$rulesSql,
         |matched AS (
         |  SELECT p.canon_url, r.prefix, r.allow,
         |    ROW_NUMBER() OVER (PARTITION BY p.canon_url
         |      ORDER BY length(r.prefix) DESC, r.allow DESC) AS rk
         |  FROM parts p JOIN rules r
         |    ON p.source = r.source
         |   AND substr(string_split(p.path, '?')[1], 1, length(r.prefix)) = r.prefix
         |)
         |SELECT p.canon_url,
         |  m.prefix AS rule_prefix,
         |  COALESCE(m.allow, TRUE) AS allowed
         |FROM parts p LEFT JOIN (SELECT * FROM matched WHERE rk = 1) m
         |  ON m.canon_url = p.canon_url
         |ORDER BY p.canon_url""".stripMargin,
    "q_frontier" ->
      s"""WITH h AS (
         |  SELECT doc_id,
         |    '<a href="http://' || source || '.example.com/docs/' ||
         |      CAST((doc_id * 7 + 13) % 100 AS VARCHAR) || '?utm_source=page&utm_medium=m">' ||
         |    '<a href="HTTP://' || upper(source || '.example.com') || ':80/docs/' ||
         |      CAST((doc_id * 11 + 5) % 100 AS VARCHAR) || '#frag">' ||
         |    '<a href="http://' || source || '.example.com/docs/' ||
         |      CAST((doc_id * 7 + 13) % 100 AS VARCHAR) || '/">' AS html
         |  FROM documents
         |), raw_links AS (
         |  SELECT doc_id, unnest(regexp_extract_all(html, '<a href="([^"]*)"', 1)) AS href
         |  FROM h
         |), links AS (
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
         |$urlUniverseSql,
         |fetched AS (
         |  SELECT canon_url FROM urls
         |  WHERE CAST(regexp_extract(canon_url, '/docs/([0-9]+)$$', 1) AS INT) < 50
         |)
         |SELECT a.canon_url, a.n_referrers
         |FROM allowed a
         |WHERE a.canon_url NOT IN (SELECT canon_url FROM fetched)
         |ORDER BY a.canon_url""".stripMargin
  )
}
