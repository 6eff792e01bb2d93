package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.EventCols
import graft.functions.EventCols.{d18, sql => S}

/** Core event-stream analytics (SURVEY.md §2 rows 1–4, 10, 14, 23).
  *
  * Re-expresses the reference's per-match stat pipeline
  * (reference: core/pedri_analysis.py:231-299 compute_stats_for_match,
  * 664-688 summary, 201-218 minutes_played_estimate,
  * core/pedri_analysis_extended.py:89-107 infer_attacking_direction)
  * as declarative DataFrame plans: one shuffle on the group key with
  * map-side partial aggregation, no driver-side loops. At 100 TB the
  * `events` table is date-partitioned; `to_date(ts)` group keys let the
  * scan prune partitions and AQE coalesce the post-shuffle partitions.
  */
object EventOps {

  /** §2-1 `q_event_scan`: filtered entity scan with projection + time range
    * (reference core/pedri_analysis.py:232 single-player filter,
    * find_pedri_matches_in_events.py presence scan). Filter + projection
    * both reach the parquet reader (PushedFilters / ReadSchema). */
  def eventScan(events: DataFrame, userId: Long = 42L,
                eventType: String = "click"): DataFrame = {
    // time band as TIMESTAMP_NTZ literals against the STORED ts column —
    // the range predicate reaches the parquet reader (PushedFilters:
    // GreaterThanOrEqual(ts,…)/LessThan(ts,…) → row-group/page skipping).
    val lo = java.time.LocalDateTime.parse("2024-01-10T00:00:00")
    val hi = java.time.LocalDateTime.parse("2024-01-25T00:00:00")
    events
      .filter(col("user_id") === userId && col("event_type") === eventType &&
        col("ts") >= lit(lo) && col("ts") < lit(hi))
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .orderBy("event_id")
  }

  /** §2-2 `q_match_stats`: per-(user, day) conditional aggregation — the
    * compute_stats_for_match shape: ~N counters + sums + ratios in ONE
    * aggregation pass (single shuffle, map-side partials). Counts use
    * count(CASE) (bigint in both engines); money sums go through
    * DECIMAL(18,2) so partial-agg order can't drift the double. */
  def matchStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), EventCols.day)
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        count(when(col("event_type") === "error", 1)).as("n_error"),
        count(when(col("event_type") === "signup", 1)).as("n_signup"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"),
        sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)
          .cast(d18)).cast("double").as("purchase_value"))
      .withColumn("purchase_rate", col("n_purchase") / col("n_events"))
      .withColumn("click_share", col("n_click") / col("n_events"))
      .orderBy("user_id", "day")

  /** §2-3 `q_summary`: one-row global rollup incl. weighted ratio
    * (reference core/pedri_analysis.py:664-688 — aggregate career summary
    * with possession-weighted pass%). Partial agg → single reducer; only
    * partials move. */
  def summary(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      countDistinct(EventCols.day).as("n_days"),
      sum(col("value").cast(d18)).cast("double").as("sum_value"),
      count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
      sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)
        .cast(d18)).cast("double").as("purchase_value"))
      .withColumn("purchase_share", col("n_purchase") / col("n_events"))
      .withColumn("weighted_purchase_value_share",
        col("purchase_value") / col("sum_value"))

  /** §2-4 `q_per90`: per-90 rate normalization with a clamped duration
    * estimate (reference core/pedri_analysis.py:201-218: minutes from the
    * event-time span, clamped to [10, 95]). min/max/counts come out of the
    * SAME single aggregation pass as the stats; duration math is exact
    * int64 microseconds until the final division. */
  def per90(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), EventCols.day)
      .agg(
        min(EventCols.us).as("min_us"),
        max(EventCols.us).as("max_us"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
      .withColumn("minutes",
        greatest(lit(10.0), least(lit(95.0),
          (col("max_us") - col("min_us")) / 60000000.0)))
      .withColumn("click_per90", col("n_click") * 90.0 / col("minutes"))
      .withColumn("purchase_per90", col("n_purchase") * 90.0 / col("minutes"))
      .withColumn("value_per90", col("sum_value") * 90.0 / col("minutes"))
      .drop("min_us", "max_us")
      .orderBy("user_id", "day")

  /** §2-10 `q_weighted_ratio`: Σ(flagged value)/Σ(value) per segment — the
    * weighted pass-completion% shape (reference pass_pct_weighted,
    * core/pedri_analysis.py:664-688). Single agg pass. */
  def weightedRatio(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("value") > 10.0, 1)).as("n_high"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"),
        sum(when(col("value") > 10.0, col("value")).otherwise(0.0)
          .cast(d18)).cast("double").as("high_value"))
      .withColumn("high_rate", col("n_high") / col("n"))
      .withColumn("weighted_high_share", col("high_value") / col("sum_value"))
      .orderBy("event_type")

  /** §2-14 `q_direction`: per-group boolean from the sign of the mean delta
    * (reference core/pedri_analysis_extended.py:89-107
    * infer_attacking_direction: sign of mean Δx of first-half completed
    * passes). Re-expressed exactly in integers: majority vote of
    * sign(dx) — identical semantics, no float-summation-order hazard. */
  def direction(events: DataFrame): DataFrame =
    EventCols.withGeometry(
      events.filter(col("event_type") === "click" && hour(col("ts")) < 12))
      .groupBy(col("user_id"))
      .agg(
        count(when(col("dx") > 0.0, 1)).as("n_right"),
        count(when(col("dx") < 0.0, 1)).as("n_left"))
      .withColumn("attacks_right", col("n_right") > col("n_left"))
      .orderBy("user_id")

  /** Value tiers for the range join: (tier, lo, hi) with value ∈ [lo, hi). */
  val Tiers: Seq[(String, Double, Double)] =
    Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e18))

  /** §2-41 `q_range_join`: band (non-equi) join of the fact stream to a
    * tiny tier dimension — the bucketing-by-range shape (histogram bins,
    * SLA bands, price tiers). The dimension is BROADCAST so the range
    * condition is evaluated map-side (BroadcastNestedLoopJoin over 3
    * rows), never a shuffle: at 100 TB this is a scan + partial agg, the
    * same cost as a CASE expression but with the dimension as data. */
  def rangeJoin(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val tiers = Tiers.toDF("tier", "lo", "hi")
    events
      .join(broadcast(tiers),
        col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("tier"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
      .orderBy("tier")
  }

  /** The pivot column domain, stated explicitly: with the values known
    * up front Spark plans ONE aggregation pass (no extra distinct-scan to
    * discover them — that discovery pass is what makes naive pivot
    * unusable at 100 TB). */
  val EventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** §2-42 `q_pivot`: long→wide — per-user event counts as one column per
    * event type. Single shuffle on user_id, map-side partials; missing
    * combinations become 0. */
  def pivotCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .select(col("user_id") +:
        EventTypes.map(t => col(t).as(s"n_$t")): _*)
      .orderBy("user_id")

  /** Approximate twin of [[summary]] for the 100 TB path.
    *
    * Exact `countDistinct` rewrites into an Expand + extra shuffle of the
    * distinct values — at 100 TB that is the query's whole cost. HLL-based
    * `approx_count_distinct` keeps the rollup a SINGLE partial-aggregated
    * pass (±~2.3% default error), which is the right trade for monitoring
    * rollups. No DuckDB oracle (approximate by design) — spec-tested
    * against the exact version instead. */
  def summaryApprox(events: DataFrame): DataFrame =
    events.agg(
      count(lit(1)).as("n_events"),
      approx_count_distinct(col("user_id")).as("n_users_approx"),
      approx_count_distinct(EventCols.day).as("n_days_approx"),
      sum(col("value").cast(d18)).cast("double").as("sum_value"))

  /** §2-23 `q_tumbling`: tumbling 1-hour window counts — the batch twin of
    * the streaming path (reference extended.py:475-517 per-match trend
    * series; here per-hour). Window start is a row-level date_trunc, then
    * one agg. */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  /** §2-46 `q_sliding`: SLIDING 2-hour windows every hour — each event
    * lands in size/slide = 2 windows (Spark's `window()` generates them
    * row-level before the agg; no self-join). The overlap factor
    * multiplies the shuffle payload by 2, which is the honest cost of
    * sliding windows at any scale — the partials are still O(windows),
    * not O(events). Batch twin of `EventStream.windowedCounts(slide=…)`. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("win"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
      .select(col("win.start").as("window_start"),
        col("win.end").as("window_end"), col("n"), col("sum_value"))
      .orderBy("window_start")

  // ------------------------------------------------------------------
  // DuckDB oracle SQL (driver hash-compares by column name — aliases
  // match the Spark output exactly; deterministic ORDER BY everywhere).
  // ------------------------------------------------------------------
  val oracles: Map[String, String] = Map(
    "q_event_scan" ->
      """SELECT event_id, ts, user_id, value
        |FROM events
        |WHERE user_id = 42 AND event_type = 'click'
        |  AND ts >= TIMESTAMP '2024-01-10 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-25 00:00:00'
        |ORDER BY event_id""".stripMargin,
    "q_match_stats" ->
      s"""SELECT user_id, ${S.day} AS day,
         |  COUNT(*) AS n_events,
         |  COUNT(*) FILTER (event_type = 'click') AS n_click,
         |  COUNT(*) FILTER (event_type = 'view') AS n_view,
         |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
         |  COUNT(*) FILTER (event_type = 'error') AS n_error,
         |  COUNT(*) FILTER (event_type = 'signup') AS n_signup,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value,
         |  (COUNT(*) FILTER (event_type = 'purchase')) / COUNT(*) AS purchase_rate,
         |  (COUNT(*) FILTER (event_type = 'click')) / COUNT(*) AS click_share
         |FROM events
         |GROUP BY user_id, ${S.day}
         |ORDER BY user_id, day""".stripMargin,
    "q_summary" ->
      s"""SELECT COUNT(*) AS n_events,
         |  COUNT(DISTINCT user_id) AS n_users,
         |  COUNT(DISTINCT ${S.day}) AS n_days,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |  COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
         |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value,
         |  (COUNT(*) FILTER (event_type = 'purchase')) / COUNT(*) AS purchase_share,
         |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
         |    / CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS weighted_purchase_value_share
         |FROM events""".stripMargin,
    "q_per90" ->
      s"""WITH a AS (
         |  SELECT user_id, ${S.day} AS day,
         |    MIN(${S.us}) AS min_us, MAX(${S.us}) AS max_us,
         |    COUNT(*) FILTER (event_type = 'click') AS n_click,
         |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |  FROM events GROUP BY user_id, ${S.day}
         |), m AS (
         |  SELECT *, greatest(CAST(10 AS DOUBLE), least(CAST(95 AS DOUBLE),
         |    (max_us - min_us) / 60000000.0)) AS minutes FROM a
         |)
         |SELECT user_id, day, n_click, n_purchase, sum_value, minutes,
         |  n_click * 90.0 / minutes AS click_per90,
         |  n_purchase * 90.0 / minutes AS purchase_per90,
         |  sum_value * 90.0 / minutes AS value_per90
         |FROM m
         |ORDER BY user_id, day""".stripMargin,
    "q_weighted_ratio" ->
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  COUNT(*) FILTER (value > 10.0) AS n_high,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(CAST(CASE WHEN value > 10.0 THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS high_value,
        |  (COUNT(*) FILTER (value > 10.0)) / COUNT(*) AS high_rate,
        |  CAST(SUM(CAST(CASE WHEN value > 10.0 THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS weighted_high_share
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q_direction" ->
      s"""${S.geo("click")}
         |SELECT user_id,
         |  COUNT(*) FILTER (dx > 0.0) AS n_right,
         |  COUNT(*) FILTER (dx < 0.0) AS n_left,
         |  (COUNT(*) FILTER (dx > 0.0)) > (COUNT(*) FILTER (dx < 0.0)) AS attacks_right
         |FROM g
         |WHERE hour(ts) < 12
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin,
    "q_range_join" -> {
      val values = Tiers.map { case (t, lo, hi) =>
        s"(${graft.functions.TextFuns.sqlLit(t)}, $lo, $hi)"
      }.mkString(", ")
      s"""SELECT tier, COUNT(*) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM events
         |JOIN (VALUES $values) AS t(tier, lo, hi)
         |  ON value >= lo AND value < hi
         |GROUP BY tier
         |ORDER BY tier""".stripMargin
    },
    "q_pivot" -> {
      val counts = EventTypes.map(t =>
        s"COUNT(*) FILTER (event_type = '$t') AS n_$t").mkString(",\n  ")
      s"""SELECT user_id,
         |  $counts
         |FROM events
         |GROUP BY user_id
         |ORDER BY user_id""".stripMargin
    },
    "q_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY date_trunc('hour', ts), event_type
        |ORDER BY hour, event_type""".stripMargin,
    "q_sliding" ->
      """SELECT date_trunc('hour', ts) - i * INTERVAL 1 HOUR AS window_start,
        |  date_trunc('hour', ts) - i * INTERVAL 1 HOUR + INTERVAL 2 HOUR AS window_end,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |CROSS JOIN (VALUES (0), (1)) AS s(i)
        |GROUP BY 1, 2
        |ORDER BY window_start""".stripMargin
  )
}
