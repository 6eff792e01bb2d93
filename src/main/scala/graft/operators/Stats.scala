package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.EventCols
import graft.functions.EventCols.{d18, sql => S}

/** Statistical / viz-feeding operators (SURVEY.md §2 rows 5–9, 16, 19).
  *
  * Everything a reference figure consumes — histogram bins, heatmap cells,
  * top-N bars, percentile radars, normalized radar vectors, trend series —
  * computed as DataFrames. The heavy reduction (raw rows → per-group
  * aggregates) happens FIRST in one shuffle; the window functions then run
  * over the tiny aggregated frame (≤ users×days rows), which is the right
  * shape at 100 TB: windows never see raw events.
  */
object StatsOps {

  /** §2-5 `q_percentile`: percentile rank of each per-match value within the
    * entity's own distribution (reference core/pedri_analysis.py:488-522
    * `_percentile_rank`: mean(s <= v) * 100 ≡ cume_dist * 100). */
  def percentile(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), EventCols.day)
      .agg(count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
    val w = Window.partitionBy("user_id").orderBy("n_purchase")
    daily
      .withColumn("pct", cume_dist().over(w) * 100.0)
      .orderBy("user_id", "day")
  }

  /** §2-6 `q_topn`: top-20 groups by a metric with deterministic ties
    * (reference core/pedri_analysis.py:355-380 plot_bar top_n=20). Compiles
    * to TakeOrderedAndProject — each partition keeps 20, no global sort. */
  def topN(events: DataFrame, n: Int = 20): DataFrame =
    events
      .groupBy(col("user_id"), EventCols.day)
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0).cast(d18)).cast("double").as("purchase_value"))
      .orderBy(col("purchase_value").desc, col("user_id").asc, col("day").asc)
      .limit(n)

  /** §2-8 `q_hist1d`: fixed-width 1-D histogram (reference
    * core/pedri_analysis.py:383-395 plot_hist). Bin id is a codegen'd
    * row-level expression; the shuffle carries ≤ #bins cells. */
  def hist1d(events: DataFrame, width: Double = 20.0): DataFrame =
    events
      .groupBy(floor(col("value") / width).cast("int").as("bin"))
      .agg(count(lit(1)).as("n"))
      .withColumn("lo", col("bin") * width)
      .orderBy("bin")

  /** §2-7 `q_heatmap2d`: 2-D spatial histogram on the 120×80 pitch
    * (reference core/pedri_analysis.py:416-433 hexbin,
    * extended.py:543-585 48×32 grid). ≤ 48×32 cells regardless of input
    * size — the shuffle payload is constant. */
  def heatmap2d(events: DataFrame): DataFrame =
    EventCols.withGeometry(events.filter(col("event_type") === "click"))
      .groupBy(
        floor(col("x") / 2.5).cast("int").as("bx"),
        floor(col("y") / 2.5).cast("int").as("by"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bx", "by")

  /** §2-9 `q_trend`: 7-day moving average over each entity's ordered daily
    * series (reference extended.py:475-517 plot_trends). Runs on the
    * post-agg frame. The moving average divides two window SUMs (exact
    * bigints) so the double is order-independent. */
  def trend(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), EventCols.day)
      .agg(count(when(col("event_type") === "purchase", 1)).as("n_purchase"))
    val w = Window.partitionBy("user_id").orderBy("day").rowsBetween(-6, 0)
    daily
      .withColumn("ma7",
        sum(col("n_purchase")).over(w) / count(col("n_purchase")).over(w))
      .orderBy("user_id", "day")
  }

  /** Approximate twin of [[percentile]] for the 100 TB path: global
    * quantiles of a metric via `approx_percentile` (t-digest-style sketch)
    * — one partial-aggregated pass, no sort, no window, mergeable across
    * partitions. The exact `cume_dist` version ranks WITHIN an entity
    * (small frames); this one answers "where does a value sit in the
    * whole-population distribution" without materializing it.
    * Output is flat scalar columns (one per quantile), not an array —
    * downstream consumers (and the driver's compare) want plain cells. */
  def percentileApprox(events: DataFrame,
                       qs: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val agged = events.agg(
      percentile_approx(col("value"),
        array(qs.map(lit(_)): _*), lit(10000)).as("value_quantiles"),
      count(lit(1)).as("n"))
    // label from the FULL quantile value (0.995 → p99_5), not a rounded
    // percent — rounding made 0.995 and 1.0 collide as "p100"
    def label(q: Double): String =
      "p" + (BigDecimal(q.toString) * 100).underlying.stripTrailingZeros
        .toPlainString.replace(".", "_")
    val labels = qs.map(label)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels from $qs: $labels")
    val qCols = labels.zipWithIndex.map { case (lbl, i) =>
      col("value_quantiles").getItem(i).as(lbl)
    }
    agged.select(qCols :+ col("n"): _*)
  }

  /** §2-45 `q_topk_per_group`: top-k days per user by purchase value —
    * the GROUP-WISE top-N ([[topN]] is global). Aggregate first (one
    * shuffle), then row_number over the per-user frame: the window input
    * is users × days, never raw events, and each partition's sort is
    * local — the shape that survives 100 TB where a global sort or a
    * per-group collect would not. */
  def topKPerGroup(events: DataFrame, k: Int = 3): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), EventCols.day)
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0).cast(d18)).cast("double").as("purchase_value"))
    daily
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("purchase_value").desc, col("day").asc)))
      .filter(col("rk") <= k)
      .orderBy("user_id", "rk")
  }

  /** §2-52 `q_ntile`: decile assignment of each user's daily purchase
    * values within their own history — the quantile-bucketed feature
    * (spend-decile) shape. Window over the post-agg daily frame with a
    * FULL tie-break order (value, then day), so the NTILE assignment is
    * deterministic and engine-portable. */
  def ntileDeciles(events: DataFrame, n: Int = 10): DataFrame = {
    val daily = events
      .groupBy(col("user_id"), EventCols.day)
      .agg(sum(when(col("event_type") === "purchase", col("value"))
        .otherwise(0.0).cast(d18)).cast("double").as("purchase_value"))
    daily
      .withColumn("decile", ntile(n).over(
        Window.partitionBy("user_id")
          .orderBy(col("purchase_value").asc, col("day").asc)))
      .orderBy("user_id", "day")
  }

  /** §2-16 `q_position_counts`: most-common value per entity (mode;
    * reference core/pedri_profile.py `Counter.most_common` over positions).
    * Count-agg then a row_number over the tiny (entity × type) frame. */
  def positionCounts(events: DataFrame): DataFrame = {
    val counts = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("n").desc, col("event_type").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("top_type"), col("n"))
      .orderBy("user_id")
  }

  /** §2-19 `q_radar_norm`: min-max normalize each entity's metric vector
    * against the population ranges (reference utils/viz_radar.py
    * `_normalize_values`). The population min/max come from a 1-row global
    * aggregate broadcast back onto the per-entity frame — NOT an
    * unpartitioned window, which would funnel every row through a single
    * partition (WindowExec warns exactly about that). The
    * (v-min)/(max-min) operands are identical doubles in both engines. */
  def radarNorm(events: DataFrame): DataFrame = {
    val metrics = events
      .groupBy(col("user_id"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
    val ranges = metrics.agg(
      min("n_click").as("min_click"), max("n_click").as("max_click"),
      min("n_purchase").as("min_purchase"), max("n_purchase").as("max_purchase"),
      min("sum_value").as("min_value"), max("sum_value").as("max_value"))
    def norm(c: String, suffix: String) =
      (col(c) - col("min_" + suffix)) /
        (col("max_" + suffix) - col("min_" + suffix))
    metrics
      .crossJoin(broadcast(ranges))
      .withColumn("click_norm", norm("n_click", "click"))
      .withColumn("purchase_norm", norm("n_purchase", "purchase"))
      .withColumn("value_norm", norm("sum_value", "value"))
      .select("user_id", "click_norm", "purchase_norm", "value_norm")
      .orderBy("user_id")
  }

  /** §2-94 `q_anomaly`: each user's anomalous days — daily value sums
    * deviating more than 3σ from the user's OWN mean — flagged by an
    * INTEGER-EXACT variance test, so the statistical monitor is
    * hash-checkable: with per-day cent sums xc, n days, S = Σxc,
    * Q = Σxc², the z² > 9 test
    *     (x − μ)² > 9σ²   ⟺   (n·xc − S)² > 9·(n·Q − S²)
    * clears all denominators; every term is an exact integer (DECIMAL(38)
    * on the Spark side, HUGEINT in DuckDB), so no float rounding can
    * flip a flag on either engine. n = 1 collapses both sides to 0 > 0 —
    * never flagged, no divide-by-zero to guard.
    *
    * Scale shape: raw events reduce in ONE (user, day) shuffle; the
    * per-user moments are a window over the tiny daily frame (the
    * StatsOps contract: windows never see raw events). */
  private val d38 = "decimal(38,0)"

  /** Per-(user, day) exact cent sums — the daily frame [[anomaly]],
    * [[userMoments]], and the streaming scorer all derive from (ONE
    * definition, so batch and stream cannot disagree on what a "day
    * sum" is). DECIMAL(18,2) sum × 100 is an integer by construction. */
  def dailyCents(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), EventCols.day)
      .agg((sum(col("value").cast(d18)) * 100).cast("long").as("xc"))

  /** Per-user moments (n days, S = Σ cents, Q = Σ cents²) — what a
    * nightly batch job persists for `EventStream.anomalyStream`'s live
    * scoring. Exact integers end to end (DECIMAL(38)). */
  def userMoments(events: DataFrame): DataFrame =
    dailyCents(events)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("xc").cast(d38)).as("s"),
        sum(col("xc").cast(d38) * col("xc")).as("q"))

  /** The integer-exact 3σ test: (n·x − S)² > 9·(nQ − S²), all DECIMAL(38)
    * — shared by the batch operator and the streaming scorer. */
  def exceeds3Sigma: org.apache.spark.sql.Column = {
    val a = col("n").cast(d38) * col("xc") - col("s")
    a * a > lit(9) * (col("n").cast(d38) * col("q") - col("s") * col("s"))
  }

  def anomaly(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    dailyCents(events)
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s", sum(col("xc").cast(d38)).over(w))
      .withColumn("q",
        sum((col("xc").cast(d38) * col("xc"))).over(w))
      .filter(exceeds3Sigma)
      .select(col("user_id"), col("day"),
        (col("xc") / 100.0).as("day_sum"), col("n").as("n_days"))
      .orderBy("user_id", "day")
  }

  val oracles: Map[String, String] = Map(
    "q_anomaly" ->
      s"""WITH daily AS (
         |  SELECT user_id, ${S.day} AS day,
         |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS xc
         |  FROM events GROUP BY user_id, ${S.day}
         |), m AS (
         |  SELECT *, COUNT(*) OVER w AS n,
         |    SUM(CAST(xc AS HUGEINT)) OVER w AS s,
         |    SUM(CAST(xc AS HUGEINT) * xc) OVER w AS q
         |  FROM daily WINDOW w AS (PARTITION BY user_id)
         |)
         |SELECT user_id, day, xc / 100.0 AS day_sum, n AS n_days
         |FROM m
         |WHERE (n * CAST(xc AS HUGEINT) - s) * (n * CAST(xc AS HUGEINT) - s)
         |      > 9 * (n * q - s * s)
         |ORDER BY user_id, day""".stripMargin,
    "q_ntile" ->
      s"""WITH daily AS (
         |  SELECT user_id, ${S.day} AS day,
         |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
         |  FROM events GROUP BY user_id, ${S.day}
         |)
         |SELECT user_id, day, purchase_value,
         |  CAST(ntile(10) OVER (PARTITION BY user_id
         |    ORDER BY purchase_value ASC, day ASC) AS INTEGER) AS decile
         |FROM daily
         |ORDER BY user_id, day""".stripMargin,
    "q_topk_per_group" ->
      s"""WITH daily AS (
         |  SELECT user_id, ${S.day} AS day,
         |    CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
         |  FROM events GROUP BY user_id, ${S.day}
         |), ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY user_id
         |    ORDER BY purchase_value DESC, day ASC) AS rk
         |  FROM daily
         |)
         |SELECT user_id, day, purchase_value, CAST(rk AS INTEGER) AS rk
         |FROM ranked WHERE rk <= 3
         |ORDER BY user_id, rk""".stripMargin,
    "q_percentile" ->
      s"""WITH daily AS (
         |  SELECT user_id, ${S.day} AS day,
         |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
         |  FROM events GROUP BY user_id, ${S.day}
         |)
         |SELECT user_id, day, n_purchase,
         |  cume_dist() OVER (PARTITION BY user_id ORDER BY n_purchase) * 100.0 AS pct
         |FROM daily
         |ORDER BY user_id, day""".stripMargin,
    "q_topn" ->
      s"""SELECT user_id, ${S.day} AS day,
         |  CAST(SUM(CAST(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS purchase_value
         |FROM events
         |GROUP BY user_id, ${S.day}
         |ORDER BY purchase_value DESC, user_id ASC, day ASC
         |LIMIT 20""".stripMargin,
    "q_hist1d" ->
      """SELECT CAST(floor(value / 20.0) AS INTEGER) AS bin,
        |  COUNT(*) AS n,
        |  CAST(floor(value / 20.0) AS INTEGER) * 20.0 AS lo
        |FROM events
        |GROUP BY 1
        |ORDER BY bin""".stripMargin,
    "q_heatmap2d" ->
      s"""${S.geo("click")}
         |SELECT CAST(floor(x / 2.5) AS INTEGER) AS bx,
         |  CAST(floor(y / 2.5) AS INTEGER) AS by,
         |  COUNT(*) AS n
         |FROM g
         |GROUP BY 1, 2
         |ORDER BY bx, by""".stripMargin,
    "q_trend" ->
      s"""WITH daily AS (
         |  SELECT user_id, ${S.day} AS day,
         |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase
         |  FROM events GROUP BY user_id, ${S.day}
         |)
         |SELECT user_id, day, n_purchase,
         |  SUM(n_purchase) OVER w / COUNT(n_purchase) OVER w AS ma7
         |FROM daily
         |WINDOW w AS (PARTITION BY user_id ORDER BY day
         |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, day""".stripMargin,
    "q_position_counts" ->
      """WITH counts AS (
        |  SELECT user_id, event_type, COUNT(*) AS n
        |  FROM events GROUP BY user_id, event_type
        |), ranked AS (
        |  SELECT user_id, event_type AS top_type, n,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY n DESC, event_type ASC) AS rn
        |  FROM counts
        |)
        |SELECT user_id, top_type, n FROM ranked WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q_radar_norm" ->
      """WITH m AS (
        |  SELECT user_id,
        |    COUNT(*) FILTER (event_type = 'click') AS n_click,
        |    COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id,
        |  (n_click - MIN(n_click) OVER ()) / (MAX(n_click) OVER () - MIN(n_click) OVER ()) AS click_norm,
        |  (n_purchase - MIN(n_purchase) OVER ()) / (MAX(n_purchase) OVER () - MIN(n_purchase) OVER ()) AS purchase_norm,
        |  (sum_value - MIN(sum_value) OVER ()) / (MAX(sum_value) OVER () - MIN(sum_value) OVER ()) AS value_norm
        |FROM m
        |ORDER BY user_id""".stripMargin
  )
}
