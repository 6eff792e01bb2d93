package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.EventCols
import graft.functions.EventCols.{d18, sql => S}

/** Temporal operators: sessionization and time-window / key-linked
  * self-joins (SURVEY.md §2 rows 11–13).
  *
  * All three shuffle ONCE on `user_id` so the per-entity work (ordering,
  * band matching) is partition-local — the co-partitioned shape that holds
  * on a 1000-executor cluster. Time math is exact int64 microseconds.
  */
object SessionOps {

  /** Gap threshold: 4 h in microseconds. */
  val GapUs: Long = 4L * 3600 * 1000000

  /** §2-11 `q_sessionize`: gap-based sessionization via lag + running sum
    * (re-expresses the reference's event-time-span heuristics,
    * core/pedri_analysis.py:201-218, as proper sessions). One shuffle on
    * user_id; both windows share the same sort, so Spark plans a single
    * Window exchange. */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("event_id"), col("ts"), EventCols.us)
      .withColumn("new_session",
        when(col("us") - lag(col("us"), 1).over(w) > GapUs || lag(col("us"), 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** Band width for the after-window join: 6 h in microseconds. */
  val BandUs: Long = 6L * 3600 * 1000000

  /** §2-12 `q_window_after`: count events of type B within Δt after each
    * type-A event of the same entity (reference extended.py:356-384
    * pressures_after_loss: pressures within 5 s of own turnover). Here:
    * 'view' events within 6 h after each 'error'. The equi-key (user_id)
    * makes this a co-partitioned join; the time band is a partition-local
    * post-filter, so no n² blowup at scale. */
  def windowAfter(events: DataFrame): DataFrame = {
    val a = events.filter(col("event_type") === "error")
      .select(col("event_id").as("a_id"), col("user_id"), EventCols.us.as("a_us"))
    val b = events.filter(col("event_type") === "view")
      .select(col("user_id").as("b_user"), EventCols.us.as("b_us"))
    a.join(b,
        col("user_id") === col("b_user") &&
          col("b_us") > col("a_us") && col("b_us") <= col("a_us") + BandUs,
        "left")
      .groupBy(col("a_id"), col("user_id"))
      .agg(count(col("b_us")).as("n_after"))
      .orderBy("a_id")
  }

  /** §2-13 `q_key_join`: credit linker — join each type-B event to the
    * type-A event it references and credit A's owner with B's value
    * (reference extended.py:245-253 xA: shot.key_pass_id → pass, passer
    * credited with shot xG). The synthetic link key is (user_id, k); where
    * several clicks share the key, the LATEST click before the purchase
    * takes the credit — an as-of join, expressed as equi-join +
    * row_number()=1 so Catalyst keeps it a co-partitioned shuffle join. */
  def keyJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        EventCols.k.as("p_k"), EventCols.us.as("p_us"), col("value").as("p_value"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"),
        EventCols.k.as("c_k"), EventCols.us.as("c_us"))
    val asof = purchases
      .join(clicks,
        col("p_user") === col("c_user") && col("p_k") === col("c_k") &&
          col("c_us") < col("p_us"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p_id").orderBy(col("c_us").desc, col("c_id").desc)))
      .filter(col("rn") === 1)
    asof
      .groupBy(col("c_user").as("user_id"))
      .agg(
        count(lit(1)).as("n_assisted"),
        sum(col("p_value").cast(d18)).cast("double").as("xa_value"))
      .orderBy("user_id")
  }

  /** §2-43 `q_asof_join`: proper as-of join — for every purchase, the most
    * recent STRICTLY-EARLIER click by the same user (the time-series
    * enrichment Spark has no native operator for).
    *
    * Spark-first shape: NO join at all. Tag both event kinds, ONE shuffle
    * on user_id, one window sort, and `last(_, ignoreNulls)` over the
    * preceding frame carries the latest click forward. At equal
    * timestamps purchases sort BEFORE clicks (is_p DESC) so a same-
    * microsecond click is excluded — the strict `<` of the join
    * formulation. This beats the join+row_number as-of (cf. [[keyJoin]])
    * when the right side is dense: cost is O(n log n_partition) with no
    * candidate-pair blowup, and it holds at 100 TB because the window is
    * partition-local after the user_id shuffle. */
  def asofJoin(events: DataFrame): DataFrame = {
    val tagged = events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), EventCols.us,
        (col("event_type") === "purchase").as("is_p"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("us").asc, col("is_p").desc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    tagged
      .withColumn("asof_c_id",
        last(when(!col("is_p"), col("event_id")), ignoreNulls = true).over(w))
      .withColumn("asof_c_us",
        last(when(!col("is_p"), col("us")), ignoreNulls = true).over(w))
      .filter(col("is_p"))
      .select(col("event_id").as("p_id"), col("user_id"), col("asof_c_id"),
        ((col("us") - col("asof_c_us")) / 1000000.0).as("gap_sec"))
      .orderBy("p_id")
  }

  /** §2-49 `q_lag_delta`: per-event deltas vs the user's previous event
    * (time gap + value change) — the lead/lag feature-engineering shape.
    * ONE shuffle on user_id; both lags share the same window sort. Unlike
    * the other windows this one runs over RAW events — the honest cost of
    * row-level sequential features at 100 TB is exactly this one
    * co-partitioned sort, same as [[sessionize]]. */
  def lagDelta(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    events
      .select(col("user_id"), col("event_id"), EventCols.us, col("value"))
      .withColumn("gap_sec",
        (col("us") - lag(col("us"), 1).over(w)) / 1000000.0)
      .withColumn("value_delta", col("value") - lag(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("gap_sec"),
        col("value_delta"))
      .orderBy("user_id", "event_id")
  }

  /** §2-53 `q_journey`: each user-day's ORDERED event-type sequence as one
    * string — the behavioral-sequence feature (session paths for sequence
    * models). One aggregation pass: collect (us, event_id, type) structs,
    * sort INSIDE the row (array_sort on the struct's natural order — time
    * then id, deterministic), join with `->`. The shuffle carries each
    * group's struct list once; no window, no per-group sort stage. */
  def journey(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), EventCols.day, EventCols.us,
        col("event_id"), col("event_type"))
      .groupBy(col("user_id"), col("day"))
      .agg(
        count(lit(1)).as("n_events"),
        concat_ws("->", transform(
          array_sort(collect_list(struct(col("us"), col("event_id"),
            col("event_type")))),
          x => x.getField("event_type"))).as("path"))
      .orderBy("user_id", "day")

  /** Default funnel step chain (and the q_funnel oracle's contract). */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** §2-87 `q_funnel`: ordered conversion funnel over an arbitrary step
    * chain (default view → click → purchase), counting users reaching
    * each stage plus the exact summed stage-to-stage gap (int64 micros —
    * no float drift at any corpus size).
    *
    * Spark-first shape: ONE shuffle on user_id and one window sort
    * shared by every stage — no chained per-stage joins. The running min
    * of stage-1 times (`r1`) marks each stage-2 event with a stage-1
    * event strictly before it; the running min of those qualified times
    * (`r2`) marks stage 3, and so on. A stage-i event qualifies iff its
    * time exceeds the user's FIRST qualified stage-(i−1) time
    * (rᵢ₋₁ at the row < us ⟺ us > min qualified stage-(i−1) us), so the
    * window formulation computes exactly the chained-min-join semantics
    * the DuckDB oracle states — spec-asserted against an independent
    * chained-join build. At 100 TB this is the same co-partitioned sort
    * [[sessionize]] pays, vs |steps| shuffled joins for the naive
    * funnel. */
  /** Per-user first-qualifying timestamp of every funnel stage —
    * (user_id, t1..tk µs, null where the user never reached the stage).
    * The shared core of [[funnel]] (counts + summed gaps) and
    * [[funnelLatency]] (per-transition latency stats): one user_id
    * window sort feeds every chain. */
  private[graft] def funnelUserTimes(events: DataFrame,
                                     steps: Seq[String]): DataFrame = {
    // single-digit stage prefixes keep the output ordering lexicographic
    require(steps.size >= 2 && steps.size <= 9, "funnel needs 2-9 steps")
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // qᵢ = this row's us if it qualifies for stage i (its type matches
    // and some stage-(i-1)-qualified event sorts strictly earlier, via
    // the running min rᵢ₋₁); all chains share the ONE window sort.
    val base = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_id"), col("event_type"), EventCols.us)
      .withColumn("q1", when(col("event_type") === steps.head, col("us")))
    val staged = (2 to steps.size).foldLeft(
      base.withColumn("r1", min(col("q1")).over(w))) { (df, i) =>
      val qualified = df.withColumn(s"q$i",
        when(col("event_type") === steps(i - 1) &&
          col(s"r${i - 1}") < col("us"), col("us")))
      if (i < steps.size)
        qualified.withColumn(s"r$i", min(col(s"q$i")).over(w))
      else qualified
    }
    staged.groupBy(col("user_id")).agg(
      min(col("q1")).as("t1"),
      (2 to steps.size).map(i => min(col(s"q$i")).as(s"t$i")): _*)
  }

  def funnel(events: DataFrame,
             steps: Seq[String] = FunnelSteps): DataFrame = {
    val perUser = funnelUserTimes(events, steps)
    val totals =
      (1 to steps.size).map(i => count(col(s"t$i")).as(s"n$i")) ++
        (2 to steps.size).map(i =>
          coalesce(sum(col(s"t$i") - col(s"t${i - 1}")), lit(0L)).as(s"g$i"))
    val stackRows = steps.zipWithIndex.map { case (s, idx) =>
      val i = idx + 1
      val gap = if (i == 1) "CAST(0 AS BIGINT)" else s"g$i"
      s"'${i}_$s', n$i, $gap"
    }.mkString(", ")
    perUser.agg(totals.head, totals.tail: _*)
      .selectExpr(
        s"stack(${steps.size}, $stackRows) AS (stage, n_users, sum_gap_us)")
      .orderBy("stage")
  }

  /** §2-114 `q_funnel_latency`: TIME-TO-CONVERT per funnel transition —
    * for each stage i ≥ 2, over the users who completed it: how many,
    * and the sum/min/max/mean of (tᵢ − tᵢ₋₁) in µs. `q_funnel` says
    * where users drop; this says how long the survivors take — the
    * second question every funnel owner asks.
    *
    * Same ONE user_id window sort as the funnel ([[funnelUserTimes]]);
    * latencies are integer-µs sums (order-independent, exact), the mean
    * is one IEEE division on the 1-row result. A stage nobody completed
    * is all-NULL except n_users=0 — identical semantics in both
    * engines. */
  def funnelLatency(events: DataFrame,
                    steps: Seq[String] = FunnelSteps): DataFrame = {
    val perUser = funnelUserTimes(events, steps)
    val aggs = (2 to steps.size).flatMap { i =>
      val gap = col(s"t$i") - col(s"t${i - 1}")
      Seq(count(col(s"t$i")).as(s"n$i"), sum(gap).as(s"g$i"),
        min(gap).as(s"mn$i"), max(gap).as(s"mx$i"))
    }
    val stackRows = (2 to steps.size).map { i =>
      s"'${i}_${steps(i - 1)}', n$i, g$i, mn$i, mx$i"
    }.mkString(", ")
    perUser.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${steps.size - 1}, $stackRows) AS " +
        "(stage, n_users, sum_gap_us, min_gap_us, max_gap_us)")
      .withColumn("avg_gap_us",
        when(col("n_users") > 0, col("sum_gap_us") * lit(1.0) / col("n_users")))
      .orderBy("stage")
  }

  /** §2-88 `q_retention`: cohort retention — users grouped by the day of
    * their first event, counted on each later active day as an offset
    * from the cohort day.
    *
    * Spark-first shape: NO join. ONE user_id shuffle computes the
    * cohort day AND the distinct active-day set in the same partial
    * aggregation (collect_set dedups map-side, so the shuffle carries
    * per-user day SETS, not events); the explode back out is
    * O(user-days) rows into the cohorts×offsets-bounded final agg. The
    * join formulation costs two extra shuffles (the distinct + the join
    * re-partition). Per-user state is bounded by the retention horizon
    * (days, not events) — thousands at worst, regardless of corpus
    * size. */
  def retention(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), EventCols.day)
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("days"))
      .select(col("cohort_day"), explode(col("days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset_days")

  /** §2-89 `q_session_window`: gap-based sessionization via Spark's
    * NATIVE `session_window` operator — the declarative twin of the
    * lag+running-sum [[sessionize]] (which keeps the explicit session_id;
    * this one gets Spark's built-in session merge and the exact shape
    * the STREAMING path uses, see `EventStream.sessionWindowStream`).
    * Session boundary: a new session starts when the gap is ≥ the
    * threshold (the window [ts, ts+gap) is half-open), which is what the
    * oracle's `>=` flag states — note [[sessionize]] uses strict `>`, so
    * the two operators agree except at exact-gap ties. One shuffle on
    * user_id; the merge is partition-local. */
  def sessionWindow(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("ts"), EventCols.us)
      .groupBy(col("user_id"), session_window(col("ts"), "4 hours").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000.0).as("duration_sec"))
      .select(col("user_id"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_events"), col("duration_sec"))
      .orderBy("user_id", "session_start")

  val oracles: Map[String, String] = Map(
    "q_funnel" ->
      s"""WITH s1 AS (
         |  SELECT user_id, MIN(${S.us}) AS t1
         |  FROM events WHERE event_type = 'view' GROUP BY user_id
         |), s2 AS (
         |  SELECT e.user_id, MIN(${S.us}) AS t2, MIN(s1.t1) AS t1
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND ${S.us} > s1.t1
         |  GROUP BY e.user_id
         |), s3 AS (
         |  SELECT e.user_id, MIN(${S.us}) AS t3, MIN(s2.t2) AS t2
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND ${S.us} > s2.t2
         |  GROUP BY e.user_id
         |), agg AS (
         |  SELECT (SELECT COUNT(*) FROM s1) AS n1,
         |         (SELECT COUNT(*) FROM s2) AS n2,
         |         (SELECT COUNT(*) FROM s3) AS n3,
         |         (SELECT CAST(COALESCE(SUM(t2 - t1), 0) AS BIGINT) FROM s2) AS g2,
         |         (SELECT CAST(COALESCE(SUM(t3 - t2), 0) AS BIGINT) FROM s3) AS g3
         |)
         |SELECT '1_view' AS stage, n1 AS n_users,
         |       CAST(0 AS BIGINT) AS sum_gap_us FROM agg
         |UNION ALL SELECT '2_click', n2, g2 FROM agg
         |UNION ALL SELECT '3_purchase', n3, g3 FROM agg
         |ORDER BY stage""".stripMargin,
    "q_funnel_latency" ->
      s"""WITH s1 AS (
         |  SELECT user_id, MIN(${S.us}) AS t1
         |  FROM events WHERE event_type = 'view' GROUP BY user_id
         |), s2 AS (
         |  SELECT e.user_id, MIN(${S.us}) AS t2, MIN(s1.t1) AS t1
         |  FROM events e JOIN s1 ON e.user_id = s1.user_id
         |  WHERE e.event_type = 'click' AND ${S.us} > s1.t1
         |  GROUP BY e.user_id
         |), s3 AS (
         |  SELECT e.user_id, MIN(${S.us}) AS t3, MIN(s2.t2) AS t2
         |  FROM events e JOIN s2 ON e.user_id = s2.user_id
         |  WHERE e.event_type = 'purchase' AND ${S.us} > s2.t2
         |  GROUP BY e.user_id
         |), stages AS (
         |  SELECT '2_click' AS stage,
         |    (SELECT COUNT(*) FROM s2) AS n_users,
         |    (SELECT CAST(SUM(t2 - t1) AS BIGINT) FROM s2) AS sum_gap_us,
         |    (SELECT CAST(MIN(t2 - t1) AS BIGINT) FROM s2) AS min_gap_us,
         |    (SELECT CAST(MAX(t2 - t1) AS BIGINT) FROM s2) AS max_gap_us
         |  UNION ALL
         |  SELECT '3_purchase',
         |    (SELECT COUNT(*) FROM s3),
         |    (SELECT CAST(SUM(t3 - t2) AS BIGINT) FROM s3),
         |    (SELECT CAST(MIN(t3 - t2) AS BIGINT) FROM s3),
         |    (SELECT CAST(MAX(t3 - t2) AS BIGINT) FROM s3)
         |)
         |SELECT stage, n_users, sum_gap_us, min_gap_us, max_gap_us,
         |  CASE WHEN n_users > 0 THEN sum_gap_us * 1.0 / n_users END AS avg_gap_us
         |FROM stages
         |ORDER BY stage""".stripMargin,
    "q_retention" ->
      s"""WITH f AS (
         |  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
         |  FROM events GROUP BY user_id
         |), a AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         |)
         |SELECT cohort_day, date_diff('day', cohort_day, day) AS offset_days,
         |  COUNT(*) AS n_users
         |FROM a JOIN f USING (user_id)
         |GROUP BY cohort_day, offset_days
         |ORDER BY cohort_day, offset_days""".stripMargin,
    "q_session_window" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, ${S.us} AS us FROM events
         |), flagged AS (
         |  SELECT *, CASE WHEN us - lag(us) OVER w >= $GapUs
         |                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
         |), sess AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM flagged
         |)
         |SELECT user_id, MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 4 HOUR AS session_end,
         |  COUNT(*) AS n_events,
         |  (MAX(us) - MIN(us)) / 1000000.0 AS duration_sec
         |FROM sess
         |GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "q_journey" ->
      s"""SELECT user_id, ${S.day} AS day, COUNT(*) AS n_events,
         |  string_agg(event_type, '->'
         |    ORDER BY ${S.us}, event_id, event_type) AS path
         |FROM events
         |GROUP BY user_id, ${S.day}
         |ORDER BY user_id, day""".stripMargin,
    "q_lag_delta" ->
      s"""SELECT user_id, event_id,
         |  (${S.us} - lag(${S.us}) OVER w) / 1000000.0 AS gap_sec,
         |  value - lag(value) OVER w AS value_delta
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ${S.us}, event_id)
         |ORDER BY user_id, event_id""".stripMargin,
    "q_asof_join" ->
      s"""WITH t AS (
         |  SELECT user_id, event_id, ${S.us} AS us,
         |    (event_type = 'purchase') AS is_p
         |  FROM events WHERE event_type IN ('click', 'purchase')
         |), w AS (
         |  SELECT *,
         |    last_value(CASE WHEN NOT is_p THEN event_id END IGNORE NULLS)
         |      OVER win AS asof_c_id,
         |    last_value(CASE WHEN NOT is_p THEN us END IGNORE NULLS)
         |      OVER win AS asof_c_us
         |  FROM t
         |  WINDOW win AS (PARTITION BY user_id
         |                 ORDER BY us ASC, is_p DESC, event_id ASC
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |)
         |SELECT event_id AS p_id, user_id, asof_c_id,
         |  (us - asof_c_us) / 1000000.0 AS gap_sec
         |FROM w WHERE is_p
         |ORDER BY p_id""".stripMargin,
    "q_sessionize" ->
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts, ${S.us} AS us FROM events
         |), flagged AS (
         |  SELECT *, CASE WHEN us - lag(us) OVER w > $GapUs
         |                   OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
         |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
         |), sess AS (
         |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         |  FROM flagged
         |)
         |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         |  COUNT(*) AS n_events,
         |  MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  (MAX(us) - MIN(us)) / 1000000.0 AS duration_sec
         |FROM sess
         |GROUP BY user_id, session_id
         |ORDER BY user_id, session_id""".stripMargin,
    "q_window_after" ->
      s"""WITH a AS (
         |  SELECT event_id AS a_id, user_id, ${S.us} AS a_us
         |  FROM events WHERE event_type = 'error'
         |), b AS (
         |  SELECT user_id AS b_user, ${S.us} AS b_us
         |  FROM events WHERE event_type = 'view'
         |)
         |SELECT a_id, user_id, COUNT(b_us) AS n_after
         |FROM a LEFT JOIN b
         |  ON user_id = b_user AND b_us > a_us AND b_us <= a_us + $BandUs
         |GROUP BY a_id, user_id
         |ORDER BY a_id""".stripMargin,
    "q_key_join" ->
      s"""WITH p AS (
         |  SELECT event_id AS p_id, user_id AS p_user, ${S.k} AS p_k,
         |         ${S.us} AS p_us, value AS p_value
         |  FROM events WHERE event_type = 'purchase'
         |), c AS (
         |  SELECT event_id AS c_id, user_id AS c_user, ${S.k} AS c_k,
         |         ${S.us} AS c_us
         |  FROM events WHERE event_type = 'click'
         |), linked AS (
         |  SELECT p_id, c_user, p_value,
         |    row_number() OVER (PARTITION BY p_id ORDER BY c_us DESC, c_id DESC) AS rn
         |  FROM p JOIN c ON p_user = c_user AND p_k = c_k AND c_us < p_us
         |)
         |SELECT c_user AS user_id, COUNT(*) AS n_assisted,
         |  CAST(SUM(CAST(p_value AS DECIMAL(18,2))) AS DOUBLE) AS xa_value
         |FROM linked WHERE rn = 1
         |GROUP BY c_user
         |ORDER BY user_id""".stripMargin
  )
}
