package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference pipeline end-to-end on StatsBomb-SHAPED data.
  *
  * `graft.sources.EventsJsonSource.flatten` output is the input contract
  * here — a user of the reference pipeline points [[matchStats]] at their
  * own event JSON and gets the per-match stat table the reference's
  * `compute_stats_for_match` produces (reference:
  * core/pedri_analysis.py:231-299), computed as one distributed
  * aggregation instead of a per-file Python loop.
  *
  * The generic operators (EventOps/StatsOps/...) carry the oracle-verified
  * semantics on the synthetic tables; this object binds the same shapes to
  * the real StatsBomb schema (spec-tested — the synthetic corpus has no
  * StatsBomb files).
  */
object StatsBombOps {

  /** reference core/pedri_analysis.py:154-162 — progressive pass:
    * dx ≥ 10 ∧ dx > |dy| on the real pitch coordinates. */
  private def progressive = (col("x2") - col("x") >= 10.0) &&
    (col("x2") - col("x") > abs(col("y2") - col("y")))

  /** reference extended.py:110-130 — the EXTENDED progressive rule on
    * direction-adjusted coordinates: completed ∧ dx ≥ 10 ∧ gain ≥ 30% of
    * the remaining distance to the goal line. ONE definition shared by
    * [[extendedMatchStats]] and [[progressiveReceptions]] so the two can
    * never drift. */
  private def progressiveExtended: org.apache.spark.sql.Column = {
    val distStart = greatest(lit(0.0), lit(120.0) - col("x"))
    val distEnd = greatest(lit(0.0), lit(120.0) - col("x2"))
    col("completed_pass") &&
      col("x").isNotNull && col("x2").isNotNull &&
      (col("x2") - col("x") >= 10.0) && (distStart > 0.0) &&
      ((distStart - distEnd) >= distStart * 0.3)
  }

  /** Per-(player, match) stat table — the reference's ~20 counters/ratios
    * in ONE aggregation pass over the flattened events. */
  def matchStats(flat: DataFrame): DataFrame =
    flat
      .groupBy(col("player_id"), col("match_file"))
      .agg(
        count(lit(1)).as("n_events"),
        count(when(col("event_type") === "Pass", 1)).as("total_pass"),
        count(when(col("completed_pass"), 1)).as("comp_pass"),
        count(when(col("key_pass"), 1)).as("key_passes"),
        count(when(col("event_type") === "Pass" && progressive, 1)).as("prog_pass"),
        count(when(col("event_type") === "Carry" && progressive, 1)).as("prog_carries"),
        count(when(col("event_type") === "Shot", 1)).as("shots"),
        sum(when(col("event_type") === "Shot", col("xg")).otherwise(0.0)).as("total_xg"),
        // reference core/pedri_analysis.py:96-104, emitted at :253-254
        count(when(col("event_type") === "Dribble", 1)).as("dribbles_attempted"),
        count(when(col("event_type") === "Dribble" &&
          col("dribble_outcome") === "Complete", 1)).as("dribbles_completed"),
        // reference :104-106 and carry_distance :165-171 (0.0 when either
        // endpoint is missing), emitted at :255-256
        count(when(col("event_type") === "Carry", 1)).as("carries"),
        sum(when(col("event_type") === "Carry",
          coalesce(sqrt((col("x2") - col("x")) * (col("x2") - col("x")) +
            (col("y2") - col("y")) * (col("y2") - col("y"))),
            lit(0.0))).otherwise(0.0)).as("carry_distance_units"),
        count(when(col("event_type") === "Pressure", 1)).as("pressures"),
        // reference :112-117 — a tackle is a Duel with duel.type "Tackle"
        count(when(col("event_type") === "Duel" &&
          col("duel_type") === "Tackle", 1)).as("tackles"),
        count(when(col("event_type") === "Interception", 1)).as("interceptions"),
        count(when(col("event_type") === "Ball Recovery", 1)).as("recoveries"),
        count(when(col("event_type") === "Dispossessed", 1)).as("dispossessed"),
        // reference extended.py:286-287 — COMPLETED passes with the
        // under_pressure flag (the counter is nested inside the
        // is_completed_pass branch of the reference loop)
        count(when(col("completed_pass") && col("under_pressure"), 1))
          .as("passes_under_pressure"),
        min(col("t_sec")).as("first_sec"),
        max(col("t_sec")).as("last_sec"))
      .withColumn("pass_pct",
        when(col("total_pass") > 0, col("comp_pass") * 100.0 / col("total_pass")))
      // reference core/pedri_analysis.py:201-218: minutes from the event
      // span, clamped to [10, 95] (substitution handling in [[minutesPlayed]])
      .withColumn("minutes_est",
        greatest(lit(10.0), least(lit(95.0),
          (col("last_sec") - col("first_sec")) / 60.0)))
      .withColumn("passes_per90", col("total_pass") * 90.0 / col("minutes_est"))
      .withColumn("xg_per90", col("total_xg") * 90.0 / col("minutes_est"))

  /** reference extended.py:89-107 + 82-87 — normalize coordinates so every
    * team attacks left→right in every half.
    *
    * Direction is inferred per (team, match, period) group from the
    * majority sign of Δx over completed passes (the distributed,
    * float-order-free version of "sign of mean Δx"), broadcast back, and
    * the pitch is flipped (x → 120−x, y → 80−y) where a team attacks
    * left. All downstream geometry (progressive, final third, pen area)
    * then works on adjusted coordinates — exactly the reference's
    * `toward_goal_delta` contract, computed once per match instead of per
    * event. */
  def withAttackDirection(flat: DataFrame): DataFrame = {
    val dir = flat
      .filter(col("completed_pass") && col("period") === 1)
      .groupBy(col("team_id").as("d_team"), col("match_file").as("d_match"))
      .agg((count(when(col("x2") > col("x"), 1)) >
        count(when(col("x2") < col("x"), 1))).as("attacks_right_p1"))
    def flip(c: String, max: Double, attacksRight: org.apache.spark.sql.Column) =
      when(attacksRight, col(c)).otherwise(lit(max) - col(c))
    flat
      .join(broadcast(dir),
        col("team_id") === col("d_team") && col("match_file") === col("d_match"),
        "left")
      .withColumn("attacks_right",
        // teams swap ends at half time
        when(col("period") % 2 === 1, coalesce(col("attacks_right_p1"), lit(true)))
          .otherwise(!coalesce(col("attacks_right_p1"), lit(true))))
      .withColumn("xa_", flip("x", 120.0, col("attacks_right")))
      .withColumn("ya_", flip("y", 80.0, col("attacks_right")))
      .withColumn("x2a_", flip("x2", 120.0, col("attacks_right")))
      .withColumn("y2a_", flip("y2", 80.0, col("attacks_right")))
      .drop("d_team", "d_match", "attacks_right_p1", "x", "y", "x2", "y2")
      .withColumnRenamed("xa_", "x").withColumnRenamed("ya_", "y")
      .withColumnRenamed("x2a_", "x2").withColumnRenamed("y2a_", "y2")
  }

  /** reference extended.py:199-440 `analyze_match_extended` — the
    * EXTENDED per-(player, match) row: geometry-aware counters on
    * direction-ADJUSTED coordinates (input goes through
    * [[withAttackDirection]], after which every team attacks
    * left→right, so `in_final_third` etc. lose their direction
    * argument), plus goals / turnovers / cross-excluded deep
    * completions / switches / extended-progressive passes and carries.
    * One aggregation pass like [[matchStats]]; join
    * [[progressiveReceptions]], [[pressuresAfterLoss]], [[xA]] and
    * [[teamTotalXg]] for the reference's full extended row. */
  def extendedMatchStats(flat: DataFrame): DataFrame = {
    val adj = withAttackDirection(flat)
    val comp = col("completed_pass")
    val isPass = col("event_type") === "Pass"
    val hasSeg = col("x").isNotNull && col("x2").isNotNull
    val dx = col("x2") - col("x")
    val dyAbs = abs(col("y2") - col("y"))
    adj
      .groupBy(col("player_id"), col("match_file"))
      .agg(
        count(when(isPass, 1)).as("passes_total"),
        count(when(comp, 1)).as("passes_completed"),
        // extended key passes add the goal_assist flag (:279-283) and
        // are nested in the completed branch
        count(when(comp && (col("key_pass") || col("goal_assist")), 1))
          .as("key_passes"),
        count(when(col("event_type") === "Shot", 1)).as("shots"),
        // :304-305
        count(when(col("event_type") === "Shot" &&
          col("shot_outcome") === "Goal", 1)).as("goals"),
        sum(when(col("event_type") === "Shot", col("xg")).otherwise(0.0)).as("xg"),
        // :308-309
        count(when(col("event_type") === "Shot" &&
          col("key_pass_id").isNotNull, 1)).as("shots_after_key_pass"),
        count(when(col("event_type") === "Dribble", 1)).as("dribbles_attempted"),
        count(when(col("event_type") === "Dribble" &&
          col("dribble_outcome") === "Complete", 1)).as("dribbles_completed"),
        // :265-267 — Miscontrol or Dispossessed
        count(when(col("event_type").isin("Miscontrol", "Dispossessed"), 1))
          .as("turnovers"),
        count(when(col("event_type") === "Pressure", 1)).as("pressures"),
        // deliberate divergence: extended.py tests etype == 'Tackle', an
        // event type that never occurs in StatsBomb data (its extended
        // tackles counter is always 0); this keeps pedri_analysis.py's
        // is_tackle formulation (Duel + duel.type), which counts real data
        count(when(col("event_type") === "Duel" &&
          col("duel_type") === "Tackle", 1)).as("tackles"),
        count(when(col("event_type") === "Interception", 1)).as("interceptions"),
        count(when(col("event_type") === "Ball Recovery", 1)).as("ball_recoveries"),
        // :286-297 — all nested in the completed-pass branch
        count(when(comp && col("under_pressure"), 1)).as("passes_under_pressure"),
        count(when(comp && col("x2") >= 80.0, 1)).as("passes_into_final_third"),
        count(when(comp && col("x2") >= 102.0 &&
          col("y2") >= 18.0 && col("y2") <= 62.0, 1)).as("passes_into_penalty_area"),
        // :150-165 — completed, NOT a cross, x-distance to goal line < 20
        count(when(comp && !col("pass_cross") && col("x2").isNotNull &&
          (greatest(lit(0.0), lit(120.0) - col("x2")) < 20.0), 1))
          .as("deep_completions"),
        // :167-177 — the reference also tests segment length ≥ 30, but
        // dy ≥ 40 already implies length ≥ 40 (hypotenuse ≥ a leg), so
        // the conjunct is vacuous and the sqrt is skipped here;
        // EventCols.isSwitchExact keeps the literal two-condition formula
        count(when(comp && hasSeg && (dyAbs >= 40.0), 1)).as("switches_of_play"),
        count(when(progressiveExtended, 1)).as("progressive_passes"),
        // :316-327 — carry with toward-goal dx ≥ 10 on adjusted coords
        count(when(col("event_type") === "Carry" && hasSeg && (dx >= 10.0), 1))
          .as("progressive_carries"),
        sum(when(col("event_type") === "Carry",
          coalesce(sqrt(dx * dx + (col("y2") - col("y")) * (col("y2") - col("y"))),
            lit(0.0))).otherwise(0.0)).as("carry_distance"))
      .withColumn("pass_pct",
        when(col("passes_total") > 0,
          col("passes_completed") * 100.0 / col("passes_total")).otherwise(0.0))
      .withColumn("dribbles_pct",
        when(col("dribbles_attempted") > 0,
          col("dribbles_completed") * 100.0 / col("dribbles_attempted"))
          .otherwise(0.0))
  }

  /** reference extended.py:338-353 — progressive receptions: completed,
    * extended-progressive passes RECEIVED, credited to the recipient.
    * Adjusted coordinates come from the PASSER's team direction, which
    * [[withAttackDirection]] already applied row-wise. Deliberate
    * divergence: the reference's receptions loop caches the FIRST-HALF
    * direction and never flips it at half time (extended.py:350), so its
    * second-half receptions evaluate the progressive rule on
    * wrong-direction coordinates; this version flips per period like
    * every other adjusted-geometry counter. */
  def progressiveReceptions(flat: DataFrame): DataFrame =
    withAttackDirection(flat)
      .filter(col("event_type") === "Pass" && progressiveExtended &&
        col("recipient_id").isNotNull)
      .groupBy(col("recipient_id").as("player_id"), col("match_file"))
      .agg(count(lit(1)).as("progressive_receptions"))

  /** reference extended.py:356-384 — pressures within 5 s after the same
    * player's own turnover (Miscontrol/Dispossessed), same period. The
    * reference's loop counts each pressure at most once; the equi-join on
    * (player, match, period) + band [0 s, 5 s] followed by a distinct
    * pressure count is the set-semantics twin. Same-second ties: the
    * reference's `event_minute` is second-granular too and its candidate
    * scan accepts `tstamp - p_t == 0` regardless of file order, so a
    * pressure in the same second as the turnover counts in BOTH
    * formulations — no ordering divergence. Co-partitioned join, no n²:
    * both sides shuffle once on the player key. */
  def pressuresAfterLoss(flat: DataFrame): DataFrame = {
    val losses = flat
      .filter(col("event_type").isin("Miscontrol", "Dispossessed"))
      .select(col("player_id").as("l_player"), col("match_file").as("l_match"),
        col("period").as("l_period"), col("t_sec").as("l_sec"))
    flat
      .filter(col("event_type") === "Pressure")
      .join(losses,
        col("player_id") === col("l_player") &&
          col("match_file") === col("l_match") &&
          col("period") === col("l_period") &&
          col("t_sec") >= col("l_sec") && col("t_sec") <= col("l_sec") + 5)
      .groupBy(col("player_id"), col("match_file"))
      .agg(countDistinct(col("event_id")).as("pressures_after_loss"))
  }

  /** reference extended.py:246-249 — team xG per match (the denominator
    * of share-of-team metrics). Deliberate divergence: the reference's
    * loop accumulates EVERY shot in the match — both teams — into
    * `team_total_xg`, so its row value is really the MATCH total. This
    * groups by (team, match), the quantity the share metric means;
    * `SUM(team_total_xg) OVER (PARTITION BY match_file)` recovers the
    * reference's literal number. */
  def teamTotalXg(flat: DataFrame): DataFrame =
    flat
      .filter(col("event_type") === "Shot")
      .groupBy(col("team_id"), col("match_file"))
      .agg(sum(coalesce(col("xg"), lit(0.0))).as("team_total_xg"))

  /** reference core/pedri_analysis.py:201-218 `minutes_played_estimate`,
    * EXACT semantics: if the player was substituted OFF, minutes =
    * off-time − on-time (on-time is the substitution that brought them
    * ON if any, else 0 — kickoff starters), clamped to [0, 95]; else the
    * span of the player's OWN events, clamped to [10, 95]. Substitution
    * events are tiny → broadcast joins. Note the event's `player` is the
    * one GOING OFF; `substitution.replacement` is the one coming on. */
  def minutesPlayed(flat: DataFrame, playerId: Long): DataFrame = {
    // max(t_sec) = chronological last. The reference's loop keeps the
    // last event in FILE order — the two agree unless a player's
    // duplicate substitution events (malformed data to begin with) are
    // ALSO listed out of time order, where no reading is authoritative
    val subbedOff = flat
      .filter(col("event_type") === "Substitution" &&
        col("player_id") === playerId)
      .groupBy(col("match_file").as("m_off"))
      .agg(max(col("t_sec")).as("off_sec"))
    val subbedOn = flat
      .filter(col("event_type") === "Substitution" &&
        col("sub_replacement_id") === playerId)
      .groupBy(col("match_file").as("m_on"))
      .agg(max(col("t_sec")).as("on_sec"))
    flat.filter(col("player_id") === playerId)
      .groupBy(col("match_file"))
      .agg(min(col("t_sec")).as("first_sec"), max(col("t_sec")).as("last_sec"))
      .join(broadcast(subbedOff), col("match_file") === col("m_off"), "left")
      .join(broadcast(subbedOn), col("match_file") === col("m_on"), "left")
      .select(col("match_file"),
        when(col("off_sec").isNotNull,
          greatest(lit(0.0), least(lit(95.0),
            (col("off_sec") - coalesce(col("on_sec"), lit(0L))) / 60.0)))
        .otherwise(
          greatest(lit(10.0), least(lit(95.0),
            (col("last_sec") - col("first_sec")) / 60.0)))
        .as("minutes"))
  }

  /** reference core/pedri_analysis.py:190-198 `lineup_position_for_pedri`,
    * generalized: every (match, team, player, position) of the Starting
    * XI events' `tactics.lineup` arrays — one distributed explode over
    * the nested frame (the reference loops per file). Input is the
    * NESTED frame from [[graft.sources.EventsJsonSource.read]] (the
    * lineup array would be lost in `flatten`). */
  def lineupPositions(nested: DataFrame): DataFrame =
    nested
      .filter(col("type.name") === "Starting XI")
      .select(col("match_file"), col("team.id").as("team_id"),
        explode(col("tactics.lineup")).as("entry"))
      .select(col("match_file"), col("team_id"),
        col("entry.player.id").as("player_id"),
        col("entry.position.name").as("lineup_position"))

  /** reference extended.py:245-253 — xA: join each shot to the pass that
    * assisted it (`shot.key_pass_id` → pass event id) and credit the
    * passer with the shot's xG. Equi-join on the event id — broadcast the
    * (small) shot side per match at scale. */
  def xA(flat: DataFrame): DataFrame = {
    val shots = flat.filter(col("key_pass_id").isNotNull)
      .select(col("key_pass_id"), col("xg"))
    val passes = flat.filter(col("event_type") === "Pass")
      .select(col("event_id"), col("player_id"), col("match_file"))
    passes.join(shots, passes("event_id") === shots("key_pass_id"))
      .groupBy(col("player_id"), col("match_file"))
      .agg(count(lit(1)).as("n_assisted_shots"), sum(col("xg")).as("xa"))
  }

  /** reference extended.py:520-541 `plot_scatter_pp_vs_pc` — the scatter
    * FEED: per (player, match) progressive passes vs progressive carries
    * with the reference's xA-scaled marker size `max(20.0, xa * 300.0)`.
    * The last reference figure without a named feed; the plot itself is
    * out of scope, this DataFrame is its input. One pass for the
    * extended stats; the per-match xA aggregate is tiny → broadcast
    * left join (a player with no assisted shots scatters at the 20.0
    * floor, xa = 0 like the reference's missing-key default). */
  def scatterPpVsPc(flat: DataFrame): DataFrame =
    extendedMatchStats(flat)
      .filter(col("player_id").isNotNull)
      .select(col("player_id"), col("match_file"),
        col("progressive_passes").as("pp"),
        col("progressive_carries").as("pc"))
      .join(broadcast(xA(flat).select(col("player_id").as("_pid"),
        col("match_file").as("_mf"), col("xa"))),
        col("player_id") === col("_pid") && col("match_file") === col("_mf"),
        "left")
      .select(col("player_id"), col("match_file"), col("pp"), col("pc"),
        coalesce(col("xa"), lit(0.0)).as("xa"))
      .withColumn("marker_size", greatest(lit(20.0), col("xa") * 300.0))

  /** reference extended.py:543-585 `plot_heatmap_points` + :272-274/
    * :317-318 — the heatmap FEED: completed-pass or carry start
    * locations binned on the 48×32 grid over the 120×80 pitch
    * (np.histogram2d semantics: cell = 2.5×2.5, upper edge inclusive in
    * the last bin, out-of-range dropped), with the reference's log1p
    * intensity. Raw (unadjusted) locations, like the reference. The
    * plot itself is out of scope; this DataFrame is its input. */
  def heatmapBins(flat: DataFrame, kind: String = "pass"): DataFrame = {
    require(kind == "pass" || kind == "carry",
      s"kind must be 'pass' or 'carry', got '$kind'")
    val src =
      if (kind == "pass") flat.filter(col("completed_pass"))
      else flat.filter(col("event_type") === "Carry")
    src
      .filter(col("x").isNotNull && col("y").isNotNull &&
        col("x") >= 0.0 && col("x") <= 120.0 &&
        col("y") >= 0.0 && col("y") <= 80.0)
      .select(
        least(floor(col("x") / 2.5), lit(47.0)).cast("int").as("bx"),
        least(floor(col("y") / 2.5), lit(31.0)).cast("int").as("by"))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))
      .withColumn("intensity", log1p(col("n")))
  }

  /** The match id a profile row keys on, derived from the event file path
    * (the reference names event files `<match_id>.json` —
    * extended.py:60-62 `load_events`). */
  def matchId(matchFile: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(matchFile, "([^/]+)\\.json$", 1)

  /** reference extended.py:40-58 `load_profile` — the profile JSON array
    * as a DataFrame keyed by match id. Mirrors the reference's key
    * coalescing (`match_id`/`id`/`matchId`/`match`, first present wins)
    * and leaves the falsy-value defaults to [[withMatchMeta]] (the
    * reference applies them at lookup time, so a match missing from the
    * profile gets them too). */
  def readProfile(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("match_id", StringType), StructField("id", StringType),
      StructField("matchId", StringType), StructField("match", StringType),
      StructField("team_name", StringType), StructField("team", StringType),
      StructField("minutes", DoubleType), StructField("position", StringType)))
    spark.read.schema(schema).option("multiLine", true).json(path)
      .select(
        coalesce(col("match_id"), col("id"), col("matchId"), col("match"))
          .as("match_id"),
        coalesce(col("team_name"), col("team")).as("team"),
        col("minutes"), col("position"))
      .filter(col("match_id").isNotNull)
  }

  /** reference extended.py:40-58 + :203-205 — enrich per-match rows with
    * the profile's match metadata (team, minutes, position). Broadcast
    * left join on the match id: the profile is tiny (one row per match)
    * next to the stats side, and matches absent from the profile keep the
    * reference's defaults. The reference's `or`-defaults treat falsy
    * values (empty string, 0.0) as absent — mirrored via nullif. */
  def withMatchMeta(stats: DataFrame, profile: DataFrame): DataFrame = {
    val meta = profile.select(
      col("match_id").as("meta_match_id"),
      col("team").as("meta_team"), col("minutes").as("meta_minutes"),
      col("position").as("meta_position"))
    stats
      .join(broadcast(meta), matchId(col("match_file")) === col("meta_match_id"),
        "left")
      .withColumn("profile_team",
        coalesce(nullif(col("meta_team"), lit("")), lit("Barcelona/Spain")))
      .withColumn("profile_minutes",
        coalesce(nullif(col("meta_minutes"), lit(0.0)), lit(90.0)))
      .withColumn("profile_position",
        coalesce(nullif(col("meta_position"), lit("")), lit("Unknown")))
      .drop("meta_match_id", "meta_team", "meta_minutes", "meta_position")
  }

  /** reference pedri_profile.py — position frequency per player
    * (`Counter.most_common`): full ranked table, ready for top-1 or top-k. */
  def positionFrequency(flat: DataFrame): DataFrame =
    flat.filter(col("position").isNotNull)
      .groupBy(col("player_id"), col("position"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("player_id").orderBy(col("n").desc, col("position").asc)))
}
