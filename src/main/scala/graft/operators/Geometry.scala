package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.EventCols
import graft.functions.EventCols.{d18, sql => S}

/** Pitch-geometry operators (SURVEY.md §2 rows 15, 17, 18).
  *
  * The reference's geometric pass vocabulary
  * (core/pedri_analysis.py:154-162, core/pedri_analysis_extended.py:110-177)
  * as pure row-level codegen'd expressions — no UDFs, no shuffle for the
  * per-event flags; only the recipient aggregation shuffles (once). */
object GeometryOps {

  /** §2-15 `q_pitch_geometry`: all five geometric predicates per event.
    * Row-level only — stays inside one WholeStageCodegen span over the
    * parquet scan, with filter + projection pushed down. */
  def pitchGeometry(events: DataFrame): DataFrame =
    EventCols.withGeometry(events.filter(col("event_type") === "click"))
      .select(
        col("event_id"), col("user_id"),
        EventCols.isProgressive.as("progressive"),
        EventCols.isProgressive30.as("progressive30"),
        EventCols.isFinalThird.as("final_third"),
        EventCols.isPenaltyArea.as("penalty_area"),
        EventCols.isDeepCompletion.as("deep_completion"),
        EventCols.isSwitch.as("switch_play"),
        // exact-reference formulations (extended.py:110-177) alongside the
        // simplified synthetic variants — same row-level codegen span
        EventCols.isProgressive30Exact.as("progressive30_exact"),
        EventCols.isDeepCompletionExact.as("deep_completion_exact"),
        EventCols.isSwitchExact.as("switch_play_exact"))
      .orderBy("event_id")

  /** §2-17 `q_pass_segments`: start→end segment extraction, progressive
    * subset (reference core/pedri_analysis.py:526-593 pass-map arrows,
    * _collect_pedri_pass_segments). Projection-only scan. */
  def passSegments(events: DataFrame): DataFrame =
    EventCols.withGeometry(events.filter(col("event_type") === "click"))
      .filter(EventCols.isProgressive)
      .select(col("event_id"), col("user_id"),
        col("x"), col("y"), col("x2"), col("y2"),
        // segment length (reference extended.py:74-80 distance,
        // 180-185 carry_distance); sqrt of identical doubles — exact
        sqrt((col("x2") - col("x")) * (col("x2") - col("x")) +
          (col("y2") - col("y")) * (col("y2") - col("y"))).as("dist"))
      .orderBy("event_id")

  /** §2-18 `q_receptions`: recipient-perspective aggregation (reference
    * extended.py:339-354 progressive receptions — credit the RECEIVER).
    * The deterministic pseudo-recipient is k mod 150 (same id space as
    * user_id); same single-shuffle agg shape, different key column. */
  def receptions(events: DataFrame): DataFrame =
    EventCols.withGeometry(events.filter(col("event_type") === "click"))
      .withColumn("recipient_id", (col("k") % 150).cast("bigint"))
      .groupBy(col("recipient_id"))
      .agg(
        count(lit(1)).as("n_received"),
        count(when(EventCols.isProgressive, 1)).as("n_progressive"),
        sum(col("value").cast(d18)).cast("double").as("sum_value"))
      .orderBy("recipient_id")

  val oracles: Map[String, String] = Map(
    "q_pitch_geometry" ->
      s"""${S.geo("click")}
         |SELECT event_id, user_id,
         |  ${S.isProgressive} AS progressive,
         |  ${S.isProgressive30} AS progressive30,
         |  ${S.isFinalThird} AS final_third,
         |  ${S.isPenaltyArea} AS penalty_area,
         |  ${S.isDeepCompletion} AS deep_completion,
         |  ${S.isSwitch} AS switch_play,
         |  ${S.isProgressive30Exact} AS progressive30_exact,
         |  ${S.isDeepCompletionExact} AS deep_completion_exact,
         |  ${S.isSwitchExact} AS switch_play_exact
         |FROM g
         |ORDER BY event_id""".stripMargin,
    "q_pass_segments" ->
      s"""${S.geo("click")}
         |SELECT event_id, user_id, x, y, x2, y2,
         |  sqrt((x2 - x) * (x2 - x) + (y2 - y) * (y2 - y)) AS dist
         |FROM g
         |WHERE ${S.isProgressive}
         |ORDER BY event_id""".stripMargin,
    "q_receptions" ->
      s"""${S.geo("click")}
         |SELECT CAST(k % 150 AS BIGINT) AS recipient_id,
         |  COUNT(*) AS n_received,
         |  COUNT(*) FILTER (${S.isProgressive}) AS n_progressive,
         |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM g
         |GROUP BY 1
         |ORDER BY recipient_id""".stripMargin
  )
}
