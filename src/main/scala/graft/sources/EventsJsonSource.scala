package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** StatsBomb-shaped nested event JSON source.
  *
  * The reference scans the json files under `data/events` — arrays of nested event
  * objects (reference: core/pedri_analysis.py:314-322 collect_all_events,
  * 77-133 nested-field predicates). This source re-expresses that ingestion
  * Spark-first:
  *
  *  - EXPLICIT schema (never `inferSchema` — at 100 TB schema inference is
  *    a full extra pass over the data);
  *  - `multiLine` array-of-objects parsing, one DataFrame row per event;
  *  - `input_file_name()` as the match id (the reference derives match
  *    identity from the file), so no per-file driver loop — thousands of
  *    files become one distributed scan;
  *  - [[flatten]] projects the nested fields once into a flat, columnar
  *    frame: all downstream operators read pruned scalar columns.
  *
  * Only the fields the reference actually touches are declared: unknown
  * nested fields are simply never deserialized (column pruning works inside
  * struct fields for JSON too via requiredSchema pushdown).
  */
object EventsJsonSource {

  private val idName = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  /** Nested event schema — the subset of the StatsBomb open-data event
    * spec the reference reads. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("index", LongType),
    StructField("period", IntegerType),
    StructField("timestamp", StringType), // "HH:MM:SS.mmm" within half
    StructField("minute", IntegerType),
    StructField("second", IntegerType),
    StructField("type", idName),
    StructField("possession_team", idName),
    StructField("team", idName),
    StructField("player", idName),
    StructField("position", idName),
    StructField("location", ArrayType(DoubleType)),
    StructField("duration", DoubleType),
    StructField("under_pressure", BooleanType),
    StructField("pass", StructType(Seq(
      StructField("recipient", idName),
      StructField("length", DoubleType),
      StructField("angle", DoubleType),
      StructField("end_location", ArrayType(DoubleType)),
      StructField("outcome", idName),
      StructField("shot_assist", BooleanType),
      StructField("goal_assist", BooleanType),
      StructField("cross", BooleanType),
      StructField("assisted_shot_id", StringType)))),
    StructField("carry", StructType(Seq(
      StructField("end_location", ArrayType(DoubleType))))),
    StructField("dribble", StructType(Seq(
      StructField("outcome", idName)))),
    StructField("duel", StructType(Seq(
      StructField("type", idName)))),
    StructField("shot", StructType(Seq(
      StructField("statsbomb_xg", DoubleType),
      StructField("key_pass_id", StringType),
      StructField("outcome", idName)))),
    StructField("substitution", StructType(Seq(
      StructField("replacement", idName)))),
    StructField("tactics", StructType(Seq(
      StructField("formation", LongType),
      StructField("lineup", ArrayType(StructType(Seq(
        StructField("player", idName),
        StructField("position", idName))))))))))

  /** Read one-or-many event files (glob/dir ok) into the nested frame. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(schema)
      .option("multiLine", true)
      .json(path)
      .withColumn("match_file", input_file_name())

  /** Flatten the nested frame into the analytics-ready columnar shape the
    * graft operators consume: one row per event, scalar columns only. */
  def flatten(nested: DataFrame): DataFrame =
    nested.select(
      col("id").as("event_id"),
      col("match_file"),
      col("period"),
      col("minute"),
      col("second"),
      (col("minute") * 60 + col("second")).as("t_sec"),
      col("type.name").as("event_type"),
      col("player.id").as("player_id"),
      col("team.id").as("team_id"),
      col("position.name").as("position"),
      element_at(col("location"), 1).as("x"),
      element_at(col("location"), 2).as("y"),
      coalesce(col("pass.end_location"), col("carry.end_location")).getItem(0).as("x2"),
      coalesce(col("pass.end_location"), col("carry.end_location")).getItem(1).as("y2"),
      // completed pass = no outcome object, or an explicit "Complete" —
      // reference core/pedri_analysis.py:85-90 accepts both
      (col("type.name") === "Pass" &&
        (col("pass.outcome.name").isNull ||
          col("pass.outcome.name") === "Complete")).as("completed_pass"),
      (col("pass.shot_assist") === true || col("pass.assisted_shot_id").isNotNull)
        .as("key_pass"),
      col("pass.recipient.id").as("recipient_id"),
      // absent flag ≡ false in the StatsBomb spec (the key is only present
      // when true) — reference extended.py:286-287 tests truthiness
      coalesce(col("under_pressure"), lit(false)).as("under_pressure"),
      col("dribble.outcome.name").as("dribble_outcome"),
      col("duel.type.name").as("duel_type"),
      col("shot.outcome.name").as("shot_outcome"),
      coalesce(col("pass.goal_assist"), lit(false)).as("goal_assist"),
      coalesce(col("pass.cross"), lit(false)).as("pass_cross"),
      col("shot.statsbomb_xg").as("xg"),
      col("shot.key_pass_id").as("key_pass_id"),
      col("substitution.replacement.id").as("sub_replacement_id"))
}
