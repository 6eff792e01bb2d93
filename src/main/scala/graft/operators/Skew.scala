package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §5).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when a single key is so hot that even split shuffle
  * blocks overwhelm one executor (the classic power-law `user_id`), or
  * when AQE is unavailable (streaming joins). For the supported join
  * types semantics are identical to the unsalted join — asserted in
  * `SkewSpec`.
  */
object Skew {

  /** Join types for which replicating the right side preserves semantics.
    * Right/full outer are NOT supported: the right side is exploded into
    * `salts` copies before the join, so an unmatched right row would
    * surface `salts` times instead of once. */
  private val SupportedJoinTypes = Set(
    "inner", "cross", "left", "left_outer", "leftouter",
    "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")

  /** Equi-join `left ⋈ right` on `key`, salting the LEFT (large, skewed)
    * side into `salts` sub-keys and replicating the RIGHT side once per
    * salt. The shuffle spreads each hot key over `salts` reducers; the
    * replication multiplies the small side only.
    *
    * `joinType` must be inner or a left variant (outer/semi/anti) — see
    * [[SupportedJoinTypes]]; right/full outer would duplicate unmatched
    * right rows and are rejected.
    *
    * Deterministic salt (hash of the whole left row's monotonic id would
    * break reproducibility across retries — instead: hash of stable
    * columns `saltBy`, typically a unique id). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val jt = joinType.toLowerCase.replace(" ", "_")
    require(SupportedJoinTypes.contains(jt),
      s"saltedJoin supports inner/left join types only, got '$joinType' — " +
        "right/full outer would emit unmatched right rows once per salt")
    // collision-proof internal salt column: a caller's own "_salt" would
    // otherwise be silently overwritten (and dropped from the output).
    // Compare case-INsensitively — Spark resolves withColumn/drop with
    // the default case-insensitive resolver, so a caller's "_SALT" would
    // collide just the same.
    val taken = (left.columns ++ right.columns).map(_.toLowerCase).toSet
    val saltCol = Iterator.from(0)
      .map(i => if (i == 0) "_salt" else s"_salt$i")
      .find(n => !taken.contains(n)).get
    // explicit aliases: when `right` derives from `left` (the common
    // fact ⋈ agg-of-fact case) unqualified columns share lineage and the
    // equi-predicate resolves trivially-true before self-join
    // disambiguation kicks in
    val l = left.withColumn(saltCol, pmod(xxhash64(saltBy), lit(salts)))
      .alias("_sj_l")
    val r = right.withColumn(saltCol,
      explode(sequence(lit(0L), lit((salts - 1).toLong)))).alias("_sj_r")
    val joined = l.join(r,
      col(s"_sj_l.$key") === col(s"_sj_r.$key") &&
        col(s"_sj_l.$saltCol") === col(s"_sj_r.$saltCol"), jt)
    if (jt.contains("semi") || jt.contains("anti"))
      joined.drop(saltCol) // semi/anti keep left columns only
    else
      joined
        .drop(col(s"_sj_l.$saltCol")).drop(col(s"_sj_r.$saltCol"))
        .drop(col(s"_sj_r.$key"))
  }

  /** §2-47 `q_skew_join`: the salted join as a checked query — enrich every
    * event with its user's total event count (the power-law key: a few
    * users own most events) and roll up per type. The salt spreads each
    * hot user over 8 reducers; results are identical to the plain join
    * (the oracle IS the plain join), which is exactly the salting
    * contract. */
  def skewJoinQuery(events: DataFrame): DataFrame = {
    val userTotals = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("user_total"))
    saltedJoin(events.select("event_id", "user_id", "event_type"),
        userTotals, "user_id", saltBy = col("event_id"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("user_total")).as("sum_user_total"))
      .orderBy("event_type")
  }

  val oracles: Map[String, String] = Map(
    "q_skew_join" ->
      """WITH ut AS (
        |  SELECT user_id, COUNT(*) AS user_total FROM events GROUP BY user_id
        |)
        |SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(user_total) AS BIGINT) AS sum_user_total
        |FROM events JOIN ut USING (user_id)
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin
  )
}
