package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md §5).
  *
  * AQE's skew-join split handles most cases at runtime; explicit salting
  * remains the tool when a single key is so hot that even split shuffle
  * blocks overwhelm one executor (the classic power-law `user_id`), or
  * when AQE is unavailable (streaming joins). Semantics are identical to
  * the unsalted join — asserted in `SkewSpec`.
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, salting the LEFT (large, skewed)
    * side into `salts` sub-keys and replicating the RIGHT side once per
    * salt. The shuffle spreads each hot key over `salts` reducers; the
    * replication multiplies the small side only.
    *
    * Deterministic salt (hash of the whole left row's monotonic id would
    * break reproducibility across retries — instead: hash of stable
    * columns `saltBy`, typically a unique id). */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, salts: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(saltBy), lit(salts)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    l.join(r,
      l(key) === r(key) && l("_salt") === r("_salt"), joinType)
      .drop(l("_salt")).drop(r("_salt")).drop(r(key))
  }
}
