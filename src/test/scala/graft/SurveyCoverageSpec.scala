package graft

import java.nio.file.{Files, Paths}

/** SURVEY.md §2 is the coverage contract — this gate fails if a key is
  * declared there without an implementation (or oracle). */
class SurveyCoverageSpec extends SparkSpec {

  private lazy val surveyKeys: Set[String] = {
    val text = Files.readString(Paths.get("SURVEY.md"))
    "`(q_[0-9a-z_]+|q1_pricing)`".r.findAllMatchIn(text).map(_.group(1)).toSet
  }

  test("every SURVEY §2 query key has an implementation") {
    val missing = surveyKeys -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"declared in SURVEY.md but not implemented: $missing")
  }

  /** §2-D rows: approximate / binary-output operators with no
    * SQL-expressible DuckDB oracle (the driver records a rows-only check).
    * Everything else MUST have an exact oracle. */
  private val rowsOnly = Set(
    "q_summary_approx", "q_percentile_approx", "q_frame_sample")

  test("every SURVEY §2 query key has a DuckDB oracle unless declared rows-only") {
    val missing = surveyKeys -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"declared in SURVEY.md but lacking an oracle: $missing")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty)
  }

  test("every implemented query is declared in SURVEY §2") {
    val undeclared = SparkEntry.queries.keySet -- surveyKeys
    assert(undeclared.isEmpty, s"implemented but missing from SURVEY.md: $undeclared")
  }
}
