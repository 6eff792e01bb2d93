package graft

/** Driver-contract smoke: entry() returns rows; every declared query runs
  * at sf0.001 and every oracle key has a matching query. */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query and every query key is well-formed") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os -- qs}")
    assert(qs.forall(_.matches("q[_0-9a-z]+")), qs)
  }

  test("all queries execute at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n >= 0, name)
    }
  }
}
