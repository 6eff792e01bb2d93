package graft

import graft.sources.Tables

/** The library is usable from plain `spark.sql` too: tables registered as
  * temp views + the native functions injected by GraftExtensions resolve
  * by name in SQL text. */
class SqlSurfaceSpec extends SparkSpec {

  test("graft tables and native functions work through spark.sql") {
    graft.plans.GraftFunctions.register(spark)
    // the generic accessor must be safe for every declared table,
    // including events (nanos-timestamp handling routes internally)
    Tables.names.foreach { n =>
      Tables(spark, sfDir, n).createOrReplaceTempView(n)
    }
    val agg = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    assert(agg.count() > 0)
    val ann = spark.sql(
      """SELECT e.vec_id,
        |  float_dot(e.embedding, q.embedding) /
        |    (float_norm(e.embedding) * float_norm(q.embedding)) AS cos
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY cos DESC, vec_id LIMIT 5""".stripMargin).collect()
    assert(ann.length == 5)
    assert(ann.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
    val sim = spark.sql(
      "SELECT doc_id, simhash_fp(lower(trim(text)), 16) AS fp FROM documents LIMIT 3")
      .collect()
    assert(sim.forall(r => r.getLong(1) >= 0 && r.getLong(1) < (1L << 16)))
    // the capped posting-list aggregate resolves from SQL text too
    val capped = spark.sql(
      """SELECT lang, collect_set_capped(doc_id, 5) AS ds
        |FROM documents GROUP BY lang""".stripMargin).collect()
    assert(capped.nonEmpty)
    assert(capped.forall(_.getSeq[Long](1).length <= 6)) // saturates at cap+1
  }
}
