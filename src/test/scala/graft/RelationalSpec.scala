package graft

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSpec {

  test("pricingSummary groups by flag/status with exact decimal sums") {
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.pricingSummary(li).collect()
    assert(out.nonEmpty)
    val schema = Relational.pricingSummary(li).schema
    assert(schema.fieldNames.toSet == Set(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "count_order", "avg_qty", "avg_price"))
    // cross-check one group against an independent computation
    val row = out.head
    val flag = row.getString(0); val status = row.getString(1)
    val expCnt = li.where(s"l_returnflag = '$flag' AND l_linestatus = '$status' " +
      "AND l_shipdate <= timestamp '1998-09-02'").count()
    assert(row.getAs[Long]("count_order") == expCnt)
    assert(row.getAs[Double]("sum_qty") > 0)
  }

  test("revenueByNation broadcasts dims and rolls up per nation") {
    val out = Relational.revenueByNation(
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir), Tables.region(spark, sfDir))
    val rows = out.collect()
    assert(rows.nonEmpty)
    val totalOrders = rows.map(_.getAs[Long]("n_orders")).sum
    assert(totalOrders == Tables.orders(spark, sfDir).count())
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims must be broadcast")
  }

  test("topCustomers returns at most N with descending revenue") {
    val out = Relational.topCustomers(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir), n = 10).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }
}
