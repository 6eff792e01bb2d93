package graft

import org.apache.spark.sql.functions.{col, lit, sum}

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

  test("orderPriority is a semi-join: counts orders once regardless of matching lineitems") {
    val orders = Tables.orders(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val out = Relational.orderPriority(orders, li)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // independent recomputation via a distinct-key join for one priority
    val pri = rows.head.getString(0)
    val expected = orders
      .where(s"o_orderdate >= timestamp '1998-01-01' AND o_orderdate < timestamp '1998-04-01' " +
        s"AND o_orderpriority = '$pri'")
      .join(li.where("l_returnflag = 'R'").select("l_orderkey").distinct(),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(rows.head.getAs[Long]("order_count") == expected)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "must plan as a semi-join (no row explosion)")
  }

  test("promoShare is an exact conditional ratio over a broadcast part join") {
    val out = Relational.promoShare(Tables.lineitem(spark, sfDir), Tables.part(spark, sfDir))
    val row = out.collect().head
    val promo = row.getAs[Double]("promo_revenue")
    val total = row.getAs[Double]("total_revenue")
    val share = row.getAs[Double]("promo_share")
    assert(promo >= 0 && promo <= total)
    assert(share >= 0 && share <= 100)
    assert(math.abs(share - 100.0 * promo / total) < 1e-9)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "part must be broadcast")
  }

  test("topCustomers returns at most N with descending revenue") {
    val out = Relational.topCustomers(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir), n = 10).collect()
    assert(out.length <= 10 && out.nonEmpty)
    val revs = out.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
  }

  test("regionalRevenue binds customer and supplier nations through the facts") {
    val out = Relational.regionalRevenue(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.supplier(spark, sfDir), Tables.nation(spark, sfDir),
      Tables.region(spark, sfDir))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every surviving nation belongs to the requested region
    val asiaNations = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).forall(asiaNations))
    // all dims broadcast: exactly ONE shuffle join (lineitem ⋈ orders)
    val plan = out.queryExecution.executedPlan.toString
    val nBroadcast = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(nBroadcast >= 3, s"dims must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") ||
      "SortMergeJoin".r.findAllIn(plan).size <= 1, "one fact shuffle join at most")
  }

  test("returnsByCustomer pre-aggregates returns before the fact join; top-N head") {
    val out = Relational.returnsByCustomer(Tables.lineitem(spark, sfDir),
      Tables.orders(spark, sfDir), Tables.customer(spark, sfDir),
      Tables.nation(spark, sfDir))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sorted(Ordering[Double].reverse)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-N must be a heap")
    // independent recomputation for the top customer
    val top = rows.head
    val expected = Tables.lineitem(spark, sfDir)
      .where("l_returnflag = 'R'")
      .join(Tables.orders(spark, sfDir)
        .where("o_orderdate >= timestamp '1996-10-01' AND o_orderdate < timestamp '1997-01-01'"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sfDir)
        .filter(col("c_custkey") === top.getAs[Long]("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).cast("double"))
      .collect().head.getDouble(0)
    assert(top.getAs[Double]("revenue") == expected)
  }
}
