package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational scan/agg/join anchors.
  *
  * These re-express the scan→conditional-aggregate shape of the reference's
  * per-match stats pipeline (reference: core/pedri_analysis.py:231-299) on
  * the TPC-H-ish tables, and serve as the benchmark anchors for partial
  * aggregation, broadcast joins, and shuffle joins.
  *
  * Numeric discipline: money-ish doubles are cast to DECIMAL before SUM so
  * the result is order-independent (exact decimal arithmetic), then cast
  * back to DOUBLE — Spark and the DuckDB oracle produce bit-identical
  * values regardless of partial-aggregation order. At 100 TB this also
  * means the partial-agg tree can be arbitrarily deep without float drift.
  */
object Relational {

  private val d18 = DecimalType(18, 2)

  /** TPC-H-Q1-shaped pricing summary.
    *
    * Plan shape: parquet scan (filter + projection pushed down) →
    * partial hash agg (map-side) → single shuffle on the 2 group keys →
    * final agg → tiny sort. The group-key cardinality is O(10) so the
    * shuffle payload is partials only — this survives any scale-up.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame = {
    val qty   = col("l_quantity").cast(d18)
    val price = col("l_extendedprice").cast(d18)
    val disc  = col("l_discount").cast(d18)
    val tax   = col("l_tax").cast(d18)
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(qty).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum(price * (lit(1) - disc)).cast("double").as("sum_disc_price"),
        sum(price * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue per nation: fact ⋈ small dims.
    *
    * Dimension enrichment shape (reference joins lineup/team metadata onto
    * events, core/pedri_analysis_extended.py:199-223). customer/nation/
    * region are broadcast — zero shuffle for the dims, one shuffle for the
    * fact aggregation. At 100 TB the dims are still KB–MB: broadcast holds.
    */
  def revenueByNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame, region: DataFrame): DataFrame = {
    orders
      .join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("o_totalprice").cast(d18)).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("r_name", "n_name")
  }

  /** Top customers by lineitem revenue: fact ⋈ fact, then top-N.
    *
    * The big-join shape, with the two classic large-scale moves:
    *
    *  1. PRE-AGGREGATE lineitem to one row per orderkey BEFORE the join —
    *     shrinks the join input ~4× and turns `COUNT(DISTINCT o_orderkey)`
    *     into a plain `count(*)` (orderkey is unique in orders), avoiding
    *     the Expand + second shuffle a distinct aggregate plans.
    *  2. Broadcast the customer dim; lineitem⋈orders shuffles once on
    *     orderkey (AQE picks SMJ vs shuffled-hash and splits skew).
    *
    * The final top-N compiles to TakeOrderedAndProject — no global sort.
    * Decimal partials keep the revenue identical to the oracle's
    * COUNT(DISTINCT) formulation.
    */
  def topCustomers(lineitem: DataFrame, orders: DataFrame,
                   customer: DataFrame, n: Int = 20): DataFrame = {
    val perOrder = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(d18) *
        (lit(1) - col("l_discount").cast(d18))).as("order_rev"))
    perOrder
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(sum(col("order_rev")).cast("double").as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(n)
  }

  /** TPC-H-Q4-shaped priority count: orders in a quarter with at least one
    * returned lineitem, counted per priority class. (The testdata schema
    * carries no commit/receipt dates, so "late" becomes `l_returnflag='R'`
    * — the plan shape, not the predicate, is the point.)
    *
    * Plan shape: LEFT SEMI join — the probe side never duplicates order
    * rows no matter how many lineitems match, so the join output is
    * bounded by |orders|, not |orders|×|lineitem|. Both sides filter
    * BEFORE the join (pushdown audited); the shuffle keys are the join
    * key, and at 100 TB AQE can still flip the build side to broadcast
    * when the quarter's order slice is small. An EXISTS subquery in SQL
    * is exactly this operator — no distinct, no row explosion.
    */
  def orderPriority(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val o = orders.filter(
      col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
      col("o_orderdate") <  lit("1998-04-01").cast("timestamp"))
    val returned = lineitem
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(returned, o("o_orderkey") === returned("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H-Q14-shaped promo share: revenue fraction from PROMO-type parts
    * in a shipdate window — the conditional-ratio-over-a-join shape (the
    * reference computes the same shape per match: completed/attempted
    * passes, core/pedri_analysis.py:262-271).
    *
    * Plan shape: fact ⋈ broadcast(dim) — part is the small side and is
    * broadcast explicitly, so the fact table never shuffles; the ratio is
    * one conditional DECIMAL aggregate over the joined stream (exact,
    * order-independent partials) and the division happens once on the
    * 1-row result. At 100 TB: part stays MB-scale → broadcast holds;
    * zero shuffles beyond the final 1-row agg.
    */
  def promoShare(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = col("l_extendedprice").cast(d18) *
      (lit(1) - col("l_discount").cast(d18))
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-07-01").cast("timestamp"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(d18)))
          .cast("double").as("promo_revenue"),
        sum(rev).cast("double").as("total_revenue"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_revenue") / col("total_revenue"))
  }

  /** TPC-H-Q3-shaped shipping priority: top unshipped orders by revenue
    * — fact ⋈ fact ⋈ small dim with a top-k head.
    *
    * Plan shape: customer prunes (broadcast) BEFORE the fact join; both
    * facts filter at the scan (pushdown); the lineitem⋈orders join is
    * the one real shuffle; the k-row head compiles to
    * TakeOrderedAndProject (per-partition heaps — no global sort of the
    * join output). The canonical "find the work queue" query at any
    * scale. */
  def shippingPriority(lineitem: DataFrame, orders: DataFrame,
                       customer: DataFrame, n: Int = 10): DataFrame = {
    val cut = lit("1998-03-15").cast("timestamp")
    val rev = col("l_extendedprice").cast(d18) *
      (lit(1) - col("l_discount").cast(d18))
    lineitem.filter(col("l_shipdate") > cut)
      .join(orders.filter(col("o_orderdate") < cut),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(n)
  }

  /** TPC-H-Q6-shaped forecast revenue: one filtered aggregate, no joins
    * — the query whose entire cost is the SCAN, so it is the purest
    * pushdown/pruning benchmark in the suite.
    *
    * Plan shape: all three range predicates reach the parquet scan
    * (PushedFilters); only two columns are read (ReadSchema); the agg is
    * a 1-row DECIMAL-exact fold. At 100 TB this is the query that shows
    * whether the scan layer is doing its job — nothing else can hide. */
  def forecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(sum(col("l_extendedprice").cast(d18) * col("l_discount").cast(d18))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))

  /** TPC-H-Q5-shaped regional same-nation revenue: lineitem ⋈ orders ⋈
    * customer ⋈ supplier ⋈ nation ⋈ region, keeping only rows where the
    * SUPPLYING nation equals the customer's nation, one region, one
    * order year — the classic star-join-with-a-correlation-predicate
    * shape (the same-nation condition cannot push into either dim
    * alone; it binds two of them through the facts).
    *
    * Plan shape: ONE real shuffle (lineitem⋈orders on orderkey); the
    * region-filtered nation list, customer, and supplier all broadcast
    * — the same-nation equality rides the supplier broadcast join as a
    * residual condition, never a shuffle of its own. At 100 TB supplier
    * and nation stay MB-scale; customer is the first dim to outgrow a
    * broadcast, at which point the o_custkey join becomes the second
    * keyed shuffle and the rest of the plan is unchanged. */
  def regionalRevenue(lineitem: DataFrame, orders: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame,
                      regionName: String = "ASIA"): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    lineitem
      .join(orders.filter(
        col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("l_extendedprice").cast(d18) *
        (lit(1) - col("l_discount").cast(d18))).cast("double").as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H-Q10-shaped returned-item reporting: customers ranked by the
    * revenue they returned in one quarter — "who should support call
    * first". The topCustomers discipline applies: lineitem PRE-AGGREGATES
    * to one row per orderkey (returns only) BEFORE the orders join, so
    * the fact⋈fact shuffle moves per-order partials, not lineitems;
    * customer and nation broadcast; top-N is TakeOrderedAndProject. */
  def returnsByCustomer(lineitem: DataFrame, orders: DataFrame,
                        customer: DataFrame, nation: DataFrame,
                        n: Int = 20): DataFrame = {
    val returnedPerOrder = lineitem
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(d18) *
        (lit(1) - col("l_discount").cast(d18))).as("order_rev"))
    returnedPerOrder
      .join(orders.filter(
        col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(sum(col("order_rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey").asc)
      .limit(n)
  }

  val oracles: Map[String, String] = Map(
    "q_regional_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name ASC""".stripMargin,
    "q_returns_by_customer" ->
      """WITH ret AS (
        |  SELECT l_orderkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS order_rev
        |  FROM lineitem
        |  WHERE l_returnflag = 'R'
        |  GROUP BY l_orderkey
        |)
        |SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(order_rev) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM ret
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin,
    "q_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_shipdate > TIMESTAMP '1998-03-15'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_forecast_revenue" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lineitems
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
        |         p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1996-07-01'
        |)
        |SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        |  CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |  100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE) AS promo_share
        |FROM j""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  COUNT(*) AS count_order,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_revenue_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY revenue DESC, c_custkey ASC
        |LIMIT 20""".stripMargin
  )
}
