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

  val oracles: Map[String, String] = Map(
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
