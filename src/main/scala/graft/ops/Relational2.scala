package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import Relational.{t, events, fanOut}

/** Second wave of relational operators: as-of join, correlated EXISTS
  * aggregation, conditional pivot, cube, exact percentiles. */
object Relational2 {

  // ----------------------------------------------------------------------
  // As-of join — the classic operator Spark lacks natively, composed
  // Spark-first (preference (a) from the build rules): tag and union both
  // streams, one window pass carries the latest right-side value forward.
  // One shuffle on (user_id), no range-join blowup — at 100 TB this is the
  // sort-merge-friendly formulation.
  /** For every non-signup event: the timestamp of that user's most recent
    * signup at-or-before the event (inclusive; signup sorts before other
    * events on timestamp ties). */
  def q30AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
    val tagged = e.select(
      col("user_id"), col("ts"), col("event_id"), col("event_type"),
      when(col("event_type") === "signup", col("ts")).as("signup_ts"),
      when(col("event_type") === "signup", lit(0)).otherwise(lit(1)).as("tag"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("last_signup_ts", last(col("signup_ts"), ignoreNulls = true).over(w))
      .filter(col("event_type") =!= "signup")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("last_signup_ts"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val q30Sql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN event_type = 'signup' THEN ts END AS signup_ts,
      |    CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END AS tag
      |  FROM events
      |)
      |SELECT user_id, event_id, ts, event_type,
      |  last_value(signup_ts IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, tag, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
      |FROM tagged
      |QUALIFY event_type <> 'signup'
      |ORDER BY user_id, event_id""".stripMargin

  // ----------------------------------------------------------------------
  // Correlated EXISTS aggregation (TPC-H Q4 shape): orders having at least
  // one heavy lineitem, counted per priority. Catalyst plans the EXISTS as
  // a left-semi join.
  def q31ExistsAgg(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
    val heavy = t(s, dir, "lineitem").filter(col("l_quantity") > 49).select("l_orderkey")
    o.join(heavy, o("o_orderkey") === heavy("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q31Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 49)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ----------------------------------------------------------------------
  // Conditional-aggregation pivot: order counts and exact revenue by
  // market segment, one column per order status.
  def q32Pivot(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select("o_custkey", "o_orderstatus", "o_totalprice")
    val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    o.join(c, o("o_custkey") === c("c_custkey"))  // customer scales with SF: no forced hint
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_filled"),
        sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_partial"),
        sum(when(col("o_orderstatus") === "O", col("o_totalprice").cast("decimal(18,4)"))
          .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("open_revenue"))
      .orderBy(col("c_mktsegment"))
  }

  val q32Sql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4))
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS open_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ----------------------------------------------------------------------
  // Cube: all grouping-set combinations over (returnflag, linestatus).
  def q33Cube(s: SparkSession, dir: String): DataFrame =
    fanOut(t(s, dir, "lineitem"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q33Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // ----------------------------------------------------------------------
  // Exact percentiles per group (Spark `percentile` and DuckDB
  // quantile_cont share the linear-interpolation definition; inputs are
  // 2-dp doubles so the interpolation arithmetic is identical).
  def q34Percentile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  val q34Sql: String =
    """SELECT o_orderstatus,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
}
