package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Frame-spec window coverage (SURVEY §2.5 notes these come free with
  * Spark; exposed and oracle-checked here): running totals, lag deltas,
  * percent_rank, ordered string aggregation.
  */
object WindowQueries {

  // window-frame sums use the same exact-decimal trick as Det: the frame
  // order is deterministic, and decimal addition makes the running value
  // bit-identical to the oracle's
  private def decSum(c: org.apache.spark.sql.Column) = sum(c.cast(DecimalType(38, 6)))

  val defs: Seq[QueryDef] = Seq(
    // ---- running total per customer over order history
    QueryDef(
      "q51_running_spend",
      Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                 AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey"""),
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          decSum(col("o_totalprice")).over(w).cast("double").as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- month-over-month revenue delta via LAG
    QueryDef(
      "q52_mom_revenue_delta",
      Some("""
        WITH m AS (
          SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue
          FROM orders GROUP BY 1, 2)
        SELECT yr, mo, revenue,
               revenue - LAG(revenue) OVER (ORDER BY yr, mo) AS delta
        FROM m ORDER BY yr, mo"""),
    ) { (s, dir) =>
      val monthly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(decSum(col("o_totalprice")).cast("double").as("revenue"))
      val w = Window.orderBy("yr", "mo")
      monthly
        .withColumn("delta", col("revenue") - lag(col("revenue"), 1).over(w))
        .orderBy("yr", "mo")
    },

    // ---- percent_rank over account balances within segment
    QueryDef(
      "q53_balance_percentile",
      Some("""
        SELECT c_custkey, c_mktsegment,
               PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal, c_custkey) AS bal_pr
        FROM customer ORDER BY c_custkey"""),
    ) { (s, dir) =>
      val w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          percent_rank().over(w).as("bal_pr"))
        .orderBy("c_custkey")
    },

    // ---- ordered string aggregation (listagg) of statuses per customer
    QueryDef(
      "q54_status_history",
      Some("""
        SELECT o_custkey,
               string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(
          concat_ws(",", sort_array(collect_list(col("o_orderstatus")))).as("statuses"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_custkey")
    },
  )
}
