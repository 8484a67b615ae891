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

    // ---- TPC-H Q3 shape: selective join + group + top-k by revenue
    QueryDef(
      "q56_shipping_priority",
      Some(s"""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
                 AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1999-01-01").cast("timestamp"))
        .join(Tables.orders(s, dir)
          .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"),
          col("o_orderpriority"))
        .agg(decSum(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("double").as("revenue"))
        .orderBy(desc("revenue"), asc("l_orderkey")).limit(10)
    },

    // ---- BETWEEN date-range scan with row-group skipping
    QueryDef(
      "q57_quarter_revenue",
      Some(s"""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00'
                             AND TIMESTAMP '1997-03-31 00:00:00'"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate").between(
          lit("1997-01-01").cast("timestamp"), lit("1997-03-31").cast("timestamp")))
        .agg(decSum(col("l_extendedprice")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
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

    // ---- rank-statistics windows: percent_rank / cume_dist / first_value
    // per customer over order spend (total tie order via the key suffix
    // so both engines rank identically; the rational rank divisions are
    // IEEE-exact, so the doubles hash-match bit-for-bit).
    QueryDef(
      "q135_order_percentiles",
      Some("""
        SELECT o_custkey, o_orderkey,
               percent_rank() OVER w AS pr,
               cume_dist() OVER w AS cd,
               first_value(o_orderkey) OVER w AS cheapest_order
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_orderkey"""),
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          first(col("o_orderkey")).over(w).as("cheapest_order"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- per-user EWMA of event values (exponential smoothing,
    // s_t = α·x_t + (1-α)·s_{t-1}, s_1 = x_1): the recursive smoother
    // no window frame can express — each user's ordered series folds
    // ROW-LOCALLY (one groupBy shuffle, then a sequential in-row fold,
    // embarrassingly parallel across users). Both engines run the
    // IDENTICAL fold (DuckDB list_reduce seeds with the first element,
    // exactly this recurrence; α literals interpolated from the same
    // Scala doubles), so the smoothed doubles hash bit-exact with no
    // rounding step.
    {
      val a = 0.3
      val b = 1 - a
      QueryDef(
        "q146_user_ewma",
        Some(s"""
          WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                     FROM events GROUP BY user_id)
          SELECT user_id, CAST(len(vals) AS INT) AS n_events,
                 list_reduce(vals, (acc, x) ->
                   CAST($a AS DOUBLE) * x + CAST($b AS DOUBLE) * acc) AS ewma
          FROM g ORDER BY user_id"""),
      ) { (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("evs"))
          .withColumn("vals", transform(col("evs"), e => e.getField("value")))
          .select(col("user_id"), size(col("vals")).as("n_events"),
            aggregate(
              slice(col("vals"), lit(2),
                greatest(size(col("vals")) - 1, lit(0))),
              element_at(col("vals"), 1),
              (acc, x) => lit(a) * x + lit(b) * acc).as("ewma"))
          .orderBy("user_id")
      }
    },

    // ---- per-user HOLT double exponential smoothing (level + linear
    // trend; Holt 1957): l_t = α·x_t + (1-α)·(l_{t-1}+b_{t-1}),
    // b_t = β·(l_t-l_{t-1}) + (1-β)·b_{t-1}, seeded l_2 = x_2,
    // b_2 = x_2-x_1 — the q146 row-local fold upgraded to a PAIR
    // accumulator. Both engines fold the identical pair recurrence
    // (DuckDB list_reduce seeds with a prepended [l, b] PAIR-LIST — not
    // a struct: DuckDB 1.0 updates struct accumulator fields in place
    // sequentially, so a struct's trend field would read the
    // already-updated level; list accumulators evaluate both elements
    // against the old state. The new level is inlined twice in the
    // trend update in BOTH lambdas, so op order matches term-for-term)
    // — only +,-,* on doubles, hence bit-exact with no rounding step.
    // Users with < 2 events have no defined trend and are excluded.
    {
      val a = 0.5
      val b = 0.3
      QueryDef(
        "q153_user_holt_trend",
        Some(s"""
          WITH g AS (SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                     FROM events GROUP BY user_id HAVING count(*) >= 2),
          st AS (SELECT user_id, CAST(len(vals) AS INT) AS n_events,
                   list_reduce(
                     list_prepend(
                       [vals[2], vals[2] - vals[1]],
                       list_transform(vals[3:], x ->
                         [x, CAST(0 AS DOUBLE)])),
                     (acc, e) ->
                       [CAST($a AS DOUBLE) * e[1] +
                          CAST(${1 - a} AS DOUBLE) * (acc[1] + acc[2]),
                        CAST($b AS DOUBLE) *
                          ((CAST($a AS DOUBLE) * e[1] +
                            CAST(${1 - a} AS DOUBLE) * (acc[1] + acc[2]))
                           - acc[1]) +
                          CAST(${1 - b} AS DOUBLE) * acc[2]]) AS r
                 FROM g)
          SELECT user_id, n_events, r[1] AS level, r[2] AS trend,
                 r[1] + r[2] AS forecast
          FROM st ORDER BY user_id"""),
      ) { (s, dir) =>
        Tables.events(s, dir)
          .groupBy("user_id")
          .agg(array_sort(collect_list(
            struct(col("ts"), col("event_id"), col("value")))).as("evs"))
          .withColumn("vals", transform(col("evs"), e => e.getField("value")))
          .filter(size(col("vals")) >= 2)
          .select(col("user_id"), size(col("vals")).as("n_events"),
            aggregate(
              slice(col("vals"), lit(3),
                greatest(size(col("vals")) - 2, lit(0))),
              struct(
                element_at(col("vals"), 2).as("l"),
                (element_at(col("vals"), 2) - element_at(col("vals"), 1)).as("b")),
              (acc, x) => struct(
                (lit(a) * x + lit(1 - a) *
                  (acc.getField("l") + acc.getField("b"))).as("l"),
                (lit(b) * ((lit(a) * x + lit(1 - a) *
                  (acc.getField("l") + acc.getField("b"))) - acc.getField("l"))
                  + lit(1 - b) * acc.getField("b")).as("b"))).as("r"))
          .select(col("user_id"), col("n_events"),
            col("r.l").as("level"), col("r.b").as("trend"),
            (col("r.l") + col("r.b")).as("forecast"))
          .orderBy("user_id")
      }
    },
  )
}
