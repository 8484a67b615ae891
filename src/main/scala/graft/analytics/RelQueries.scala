package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Det, Tables}

/** Relational operator coverage over the driver testdata (SURVEY §2.2-§2.6):
  * scans, filters, equi/semi/anti joins, hash aggregation, windows, top-k,
  * set ops, rollup. Every query is declarative DataFrame API — Catalyst
  * handles pushdown/pruning/join strategy; dims are explicitly broadcast
  * where the small side is known-bounded (region/nation/supplier/part stay
  * tiny at any scale factor; customer/orders/lineitem grow).
  *
  * Double aggregates use [[graft.core.Det]] exact-decimal sums so results
  * are bit-identical across partitionings and vs. the DuckDB oracle.
  */
object RelQueries {
  import Det.{dsum, davg, sqlSum, sqlAvg}

  val defs: Seq[QueryDef] = Seq(
    // ---- A1/A3/A10: wide hash agg with partial aggregation (TPC-H Q1 shape)
    QueryDef(
      "q01_pricing_summary",
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${sqlSum("l_quantity")} AS sum_qty,
               ${sqlSum("l_extendedprice")} AS sum_base_price,
               ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
               ${sqlAvg("l_quantity")} AS avg_qty,
               ${sqlAvg("l_extendedprice")} AS avg_price,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- J2/A1: star join through orders->customer->nation->region, dims broadcast
    QueryDef(
      "q02_revenue_by_nation",
      Some(s"""
        SELECT r_name, n_name,
               ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // ---- W3 top-k: agg then TakeOrderedAndProject (no full sort at scale)
    QueryDef(
      "q03_top_customers",
      Some(s"""
        SELECT c_custkey, c_name,
               ${sqlSum("o_totalprice")} AS total_spend,
               COUNT(*) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY total_spend DESC, c_custkey
        LIMIT 10"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum(col("o_totalprice")).as("total_spend"), count(lit(1)).as("n_orders"))
        .orderBy(desc("total_spend"), asc("c_custkey"))
        .limit(10)
    },

    // ---- A1/A10/A11 per-segment stats
    QueryDef(
      "q04_segment_stats",
      Some(s"""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               ${sqlAvg("c_acctbal")} AS avg_bal,
               MIN(c_acctbal) AS min_bal,
               MAX(c_acctbal) AS max_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment"""),
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          davg(col("c_acctbal")).as("avg_bal"),
          min("c_acctbal").as("min_bal"),
          max("c_acctbal").as("max_bal"))
        .orderBy("c_mktsegment")
    },

    // ---- P3 predicate + projection pushdown to parquet
    QueryDef(
      "q05_filter_project",
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
        WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        ORDER BY l_orderkey, l_linenumber"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_quantity") > 45 &&
          col("l_shipdate") >= lit("2000-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- W1 quintile bucketing (NTILE) — reference RFM segmentation shape
    QueryDef(
      "q06_acctbal_quintiles",
      Some("""
        SELECT c_custkey,
               NTILE(5) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quintile
        FROM customer
        ORDER BY c_custkey"""),
    ) { (s, dir) =>
      Tables.customer(s, dir)
        .withColumn("bal_quintile",
          ntile(5).over(Window.orderBy(col("c_acctbal"), col("c_custkey"))))
        .select("c_custkey", "bal_quintile")
        .orderBy("c_custkey")
    },

    // ---- W4 row_number: latest order per customer
    QueryDef(
      "q07_latest_order",
      Some("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders)
        WHERE rn = 1
        ORDER BY o_custkey"""),
    ) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy("o_custkey")
    },

    // ---- A5/A6/D1: distinct + dedup counts in one pass
    QueryDef(
      "q08_distinct_stats",
      Some("""
        SELECT COUNT(*) AS n_rows,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(DISTINCT l_suppkey) AS n_supps
        FROM lineitem"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
    },

    // ---- semi + anti joins (J-menu): per-customer big-spender flag
    QueryDef(
      "q09_big_order_customers",
      Some("""
        SELECT c_custkey, c_name, 1 AS has_big_order FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        UNION ALL
        SELECT c_custkey, c_name, 0 AS has_big_order FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey"""),
    ) { (s, dir) =>
      val big = Tables.orders(s, dir).filter(col("o_totalprice") > 400000)
      val cust = Tables.customer(s, dir)
      cust.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), lit(1).as("has_big_order"))
        .unionAll(
          cust.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
            .select(col("c_custkey"), col("c_name"), lit(0).as("has_big_order")))
        .orderBy("c_custkey")
    },

    // ---- A4 null audit: one wide agg pass (reference Q1 completeness check)
    QueryDef(
      "q10_null_audit",
      Some("""
        SELECT COUNT(*) - COUNT(o_custkey) AS nulls_custkey,
               COUNT(*) - COUNT(o_totalprice) AS nulls_totalprice,
               COUNT(*) - COUNT(o_orderdate) AS nulls_orderdate,
               COUNT(*) - COUNT(o_orderstatus) AS nulls_orderstatus
        FROM orders"""),
    ) { (s, dir) =>
      val df = Tables.orders(s, dir)
      df.agg(
        sum(col("o_custkey").isNull.cast("long")).as("nulls_custkey"),
        sum(col("o_totalprice").isNull.cast("long")).as("nulls_totalprice"),
        sum(col("o_orderdate").isNull.cast("long")).as("nulls_orderdate"),
        sum(col("o_orderstatus").isNull.cast("long")).as("nulls_orderstatus"))
    },

    // ---- UNPIVOT/melt: the q10 wide null-audit row in long form — one
    // (column, n_nulls) row per audited column, the shape monitoring
    // systems ingest. Spark's native unpivot (Expand, no shuffle).
    QueryDef(
      "q118_null_audit_long",
      Some("""
        WITH w AS (
          SELECT COUNT(*) - COUNT(o_custkey) AS o_custkey,
                 COUNT(*) - COUNT(o_totalprice) AS o_totalprice,
                 COUNT(*) - COUNT(o_orderdate) AS o_orderdate,
                 COUNT(*) - COUNT(o_orderstatus) AS o_orderstatus
          FROM orders)
        SELECT column_name, n_nulls
        FROM (UNPIVOT w ON o_custkey, o_totalprice, o_orderdate, o_orderstatus
              INTO NAME column_name VALUE n_nulls)
        ORDER BY column_name"""),
    ) { (s, dir) =>
      val audited = Seq("o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus")
      Tables.orders(s, dir)
        .agg(sum(col(audited.head).isNull.cast("long")).as(audited.head),
          audited.tail.map(c => sum(col(c).isNull.cast("long")).as(c)): _*)
        .unpivot(Array.empty, audited.map(col).toArray, "column_name", "n_nulls")
        .orderBy("column_name")
    },

    // ---- referential-integrity audit: orphaned foreign keys across the
    // star schema (orders→customer, lineitem→orders, lineitem→part) in
    // one union of anti-join counts — the cross-table twin of the q10
    // null audit, and the gate a warehouse load runs before publish.
    QueryDef(
      "q124_orphan_audit",
      Some("""
        SELECT 'orders.o_custkey' AS fk, (SELECT COUNT(*) FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
          AS n_orphans
        UNION ALL
        SELECT 'lineitem.l_orderkey', (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        UNION ALL
        SELECT 'lineitem.l_partkey', (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        ORDER BY fk"""),
    ) { (s, dir) =>
      // ONE Spark job: each FK edge contributes a lazy anti-join global
      // aggregate (always exactly one row, even at zero orphans), and
      // the union evaluates all edges in a single action — no per-edge
      // driver-side count loop.
      def orphans(fk: String, child: org.apache.spark.sql.DataFrame,
          childKey: String, parent: org.apache.spark.sql.DataFrame,
          parentKey: String): org.apache.spark.sql.DataFrame =
        child.join(parent.select(col(parentKey)),
            col(childKey) === col(parentKey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(fk).as("fk"), col("n_orphans"))
      orphans("orders.o_custkey", Tables.orders(s, dir), "o_custkey",
          Tables.customer(s, dir), "c_custkey")
        .unionByName(orphans("lineitem.l_orderkey", Tables.lineitem(s, dir),
          "l_orderkey", Tables.orders(s, dir), "o_orderkey"))
        .unionByName(orphans("lineitem.l_partkey", Tables.lineitem(s, dir),
          "l_partkey", Tables.part(s, dir), "p_partkey"))
        .orderBy("fk")
    },

    // ---- correlated subqueries: above-nation-average customers who have
    // ordered — a correlated SCALAR subquery (decorrelated by Catalyst to
    // an aggregate + join) plus a correlated EXISTS (left-semi). The
    // per-nation average uses the Det decimal-exact sum on BOTH engines,
    // so the comparison boundary is bit-identical. spark.sql is the
    // product surface here: the DataFrame API has no correlated-subquery
    // constructor, and the decorrelation rewrite is precisely the
    // Catalyst capability this query exercises.
    QueryDef(
      "q120_above_avg_customers",
      Some(s"""
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT ${graft.core.Det.sqlAvg("c2.c_acctbal")}
                           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey"""),
    ) { (s, dir) =>
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE c_acctbal > (SELECT ${graft.core.Det.sqlAvg("c2.c_acctbal")}
                           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
          AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        ORDER BY c_custkey""")
    },

    // ---- full set-operation surface (§2.6): INTERSECT / EXCEPT on the
    // buyer key sets of two eras (customer retention/churn/acquisition),
    // plus the MULTISET variants — EXCEPT ALL / INTERSECT ALL over the
    // order-priority bags, aggregated to counts so the multiset
    // semantics (max(m-n,0) / min(m,n) copies) are what the hash
    // checks. All four ops shuffle on the compared row as the key with
    // map-side distinct/count — no driver materialization, broadcast
    // nothing: both sides are fact-sized.
    QueryDef(
      "q137_set_ops",
      Some("""
        WITH a AS (SELECT o_custkey FROM orders
                   WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        b AS (SELECT o_custkey FROM orders
              WHERE o_orderdate >= TIMESTAMP '1998-01-01'),
        pa AS (SELECT o_orderpriority FROM orders
               WHERE o_orderdate < TIMESTAMP '1998-01-01'),
        pb AS (SELECT o_orderpriority FROM orders
               WHERE o_orderdate >= TIMESTAMP '1998-01-01')
        SELECT 'retained' AS tag, CAST(o_custkey AS VARCHAR) AS key,
               CAST(1 AS BIGINT) AS cnt
        FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)
        UNION ALL
        SELECT 'churned', CAST(o_custkey AS VARCHAR), 1
        FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
        UNION ALL
        SELECT 'acquired', CAST(o_custkey AS VARCHAR), 1
        FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
        UNION ALL
        SELECT 'excess_priority', o_orderpriority, count(*)
        FROM (SELECT * FROM pa EXCEPT ALL SELECT * FROM pb)
        GROUP BY o_orderpriority
        UNION ALL
        SELECT 'common_priority', o_orderpriority, count(*)
        FROM (SELECT * FROM pa INTERSECT ALL SELECT * FROM pb)
        GROUP BY o_orderpriority
        ORDER BY tag, key"""),
    ) { (s, dir) =>
      val orders = Tables.orders(s, dir)
      val cut = lit("1998-01-01").cast("timestamp")
      val a = orders.filter(col("o_orderdate") < cut).select("o_custkey")
      val b = orders.filter(col("o_orderdate") >= cut).select("o_custkey")
      val pa = orders.filter(col("o_orderdate") < cut).select("o_orderpriority")
      val pb = orders.filter(col("o_orderdate") >= cut).select("o_orderpriority")
      def keyed(df: DataFrame, tag: String) = df
        .select(lit(tag).as("tag"),
          col("o_custkey").cast("string").as("key"), lit(1L).as("cnt"))
      keyed(a.intersect(b), "retained")
        .unionByName(keyed(a.except(b), "churned"))
        .unionByName(keyed(b.except(a), "acquired"))
        .unionByName(pa.exceptAll(pb).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .select(lit("excess_priority").as("tag"),
            col("o_orderpriority").as("key"), col("cnt")))
        .unionByName(pa.intersectAll(pb).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .select(lit("common_priority").as("tag"),
            col("o_orderpriority").as("key"), col("cnt")))
        .orderBy("tag", "key")
    },
  )
}
