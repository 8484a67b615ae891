package graft.analytics

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Det, Tables}

/** Statistics, windowing, set-ops, JSON and calendar coverage (SURVEY §2.4,
  * §2.5, §2.7): quantiles, z-score (the reference's F10 normalize with the
  * scalable agg-then-broadcast pattern, not a global window), per-group mode
  * with pandas tie-breaking, correlation via exact power sums, rollup,
  * pivot-style conditional aggregation, JSON extraction, limit/offset.
  */
object AggQueries {
  import Det.{dsum, davg, sqlSum, sqlAvg}

  // Mirrors sklearn StandardScaler (population stddev, SURVEY §2.4 A10):
  // stats come from one aggregate job and re-enter the row-level plan as a
  // broadcast 1-row frame — no global window, so it scales to any row count.

  val defs: Seq[QueryDef] = Seq(
    // ---- A7/A9 exact percentiles (pandas-median parity: linear interpolation)
    QueryDef(
      "q11_quantiles",
      Some("""
        SELECT quantile_cont(l_quantity, 0.25) AS qty_q1,
               quantile_cont(l_quantity, 0.50) AS qty_med,
               quantile_cont(l_quantity, 0.75) AS qty_q3,
               quantile_cont(l_extendedprice, 0.50) AS price_med
        FROM lineitem"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        expr("percentile(l_quantity, 0.25)").as("qty_q1"),
        expr("percentile(l_quantity, 0.50)").as("qty_med"),
        expr("percentile(l_quantity, 0.75)").as("qty_q3"),
        expr("percentile(l_extendedprice, 0.50)").as("price_med"))
    },

    // ---- F1 binning (pd.cut right-closed intervals) as CASE chain
    QueryDef(
      "q12_price_bands",
      Some("""
        SELECT CASE WHEN o_totalprice <= 100000 THEN 'low'
                    WHEN o_totalprice <= 250000 THEN 'mid'
                    WHEN o_totalprice <= 400000 THEN 'high'
                    ELSE 'very_high' END AS band,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1 ORDER BY band"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .withColumn("band",
          when(col("o_totalprice") <= 100000, "low")
            .when(col("o_totalprice") <= 250000, "mid")
            .when(col("o_totalprice") <= 400000, "high")
            .otherwise("very_high"))
        .groupBy("band").agg(count(lit(1)).as("n_orders"))
        .orderBy("band")
    },

    // ---- F10 z-score normalization, agg-then-broadcast (no global window)
    QueryDef(
      "q13_zscore_acctbal",
      Some(s"""
        SELECT c_custkey,
               (c_acctbal - m) / sqrt(sq / n - m * m) AS bal_z
        FROM customer CROSS JOIN (
          SELECT ${sqlSum("c_acctbal")} / COUNT(c_acctbal) AS m,
                 ${sqlSum("c_acctbal * c_acctbal")} AS sq,
                 COUNT(c_acctbal) AS n
          FROM customer)
        ORDER BY c_custkey"""),
    ) { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val stats = cust.agg(
        davg(col("c_acctbal")).as("m"),
        dsum(col("c_acctbal") * col("c_acctbal")).as("sq"),
        count(col("c_acctbal")).as("n"))
      cust.crossJoin(broadcast(stats))
        .select(col("c_custkey"),
          ((col("c_acctbal") - col("m")) /
            sqrt(col("sq") / col("n") - col("m") * col("m"))).as("bal_z"))
        .orderBy("c_custkey")
    },

    // ---- A8 mode per group with pandas tie-break (count desc, value asc)
    QueryDef(
      "q14_user_top_event",
      Some("""
        SELECT user_id, event_type AS top_event, cnt FROM (
          SELECT user_id, event_type, COUNT(*) AS cnt,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type)
        WHERE rn = 1 ORDER BY user_id"""),
    ) { (s, dir) =>
      val w = Window.partitionBy("user_id").orderBy(desc("cnt"), asc("event_type"))
      Tables.events(s, dir)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("top_event"), col("cnt"))
        .orderBy("user_id")
    },

    // ---- A12 Pearson correlation via exact power sums (deterministic)
    QueryDef(
      "q15_corr_qty_price",
      Some(s"""
        SELECT (sxy - sx * sy / n) /
               (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
        FROM (
          SELECT COUNT(*) AS n,
                 ${sqlSum("l_quantity")} AS sx,
                 ${sqlSum("l_extendedprice")} AS sy,
                 ${sqlSum("l_quantity * l_quantity")} AS sxx,
                 ${sqlSum("l_extendedprice * l_extendedprice")} AS syy,
                 ${sqlSum("l_quantity * l_extendedprice")} AS sxy
          FROM lineitem)"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .agg(Det.dcorr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"))
    },

    // ---- temporal bucketing: daily event rollup (cast to DATE both sides)
    QueryDef(
      "q16_events_daily",
      Some(s"""
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
               COUNT(*) AS n_events,
               ${sqlSum("value")} AS sum_value,
               ${sqlAvg("value")} AS avg_value
        FROM events
        GROUP BY 1, 2 ORDER BY day, event_type"""),
    ) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          dsum(col("value")).as("sum_value"),
          davg(col("value")).as("avg_value"))
        .orderBy("day", "event_type")
    },

    // ---- ROLLUP hierarchy totals (free from Spark; NULLS FIRST on both sides)
    QueryDef(
      "q17_revenue_rollup",
      Some(s"""
        SELECT r_name, n_name, ${sqlSum("o_totalprice")} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""),
    ) { (s, dir) =>
      // Via spark.sql: the DataFrame rollup path trips the ambiguous-self-
      // join check on Expand's duplicated attribute IDs; SQL GROUPING SETS
      // analysis does not. Plan (Expand + partial/final hash agg) is the same.
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.nation(s, dir).createOrReplaceTempView("nation")
      Tables.region(s, dir).createOrReplaceTempView("region")
      s.sql(s"""
        SELECT r_name, n_name, ${sqlSum("o_totalprice")} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""")
    },

    // ---- calendar functions: orders by year/month
    QueryDef(
      "q18_orders_by_month",
      Some(s"""
        SELECT CAST(year(o_orderdate) AS INT) AS yr, CAST(month(o_orderdate) AS INT) AS mo,
               COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
        FROM orders GROUP BY 1, 2 ORDER BY yr, mo"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy("yr", "mo")
    },

    // ---- set op: INTERSECT of order-placing customers and event users
    QueryDef(
      "q19_active_buyers",
      Some("""
        SELECT id FROM (
          SELECT o_custkey AS id FROM orders
          INTERSECT
          SELECT user_id AS id FROM events)
        ORDER BY id"""),
    ) { (s, dir) =>
      Tables.orders(s, dir).select(col("o_custkey").as("id"))
        .intersect(Tables.events(s, dir).select(col("user_id").as("id")))
        .orderBy("id")
    },

    // ---- P5 LIMIT/OFFSET pagination (deterministic via unique tiebreak)
    QueryDef(
      "q20_page_two",
      Some("""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10 OFFSET 20"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(20).limit(10)
    },

    // ---- W3/W4 top-k per group via ranked window
    QueryDef(
      "q21_top_orders_per_status",
      Some("""
        SELECT o_orderstatus, o_orderkey, o_totalprice, rn FROM (
          SELECT o_orderstatus, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
        WHERE rn <= 3 ORDER BY o_orderstatus, rn"""),
    ) { (s, dir) =>
      val w = Window.partitionBy("o_orderstatus")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_orderstatus", "rn")
    },

    // ---- F13-style pivot: conditional aggregation per event type
    QueryDef(
      "q22_user_event_pivot",
      Some(s"""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
               CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
               ${sqlSum("CASE WHEN event_type = 'purchase' THEN value ELSE 0 END")} AS purchase_value
        FROM events GROUP BY user_id ORDER BY user_id"""),
    ) { (s, dir) =>
      def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0))
      Tables.events(s, dir).groupBy("user_id").agg(
        cnt("click").as("n_click"),
        cnt("view").as("n_view"),
        cnt("purchase").as("n_purchase"),
        cnt("signup").as("n_signup"),
        cnt("error").as("n_error"),
        dsum(when(col("event_type") === "purchase", col("value")).otherwise(lit(0.0)))
          .as("purchase_value"))
        .orderBy("user_id")
    },

    // ---- JSON extraction from the props payload column
    QueryDef(
      "q23_json_props",
      Some(s"""
        SELECT event_type,
               ${sqlAvg("CAST(props->>'" + "$.k' AS BIGINT)")} AS avg_k,
               MIN(CAST(props->>'$$.k' AS BIGINT)) AS min_k,
               MAX(CAST(props->>'$$.k' AS BIGINT)) AS max_k
        FROM events GROUP BY event_type ORDER BY event_type"""),
    ) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast("bigint")
      Tables.events(s, dir)
        .withColumn("k", k)
        .groupBy("event_type")
        .agg(davg(col("k")).as("avg_k"), min("k").as("min_k"), max("k").as("max_k"))
        .orderBy("event_type")
    },

    // ---- string functions over part
    QueryDef(
      "q24_part_strings",
      Some("""
        SELECT p_partkey,
               upper(p_brand) AS brand_u,
               length(p_name) AS name_len,
               CAST(p_name LIKE '%green%' AS INT) AS has_green,
               replace(p_type, ' ', '_') AS type_id
        FROM part ORDER BY p_partkey"""),
    ) { (s, dir) =>
      Tables.part(s, dir).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        col("p_name").contains("green").cast("int").as("has_green"),
        regexp_replace(col("p_type"), " ", "_").as("type_id"))
        .orderBy("p_partkey")
    },

    // ---- F2 zero-guarded ratio (the reference's x / y.replace(0,1) idiom).
    // The per-row quotient is summed as floor(q * 1e4) in BIGINT: double
    // multiply/divide/floor are IEEE-identical in Spark and DuckDB, and the
    // integer sum is exact, so the result is bit-deterministic under any
    // partitioning — summing raw double quotients (even via a decimal cast)
    // trips engine-specific rounding of the cast at the 6th decimal.
    // The per-pair floored values are ~3e8, so the SUM runs in
    // DECIMAL(38,0) on both engines (a BIGINT sum would silently wrap in
    // non-ANSI Spark around sf~1e3 while DuckDB promotes to hugeint);
    // only the final total is cast back to BIGINT.
    QueryDef(
      "q25_unit_price",
      Some("""
        SELECT l_returnflag,
               CAST(SUM(CAST(floor(l_extendedprice * 10000 /
                 (CASE WHEN l_quantity = 0 THEN 1 ELSE l_quantity END)) AS DECIMAL(38,0))) AS BIGINT)
                 AS sum_unit_price_e4
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    ) { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(sum(floor(col("l_extendedprice") * 10000 /
          when(col("l_quantity") === 0, 1).otherwise(col("l_quantity")))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
          .cast("long")
          .as("sum_unit_price_e4"))
        .orderBy("l_returnflag")
    },

    // ---- per-user daily gap-fill + forward fill: materialize the
    // missing days of each user's active span as zero-activity rows and
    // carry the last active day's (decimal-exact) sum forward — the
    // resample/ffill grid every windowed feature pipeline consumes.
    QueryDef(
      "q105_daily_gap_fill",
      Some(graft.ops.TimeSeries.gapFillDailyOracleSql),
    ) { (s, dir) =>
      graft.ops.TimeSeries.gapFillDaily(Tables.events(s, dir),
          "user_id", "ts", "value")
        .orderBy("user_id", "day")
    },

    // ---- conversion funnel: per user, the first click and the first
    // purchase AFTER it; converted = purchase within 7 days. Timestamps
    // compared as exact micros (unix_micros/epoch_us) — no float time
    // arithmetic. Two hash aggregations + one user-keyed join; no window.
    QueryDef(
      "q109_click_purchase_funnel",
      Some("""
        WITH fc AS (SELECT user_id, min(epoch_us(ts)) AS fc_us
                    FROM events WHERE event_type = 'click' GROUP BY user_id),
        fp AS (SELECT e.user_id, min(epoch_us(e.ts)) AS fp_us
               FROM events e JOIN fc ON e.user_id = fc.user_id
               WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.fc_us
               GROUP BY e.user_id)
        SELECT fc.user_id, fc.fc_us, fp.fp_us,
               COALESCE(fp.fp_us - fc.fc_us <= 604800000000, FALSE) AS converted
        FROM fc LEFT JOIN fp ON fc.user_id = fp.user_id
        ORDER BY fc.user_id"""),
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val fc = ev.filter(col("event_type") === "click")
        .groupBy("user_id").agg(min("us").as("fc_us"))
      val fp = ev.filter(col("event_type") === "purchase")
        .join(fc, "user_id").filter(col("us") > col("fc_us"))
        .groupBy("user_id").agg(min("us").as("fp_us"))
      fc.join(fp, Seq("user_id"), "left")
        .select(col("user_id"), col("fc_us"), col("fp_us"),
          coalesce(col("fp_us") - col("fc_us") <= 604800000000L, lit(false))
            .as("converted"))
        .orderBy("user_id")
    },

    // ---- weekly cohort retention: cohort = ISO week of first activity;
    // cell (cohort_week, week_offset) counts users active in that week.
    // Monday-aligned date_trunc on both engines; offsets are exact
    // integer day-diffs / 7.
    QueryDef(
      "q110_cohort_retention",
      Some("""
        WITH uw AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS week
                    FROM events),
        cohort AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
        SELECT c.cohort_week, date_diff('day', c.cohort_week, uw.week) // 7 AS week_offset,
               count(*) AS n_active
        FROM uw JOIN cohort c ON uw.user_id = c.user_id
        GROUP BY 1, 2 ORDER BY 1, 2"""),
    ) { (s, dir) =>
      val uw = Tables.events(s, dir)
        .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      val cohort = uw.groupBy("user_id").agg(min("week").as("cohort_week"))
      uw.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy("cohort_week", "week_offset")
    },

    // ---- explicit GROUPING SETS with grouping_id: two disjoint
    // aggregation shapes in one pass ((status, priority) detail and
    // (priority) margins, NOT a rollup) — same Expand plan as q17/q47,
    // exercised with a mixed set list and the grouping-bitmap column.
    QueryDef(
      "q119_status_grouping_sets",
      Some(s"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
                 AS gid,
               COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
    ) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      s.sql(s"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
                 AS gid,
               COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    },

    // ---- event-time RANGE window frame: per-user 7-day rolling spend —
    // the frame is bounded by TIME (RANGE BETWEEN INTERVAL), not row
    // count, so sparse and bursty users get the same semantics. Spark SQL
    // surface (the DataFrame rangeBetween API takes only numeric
    // offsets); decimal-exact sums both sides.
    QueryDef(
      "q121_rolling_7d_spend",
      Some(s"""
        SELECT user_id, epoch_us(ts) AS ts_us,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS spend_7d
        FROM events ORDER BY user_id, ts_us"""),
    ) { (s, dir) =>
      Tables.events(s, dir).createOrReplaceTempView("events")
      s.sql("""
        SELECT user_id, unix_micros(ts) AS ts_us,
               CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
                 PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
                 AS DOUBLE) AS spend_7d
        FROM events ORDER BY user_id, ts_us""")
    },

    // ---- burst-head dedup ("debounce"): first event of each 4-hour
    // activity burst per (user, event_type) — duplicate-suppression for
    // retry-prone event emitters, island formulation (see the operator
    // scaladoc for why not the order-chained variant).
    QueryDef(
      "q123_burst_head_events",
      Some("""
        WITH o AS (SELECT event_id, user_id, event_type, ts,
                     LAG(ts) OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS prev
                   FROM events),
        s AS (SELECT *, SUM(CASE WHEN prev IS NULL OR
                       epoch_us(ts) - epoch_us(prev) >= CAST(14400 AS BIGINT) * 1000000
                       THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS sid
              FROM o),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type, sid
                                           ORDER BY ts, event_id) AS rn
              FROM s)
        SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
        FROM r WHERE rn = 1 ORDER BY event_id"""),
    ) { (s, dir) =>
      graft.ops.TimeSeries.burstHeads(
          Tables.events(s, dir).select("event_id", "user_id", "event_type", "ts"),
          Seq("user_id", "event_type"), "ts", "event_id", gapSeconds = 14400L)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy("event_id")
    },

    // ---- market-basket co-occurrence: part pairs ordered together in
    // >= 2 orders (the pairwise support core of frequent-itemset mining).
    // Per-order self-join — bounded by basket size (TPC-H <= 7 lines), so
    // pair generation is linear in orders, never corpus-quadratic.
    QueryDef(
      "q111_copurchase_pairs",
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               count(*) AS n_orders
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        ORDER BY part_a, part_b"""),
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 2)
        .orderBy("part_a", "part_b")
    },

    // ---- distributed PageRank over the co-purchase graph (parts linked
    // when they share an order, both directions): 4 rounds of INTEGER-
    // EXACT fixed-point iteration — rank at scale 1e12, floor-div only —
    // so the oracle UNROLLS the same four rounds as CTEs and hash-matches
    // bit-for-bit. The Pregel-as-joins shape: one edge join + one dst
    // aggregation per round, lineage cut every 2 rounds.
    QueryDef(
      "q133_part_pagerank",
      Some {
        val rounds = (1 to 4).map { k =>
          s"""r$k AS (SELECT nodes.node,
               CAST(150000000000 + (85 * coalesce(c.contrib, 0)) // 100
                    AS BIGINT) AS rank
             FROM nodes LEFT JOIN (
               SELECT e.dst AS node,
                      CAST(sum(r${k - 1}.rank // deg.deg) AS BIGINT) AS contrib
               FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src
                      JOIN deg ON deg.src = e.src
               GROUP BY e.dst) c ON c.node = nodes.node)"""
        }.mkString(",\n")
        s"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT node,
                 CAST(1000000000000 // (SELECT count(*) FROM nodes) AS BIGINT)
                   AS rank FROM nodes),
        $rounds
        SELECT node AS part, rank AS rank_e12 FROM r4 ORDER BY part"""
      },
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
      graft.ops.PageRank.pageRank(edges, "src", "dst", iters = 4)
        .select(col("node").as("part"), col("rank").as("rank_e12"))
        .orderBy("part")
    },

    // ---- per-part TRIANGLE counts over the co-purchase graph (each
    // triangle counted at all 3 vertices): wedges under the id
    // orientation a<b<c close against the edge set in one equi-join —
    // never a cartesian. The oracle replays the same two self-joins.
    QueryDef(
      "q134_copurchase_triangles",
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1 JOIN e e2 ON e1.v = e2.u
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        roles AS (SELECT a AS part FROM tri UNION ALL
                  SELECT b FROM tri UNION ALL SELECT c FROM tri)
        SELECT part, count(*) AS n_triangles FROM roles
        GROUP BY part ORDER BY part"""),
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.PageRank.triangleCounts(edges, "src", "dst")
        .orderBy("part")
    },

    // ---- label-propagation communities over the co-purchase graph:
    // 3 synchronous rounds, most-frequent-neighbor label with min-label
    // tie-break — a deterministic integer function of the previous
    // labeling, so the oracle UNROLLS the rounds as CTEs (the q133
    // fixed-point pattern applied to community detection).
    QueryDef(
      "q160_copurchase_communities",
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
        l0 AS (SELECT DISTINCT u AS node, u AS lab FROM sym),
        s1 AS (SELECT s.u AS node, l.lab, count(*) AS c
               FROM sym s JOIN l0 l ON l.node = s.v GROUP BY 1, 2),
        l1 AS (SELECT node, lab FROM (SELECT node, lab,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, lab ASC) AS rn FROM s1) WHERE rn = 1),
        s2 AS (SELECT s.u AS node, l.lab, count(*) AS c
               FROM sym s JOIN l1 l ON l.node = s.v GROUP BY 1, 2),
        l2 AS (SELECT node, lab FROM (SELECT node, lab,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, lab ASC) AS rn FROM s2) WHERE rn = 1),
        s3 AS (SELECT s.u AS node, l.lab, count(*) AS c
               FROM sym s JOIN l2 l ON l.node = s.v GROUP BY 1, 2),
        l3 AS (SELECT node, lab FROM (SELECT node, lab,
                 row_number() OVER (PARTITION BY node
                   ORDER BY c DESC, lab ASC) AS rn FROM s3) WHERE rn = 1)
        SELECT node AS part, lab AS community FROM l3 ORDER BY part"""),
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      graft.ops.Components.labelPropagation(edges, "src", "dst", rounds = 3)
        .select(col("node").as("part"), col("lab").as("community"))
        .orderBy("part")
    },

    // ---- single-source BFS shortest hop counts over the co-purchase
    // graph, from its smallest part id: level-synchronous frontier
    // expansion (one edge join + one visited anti-join per level) —
    // integer-exact, so the oracle replays the traversal as a
    // recursive CTE with row-dedup UNION and takes min(hops) per node.
    QueryDef(
      "q138_bfs_hops",
      Some("""
        WITH RECURSIVE li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        bfs(node, hops) AS (
          SELECT (SELECT min(src) FROM e), 0
          UNION
          SELECT e.dst, bfs.hops + 1 FROM bfs JOIN e ON e.src = bfs.node
          WHERE bfs.hops < 4)
        SELECT node AS part, CAST(min(hops) AS INT) AS hops
        FROM bfs GROUP BY node ORDER BY part"""),
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // checkpointed BEFORE the start probe (r16): the probe and the BFS
      // loop share one materialization of the edge derivation instead of
      // each replaying the li self-join + distinct
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
        .localCheckpoint(true)
      // the start scalar is one tiny agg (stat-broadcast class, SURVEY §4.1)
      val start = edges.agg(min("src")).head.getLong(0)
      graft.ops.Components.bfsHops(edges, "src", "dst", start, maxHops = 4)
        .select(col("node").as("part"), col("hops"))
        .orderBy("part")
    },

    // ---- PERSONALIZED PageRank from the 3 smallest parts: teleport
    // mass restricted to the source set — random-walk-with-restart
    // proximity, the graph-similarity score under the same integer-exact
    // fixed-point arithmetic as q133, so the oracle unrolls the same
    // 3 rounds bit-for-bit with a CASE teleport.
    QueryDef(
      "q148_personalized_pagerank",
      Some {
        val tp = (1000000000000L * 15L) / 100L / 3L
        val init = 1000000000000L / 3L
        val rounds = (1 to 3).map { k =>
          s"""r$k AS (SELECT nodes.node,
               CAST((CASE WHEN nodes.node IN (SELECT node FROM srcs)
                     THEN $tp ELSE 0 END)
                    + (85 * coalesce(c.contrib, 0)) // 100 AS BIGINT) AS rank
             FROM nodes LEFT JOIN (
               SELECT e.dst AS node,
                      CAST(sum(r${k - 1}.rank // deg.deg) AS BIGINT) AS contrib
               FROM e JOIN r${k - 1} ON r${k - 1}.node = e.src
                      JOIN deg ON deg.src = e.src
               GROUP BY e.dst) c ON c.node = nodes.node)"""
        }.mkString(",\n")
        s"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        srcs AS (SELECT node FROM nodes ORDER BY node LIMIT 3),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT node,
                 CAST(CASE WHEN node IN (SELECT node FROM srcs)
                      THEN $init ELSE 0 END AS BIGINT) AS rank FROM nodes),
        $rounds
        SELECT node AS part, rank AS rank_e12 FROM r3 ORDER BY part"""
      },
    ) { (s, dir) =>
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      // checkpointed BEFORE the sources probe (r16): the probe and the
      // rank loop share one materialization of the edge derivation
      val edges = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") =!= col("b.l_partkey"))
        .select(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
        .distinct()
        .localCheckpoint(true)
      val sources = edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node"))).distinct()
        .orderBy("node").limit(3).collect().map(_.getLong(0)).toSeq
      graft.ops.PageRank.personalizedPageRank(edges, "src", "dst",
        sources, iters = 3)
        .select(col("node").as("part"), col("rank").as("rank_e12"))
        .orderBy("part")
    },

    // ---- Apriori frequent itemsets (size 1-3, support >= 2 orders)
    // over the order->part baskets: the downward-closure prune bounds
    // candidate growth (items below support never reach pair counting,
    // pairs never extend to triples unpruned) — the oracle counts the
    // SAME sets with bare HAVING clauses, because pruning changes cost,
    // never answers; the hash match proves exactly that.
    QueryDef(
      "q142_frequent_itemsets",
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                    FROM lineitem),
        l1 AS (SELECT it, count(*) AS support FROM li
               GROUP BY it HAVING count(*) >= 2),
        l2 AS (SELECT a.it AS a, b.it AS b, count(*) AS support
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
               GROUP BY a.it, b.it HAVING count(*) >= 2),
        l3 AS (SELECT a.it AS a, b.it AS b, c.it AS c, count(*) AS support
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
                    JOIN li c ON c.bk = a.bk AND c.it > b.it
               GROUP BY a.it, b.it, c.it HAVING count(*) >= 2)
        SELECT 1 AS size, CAST(it AS VARCHAR) AS items, support FROM l1
        UNION ALL
        SELECT 2, CAST(a AS VARCHAR) || ',' || CAST(b AS VARCHAR), support
        FROM l2
        UNION ALL
        SELECT 3, CAST(a AS VARCHAR) || ',' || CAST(b AS VARCHAR) || ',' ||
               CAST(c AS VARCHAR), support
        FROM l3
        ORDER BY size, items"""),
    ) { (s, dir) =>
      graft.ops.Itemsets.apriori(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2, maxSize = 3)
        .orderBy("size", "items")
    },

    // ---- association rules x → y from q142's frequent pairs, with
    // confidence and lift: the recommendation layer over the itemset
    // lattice. Every statistic is a single division of exact integer
    // counts (deterministic under any partitioning); the basket total
    // broadcasts as a 1-row frame. Oracle recounts the same pairs with
    // bare HAVING — pruning changes cost, never answers (q142's proof
    // carried to the rule layer).
    QueryDef(
      "q175_association_rules",
      Some("""
        WITH li AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
                    FROM lineitem),
        nb AS (SELECT COUNT(DISTINCT bk) AS n_baskets FROM li),
        l1 AS (SELECT it, count(*) AS support FROM li
               GROUP BY it HAVING count(*) >= 2),
        l2 AS (SELECT a.it AS a, b.it AS b, count(*) AS support_ab
               FROM li a JOIN li b ON a.bk = b.bk AND a.it < b.it
               GROUP BY a.it, b.it HAVING count(*) >= 2),
        d AS (SELECT a AS x, b AS y, support_ab FROM l2
              UNION ALL
              SELECT b AS x, a AS y, support_ab FROM l2)
        SELECT d.x AS antecedent, d.y AS consequent,
               sx.support AS support_x, sy.support AS support_y,
               d.support_ab, (SELECT n_baskets FROM nb) AS n_baskets,
               CAST(d.support_ab AS DOUBLE) / sx.support AS confidence,
               (CAST(d.support_ab AS DOUBLE) / sx.support) /
                 (CAST(sy.support AS DOUBLE) / (SELECT n_baskets FROM nb)) AS lift
        FROM d JOIN l1 sx ON sx.it = d.x JOIN l1 sy ON sy.it = d.y
        ORDER BY antecedent, consequent"""),
    ) { (s, dir) =>
      graft.ops.Itemsets.rules(
        Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minSupport = 2)
        .orderBy("antecedent", "consequent")
    },

    // ---- robust outlier statistics per group: median, MAD (median
    // absolute deviation), and the count beyond the 3σ-equivalent MAD
    // fence (1.4826·MAD ≈ σ for normal data) — the outlier screen that
    // survives the heavy tails that break z-scores. Three small
    // aggregations shuffling only the group key; the per-row rescans
    // join the tiny per-group stats back broadcast (stat-broadcast
    // class, SURVEY §4.1). Exact interpolating percentiles both sides
    // (Spark `percentile` ≡ DuckDB `quantile_cont`, the q11 contract).
    QueryDef(
      "q140_mad_outliers",
      Some("""
        WITH med AS (SELECT c_nationkey, quantile_cont(c_acctbal, 0.5) AS med
                     FROM customer GROUP BY c_nationkey),
        dev AS (SELECT c.c_nationkey, med.med,
                       abs(c.c_acctbal - med.med) AS adev
                FROM customer c JOIN med ON med.c_nationkey = c.c_nationkey),
        mad AS (SELECT c_nationkey, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY c_nationkey)
        SELECT dev.c_nationkey, count(*) AS n, max(dev.med) AS med,
               max(mad.mad) AS mad,
               CAST(sum(CASE WHEN adev > 3.0*1.4826*mad.mad
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev JOIN mad ON mad.c_nationkey = dev.c_nationkey
        GROUP BY dev.c_nationkey ORDER BY dev.c_nationkey"""),
    ) { (s, dir) =>
      val cust = Tables.customer(s, dir).select("c_nationkey", "c_acctbal")
      val med = cust.groupBy("c_nationkey")
        .agg(expr("percentile(c_acctbal, 0.5)").as("med"))
      val dev = cust.join(broadcast(med), "c_nationkey")
        .withColumn("adev", abs(col("c_acctbal") - col("med")))
      val mad = dev.groupBy("c_nationkey")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "c_nationkey")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), max("med").as("med"), max("mad").as("mad"),
          sum(when(col("adev") > lit(3.0) * lit(1.4826) * col("mad"), 1L)
            .otherwise(0L)).as("n_outliers"))
        .orderBy("c_nationkey")
    },

    // ---- PIVOT: source × language count matrix (the reshape surface —
    // Spark's relational pivot with an EXPLICIT value list, so the plan
    // is one aggregation with no distinct-values pre-pass; absent cells
    // filled 0 to match the SQL FILTER formulation).
    QueryDef(
      "q131_lang_source_pivot",
      Some("""
        SELECT source,
               count(*) FILTER (lang = 'de') AS de,
               count(*) FILTER (lang = 'en') AS en,
               count(*) FILTER (lang = 'es') AS es,
               count(*) FILTER (lang = 'fr') AS fr,
               count(*) FILTER (lang = 'zh') AS zh
        FROM documents GROUP BY source ORDER BY source"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .groupBy("source")
        .pivot("lang", Seq("de", "en", "es", "fr", "zh"))
        .count()
        .na.fill(0L, Seq("de", "en", "es", "fr", "zh"))
        .orderBy("source")
    },

    // ---- Adamic-Adar link prediction over the co-purchase graph: score
    // UNLINKED part pairs by Σ 1/ln(deg(w)) over common neighbors w —
    // the classic "who should be bundled next" recommender signal
    // (complements q134's triangles, which close over EXISTING links).
    // Wedge generation through each common neighbor is the q134 shape
    // (bounded by co-purchase degree, never corpus-quadratic); existing
    // edges are removed with an anti-join. Each transcendental term is
    // round(1000000 / ln(deg)) — INTEGER micro-units, so the hot
    // aggregation over hundreds of millions of wedges is a plain BIGINT
    // sum (measured: the same query with per-wedge DECIMAL(38,6) sums
    // ran 31 s at sf0.1; integer micro-units cut the agg cost) and the
    // whole output is integer-exact. deg is a small integer, so both
    // engines' ln() agree far beyond the rounding boundary. The
    // co-purchase graph is DENSE at the wedge level (1.8M scored pairs
    // at sf0.01), so the output is the recommender's actual shape —
    // top-5 suggestions per part by (aa_micro, cn, id) — via a per-part
    // window over its candidates, not an all-pairs dump.
    QueryDef(
      "q201_adamic_adar",
      Some(s"""
        WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
              FROM li a JOIN li b
                ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
        deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY u),
        wedge AS (
          SELECT s1.u AS a, s2.u AS b, s1.v AS w
          FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        ), cand AS (
          SELECT a, b, count(*) AS cn,
                 CAST(SUM(CAST(round(1000000 / ln(deg)) AS BIGINT)) AS BIGINT) AS aa_micro
          FROM wedge JOIN deg ON deg.u = wedge.w
          GROUP BY a, b HAVING count(*) >= 2
        ), unlinked AS (
          SELECT a, b, cn, aa_micro
          FROM cand ANTI JOIN e ON cand.a = e.u AND cand.b = e.v
        )
        SELECT a AS part_a, b AS part_b, cn, aa_micro, rk
        FROM (SELECT a, b, cn, aa_micro,
                     row_number() OVER (PARTITION BY a
                       ORDER BY aa_micro DESC, cn DESC, b) AS rk
              FROM unlinked)
        WHERE rk <= 5 ORDER BY part_a, rk"""),
    ) { (s, dir) =>
      // degree-BLOCKED wedge generation (graft.ops.LinkPredict): exact
      // same scores, but a hub common-neighbor spreads over
      // ceil(deg/1024)² reducer cells instead of stragglering one task
      // with deg² wedge rows (VERDICT r11 scale-killer watch)
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.l_orderkey") === col("b.l_orderkey") &&
            col("a.l_partkey") < col("b.l_partkey"))
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .distinct()
      graft.ops.LinkPredict.adamicAdarTopK(e, "u", "v",
          minCommon = 2, topK = 5)
        .select(col("a").as("part_a"), col("b").as("part_b"),
          col("cn"), col("aa_micro"), col("rk"))
        .orderBy("part_a", "rk")
    },
  )
}
