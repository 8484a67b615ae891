package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}
import graft.ops.{AsofJoin, Multimodal, Sessionize}

/** Coverage for the composed operators: gap sessionization, as-of join,
  * deterministic sampling, one-hot reconstruct, CUBE, language-ID
  * heuristic, multimodal feature plumbing, approximate distinct.
  */
object OpsQueries {
  import Det.{sqlSum, dsum}

  val defs: Seq[QueryDef] = Seq(
    // ---- gap-and-island sessionization (30-min gap) over events
    QueryDef(
      "q43_event_sessions",
      Some(s"""
        WITH s AS (
          SELECT user_id, value, ts,
                 SUM(CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts) - 1 AS session_id
          FROM (SELECT user_id, value, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                FROM events))
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id, COUNT(*) AS n_events,
               epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
               ${sqlSum("value")} AS sum_value
        FROM s GROUP BY user_id, session_id
        ORDER BY user_id, session_id"""),
    ) { (s, dir) =>
      Sessionize.sessionStats(Tables.events(s, dir), "user_id", "ts", "value", 1800L)
        .orderBy("user_id", "session_id")
    },

    // ---- as-of join: latest click at-or-before each purchase, per user
    QueryDef(
      "q44_asof_click_before_purchase",
      Some("""
        SELECT p.event_id, p.user_id,
               epoch_us(c.ts) AS asof_click_us, c.value AS asof_click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        ORDER BY p.event_id"""),
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"),
          unix_micros(col("ts")).as("click_us"))
      AsofJoin.asofBackward(purchases, clicks,
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        valueCols = Seq("click_us", "value"))
        .select(col("event_id"), col("user_id"),
          col("asof_click_us"), col("asof_value").as("asof_click_value"))
        .orderBy("event_id")
    },

    // ---- key-less range join: clicks inside the 30-min window after any
    // high-value purchase (market-wide, so NO equi key — naive Spark is a
    // nested-loop join; RangeJoin bins it into one shuffle hash join)
    QueryDef(
      "q65_range_join_click_windows",
      Some("""
        SELECT c.event_id AS click_id, p.event_id AS purchase_id,
               c.value AS click_value, p.value AS purchase_value
        FROM events c JOIN events p
          ON c.event_type = 'click' AND p.event_type = 'purchase'
         AND p.value >= 250
         AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 30 MINUTE
        ORDER BY click_id, purchase_id"""),
    ) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("value").as("click_value"),
          unix_micros(col("ts")).as("click_us"))
      val windows = ev.filter(col("event_type") === "purchase" && col("value") >= 250)
        .select(col("event_id").as("purchase_id"), col("value").as("purchase_value"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + 30L * 60 * 1000000).as("w_end"))
      graft.ops.RangeJoin.pointInInterval(
        clicks, windows,
        pointCol = "click_us", startCol = "w_start", endCol = "w_end",
        binWidth = 30L * 60 * 1000000)
        .select("click_id", "purchase_id", "click_value", "purchase_value")
        .orderBy("click_id", "purchase_id")
    },

    // ---- interval-overlap join: concurrent 2-hour spending windows
    // (pairs of high-value purchases whose windows overlap; key-less)
    QueryDef(
      "q66_overlap_spend_windows",
      Some("""
        WITH w AS (SELECT event_id, ts AS s, ts + INTERVAL 120 MINUTE AS e
                   FROM events WHERE event_type = 'purchase' AND value >= 150)
        SELECT a.event_id AS a_id, b.event_id AS b_id
        FROM w a JOIN w b
          ON a.event_id < b.event_id AND a.s < b.e AND b.s < a.e
        ORDER BY a_id, b_id"""),
    ) { (s, dir) =>
      val win = 120L * 60 * 1000000
      val w = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" && col("value") >= 150)
        .select(col("event_id"), unix_micros(col("ts")).as("s"))
        .withColumn("e", col("s") + win)
      val a = w.select(col("event_id").as("a_id"), col("s").as("a_s"), col("e").as("a_e"))
      val b = w.select(col("event_id").as("b_id"), col("s").as("b_s"), col("e").as("b_e"))
      graft.ops.RangeJoin.intervalOverlap(a, b,
        "a_s", "a_e", "b_s", "b_e", binWidth = win)
        .filter(col("a_id") < col("b_id"))
        .select("a_id", "b_id")
        .orderBy("a_id", "b_id")
    },

    // ---- heavy hitters: top-5 words per language via the Misra-Gries
    // sketch (capacity 64 > the 31-word vocab, so counts are exact and
    // hash-match the oracle; at real vocabulary scale the same plan
    // ships fixed-size partials instead of the whole vocabulary)
    QueryDef(
      "q67_heavy_hitters",
      Some("""
        WITH w AS (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS word
                   FROM documents),
        c AS (SELECT lang, word, COUNT(*) AS cnt FROM w GROUP BY 1, 2),
        r AS (SELECT lang, word, cnt,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rank
              FROM c)
        SELECT lang, rank, word, cnt FROM r WHERE rank <= 5
        ORDER BY lang, rank"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("lang"), explode(graft.core.Cols.wsTokens(col("text"))).as("w"))
        .groupBy("lang")
        .agg(graft.functions.FreqSketch.freqSketch(col("w"), 64).as("sk"))
        .select(col("lang"), posexplode(slice(col("sk"), 1, 5)))
        .select(col("lang"), (col("pos") + 1).cast("long").as("rank"),
          col("col.item").as("word"), col("col.cnt").as("cnt"))
        .orderBy("lang", "rank")
    },

    // ---- D3 deterministic systematic sample (hash/keyed sampling)
    QueryDef(
      "q45_systematic_sample",
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_orderkey % 20 = 0
        ORDER BY l_orderkey, l_linenumber"""),
    ) { (s, dir) =>
      graft.ops.Sampling.systematic(Tables.lineitem(s, dir), "l_orderkey", 20)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ---- D3 exact-size seeded random sample (pandas sample(n, seed)
    // parity): n smallest seeded multiplicative-hash ranks — identical
    // arithmetic on both engines, TakeOrderedAndProject on Spark
    QueryDef(
      "q59_seeded_sample",
      Some("""
        SELECT c_custkey, c_name, c_acctbal FROM customer
        ORDER BY ((c_custkey % 100000007 + 42) * 2654435761) % 4294967296, c_custkey
        LIMIT 200"""),
    ) { (s, dir) =>
      graft.ops.Sampling.sampleExact(Tables.customer(s, dir), "c_custkey", 200, 42L)
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // ---- D3 stratified exact-n-per-stratum sample: 5 docs per source,
    // smallest seeded multiplicative-hash ranks within each stratum (the
    // same q59 arithmetic, windowed per source — no global sort)
    QueryDef(
      "q74_stratified_sample",
      Some("""
        SELECT doc_id, source FROM (
          SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY ((doc_id % 100000007 + 42) * 2654435761) % 4294967296,
                            doc_id) AS rn
          FROM documents)
        WHERE rn <= 5 ORDER BY doc_id"""),
    ) { (s, dir) =>
      graft.ops.Sampling.stratifiedExact(
        Tables.documents(s, dir), "source", "doc_id", 5, 42L)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // ---- F13+F15 round trip: one-hot encode then reconstruct the category
    QueryDef(
      "q46_onehot_reconstruct",
      Some("""
        SELECT o_orderkey,
               CASE WHEN s_F = 1 THEN 'F' WHEN s_O = 1 THEN 'O' ELSE 'P' END AS status_rt
        FROM (SELECT o_orderkey,
                     CAST(o_orderstatus = 'F' AS INT) AS s_F,
                     CAST(o_orderstatus = 'O' AS INT) AS s_O,
                     CAST(o_orderstatus = 'P' AS INT) AS s_P
              FROM orders)
        ORDER BY o_orderkey"""),
    ) { (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          (col("o_orderstatus") === "F").cast("int").as("s_F"),
          (col("o_orderstatus") === "O").cast("int").as("s_O"),
          (col("o_orderstatus") === "P").cast("int").as("s_P"))
        .select(col("o_orderkey"),
          when(col("s_F") === 1, "F").when(col("s_O") === 1, "O").otherwise("P")
            .as("status_rt"))
        .orderBy("o_orderkey")
    },

    // ---- CUBE over region x order status
    QueryDef(
      "q47_revenue_cube",
      Some(s"""
        SELECT r_name, o_orderstatus, ${sqlSum("o_totalprice")} AS revenue,
               COUNT(*) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, o_orderstatus)
        ORDER BY r_name NULLS FIRST, o_orderstatus NULLS FIRST"""),
    ) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      Tables.nation(s, dir).createOrReplaceTempView("nation")
      Tables.region(s, dir).createOrReplaceTempView("region")
      s.sql(s"""
        SELECT r_name, o_orderstatus, ${sqlSum("o_totalprice")} AS revenue,
               COUNT(*) AS n
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, o_orderstatus)
        ORDER BY r_name NULLS FIRST, o_orderstatus NULLS FIRST""")
    },

    // ---- dictionary language-ID heuristic (argmax of stopword hits)
    QueryDef(
      "q48_langid_heuristic",
      Some("""
        SELECT doc_id, lang,
               CASE WHEN s_a >= s_b AND s_a >= s_c THEN 'lang_a'
                    WHEN s_b >= s_c THEN 'lang_b'
                    ELSE 'lang_c' END AS predicted
        FROM (SELECT doc_id, lang,
                len(list_intersect(string_split_regex(trim(text), '\s+'),
                    ['table','row','column','scan'])) AS s_a,
                len(list_intersect(string_split_regex(trim(text), '\s+'),
                    ['spark','batch','query','join'])) AS s_b,
                len(list_intersect(string_split_regex(trim(text), '\s+'),
                    ['fast','slow','big','small'])) AS s_c
              FROM documents)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      def hits(words: Seq[String]) = size(array_intersect(
        graft.core.Cols.wsTokens(col("text")),
        array(words.map(lit): _*)))
      Tables.documents(s, dir)
        .withColumn("s_a", hits(Seq("table", "row", "column", "scan")))
        .withColumn("s_b", hits(Seq("spark", "batch", "query", "join")))
        .withColumn("s_c", hits(Seq("fast", "slow", "big", "small")))
        .select(col("doc_id"), col("lang"),
          when(col("s_a") >= col("s_b") && col("s_a") >= col("s_c"), "lang_a")
            .when(col("s_b") >= col("s_c"), "lang_b")
            .otherwise("lang_c").as("predicted"))
        .orderBy("doc_id")
    },

    // ---- DECLARATIVE sessionization: Spark's native session_window
    // aggregation (the state-store streaming primitive), same sessions as
    // q43's gap-and-island chain up to the exact-gap boundary (this
    // oracle's `>=` rule — session_window's end-exclusive merge).
    QueryDef(
      "q114_session_windows",
      Some(s"""
        WITH s AS (
          SELECT user_id, value, ts,
                 SUM(CASE WHEN prev_ts IS NULL
                          OR epoch_us(ts) - epoch_us(prev_ts) >= 1800 * 1000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM (SELECT user_id, value, ts,
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                FROM events))
        SELECT user_id, COUNT(*) AS n_events,
               epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
               ${sqlSum("value")} AS sum_value
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, start_us"""),
    ) { (s, dir) =>
      graft.ops.Sessionize.sessionWindowStats(Tables.events(s, dir),
          "user_id", "ts", "value", gapSeconds = 1800L)
        .orderBy("user_id", "start_us")
    },

    // ---- multimodal feature extraction plumbing (header codec; rows check)
    QueryDef("q49_media_features", None) { (s, dir) =>
      Multimodal.featureStats(
        Multimodal.extractFeatures(Multimodal.syntheticMedia(s, 1000)))
    },

    // ---- REAL audio signal features: PCM-16 decode of the WAV payloads
    // (no codec library needed — WAV is raw samples), peak/zero-crossing/
    // rms per row. no_oracle (binary surface); exactness is pinned by the
    // square-wave/sign-extension/truncation contracts in MultimodalSpec.
    QueryDef("q112_audio_features", None) { (s, dir) =>
      import s.implicits._
      Multimodal.audioFeatures(Multimodal.syntheticMedia(s, 1000))
        .toDF().orderBy("media_id")
    },

    // ---- video frame sampling: bounded fan-out per video at 1 fps from
    // the parsed mvhd duration (stub frame grab; rows check)
    QueryDef("q61_frame_sample", None) { (s, dir) =>
      import org.apache.spark.sql.functions.{count => fcount}
      Multimodal.sampleFrames(Multimodal.syntheticMedia(s, 1000))
        .groupBy("media_id")
        .agg(fcount(lit(1)).as("n_frames"),
          max(col("ts_ms")).as("last_ts_ms"))
        .orderBy("media_id")
    },

    // ---- A6 scale variant: HLL approximate distinct vs exact. The raw
    // sketch estimate is engine-specific (Spark HLL++ vs DuckDB HLL), so
    // the oracle-checkable contract is: exact counts + "the 2%-rsd sketch
    // landed within 5% of exact" flags (oracle side: literal TRUE).
    QueryDef(
      "q50_approx_distinct",
      Some("""
        SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_parts_ok,
               COUNT(DISTINCT l_orderkey) AS exact_orders,
               TRUE AS approx_orders_ok
        FROM lineitem"""),
    ) { (s, dir) =>
      def ok(approx: org.apache.spark.sql.Column, exact: org.apache.spark.sql.Column) =
        abs(approx.cast("double") - exact) <= exact * 0.05
      Tables.lineitem(s, dir).agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
        .select(
          col("exact_parts"),
          ok(col("approx_parts"), col("exact_parts")).as("approx_parts_ok"),
          col("exact_orders"),
          ok(col("approx_orders"), col("exact_orders")).as("approx_orders_ok"))
    },

    // ---- SCD Type-2 dimension merge: a deterministic change batch
    // (updates for custkey%5, incl. custkey%15 no-ops; inserts above key
    // 1M for custkey%50) applied to the customer dimension. ONE key join
    // against the CURRENT slice (history passes through join-free);
    // change detection is null-safe column equality. The warehouse
    // upsert lifecycle the reference's replace/append sinks destroy.
    QueryDef(
      "q89_scd2_merge",
      Some("""
        WITH dim AS (SELECT c_custkey, c_mktsegment, c_acctbal,
                            DATE '2024-01-01' AS valid_from,
                            CAST(NULL AS DATE) AS valid_to,
                            TRUE AS is_current FROM customer),
        chg AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 10 = 0 THEN 'VIP' ELSE c_mktsegment END AS c_mktsegment,
                 CASE WHEN c_custkey % 15 = 0 THEN c_acctbal
                      ELSE c_acctbal + CAST(100.0 AS DOUBLE) END AS c_acctbal
          FROM customer WHERE c_custkey % 5 = 0
          UNION ALL
          SELECT c_custkey + 1000000, 'NEW', CAST(0.0 AS DOUBLE)
          FROM customer WHERE c_custkey % 50 = 0),
        j AS (SELECT d.c_custkey AS dk, d.c_mktsegment AS dseg, d.c_acctbal AS dbal,
                     d.valid_from AS dvf,
                     c.c_custkey AS ck, c.c_mktsegment AS cseg, c.c_acctbal AS cbal
              FROM dim d FULL OUTER JOIN chg c ON d.c_custkey = c.c_custkey),
        merged AS (
          SELECT dk AS c_custkey, dseg AS c_mktsegment, dbal AS c_acctbal,
                 dvf AS valid_from, CAST(NULL AS DATE) AS valid_to, TRUE AS is_current
          FROM j WHERE dk IS NOT NULL AND (ck IS NULL OR NOT
            (dseg IS DISTINCT FROM cseg OR dbal IS DISTINCT FROM cbal))
          UNION ALL
          SELECT dk, dseg, dbal, dvf, DATE '2025-06-01', FALSE
          FROM j WHERE dk IS NOT NULL AND ck IS NOT NULL AND
            (dseg IS DISTINCT FROM cseg OR dbal IS DISTINCT FROM cbal)
          UNION ALL
          SELECT ck, cseg, cbal, DATE '2025-06-01', CAST(NULL AS DATE), TRUE
          FROM j WHERE dk IS NOT NULL AND ck IS NOT NULL AND
            (dseg IS DISTINCT FROM cseg OR dbal IS DISTINCT FROM cbal)
          UNION ALL
          SELECT ck, cseg, cbal, DATE '2025-06-01', CAST(NULL AS DATE), TRUE
          FROM j WHERE dk IS NULL)
        SELECT * FROM merged ORDER BY c_custkey, valid_from"""),
    ) { (s, dir) =>
      val cust = Tables.customer(s, dir)
      val dim = cust.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        to_date(lit("2024-01-01")).as("valid_from"),
        lit(null).cast("date").as("valid_to"), lit(true).as("is_current"))
      val upd = cust.filter(col("c_custkey") % 5 === 0).select(
        col("c_custkey"),
        when(col("c_custkey") % 10 === 0, lit("VIP"))
          .otherwise(col("c_mktsegment")).as("c_mktsegment"),
        when(col("c_custkey") % 15 === 0, col("c_acctbal"))
          .otherwise(col("c_acctbal") + lit(100.0)).as("c_acctbal"))
      val ins = cust.filter(col("c_custkey") % 50 === 0).select(
        (col("c_custkey") + lit(1000000L)).as("c_custkey"),
        lit("NEW").as("c_mktsegment"), lit(0.0).as("c_acctbal"))
      graft.warehouse.Scd.scd2Apply(dim, upd.union(ins), "c_custkey",
          Seq("c_mktsegment", "c_acctbal"), to_date(lit("2025-06-01")))
        .orderBy("c_custkey", "valid_from")
    },

    // ---- snapshot CDC diff: two versioned commits of an orders slice
    // (v0 = keys%7!=0 as loaded; v1 = keys%5!=0 with %3 prices doubled),
    // then the version-to-version change feed — insert/delete/update per
    // key. ONE key-shuffled full-outer join of the snapshots, non-key
    // columns packed into a struct for a single null-safe compare; the
    // downstream-incremental primitive the reference's in-place
    // overwrites cannot provide. The oracle re-derives both snapshots
    // from `orders` directly — the versioned store must be a pure
    // pass-through (commit then read-back changes nothing).
    QueryDef(
      "q95_snapshot_diff",
      Some("""
        WITH v0 AS (SELECT o_orderkey, o_orderstatus, o_totalprice
                    FROM orders WHERE o_orderkey % 7 <> 0),
        v1 AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderkey % 5 <> 0)
        SELECT o_orderkey, change_type FROM (
          SELECT coalesce(v0.o_orderkey, v1.o_orderkey) AS o_orderkey,
            CASE WHEN v0.o_orderkey IS NULL THEN 'insert'
                 WHEN v1.o_orderkey IS NULL THEN 'delete'
                 WHEN v0.o_totalprice IS DISTINCT FROM v1.o_totalprice
                   OR v0.o_orderstatus IS DISTINCT FROM v1.o_orderstatus
                   THEN 'update' END AS change_type
          FROM v0 FULL JOIN v1 ON v0.o_orderkey = v1.o_orderkey)
        WHERE change_type IS NOT NULL
        ORDER BY o_orderkey"""),
    ) { (s, dir) =>
      import graft.warehouse.VersionedTable
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val tbl = java.nio.file.Files.createTempDirectory("graft-vtbl").toString
      VersionedTable.commit(orders.filter(col("o_orderkey") % 7 =!= 0), tbl)
      VersionedTable.commit(
        orders.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))), tbl)
      VersionedTable.diff(s, tbl, 0L, 1L, Seq("o_orderkey"))
        .orderBy("o_orderkey")
    },

    // ---- MERGE INTO (Delta-style upsert, one full-outer join): source
    // rows update matched keys (SET *), insert unmatched keys, and a
    // matched-AND-condition clause deletes; untouched base rows pass
    // through. Committed through VersionedTable so every merge is a
    // time-travelable snapshot; the oracle replays the MERGE relationally
    // from the raw table — the store must be a pure pass-through.
    QueryDef(
      "q132_merge_upsert",
      Some("""
        WITH base AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
                      FROM orders WHERE o_orderkey % 3 <> 0),
        src AS (SELECT o_orderkey, o_custkey, o_orderstatus,
                       o_totalprice * 2 AS o_totalprice
                FROM orders WHERE o_orderkey % 2 = 0),
        j AS (SELECT coalesce(b.o_orderkey, s.o_orderkey) AS o_orderkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
                     ELSE b.o_custkey END AS o_custkey,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
                     ELSE b.o_orderstatus END AS o_orderstatus,
                CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
                     ELSE b.o_totalprice END AS o_totalprice,
                (b.o_orderkey IS NOT NULL AND s.o_orderkey IS NOT NULL
                  AND coalesce(s.o_orderstatus = 'F'
                               AND s.o_orderkey % 5 = 0, false)) AS del
              FROM base b FULL JOIN src s ON b.o_orderkey = s.o_orderkey)
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM j WHERE NOT del ORDER BY o_orderkey"""),
    ) { (s, dir) =>
      import graft.warehouse.{Merge, VersionedTable}
      val o = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      val tbl = java.nio.file.Files.createTempDirectory("graft-merge").toString
      VersionedTable.commit(o.filter(col("o_orderkey") % 3 =!= 0), tbl)
      Merge.mergeCommit(s, tbl,
        o.filter(col("o_orderkey") % 2 === 0)
          .withColumn("o_totalprice", col("o_totalprice") * 2),
        keys = Seq("o_orderkey"),
        deleteCond = Some(col("o_orderstatus") === "F" &&
          col("o_orderkey") % 5 === 0))
      VersionedTable.read(s, tbl).orderBy("o_orderkey")
    },

    // ---- incremental view maintenance: a (status, count, exact-sum)
    // view built over snapshot v0 is updated from the v0->v1 CDC feed
    // ALONE — never re-scanning v1 — and must equal a direct recompute
    // over v1 bit-for-bit. The decimal fixed-scale sum (Det) is what
    // makes (base ± deltas) associative-exact; the ORACLE is the direct
    // recompute, so the hash check IS the incremental==full contract.
    // At 100 TB: maintenance cost tracks churn, not table size.
    QueryDef(
      "q96_incremental_agg",
      Some(s"""
        WITH v1 AS (SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderkey % 5 <> 0)
        SELECT o_orderstatus, COUNT(*) AS n,
               ${Det.sqlSum("o_totalprice")} AS sum_price
        FROM v1 GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
    ) { (s, dir) =>
      import graft.warehouse.{IncrementalAgg, VersionedTable}
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val tbl = java.nio.file.Files.createTempDirectory("graft-vtbl96").toString
      VersionedTable.commit(orders.filter(col("o_orderkey") % 7 =!= 0), tbl)
      VersionedTable.commit(
        orders.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))), tbl)
      val view0 = IncrementalAgg.countSumView(
        VersionedTable.read(s, tbl, asOf = Some(0L)),
        "o_orderstatus", "o_totalprice")
      val cdc = VersionedTable.diffValues(s, tbl, 0L, 1L, Seq("o_orderkey"))
      IncrementalAgg.present(
          IncrementalAgg.applyCdc(view0, cdc, "o_orderstatus", "o_totalprice"),
          "o_orderstatus", "sum_price")
        .orderBy("o_orderstatus")
    },

    // ---- incremental distinct counts from persisted mergeable HLL
    // sketches: three ingest batches each write a per-source sketch
    // segment; serving unions the sketches (kilobytes) — ingested data
    // is never re-scanned. no_oracle by design (DataSketches binary /
    // approximate surface; DuckDB's approx_distinct is a different
    // sketch) — SketchStatsSpec pins merged-vs-single-pass-vs-exact.
    QueryDef("q97_incremental_distinct", None) { (s, dir) =>
      import graft.ops.SketchStats
      val docs = Tables.documents(s, dir)
      val skDir = java.nio.file.Files.createTempDirectory("graft-hll97").toString
      (0 until 3).foreach { k =>
        SketchStats.appendHllBatch(
          docs.filter(pmod(col("doc_id"), lit(3)) === k),
          "doc_id", skDir, s"b$k", groupCols = Seq("source"))
      }
      SketchStats.hllDistinct(s, skDir, Seq("source")).orderBy("source")
    },

    // ---- EXACT mergeable distinct via compressed bitmaps
    // (graft.functions.BitmapOps): per-day bitmap "segments" of active
    // users roll up to per-type exact distincts by OR-union — the exact
    // sibling of q97's HLL path, and therefore fully oracle-checkable:
    // the hash match proves union-exactness (merged-of-parts == whole),
    // the property that lets bitmap segments compact without error.
    QueryDef(
      "q150_bitmap_distinct_rollup",
      Some("""
        WITH daily AS (SELECT event_type, day(ts) AS d,
                              count(DISTINCT user_id) AS du
                       FROM events GROUP BY 1, 2)
        SELECT e.event_type,
               (SELECT count(*) FROM daily WHERE event_type = e.event_type)
                 AS n_days,
               count(DISTINCT e.user_id) AS distinct_users,
               (SELECT CAST(sum(du) AS BIGINT) FROM daily
                WHERE event_type = e.event_type) AS sum_daily_distinct
        FROM events e GROUP BY e.event_type ORDER BY e.event_type"""),
    ) { (s, dir) =>
      import graft.functions.BitmapOps._
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
        .agg(bitmapBuild(col("user_id")).as("bm"))
      daily.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          bitmapCount(bitmapMerge(col("bm"))).as("distinct_users"),
          sum(bitmapCount(col("bm"))).as("sum_daily_distinct"))
        .orderBy("event_type")
    },

    // ---- bitmap INTERSECTION — the op no cardinality sketch offers:
    // per-type user retention across the month's halves as
    // |first ∩ second| from two bitmaps built in the same single pass
    // (conditional inputs; nulls skipped). Oracle: brute-force distinct
    // set intersection in SQL.
    QueryDef(
      "q151_bitmap_retention",
      Some("""
        WITH a AS (SELECT DISTINCT event_type, user_id FROM events
                   WHERE day(ts) <= 15),
             b AS (SELECT DISTINCT event_type, user_id FROM events
                   WHERE day(ts) > 15)
        SELECT event_type,
               (SELECT count(*) FROM a WHERE a.event_type = t.event_type)
                 AS users_first_half,
               (SELECT count(*) FROM b WHERE b.event_type = t.event_type)
                 AS users_second_half,
               count(*) AS retained
        FROM (SELECT event_type, user_id FROM a
              INTERSECT SELECT event_type, user_id FROM b) t
        GROUP BY event_type ORDER BY event_type"""),
    ) { (s, dir) =>
      import graft.functions.BitmapOps._
      val d = dayofmonth(col("ts"))
      Tables.events(s, dir).groupBy("event_type")
        .agg(
          bitmapBuild(when(d <= 15, col("user_id"))).as("_a"),
          bitmapBuild(when(d > 15, col("user_id"))).as("_b"))
        .select(col("event_type"),
          bitmapCount(col("_a")).as("users_first_half"),
          bitmapCount(col("_b")).as("users_second_half"),
          bitmapAndCount(col("_a"), col("_b")).as("retained"))
        .orderBy("event_type")
    },

    // ---- entity resolution: edit-distance similarity self-join over
    // customer names (PassJoin pigeonhole blocking + levenshtein verify).
    // The oracle is BRUTE FORCE all-pairs in SQL — the hash match proves
    // the blocked join's completeness, the whole point of the operator.
    QueryDef(
      "q108_fuzzy_name_pairs",
      Some("""
        SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
               levenshtein(a.c_name, b.c_name) AS dist
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE levenshtein(a.c_name, b.c_name) <= 1
        ORDER BY id_a, id_b"""),
    ) { (s, dir) =>
      graft.ops.EditJoin.levenshteinSelfJoin(
        Tables.customer(s, dir), "c_custkey", "c_name", k = 1)
        .orderBy("id_a", "id_b")
    },

    // ---- incremental EXACT histogram: three simulated ingest batches
    // each append (bin, cnt) segments; the served histogram sums bins
    // across segments. The oracle bins the WHOLE table directly in SQL —
    // the hash match IS the exact-mergeability property (segments-summed
    // == single pass), which approximate sketches (q97) cannot offer.
    QueryDef(
      "q106_incremental_histogram",
      Some("""
        SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin, count(*) AS cnt
        FROM events GROUP BY bin ORDER BY bin"""),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val events = Tables.events(s, dir)
      val hDir = java.nio.file.Files.createTempDirectory("graft-hist106").toString
      (0 until 3).foreach { k =>
        SketchStats.appendHistBatch(
          events.filter(pmod(col("event_id"), lit(3)) === k),
          "value", hDir, s"b$k", width = 10.0)
      }
      SketchStats.histogram(s, hDir).orderBy("bin")
    },

    // ---- histogram drift between two ingest slices, served FROM the
    // persisted segments: per-bin integer cross-multiplied L1 deviation
    // |cnt_a*tot_b - cnt_b*tot_a| — exact arithmetic end to end, so the
    // whole drift monitor hash-matches (the vocab KL monitor needs 9dp
    // rounding; this needs nothing).
    QueryDef(
      "q113_histogram_drift",
      Some("""
        WITH ea AS (SELECT value FROM events WHERE user_id % 2 = 0),
        eb AS (SELECT value FROM events WHERE user_id % 2 = 1),
        ha AS (SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                      count(*) AS cnt_a FROM ea GROUP BY bin),
        hb AS (SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
                      count(*) AS cnt_b FROM eb GROUP BY bin),
        tots AS (SELECT (SELECT CAST(sum(cnt_a) AS BIGINT) FROM ha) AS tot_a,
                        (SELECT CAST(sum(cnt_b) AS BIGINT) FROM hb) AS tot_b)
        SELECT COALESCE(ha.bin, hb.bin) AS bin,
               COALESCE(cnt_a, 0) AS cnt_a, COALESCE(cnt_b, 0) AS cnt_b,
               CAST(abs(COALESCE(cnt_a, 0) * tot_b - COALESCE(cnt_b, 0) * tot_a)
                 AS BIGINT) AS dev_num
        FROM ha FULL OUTER JOIN hb ON ha.bin = hb.bin CROSS JOIN tots
        ORDER BY bin"""),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val events = Tables.events(s, dir)
      val hDir = java.nio.file.Files.createTempDirectory("graft-hist113").toString
      Seq(0, 1).foreach { side =>
        SketchStats.appendHistBatch(
          events.filter(pmod(col("user_id"), lit(2)) === side),
          "value", s"$hDir/s$side", "b0", width = 10.0)
      }
      SketchStats.histDrift(
        SketchStats.histogram(s, s"$hDir/s0"),
        SketchStats.histogram(s, s"$hDir/s1")).orderBy("bin")
    },

    // ---- publish-gate stats drift between snapshot versions: v1 doubles
    // %3 prices AND nulls out %11 prices (a simulated bad load), and the
    // monitor must surface the null-rate jump and mean shift per column.
    // ONE wide aggregate per snapshot (Det decimal sums), a 1-row cross
    // join, per-column projection — every output float is a single
    // division of exact values, so the whole monitor hash-matches.
    QueryDef(
      "q98_stats_drift",
      Some(s"""
        WITH v0 AS (SELECT o_orderkey, o_custkey, o_totalprice
                    FROM orders WHERE o_orderkey % 7 <> 0),
        v1 AS (SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey % 11 = 0 THEN NULL
                      WHEN o_orderkey % 3 = 0 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
               FROM orders WHERE o_orderkey % 5 <> 0),
        s0 AS (SELECT count(*) AS n_old,
                 count(o_custkey) AS nn_ck, ${Det.sqlSum("o_custkey")} AS s_ck,
                 count(o_totalprice) AS nn_tp, ${Det.sqlSum("o_totalprice")} AS s_tp
               FROM v0),
        s1 AS (SELECT count(*) AS n_new,
                 count(o_custkey) AS nn_ck, ${Det.sqlSum("o_custkey")} AS s_ck,
                 count(o_totalprice) AS nn_tp, ${Det.sqlSum("o_totalprice")} AS s_tp
               FROM v1)
        SELECT 'o_custkey' AS col_name, n_old, n_new,
               (n_old - s0.nn_ck) / CAST(n_old AS DOUBLE) AS null_frac_old,
               (n_new - s1.nn_ck) / CAST(n_new AS DOUBLE) AS null_frac_new,
               s0.s_ck / s0.nn_ck AS mean_old, s1.s_ck / s1.nn_ck AS mean_new
        FROM s0 CROSS JOIN s1
        UNION ALL
        SELECT 'o_totalprice', n_old, n_new,
               (n_old - s0.nn_tp) / CAST(n_old AS DOUBLE),
               (n_new - s1.nn_tp) / CAST(n_new AS DOUBLE),
               s0.s_tp / s0.nn_tp, s1.s_tp / s1.nn_tp
        FROM s0 CROSS JOIN s1
        ORDER BY col_name"""),
    ) { (s, dir) =>
      import graft.warehouse.{StatsDrift, VersionedTable}
      val orders = Tables.orders(s, dir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val tbl = java.nio.file.Files.createTempDirectory("graft-vtbl98").toString
      VersionedTable.commit(orders.filter(col("o_orderkey") % 7 =!= 0), tbl)
      VersionedTable.commit(
        orders.filter(col("o_orderkey") % 5 =!= 0)
          .withColumn("o_totalprice",
            when(col("o_orderkey") % 11 === 0, lit(null))
              .when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice"))), tbl)
      StatsDrift.statsDrift(s, tbl, 0L, 1L, Seq("o_custkey", "o_totalprice"))
        .orderBy("col_name")
    },

    // ---- persisted heavy-hitter segments: per-batch bounded
    // Misra-Gries summaries, served by pointwise sum + ONE relational
    // shrink (the mergeable-summaries combine). The event-type domain
    // sits far under the capacity, so no decrement ever fires and the
    // served counts are EXACT — the hash match against a plain
    // GROUP BY oracle proves the under-capacity exactness property;
    // the over-capacity bound lives in SketchStatsSpec.
    // ---- incremental KLL quantiles: three ingest batches each append a
    // bounded quantile summary per event_type; serving merges summaries
    // only. At this group size nothing compacts, so the served
    // estimates are EXACT and the oracle replays the shared quantile
    // definition (smallest value whose cumulative count reaches
    // ceil(q·n)) directly in SQL — the q147 under-capacity pattern for
    // ranks. Over-capacity error bounds live in SketchStatsSpec.
    QueryDef(
      "q157_kll_quantiles",
      Some("""
        WITH s AS (SELECT event_type, value, count(*) AS c
                   FROM events GROUP BY 1, 2),
        w AS (SELECT event_type, value,
                sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
                sum(c) OVER (PARTITION BY event_type) AS n
              FROM s),
        qs AS (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS q)
        SELECT event_type, q, min(value) AS est
        FROM w CROSS JOIN qs WHERE cum >= ceil(q * n)
        GROUP BY event_type, q ORDER BY event_type, q"""),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val events = Tables.events(s, dir)
      val kDir = java.nio.file.Files.createTempDirectory("graft-kll157").toString
      (0 until 3).foreach { k =>
        SketchStats.appendKllBatch(
          events.filter(pmod(col("event_id"), lit(3)) === k),
          "value", kDir, s"b$k", k = 4096, groupCols = Seq("event_type"))
      }
      SketchStats.kllQuantiles(s, kDir, Seq(0.25, 0.5, 0.75, 0.95),
        Seq("event_type"))
        .orderBy("event_type", "q")
    },

    // ---- persisted count-min frequency segments: three ingest batches
    // each append a depth×width cell table; per-user event counts are
    // served by cell-wise segment sum + min-over-depth probe — bounded
    // memory however many keys exist. The oracle replays the ENTIRE
    // sketch (XXH64 bucketing, cell aggregation, min-probe) in SQL via
    // DuckXxh, so the hash match proves the estimate exactly — every
    // collision included — not just within the ε·n bound; the signature
    // over-count property (est ≥ exact, with equality iff no collision
    // survived all rows of depth) is visible in the `overcount` column.
    // Merge-associativity and compaction contracts live in
    // SketchStatsSpec.
    QueryDef(
      "q202_cm_frequency",
      Some(DuckXxh.cmSketchOracle(width = 1024, depth = 4)),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val events = Tables.events(s, dir)
      val cmDir = java.nio.file.Files.createTempDirectory("graft-cm202").toString
      (0 until 3).foreach { k =>
        SketchStats.appendCmBatch(
          events.filter(pmod(col("event_id"), lit(3)) === k),
          "user_id", cmDir, s"b$k", width = 1024, depth = 4)
      }
      val keys = events.select("user_id").distinct()
      SketchStats.cmEstimates(s, cmDir, keys)
        .join(events.groupBy("user_id").agg(count(lit(1)).as("exact_cnt")),
          "user_id")
        .select(col("user_id"), col("exact_cnt"), col("cm_est"),
          (col("cm_est") - col("exact_cnt")).as("overcount"))
        .orderBy("user_id")
    },

    QueryDef(
      "q154_als_recommendations",
      None, // iterative MF — no SQL oracle; RecommenderSpec carries the
            // metric gate (beats global-mean baseline RMSE) and the
            // top-k shape/ordering contracts
    ) { (s, dir) =>
      import graft.ml.Recommender
      val ratings = Recommender.purchaseRatings(
        Tables.orders(s, dir), Tables.lineitem(s, dir))
      val model = Recommender.fit(ratings,
        Recommender.Config(rank = 8, maxIter = 5))
      Recommender.recommendItems(model, k = 3)
        .filter(col("c_custkey") <= 100)
        .orderBy("c_custkey", "rank")
    },

    QueryDef(
      "q147_freq_segments",
      Some("""
        SELECT CAST(event_type AS VARCHAR) AS item, count(*) AS cnt
        FROM events GROUP BY event_type ORDER BY item"""),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val events = Tables.events(s, dir)
      val fDir = java.nio.file.Files.createTempDirectory("graft-freq147").toString
      (0 until 3).foreach { k =>
        SketchStats.appendFreqBatch(
          events.filter(pmod(col("event_id"), lit(3)) === k),
          "event_type", fDir, s"b$k", capacity = 64)
      }
      SketchStats.freqItems(s, fDir).orderBy("item")
    },

    // ---- mergeable moments sketch: per-batch exact decimal power sums
    // (n, Σx..Σx⁴) persisted as segments, mean/std/skew/kurtosis served
    // by MERGING SEGMENTS ONLY — never re-scanning the ingested rows.
    // Decimal addition is associative, so the served statistics are
    // bit-identical to a direct single pass (the oracle computes the
    // direct pass; the hash match proves the merge identity). Every
    // float op is correctly-rounded IEEE in identical order on both
    // engines (m2^1.5 spelled m2*sqrt(m2)).
    QueryDef(
      "q136_moment_stats",
      Some(s"""
        WITH m AS (
          SELECT l_returnflag, count(l_quantity) AS n,
                 ${Det.sqlSum("l_quantity")} AS s1,
                 ${Det.sqlSum("l_quantity*l_quantity")} AS s2,
                 ${Det.sqlSum("l_quantity*l_quantity*l_quantity")} AS s3,
                 ${Det.sqlSum("l_quantity*l_quantity*l_quantity*l_quantity")} AS s4
          FROM lineitem GROUP BY l_returnflag),
        e AS (SELECT l_returnflag, n, s1/n AS e1, s2/n AS e2,
                     s3/n AS e3, s4/n AS e4 FROM m),
        c AS (SELECT l_returnflag, n, e1,
                     e2 - e1*e1 AS m2,
                     e3 - 3.0*e1*e2 + 2.0*e1*e1*e1 AS m3,
                     e4 - 4.0*e1*e3 + 6.0*e1*e1*e2 - 3.0*e1*e1*e1*e1 AS m4
              FROM e)
        SELECT l_returnflag, CAST(n AS BIGINT) AS n, e1 AS mean,
               sqrt(m2) AS std_pop,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) - 3.0 AS kurtosis_excess
        FROM c ORDER BY l_returnflag"""),
    ) { (s, dir) =>
      import graft.ops.SketchStats
      val li = Tables.lineitem(s, dir)
      val mDir = java.nio.file.Files.createTempDirectory("graft-mom136").toString
      (0 until 3).foreach { k =>
        SketchStats.appendMomentsBatch(
          li.filter(pmod(col("l_orderkey"), lit(3)) === k),
          "l_quantity", mDir, s"b$k", groupCols = Seq("l_returnflag"))
      }
      SketchStats.momentStats(s, mDir, Seq("l_returnflag"))
        .orderBy("l_returnflag")
    },
  )
}
