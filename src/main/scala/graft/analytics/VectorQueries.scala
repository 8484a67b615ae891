package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.VectorSim

/** Similarity-search coverage over `embeddings` (array<float>, 64-dim):
  * exact brute-force cosine top-k (oracle-checked bit-for-bit via decimal
  * dot products) and the LSH-bucketed approximate variants (rows-only).
  */
object VectorQueries {

  private def dotSql(x: String, y: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i -> " +
      s"CAST(CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE) AS DECIMAL(38,12)))) AS DOUBLE)"

  private[analytics] def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Degenerate-norm exclusion predicate (q248): zero-norm and NaN-norm
    * vectors carry no direction — mirror of the engine guard. DuckDB,
    * like Spark, orders NaN greatest, so `> 0` alone would ADMIT a NaN
    * norm on both engines.
    *
    * The guard norm is computed in PLAIN DOUBLE, not the decimal chain:
    * DuckDB errors on CAST(nan AS DECIMAL) ("out of range for INT128")
    * BEFORE isnan could observe it, so a decimal-cast guard would make
    * the oracle query ERROR on NaN-bearing embeddings while the engine
    * silently filters the row. The double norm keeps isnan reachable;
    * the cosine VALUE still rides [[dotSql]]'s decimal chain (guard and
    * value agree on >0 vs ==0 — a sum of squares has no cancellation,
    * so double-vs-decimal rounding cannot flip its sign). */
  private def rawNormSql(x: String): String =
    s"list_sum(list_transform(range(1, 65), i -> " +
      s"CAST($x[i] AS DOUBLE) * CAST($x[i] AS DOUBLE)))"

  private def normOkSql(x: String): String =
    s"(${rawNormSql(x)} > 0 AND NOT isnan(${rawNormSql(x)}))"

  /** The q139 oracle: MMR re-ranking with the greedy loop UNROLLED as k
    * relational rounds — round r scores every unselected candidate as
    * `lam*rel - (1-lam)*max(sim to the r-1 already-selected)` and takes
    * the row_number-1 row (score DESC, relevance-rank ASC tiebreak,
    * mirroring the engine's struct-argmax). Score literals interpolate
    * the SAME doubles the engine multiplies by (`1.0 - lam` computed
    * once in Scala), so both engines evaluate identical IEEE ops.
    */
  private def mmrOracle(nQ: Int, topN: Int, k: Int, lam: Double): String = {
    val oml = 1.0 - lam
    val rounds = (2 to k).map { r =>
      s"""mr$r AS (
        SELECT cv.query_id, cv.neighbor_id, cv.rel_rank, cv.rel,
               max(sim.s) AS ms
        FROM cv
        JOIN sel${r - 1} sl ON sl.query_id = cv.query_id
        JOIN sim ON sim.query_id = cv.query_id AND sim.i = cv.neighbor_id
                AND sim.j = sl.neighbor_id
        LEFT JOIN sel${r - 1} sx ON sx.query_id = cv.query_id
                AND sx.neighbor_id = cv.neighbor_id
        WHERE sx.neighbor_id IS NULL
        GROUP BY cv.query_id, cv.neighbor_id, cv.rel_rank, cv.rel),
      s$r AS (SELECT query_id, neighbor_id, rel_rank, $r AS mmr_rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
          ORDER BY $lam*rel - $oml*ms DESC, rel_rank) AS rn FROM mr$r)
        WHERE rn = 1),
      sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM s$r)"""
    }.mkString(",\n")
    s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                 FROM embeddings WHERE vec_id < $nQ),
      scored AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                   ${cosSql("q.qv", "e.embedding")} AS rel,
                   ROW_NUMBER() OVER (PARTITION BY q.query_id
                     ORDER BY ${cosSql("q.qv", "e.embedding")} DESC, e.vec_id)
                     AS rel_rank
                 FROM q, embeddings e WHERE e.vec_id != q.query_id),
      cv AS (SELECT scored.query_id, scored.neighbor_id, scored.rel,
                    CAST(scored.rel_rank AS INT) AS rel_rank,
                    e.embedding AS v
             FROM scored JOIN embeddings e ON e.vec_id = scored.neighbor_id
             WHERE scored.rel_rank <= $topN),
      sim AS (SELECT a.query_id, a.neighbor_id AS i, b.neighbor_id AS j,
                     ${cosSql("a.v", "b.v")} AS s
              FROM cv a JOIN cv b ON a.query_id = b.query_id),
      s1 AS (SELECT query_id, neighbor_id, rel_rank, 1 AS mmr_rank FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY $lam*rel - $oml*0.0 DESC, rel_rank) AS rn FROM cv)
          WHERE rn = 1),
      sel1 AS (SELECT * FROM s1),
      $rounds
      SELECT query_id, neighbor_id, CAST(mmr_rank AS INT) AS mmr_rank,
             rel_rank
      FROM sel$k ORDER BY query_id, mmr_rank"""
  }

  val defs: Seq[QueryDef] = Seq(
    // ---- exact cosine kNN: top-3 neighbors for the first 8 vectors
    // Output is the neighbor ranking only: raw cosine doubles differ
    // between engines at ~1e-10 (double->decimal rounding-mode of the
    // per-element products), while ranking gaps are ~1e-3 — the ranking is
    // the deterministic, hash-safe contract.
    QueryDef(
      "q40_cosine_knn",
      Some(s"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY q.query_id
                   ORDER BY ${cosSql("q.qv", "e.embedding")} DESC, e.vec_id) AS rank
          FROM q, embeddings e WHERE e.vec_id != q.query_id)
        WHERE rank <= 3
        ORDER BY query_id, rank"""),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.cosineTopK(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    },

    // ---- hard-negative mining for contrastive training: per anchor,
    // the top-3 highest-cosine vectors BELOW the positive threshold
    // (0.25 = this corpus' q42 near-dup operating point, so paraphrase
    // positives never leak into the negative set) — the standard dense-
    // retrieval negative-sampling cut. Same bit-matched cosine SQL as
    // q40; the threshold comparison lands on identical doubles in both
    // engines, so the whole selection is oracle-hashable.
    QueryDef(
      "q235_hard_negatives",
      Some(s"""
        WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                   FROM embeddings WHERE vec_id % 40 = 0),
        sc AS (SELECT q.query_id, e.vec_id AS neighbor_id,
                      ${cosSql("q.qv", "e.embedding")} AS cos
               FROM q, embeddings e WHERE e.vec_id != q.query_id)
        SELECT query_id, neighbor_id, rank FROM (
          SELECT query_id, neighbor_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos DESC, neighbor_id) AS rank
          FROM sc WHERE cos < 0.25)
        WHERE rank <= 3
        ORDER BY query_id, rank"""),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.hardNegatives(
          emb.filter(pmod(col("vec_id"), lit(40)) === 0), emb,
          "vec_id", "embedding", k = 3, posThreshold = 0.25)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    },

    // ---- hard negatives, IVF scale path (rows check — the recall and
    // unconditional below-threshold contracts live in RecallContractSpec)
    QueryDef("q243_hard_negatives_ivf", None) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.hardNegativesIvf(
          emb.filter(pmod(col("vec_id"), lit(40)) === 0), emb,
          "vec_id", "embedding", k = 3, posThreshold = 0.25)
        .select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank")
    },

    // ---- semantic decontamination: the embedding-space sibling of the
    // n-gram decontam family — flag corpus vectors whose cosine to ANY
    // eval anchor (vec_id % 40 = 0, the q235 split) reaches 0.25, with
    // the strongest anchor attributed and the match count. Integer-only
    // surface (doc_id, n_matches, best_eval_id): the cosine itself stays
    // internal — engine dot (exact float products, double sum) and the
    // oracle's decimal chain agree to ~1 ulp, which the 0.25 comparison
    // and the argmax tolerate on this data (the q235 precedent) but a
    // raw-double emission would gamble on (playbook rules 10/14).
    QueryDef(
      "q248_semantic_decontam",
      Some(s"""
        WITH q AS (SELECT vec_id AS eval_id, embedding AS qv
                   FROM embeddings
                   WHERE vec_id % 40 = 0 AND ${normOkSql("embedding")}),
        hits AS (SELECT e.vec_id AS doc_id, q.eval_id,
                        ${cosSql("q.qv", "e.embedding")} AS c
                 FROM embeddings e, q
                 WHERE e.vec_id % 40 <> 0 AND ${normOkSql("e.embedding")}
                   AND ${cosSql("q.qv", "e.embedding")} >= 0.25)
        SELECT doc_id, n_matches, best_eval_id FROM (
          SELECT doc_id, eval_id AS best_eval_id,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY c DESC, eval_id) AS rn,
                 COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
          FROM hits) h
        WHERE rn = 1 ORDER BY doc_id"""),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.semanticDecontam(
          emb.filter(pmod(col("vec_id"), lit(40)) === 0),
          emb.filter(pmod(col("vec_id"), lit(40)) =!= 0),
          "vec_id", "embedding", threshold = 0.25)
        .orderBy("doc_id")
    },

    // ---- INDEXED/incremental semantic decontam — q248's production
    // shape (VERDICT r14 task 4): eval anchors persist once as a
    // guarded, dim-stamped vector index (norms precomputed); the
    // per-ingest batch (the q90/q80 20% convention) probes it. The
    // probe is BIT-IDENTICAL to the broadcast path (one scoring core),
    // so the oracle is q248's relational replay restricted to the
    // batch slice. The q128-family matrix now covers surface exact /
    // surface fuzzy / semantic, each with full + incremental forms.
    QueryDef(
      "q251_incremental_semantic_decontam",
      Some(s"""
        WITH q AS (SELECT vec_id AS eval_id, embedding AS qv
                   FROM embeddings
                   WHERE vec_id % 40 = 0 AND ${normOkSql("embedding")}),
        hits AS (SELECT e.vec_id AS doc_id, q.eval_id,
                        ${cosSql("q.qv", "e.embedding")} AS c
                 FROM embeddings e, q
                 WHERE e.vec_id % 40 <> 0 AND e.vec_id % 5 = 0
                   AND ${normOkSql("e.embedding")}
                   AND ${cosSql("q.qv", "e.embedding")} >= 0.25)
        SELECT doc_id, n_matches, best_eval_id FROM (
          SELECT doc_id, eval_id AS best_eval_id,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY c DESC, eval_id) AS rn,
                 COUNT(*) OVER (PARTITION BY doc_id) AS n_matches
          FROM hits) h
        WHERE rn = 1 ORDER BY doc_id"""),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      // deterministic per-sfDir path, overwritten by the build — bench
      // reps and repeated verify runs reuse ONE directory instead of
      // accumulating orphaned createTempDirectory dirs (review r15)
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_evalanchors_" +
        Integer.toHexString(dir.hashCode)
      VectorSim.writeEvalAnchorIndex(
        emb.filter(pmod(col("vec_id"), lit(40)) === 0),
        "vec_id", "embedding", idxDir)
      VectorSim.incrementalSemanticDecontam(
          emb.filter(pmod(col("vec_id"), lit(40)) =!= 0 &&
            pmod(col("vec_id"), lit(5)) === 0),
          "vec_id", "embedding", idxDir, threshold = 0.25)
        .orderBy("doc_id")
    },

    // ---- LSH-bucketed approximate kNN (scale path; rows check)
    QueryDef("q41_cosine_knn_lsh", None) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.cosineTopKLsh(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")
    },

    // ---- embedding near-dup pairs above cosine threshold (rows check)
    // probeBits = 1: the multi-probe operating point whose >= 0.9 recall
    // the RecallContractSpec planted-pair contract actually measures
    QueryDef("q42_embedding_neardups", None) { (s, dir) =>
      VectorSim.cosineNearDups(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.25, probeBits = 1).orderBy("id_a", "id_b")
    },

    // ---- embedding near-dup CLUSTERING: connected components over
    // cosine-threshold pairs (the form a 100 TB embedding dedup actually
    // runs — representative per cluster, never the quadratic pair list).
    // Edges here are EXACT cosine pairs so the whole query is
    // hash-checked against a recursive-CTE components oracle (bit-exact
    // double dots both sides — see DuckXxh.cosineClustersOracle); the LSH
    // candidate path that replaces exact edges at corpus scale keeps its
    // own recall + cluster-consistency contracts (q41/q42 +
    // RecallContractSpec/CorpusOpsSpec).
    // threshold 0.35: the dedup operating point for THIS corpus — q42's
    // analysis threshold (0.25) transitively chains everything into one
    // giant cluster (exactly what representative dedup must not do), and
    // this synthetic table has no pairs at a natural-corpus 0.9 (the
    // planted-duplicate recall contract covers that regime in sbt)
    QueryDef("q73_embedding_dedup_clusters",
      Some(DuckXxh.cosineClustersOracle(threshold = 0.35)),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val pairs = VectorSim.exactCosinePairs(emb, "vec_id", "embedding",
        threshold = 0.35)
      // maxIterations 30: at threshold 0.35 the exact pair graph contains
      // long chains (hundreds of hops), unlike q55's shallow LSH star
      // graphs — 10 rounds genuinely doesn't reach the fixpoint here and
      // connectedComponents fails loudly (by design) rather than handing
      // back a partial clustering
      graft.ops.Components.connectedComponents(
        emb.select(col("vec_id").as("id")),
        pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        maxIterations = 30)
        .orderBy("id")
    },

    // ---- incremental embedding near-dups: the per-ingest-batch shape —
    // a new 20% slice probes the existing corpus's sign-bucket signature
    // index instead of recomputing corpus signatures (vector twin of
    // q79). Rows-only (LSH is not SQL-expressible); batch-equivalence,
    // index round-trip, and recall contracts live in VectorIndexSpec.
    // threshold/probeBits mirror q42's operating point.
    QueryDef("q80_incremental_cosine_neardups", None) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
      val fresh = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
      val index = VectorSim.signIndex(old, "vec_id", "embedding")
      VectorSim.incrementalCosineNearDups(fresh, index, "vec_id", "embedding",
        threshold = 0.25, probeBits = 1).orderBy("id_new", "id_old")
    },

    // ---- IVF-partitioned approximate kNN (inverted-file scale path;
    // rows check — the recall contract vs exact top-k lives in
    // RecallContractSpec)
    QueryDef("q60_cosine_knn_ivf", None) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.cosineTopKIvf(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")
    },

    // ---- IVF+PQ approximate kNN (IVFADC: m-byte codes through the probe
    // join, per-query ADC lookup table, exact re-rank of the bounded
    // shortlist; rows check — the recall and ADC-reconstruction contracts
    // live in RecallContractSpec / PqExprsSpec)
    QueryDef("q64_cosine_knn_pq", None) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.cosineTopKPq(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding", 3)
        .orderBy("query_id", "rank")
    },

    // ---- SemDeDup semantic dedup: spherical k-means cells, then the
    // paper's upper-triangular prune within each cell (drop a doc iff a
    // lower-id cell-mate is cosine-similar). no_oracle by design (k-means
    // assignment is not one SQL query); VectorIndexSpec pins exact
    // equality against an in-memory reference over the real corpus plus
    // the planted-clone-dropped contract.
    QueryDef("q107_semdedup_survivors", None) { (s, dir) =>
      VectorSim.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        numCells = 16, threshold = 0.35).orderBy("vec_id")
    },

    // ---- MMR diversified re-ranking (Carbonell & Goldstein 1998) of the
    // top-20 cosine candidates: greedy redundancy-penalized top-5 with
    // λ = 0.7, run ROW-LOCALLY per query in pure Catalyst HOFs. The
    // oracle UNROLLS the 5 greedy rounds as relational CTEs (argmax =
    // row_number over score DESC, relevance-rank tiebreak) — integer
    // ranks out, so the hash compares the exact selection, q40-style.
    QueryDef(
      "q139_mmr_rerank",
      Some(mmrOracle(nQ = 8, topN = 20, k = 5, lam = 0.7)),
    ) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      VectorSim.mmrRerank(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        topN = 20, k = 5, lam = 0.7)
        .orderBy("query_id", "mmr_rank")
    },

    // ---- seeded ±1 random projection (Achlioptas/JL) 64 -> 16 dims:
    // the ANN front end that shortens vectors before indexing. The
    // implicit sign matrix is re-derived from the XXH64 parity inside a
    // row-local decimal-exact fold (zero shuffles), and the oracle
    // replays hash, signs, and sums bit-for-bit in SQL.
    QueryDef(
      "q156_random_projection",
      Some(DuckXxh.signProjectOracle(dIn = 64, dOut = 16)),
    ) { (s, dir) =>
      VectorSim.signProject(Tables.embeddings(s, dir), "vec_id", "embedding",
        dIn = 64, dOut = 16)
        .orderBy("vec_id", "dim")
    },
  )
}
