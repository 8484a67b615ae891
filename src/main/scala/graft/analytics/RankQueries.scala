package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{Rrf, TextRank, VectorSim}

/** Text-relevance ranking and corpus-sharding queries over `documents` —
  * the retrieval/curation surface of a training-data pipeline (beyond the
  * reference, whose text ops stop at exact fingerprints): BM25 search,
  * TF-IDF term weighting, and the seeded deterministic shuffle/shard
  * assignment that fixes a training order.
  */
object RankQueries {

  private val bm25Terms = Seq("spark", "join", "window", "stream")

  /** Fixed query batch for q87 (and the indexed-serving contract tests):
    * distinct ids, overlapping vocabularies — the N-queries-at-once
    * retrieval shape. */
  val batchQueries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join"),
    2 -> Seq("hash", "table"),
    3 -> Seq("stream", "window", "merge"),
    4 -> Seq("vector", "sort", "join"),
  )

  /** Fixed phrase for q88: a bigram that actually occurs in the corpus. */
  val phrase: Seq[String] = Seq("table", "hash")

  val defs: Seq[QueryDef] = Seq(
    // ---- BM25 retrieval for a fixed query. Scale shape: zero corpus
    // shuffles — row-local tf for the fixed term list, one broadcast
    // 1-row stats aggregate, TakeOrderedAndProject top-k. Scores rounded
    // to 6 dp (ln's last ulp differs between JVM and libm; rounding is
    // bit-verified equal across engines).
    QueryDef(
      "q81_bm25_search",
      Some(TextRank.bm25OracleSql(bm25Terms, topK = 10)),
    ) { (s, dir) =>
      TextRank.bm25(Tables.documents(s, dir), "text", "doc_id", bm25Terms,
        topK = 10).orderBy("doc_id")
    },

    // ---- TF-IDF top terms per doc: the full-vocabulary weighting path
    // (one tf shuffle, a vocab-sized df join, one per-doc rank window).
    // Ranking is on the ROUNDED score so mathematically-coincident scores
    // (2·ln(N/x) vs ln(N/x²)) tie-break identically in both engines.
    QueryDef(
      "q82_tfidf_top_terms",
      Some(TextRank.tfidfOracleSql(topN = 3)),
    ) { (s, dir) =>
      TextRank.tfidfTopTerms(Tables.documents(s, dir), "text", "doc_id",
        topN = 3).orderBy("doc_id", "rank")
    },

    // ---- inverted-index build: (term, block) → (df, total_tf, ascending
    // posting-list block). The term-keyed shuffle is the canonical search
    // index build; postings are SEGMENTED (Lucene-style) so a stopword's
    // corpus-sized posting list never sits in one aggregation row, and
    // stringified so the compare is byte-stable across engines' list
    // types.
    QueryDef(
      "q85_inverted_index",
      Some(TextRank.invertedIndexOracleSql(blockSize = 1024)),
    ) { (s, dir) =>
      TextRank.invertedIndex(Tables.documents(s, dir), "text", "doc_id",
        blockSize = 1024).orderBy("term", "block")
    },

    // ---- seeded deterministic corpus shuffle + shard assignment (fixes
    // a reproducible training order): shard = pmod(xxhash64(id), n),
    // position = rank of the hash within the shard. The per-shard sort IS
    // the operator; parallelism = nShards, so production sizes nShards to
    // the cluster (and the hash key makes shard sizes near-uniform).
    // Hash-checked end-to-end through the DuckXxh XXH64 re-implementation.
    QueryDef(
      "q84_shard_assignment",
      Some(DuckXxh.shardAssignOracle(nShards = 16)),
    ) { (s, dir) =>
      val n = 16
      Tables.documents(s, dir)
        .select(col("doc_id"), xxhash64(col("doc_id")).as("h"))
        .withColumn("shard", pmod(col("h"), lit(n.toLong)).cast("int"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))))
        .select("doc_id", "h", "shard", "pos")
        .orderBy("doc_id")
    },

    // ---- batch multi-query BM25: N queries amortize ONE corpus scan
    // (row-local tf for the union vocabulary, one broadcast stats row),
    // per-query top-k via the bounded TopKPairs aggregate — not a window,
    // whose shuffle would collapse parallelism to the query count. Scores
    // bit-identical to N independent q81 runs (same fold order per query).
    QueryDef(
      "q87_bm25_batch",
      Some(TextRank.bm25BatchOracleSql(batchQueries, topK = 8)),
    ) { (s, dir) =>
      TextRank.bm25Batch(Tables.documents(s, dir), "text", "doc_id",
        batchQueries, topK = 8)
    },

    // ---- exact phrase occurrence ranking: candidate start positions are
    // a row-local filter over the token array (zero corpus shuffles, the
    // positional primitive under phrase queries), top-k cut is
    // TakeOrderedAndProject. Integer-only output — no float surface.
    QueryDef(
      "q88_phrase_search",
      Some(TextRank.phraseMatchOracleSql(phrase, topK = 15)),
    ) { (s, dir) =>
      TextRank.phraseMatch(Tables.documents(s, dir), "text", "doc_id",
        phrase, topK = 15).orderBy("doc_id")
    },

    // ---- hybrid retrieval: reciprocal-rank fusion of the lexical BM25
    // top-20 and the vector cosine top-20 (query = doc 0's embedding;
    // doc_id and vec_id share the id space). Only RANKS enter the fused
    // score — 1/(60+rank) is one IEEE division of exact integers, summed
    // in fixed list order — so the whole chain is hash-exact even though
    // the two legs' score scales are incomparable. The legs keep their
    // own corpus-scale shapes; fusion touches O(lists·topK) rows.
    QueryDef(
      "q94_hybrid_rrf",
      Some(s"""
        WITH lex0 AS (${TextRank.bm25OracleSql(bm25Terms, topK = 20)}),
        lex AS (SELECT doc_id,
                  row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
                FROM lex0),
        vq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        vec AS (SELECT doc_id, rank FROM (
                  SELECT e.vec_id AS doc_id,
                         row_number() OVER (ORDER BY
                           ${VectorQueries.cosSql("vq.qv", "e.embedding")} DESC,
                           e.vec_id) AS rank
                  FROM embeddings e, vq WHERE e.vec_id != 0)
                WHERE rank <= 20),
        f AS (SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
                (CASE WHEN lex.rank IS NOT NULL
                      THEN CAST(1 AS DOUBLE) / (60 + lex.rank)
                      ELSE CAST(0 AS DOUBLE) END
                 + CASE WHEN vec.rank IS NOT NULL
                        THEN CAST(1 AS DOUBLE) / (60 + vec.rank)
                        ELSE CAST(0 AS DOUBLE) END) AS rrf,
                CAST(CASE WHEN lex.rank IS NOT NULL THEN 1 ELSE 0 END
                     + CASE WHEN vec.rank IS NOT NULL THEN 1 ELSE 0 END
                     AS INT) AS n_lists
              FROM lex FULL JOIN vec ON lex.doc_id = vec.doc_id)
        SELECT doc_id, rrf, n_lists FROM (
          SELECT * FROM f ORDER BY rrf DESC, doc_id LIMIT 10)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      // re-rank the <= 20-row bm25 result: a global window on a bounded
      // post-limit list, not a corpus-sized sort
      val lex = TextRank.bm25(docs, "text", "doc_id", bm25Terms, topK = 20)
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("bm25"), col("doc_id"))))
        .select("doc_id", "rank")
      val vec = VectorSim.cosineTopK(
          emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", 20)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      Rrf.fuse(Seq(lex, vec), "doc_id", "rank", k0 = 60, topK = 10)
        .orderBy("doc_id")
    },
  )
}
