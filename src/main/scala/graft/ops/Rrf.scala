package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (RRF) of N ranked retrieval lists — the
  * standard hybrid-retrieval combiner (Cormack/Clarke/Buettcher, SIGIR
  * 2009): a document's fused score is `Σ_lists 1/(k0 + rank)`, summed
  * over the lists it appears in. RRF is the production way to merge a
  * lexical (BM25) list with a vector (cosine ANN) list without score
  * calibration: only RANKS enter the formula, so the two lists'
  * incomparable score scales never meet.
  *
  * Beyond-reference training-data surface (the reference has no
  * retrieval at all); pairs [[TextRank.bm25]] with
  * [[VectorSim.cosineTopK]] as the hybrid search every RAG-style corpus
  * query runs.
  *
  * Scale shape: fusion inputs are ALREADY bounded top-K lists (each
  * retrieval leg did the corpus-scale work and emitted <= K rows), so
  * the fold of full-outer joins here touches O(N·K) rows total —
  * driver-adjacent size at any corpus scale. The expensive parts
  * (corpus scan / pruned index read / ANN probe) live in the legs,
  * which keep their own 100 TB shapes.
  *
  * Float determinism: each list's contribution is one IEEE division
  * `1.0 / (k0 + rank)` of exact integers — bit-identical across engines
  * — and the sum folds in FIXED list order (join fold, never a groupBy
  * sum whose accumulation order floats), so fused scores are bit-exact
  * and hash-safe with integer tie-breaks on the id.
  */
object Rrf {

  /** Fuse ranked lists. Each input must carry (`idCol`, `rankCol`) with
    * rank 1-based and unique per list. Output: one row per distinct id —
    * (idCol, rrf, n_lists) — cut to the global `topK` by
    * (rrf DESC, id ASC). `n_lists` is how many lists surfaced the id
    * (the agreement signal hybrid rankers threshold on).
    */
  def fuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(k0 >= 1, "k0 must be >= 1 (the standard constant is 60)")
    // rename per-list rank columns, then fold full-outer joins on the id:
    // fixed association order for the score sum. A duplicated id inside
    // one list would silently fan out the join fold and double-count its
    // contributions — enforce uniqueness LOUDLY via a per-list
    // aggregation (the lists are bounded top-K, so this is cheap) whose
    // gate fires at execution time.
    val renamed = lists.zipWithIndex.map { case (df, i) =>
      df.groupBy(col(idCol))
        .agg(count(lit(1)).as("_c"), max(col(rankCol)).as("_m"))
        .select(col(idCol),
          when(col("_c") > 1, raise_error(concat(
            lit(s"ranked list $i contains id "), col(idCol).cast("string"),
            lit(" more than once; RRF needs one rank per id per list"))))
            .otherwise(col("_m")).as(s"_r$i"))
    }
    val joined = renamed.reduceLeft((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val contrib = lists.indices.map(i =>
      when(col(s"_r$i").isNotNull, lit(1.0) / (lit(k0) + col(s"_r$i")))
        .otherwise(lit(0.0)))
    val present = lists.indices.map(i =>
      when(col(s"_r$i").isNotNull, 1).otherwise(0))
    joined
      .select(col(idCol), contrib.reduceLeft(_ + _).as("rrf"),
        present.reduceLeft(_ + _).as("n_lists"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(topK)
  }
}
