package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.DotProductF32.dotF32
import graft.functions.TopKPairs
import scala.util.Random

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force exact cosine top-k is the baseline (a broadcast join of the
  * query set against the corpus — linear in corpus size, embarrassingly
  * parallel). The scale path is random-hyperplane LSH: a 100 TB corpus is
  * bucketed by sign-pattern once (one projection + one shuffle on the
  * bucket key), and each query only scans its own bucket (plus optional
  * multi-probe neighbors).
  *
  * Dot products are per-row sequential double accumulation (codegen'd
  * [[graft.functions.DotProductF32]]): there is no cross-row aggregation
  * in a dot product, so the result is deterministic under any partitioning
  * — the oracle contract for kNN is the RANKING, whose margins (~1e-3)
  * dwarf double rounding (~1e-15).
  */
object VectorSim {

  /** Dot product of two float-array columns (codegen'd, deterministic). */
  def dot(a: Column, b: Column): Column = dotF32(a, b)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dotF32(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Rank scored (query_id, neighbor_id, cosine) rows to per-query top-k
    * with the bounded [[graft.functions.TopKPairs]] aggregate: map-side
    * partials keep k pairs per query per partition, so the one shuffle
    * carries O(partitions × queries × k) bytes — unlike the
    * `row_number().over(partitionBy(query))` window, which shuffles every
    * scored row into #queries tasks and sorts corpus-sized partitions.
    * Ranking contract preserved: (cosine DESC, neighbor_id ASC), rank 1-k.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("query_id")
      .agg(TopKPairs.topK(col("cosine"), col("neighbor_id"), k).as("nb"))
      .select(col("query_id"), posexplode(col("nb")).as(Seq("_i", "_s")))
      .select(col("query_id"), col("_s.id").as("neighbor_id"),
        col("_s.score").as("cosine"), (col("_i") + 1).as("rank"))

  /** Exact brute-force cosine top-k: every query row against the whole
    * corpus. Queries are broadcast (the small side by construction).
    */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // norms computed ONCE per row, not per pair: the pairwise work drops
    // to a single dot product (same final values — identical arithmetic)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", sqrt(normSq(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", sqrt(normSq(col("cv"))))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Deterministic random hyperplanes (seeded) as a literal nested
    * `array<array<float>>` — generated once on the driver, folded into
    * codegen as constants (float so the per-plane dot runs on the same
    * codegen'd kernel as the pairwise scoring).
    */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Column = {
    val rnd = new Random(seed)
    array((0 until numPlanes).map { _ =>
      array((0 until dim).map(_ => lit(rnd.nextGaussian().toFloat)): _*)
    }: _*)
  }

  /** Sign-pattern LSH bucket id: bit p set when v · plane_p > 0
    * (statically unrolled over planes; `element_at` on the literal plane
    * array constant-folds, each dot is one codegen'd loop).
    */
  def lshBucket(vec: Column, planes: Column, numPlanes: Int): Column =
    (0 until numPlanes).map { p =>
      when(dotF32(vec, element_at(planes, p + 1)) > 0, lit(1L << p))
        .otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** Per-table sign-pattern buckets: `numTables` independent hash tables of
    * `planesPerTable` hyperplanes each, as one `array<long>` column. A pair
    * is a candidate when it collides in ANY table (classic OR
    * amplification) — a single table of p planes has collision probability
    * (1-θ/π)^p, which collapses for moderately-similar neighbors; L tables
    * lift it to 1-(1-(1-θ/π)^p)^L while each table still prunes ~2^p-fold.
    */
  def lshTableBuckets(
      vec: Column, planes: Column, numTables: Int, planesPerTable: Int): Column =
    array((0 until numTables).map { t =>
      (0 until planesPerTable).map { p =>
        val idx = t * planesPerTable + p
        when(dotF32(vec, element_at(planes, idx + 1)) > 0, lit(1L << p))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseOR(_))
    }: _*)

  /** LSH-bucketed approximate cosine top-k: corpus and queries are hashed
    * into `numTables` sign-pattern tables; each query joins its bucket in
    * each table, then exact cosine ranks the union of candidates. A pair
    * colliding in several tables is kept only in its FIRST shared table
    * (`first_equal_index` over the two bucket arrays — per-row filter, no
    * dedup shuffle; same trick as the MinHash band join). Recall < 1 by
    * construction; at scale this replaces the cross join with bucket
    * equi-joins carrying corpus×numTables lean rows.
    */
  def cosineTopKLsh(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, numTables: Int = 8, planesPerTable: Int = 4,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numTables * planesPerTable, dim, seed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qb", lshTableBuckets(col("qv"), planes, numTables, planesPerTable))
      .withColumn("qn", sqrt(normSq(col("qv"))))
      .select(col("query_id"), col("qv"), col("qn"), col("qb"),
        posexplode(col("qb")).as(Seq("table", "bucket")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cb", lshTableBuckets(col("cv"), planes, numTables, planesPerTable))
      .withColumn("cn", sqrt(normSq(col("cv"))))
      .select(col("neighbor_id"), col("cv"), col("cn"), col("cb"),
        posexplode(col("cb")).as(Seq("table", "bucket")))
    val scored = c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .filter(graft.functions.MinHashExprs.firstEqualIndex(col("qb"), col("cb")) ===
        col("table"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * multi-table LSH-blocked (the embedding analog of MinHash dedup).
    * Defaults favor the realistic near-dup regime (cosine >= ~0.8):
    * 8 tables × 6 planes give ~98% recall at cosine 0.9 while each table
    * prunes 64-fold.
    */
  def cosineNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numTables: Int = 8, planesPerTable: Int = 6,
      dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numTables * planesPerTable, dim, seed)
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("tb", lshTableBuckets(col("v"), planes, numTables, planesPerTable))
      .withColumn("n", sqrt(normSq(col("v"))))
      .select(col("id"), col("v"), col("n"), col("tb"),
        posexplode(col("tb")).as(Seq("table", "bucket")))
    val a = t.select(col("table"), col("bucket"), col("id").as("id_a"),
      col("v").as("va"), col("n").as("na"), col("tb").as("tb_a"))
    val b = t.select(col("table"), col("bucket"), col("id").as("id_b"),
      col("v").as("vb"), col("n").as("nb"), col("tb").as("tb_b"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.MinHashExprs.firstEqualIndex(col("tb_a"), col("tb_b")) ===
        col("table"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
