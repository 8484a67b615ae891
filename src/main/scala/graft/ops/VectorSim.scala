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

  /** LSH-bucketed approximate cosine top-k: corpus and queries are hashed
    * to sign-pattern buckets; each query joins only its bucket, then exact
    * cosine ranks within the candidates. Recall < 1 by construction; at
    * scale this replaces the cross join with a bucket-equi-join.
    */
  def cosineTopKLsh(
      queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes, numPlanes))
      .withColumn("qn", sqrt(normSq(col("qv"))))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes, numPlanes))
      .withColumn("cn", sqrt(normSq(col("cv"))))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
    rankTopK(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * LSH-blocked (the embedding analog of MinHash dedup).
    */
  def cosineNearDups(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, numPlanes: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(numPlanes, dim, seed)
    val t = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes, numPlanes))
      .withColumn("n", sqrt(normSq(col("v"))))
    val a = t.select(col("bucket"), col("id").as("id_a"), col("v").as("va"), col("n").as("na"))
    val b = t.select(col("bucket"), col("id").as("id_b"), col("v").as("vb"), col("n").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
