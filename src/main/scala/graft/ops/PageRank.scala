package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank (Page et al. 1999) with INTEGER-EXACT fixed-point
  * arithmetic — ranks live at scale 10^12 and every step uses only
  * integer sum and floor division, so a DuckDB oracle can replay the
  * whole iteration bit-for-bit (the float formulation would drift by
  * partitioning order):
  *
  *   r_0(v)   = SCALE div N
  *   r_k(v)   = (15 * SCALE) div 100
  *              + (85 * Σ_{u→v} (r_{k-1}(u) div deg(u))) div 100
  *
  * Floor-div truncation loses < 1 unit of 10^-12 rank per term per
  * round — immaterial for ranking, decisive for cross-engine equality.
  * Dangling nodes contribute no mass (the standard dropped-mass
  * simplification); on symmetric edge sets none exist.
  *
  * Shape at scale: each round is one equi-join of the edge list against
  * the (node, rank) frame plus one hash aggregation on dst — the classic
  * Pregel-as-joins formulation. Lineage is cut with localCheckpoint
  * every 2 rounds (the Components-loop lesson: an unbounded iterative
  * plan re-plans quadratically). Long math holds while
  * 85 * N * SCALE < 2^63 — at web scale lower SCALE to 10^9.
  */
object PageRank {

  val Scale = 1000000000000L

  /** Ranks after `iters` rounds over directed `edges`; output
    * (node, rank) with rank at the 10^12 fixed-point scale. Multi-edges
    * should be deduplicated by the caller if single-edge semantics are
    * wanted — each edge row carries mass.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = Scale): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true) // the loop re-reads edges every round
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val teleport = (scale * 15L) / 100L
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("_c"))
        .groupBy("node").agg(sum("_c").as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(teleport) +
          expr("(85 * coalesce(contrib, 0L)) div 100")).as("rank"))
      if (i % 2 == 0) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** PERSONALIZED PageRank: the teleport mass lands only on `sources`
    * (split evenly, floor-divided), so ranks measure proximity TO the
    * source set — the random-walk-with-restart relatedness score under
    * the same integer-exact fixed-point arithmetic as [[pageRank]]
    * (an oracle can replay every round bit-for-bit). Same
    * Pregel-as-joins round shape and lineage hygiene.
    */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], iters: Int, scale: Long = Scale): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(sources.nonEmpty && sources.size <= 10000,
      s"personalized PageRank needs 1..10000 sources (got ${sources.size}); " +
        "the teleport set rides the plan as an IN-list literal — for " +
        "larger seed sets join a teleport table instead")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val teleport = (scale * 15L) / 100L / sources.length
    val isSrc = col("node").isin(sources: _*)
    var ranks = nodes.withColumn("rank",
      when(isSrc, lit(scale / sources.length)).otherwise(lit(0L)))
    for (i <- 1 to iters) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("node"), expr("rank div deg").as("_c"))
        .groupBy("node").agg(sum("_c").as("contrib"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (when(isSrc, lit(teleport)).otherwise(lit(0L)) +
            expr("(85 * coalesce(contrib, 0L)) div 100")).as("rank"))
      if (i % 2 == 0) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }

  /** Per-vertex TRIANGLE counts (each triangle counted at all three of
    * its vertices) — the local-clustering building block, and the
    * classic MapReduce graph benchmark. Edges are canonicalized to
    * undirected (u < v) pairs; wedges enumerate under the id orientation
    * (a < b < c), so each triangle closes exactly once and the closure
    * test is one equi-join against the edge set itself.
    *
    * Shape: two self-equi-joins of the (deduplicated, checkpointed) edge
    * list + one explode-free role union + one aggregation — no
    * cartesian anywhere. Wedge volume is Σ_b (fwd-deg(b) choose 2) under
    * the orientation; for skew-heavy graphs swap the id orientation for
    * degree orientation (same output, bounded wedges) — at that point
    * the oracle needs the degree table too.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // consumed three times below
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
      .join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    // one explode, not a 3-way union — the union would re-run the
    // triangle joins once per role
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_triangles"))
  }
}
