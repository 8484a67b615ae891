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

  /** The loop's canonical (src, dst) edge frame, lineage cut exactly
    * once: when the caller already hands a materialized two-column
    * (src, dst) frame — the query fns probe start scalars off the edge
    * list first, so they checkpoint it themselves — reuse it instead of
    * re-materializing identical data (r16). */
  private def shapedEdges(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    if (srcCol == "src" && dstCol == "dst" &&
        edges.columns.sameElements(Array("src", "dst")))
      graft.core.Frames.checkpointOnce(edges)
    else edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)

  /** Ranks after `iters` rounds over directed `edges`; output
    * (node, rank) with rank at the 10^12 fixed-point scale. Multi-edges
    * should be deduplicated by the caller if single-edge semantics are
    * wanted — each edge row carries mass.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = Scale): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // checkpointOnce: a caller that already materialized (src, dst) —
    // e.g. to probe a start scalar — must not re-materialize it (r16)
    val e = shapedEdges(edges, srcCol, dstCol)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    // out-degree folded ONTO the edge list once, outside the loop (r16):
    // the round join was e ⋈ ranks ⋈ deg — one edge-sized join per round
    // existed only to re-attach a value that is a pure function of e.
    // Same integer `rank div deg` per edge, one join per round. The
    // frame is hash-partitioned on the round join key BEFORE the
    // lineage cut (localCheckpoint preserves outputPartitioning), so
    // every round's join reuses the edge-side layout and only the
    // node-sized rank frame moves — guide §2.4 "two operations keyed
    // the same way share one exchange", applied across rounds.
    val eDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(e, "src")
      .repartition(col("src"))
      .localCheckpoint(true)
    val teleport = (scale * 15L) / 100L
    var ranks = nodes.withColumn("rank", lit(scale / n))
    for (i <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
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
    val e = shapedEdges(edges, srcCol, dstCol)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    // deg folded onto the edge list once, pre-partitioned on the round
    // join key — see [[pageRank]] (r16)
    val eDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(e, "src")
      .repartition(col("src"))
      .localCheckpoint(true)
    val teleport = (scale * 15L) / 100L / sources.length
    val isSrc = col("node").isin(sources: _*)
    var ranks = nodes.withColumn("rank",
      when(isSrc, lit(scale / sources.length)).otherwise(lit(0L)))
    for (i <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
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
      dstCol: String, broadcastEdgeLimit: Long = 4000000L): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true) // consumed three times below
    // The closure join meets the WEDGE-sized stream against the
    // GRAPH-sized edge list (measured at sf0.1: 49M wedges vs 1.2M
    // edges — that one exchange moved 447 MB to meet a 19 MB side).
    // When the edge list is bounded (cheap count over the materialized
    // checkpoint) AND both endpoint ids fit 31 bits, close wedges with a
    // LEFT SEMI against the BROADCAST edge set on ONE packed 64-bit key:
    // the wedge stream never shuffles, and the single-long key rides
    // Spark's long-keyed hash relation — measured 2.5x cheaper per probe
    // than the two-column composite key (r16; guide §3.1/§2.3). An
    // inner join against the DISTINCT edge list multiplies by exactly 1,
    // so the semi join is the same result for less work. Beyond the
    // limit (or for unpackable ids) the shuffle join carries, unchanged
    // — a 100 TB graph's edge list must not be collected to one JVM.
    val packable = {
      import org.apache.spark.sql.types._
      (e.schema("u").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }) && {
        val st = e.agg(min(col("u")).cast("long"), max(col("v")).cast("long")).head()
        !st.isNullAt(0) && st.getLong(0) >= 0L && st.getLong(1) < (1L << 31)
      }
    }
    val wedges = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    val tri = if (packable && e.count() <= broadcastEdgeLimit) {
      val ePk = e.select((shiftleft(col("u").cast("long"), 32) +
        col("v").cast("long")).as("_pk"))
      wedges.join(
        org.apache.spark.sql.functions.broadcast(ePk),
        shiftleft(col("a").cast("long"), 32) + col("c").cast("long") ===
          col("_pk"),
        "left_semi")
    } else {
      wedges.join(e.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"),
        "left_semi")
    }
    // one explode, not a 3-way union — the union would re-run the
    // triangle joins once per role
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("n_triangles"))
  }
}
