package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterated min-label propagation
  * with pointer jumping — the clustering core shared by every near-dup
  * family (MinHash text clusters, embedding clusters, any candidate-pair
  * generator).
  *
  * Why not pairwise output: listing all near-dup pairs is quadratic in
  * cluster size (a 10k-copy boilerplate cluster is 50M pairs); dedup only
  * needs a representative per cluster, and label propagation over the
  * candidate EDGES is linear in edge count.
  *
  * Convergence: each round takes the min label over neighbors, then
  * replaces every label by its label's label (path halving), so rounds
  * needed are O(log diameter) instead of O(diameter). Labels only ever
  * decrease, so an unchanged label sum IS the fixpoint — one cheap
  * aggregate per round. Per round: two equi-joins keyed by id/label, no
  * driver-side state beyond the convergence scalar.
  */
object Components extends org.apache.spark.internal.Logging {

  /** Connected components of the undirected graph over `nodes` ("id"
    * column, DISTINCT integral ids — duplicates would duplicate output
    * rows) with `edges` ("src", "dst" columns; symmetrized here, so
    * callers pass each pair once in either direction; endpoints absent
    * from `nodes` still propagate labels but are dropped from the
    * output). Returns (id, cluster_rep) with cluster_rep = min id of the
    * component; keep rows where id == cluster_rep for one representative
    * per cluster. Throws if the label fixpoint is not reached within
    * `maxIterations` (rounds needed ~ log2 of the graph diameter).
    *
    * Hybrid execution, the standard CC shape: when the deduplicated edge
    * subgraph fits under `localEdgeLimit` it is union-found ON THE DRIVER
    * (exact, O(E α), one collect of (src, dst) longs) — the candidate
    * subgraph of a real near-dup corpus is orders of magnitude smaller
    * than the corpus, and the distributed loop's per-round fixed cost
    * (two joins, a checkpoint, a convergence aggregate) swamps the actual
    * work at that size. Beyond the limit the iterated min-label +
    * path-halving loop runs, whose per-round cost amortizes exactly when
    * the data is big enough to need it. Identical labels either way.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxIterations: Int = 10,
      localEdgeLimit: Long = 1000000L): DataFrame =
    connectedComponentsWithRounds(nodes, edges, maxIterations, localEdgeLimit)._1

  /** [[connectedComponents]] plus the number of propagation rounds the
    * fixpoint took (0 on the driver union-find path) — the observable the
    * O(log diameter) stress contract asserts on (`ComponentsStressSpec`,
    * which forces the distributed loop with `localEdgeLimit = 0`).
    */
  private[graft] def connectedComponentsWithRounds(nodes: DataFrame, edges: DataFrame,
      maxIterations: Int, localEdgeLimit: Long = 1000000L): (DataFrame, Int) = {
    val sym = edges
      .select(explode(array(
        struct(col("src").as("id"), col("dst").as("rep")),
        struct(col("dst").as("id"), col("src").as("rep")))).as("e"))
      .select(col("e.id").as("id"), col("e.rep").as("rep"))
      .filter(col("id") =!= col("rep"))
      .dropDuplicates()
      .persist()

    // driver union-find when the edge subgraph is small: the collect is
    // bounded by localEdgeLimit (src, dst) longs, and the result rides
    // back as a broadcast-sized label table. Collected as SPECIALIZED
    // (Long, Long) tuples, not GenericRow — at the 1M-edge default that
    // is ~32MB vs several hundred MB of Row objects, keeping the
    // shortcut safe on a default-1g driver. The shortcut is gated on
    // INTEGRAL id types (the long collect would throw on e.g. string
    // ids); non-integral callers fall through to the distributed loop,
    // which is type-agnostic — identical labels either way.
    val integralIds = {
      import org.apache.spark.sql.types._
      def width(dt: DataType): Int = dt match {
        case ByteType => 1; case ShortType => 2
        case IntegerType => 4; case LongType => 8
        case _ => -1
      }
      val edgeW = Seq("id", "rep").map(t => width(sym.schema(t).dataType))
      val nodeW = width(nodes.schema("id").dataType)
      // edge id types must FIT the node id type: labels are computed on
      // the edge endpoints and cast down to the node type at the end, so
      // a wider edge type could carry an endpoint (absent from nodes —
      // explicitly allowed) whose downcast WRAPS onto a real node id and
      // mislabels it. Wider-edged graphs take the distributed loop,
      // which never casts.
      (edgeW :+ nodeW).forall(_ > 0) && edgeW.forall(_ <= nodeW)
    }
    val nEdges = sym.count()
    if (integralIds && nEdges <= localEdgeLimit) {
      val spark0 = nodes.sparkSession
      import spark0.implicits._
      val idType = nodes.schema("id").dataType
      val pairs = sym.filter(col("id") < col("rep"))
        .select(col("id").cast("long"), col("rep").cast("long"))
        .as[(Long, Long)].collect()
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      pairs.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min id wins
      }
      val labels = pairs.iterator.flatMap(p => Iterator(p._1, p._2))
        .toSet[Long].toSeq.map(id => (id, find(id)))
      sym.unpersist()
      // cast labels back to the caller's id type (int ids upcast safely
      // to long for the union-find; reps are min-of-ids, so the downcast
      // is lossless) — the output schema must match the distributed path
      val labelDf = spark0.createDataset(labels).toDF("id", "cluster_rep")
        .select(col("id").cast(idType), col("cluster_rep").cast(idType))
      val out = nodes
        .join(broadcast(labelDf), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("cluster_rep"), col("id")).as("cluster_rep"))
        .localCheckpoint(true)
      return (out, 0)
    }

    // Only nodes that touch an edge enter the loop — isolated nodes (the
    // overwhelming majority of a realistic near-dup graph) are their own
    // representative by definition and join back after convergence, so
    // every per-round shuffle is sized by the candidate subgraph, not the
    // corpus. Initial label = min(id, min neighbor): the first
    // propagation round folded into one aggregate.
    //
    // Every round ends in an EAGER localCheckpoint: each round's plan
    // references the previous labels 3x (neighbor join + the hop
    // self-join), so without lineage truncation the logical plan grows
    // exponentially in rounds — a ~7-round graph OOMs the driver just
    // EXPLAINING the plan. The checkpoint also doubles as the round's
    // materialization barrier for the convergence aggregate, and the
    // ContextCleaner frees each round's RDD once unreferenced.
    // convergence scalar: exact decimal sum of the labels — a raw BIGINT
    // sum overflows silently once ids ~ 10^18 / node-count (any corpus in
    // the 10^12-row regime), and a wrapped sum that happens to repeat
    // would end the loop on inconsistent labels. ONLY exact integer
    // types qualify: the sum casts labels to decimal(38,0), so
    // fractional ids (double/float/scaled decimal) clustered inside one
    // integer unit would alias — labels could move without moving the
    // rounded sum, ending the loop early on inconsistent labels. Every
    // other type (strings, fractional numerics) takes the per-round
    // changed-row check — an extra id-keyed equi-join of two
    // checkpointed label tables, exact for any orderable type.
    val sumConvergence = {
      import org.apache.spark.sql.types._
      Seq("id", "rep").map(sym.schema(_).dataType).forall {
        case ByteType | ShortType | IntegerType | LongType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }
    }
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(col("cluster_rep")
          .cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    def anyChanged(prev: DataFrame, next: DataFrame): Boolean =
      next.join(prev.select(col("id"), col("cluster_rep").as("_prev")), Seq("id"))
        .filter(col("cluster_rep") =!= col("_prev")).take(1).nonEmpty

    var labels = sym.groupBy("id")
      .agg(min(col("rep")).as("nb"))
      .select(col("id"), least(col("id"), col("nb")).as("cluster_rep"))
      .localCheckpoint(true)
    var prevSum = if (sumConvergence) labelSum(labels) else null
    var converged = labels.isEmpty // edge-less graph: nothing to iterate
    var iter = 0
    while (!converged && iter < maxIterations) {
      // min label among {own} U {labels of neighbors}
      val viaEdges = sym
        .join(labels.select(col("id").as("rep"), col("cluster_rep").as("rep_label")),
          Seq("rep"))
        .groupBy("id").agg(min(col("rep_label")).as("edge_label"))
      val hop = labels.join(viaEdges, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_rep"), coalesce(col("edge_label"), col("cluster_rep")))
            .as("cluster_rep"))
      // pointer jump: cluster_rep <- label(cluster_rep)
      val next = hop
        .join(hop.select(col("id").as("cluster_rep"), col("cluster_rep").as("jump")),
          Seq("cluster_rep"), "left")
        .select(col("id"), coalesce(col("jump"), col("cluster_rep")).as("cluster_rep"))
        .localCheckpoint(true)
      if (sumConvergence) {
        val nextSum = labelSum(next)
        converged = nextSum.compareTo(prevSum) == 0
        prevSum = nextSum
      } else {
        converged = !anyChanged(labels, next)
      }
      labels = next
      iter += 1
    }
    logInfo(s"connectedComponents rounds=$iter converged=$converged")
    sym.unpersist()
    // an unconverged label table is silently WRONG (pairs can straddle
    // clusters) — fail loudly rather than hand back inconsistent dedup
    // groups; path halving converges in O(log diameter) rounds, so the
    // default cap covers any graph a near-dup pipeline produces
    if (!converged) {
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds; " +
          "raise maxIterations (rounds needed ~ log2 of the graph diameter)")
    }
    // isolated nodes rejoin as their own representative; the final
    // localCheckpoint hands back a lineage-free result so the last
    // round's RDD can be collected
    val out = nodes
      .join(labels, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster_rep"), col("id")).as("cluster_rep"))
      .localCheckpoint(true)
    (out, iter)
  }

  /** Level-synchronous single-source BFS over directed `edges`
    * (src, dst columns): returns (node, hops) for every node reachable
    * from `source` in at most `maxHops` edges, hops = the exact
    * shortest hop count. The traversal sibling of the CC loop, in the
    * same Pregel-as-joins shape: each level is ONE equi-join of the
    * edge list against the current frontier plus one anti-join against
    * the visited set — integer-exact, so an oracle can replay it as a
    * recursive CTE bit-for-bit.
    *
    * Shape at scale: the frontier/visited frames carry (long, int)
    * rows, partitioned by node; every level is checkpointed, cutting
    * both the lineage (the CC-loop lesson — an uncut iterative plan
    * re-plans quadratically) and the per-level emptiness probe's
    * recompute. Levels run strictly sequentially — that is BFS; width,
    * not depth, is where the cluster parallelism goes.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 64,
      s"maxHops must be in [0, 64], got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    // lineage cut exactly once: the q138 fn probes the start scalar off
    // the checkpointed edge list first — reuse it instead of paying a
    // second materialization of identical data (r16)
    val long2 = {
      import org.apache.spark.sql.types.LongType
      Seq(srcCol, dstCol).forall(edges.schema(_).dataType == LongType)
    }
    val e =
      if (srcCol == "src" && dstCol == "dst" && long2 &&
          edges.columns.sameElements(Array("src", "dst")))
        graft.core.Frames.checkpointOnce(edges)
      else edges
        .select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .localCheckpoint(true)
    var visited = Seq((source, 0)).toDF("node", "hops").localCheckpoint(true)
    // `visited` stays a LAZY union of the (checkpointed) per-level
    // frontiers: each level's frame is already lineage-free, so the
    // union's plan is k shallow leaves — checkpointing the union every
    // level bought nothing but one extra materialization job per level
    // (r16)
    var frontier = visited
    var k = 0
    while (k < maxHops && !frontier.isEmpty) {
      val next = e
        .join(frontier.select(col("node").as("src")), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("hops", lit(k + 1))
        .localCheckpoint(true)
      visited = visited.unionByName(next)
      frontier = next
      k += 1
    }
    visited
  }

  /** SYNCHRONOUS label propagation (Raghavan et al. 2007, public
    * literature) — community detection over an undirected graph: every
    * node starts labeled with its own id; each round it adopts the most
    * frequent label among its neighbors, ties to the SMALLEST label.
    * The min-tie-break makes each round a deterministic integer
    * function of the previous labeling (no randomized visit order), so
    * the whole run is DuckDB-oracle-checkable by unrolling the rounds
    * as CTEs — the q133 fixed-point pattern for communities.
    *
    * Scale shape: one join + hash agg + per-node bounded window per
    * round over the symmetrized edge list; lineage cut per round
    * (`localCheckpoint`) like the CC/BFS loops. A fixed small round
    * count is the published guidance (LP converges in a handful of
    * sweeps; synchronous LP may two-cycle on bipartite structures, which
    * a fixed count sidesteps deterministically).
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val e = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
    // re-read every round; hash-partitioned on the round join key v
    // BEFORE the lineage cut so each round's join reuses the edge-side
    // layout and only the node-sized label frame moves (r16, guide §2.4)
    val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(col("v"))
      .localCheckpoint(true)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("lab", col("node"))
    for (_ <- 1 to rounds) {
      // per-node winner as ONE hash aggregate, not a row_number window:
      // min(struct(-c, lab)) is exactly the (c DESC, lab ASC) argmin the
      // window selected — count first (negated, c >= 1 so negation is
      // safe), then the smallest label — but with map-side partials and
      // no per-partition sort of the edge-sized (u, lab, c) frame (r16;
      // guide §2.3 "aggregate before you shuffle"). Deterministic: the
      // struct order is total, so ties cannot flip with partitioning.
      labels = sym
        .join(labels.withColumnRenamed("node", "v"), "v")
        .groupBy("u", "lab").agg(count(lit(1)).as("c"))
        .groupBy("u")
        .agg(min(struct((-col("c")).as("_nc"), col("lab").as("lab"))).as("_m"))
        .select(col("u").as("node"), col("_m.lab").as("lab"))
        .localCheckpoint(true)
    }
    labels
  }
}
