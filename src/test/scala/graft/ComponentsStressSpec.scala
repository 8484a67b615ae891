package graft

import org.apache.spark.sql.functions._
import graft.ops.Components

/** Stress contracts for the connected-components core: the O(log
  * diameter) round bound (`ops/Components.scala` path halving) is a load-
  * bearing scale claim — every dedup family sits on this loop — so it is
  * asserted, not just documented, against the two adversarial shapes:
  * a maximum-diameter chain and a large two-cluster barbell.
  */
class ComponentsStressSpec extends SparkSpec {

  private def labels(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("1024-node chain: exact labels in ~log2(diameter) rounds, not O(diameter)") {
    import spark.implicits._
    val n = 1024 // diameter 1023 — the worst case per node count
    val nodes = spark.range(n).toDF("id")
    val edges = spark.range(n - 1)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    // localEdgeLimit = 0 forces the distributed loop — the round-count
    // contract is about THAT path, not the driver union-find shortcut
    val (out, rounds) = Components.connectedComponentsWithRounds(nodes, edges, 40,
      localEdgeLimit = 0L)
    val got = labels(out)
    assert(got.size == n && got.values.forall(_ == 0L),
      "every chain node must label to the minimum id 0")
    // path halving: ~log2(1023) ≈ 10 propagation rounds plus the no-change
    // detection round and small constant slack; a linear regression (min
    // label stepping one hop per round) would need ~1023 rounds
    assert(rounds <= 15, s"chain took $rounds rounds — pointer jumping is broken")
    info(s"1024-chain rounds: $rounds (log2(diameter) ≈ 10)")
  }

  test("10^4-node barbell: two 5k star clusters joined by a bridge, exact and fast") {
    import spark.implicits._
    val half = 5000L
    val nodes = spark.range(2 * half).toDF("id")
    // star A: hub 0 <- spokes 1..4999; star B: hub 5000 <- spokes 5001..9999
    val starA = spark.range(1, half).select(col("id").as("src"), lit(0L).as("dst"))
    val starB = spark.range(half + 1, 2 * half)
      .select(col("id").as("src"), lit(half).as("dst"))
    // bridge between two arbitrary spokes (not hubs: labels must cross
    // three hops, hub A <- spoke <- bridge <- spoke <- hub B)
    val bridge = Seq((4999L, 5001L)).toDF("src", "dst")
    val (out, rounds) = Components.connectedComponentsWithRounds(
      nodes.toDF(), starA.unionByName(starB).unionByName(bridge), 10,
      localEdgeLimit = 0L)
    val got = labels(out)
    assert(got.size == 2 * half && got.values.forall(_ == 0L),
      "the bridge must merge both stars into component 0")
    assert(rounds <= 6, s"barbell (diameter 6) took $rounds rounds")
    info(s"barbell rounds: $rounds")
  }

  test("driver union-find and the distributed loop produce identical labels") {
    import spark.implicits._
    // a messy graph: chain + star + cross-links + isolated nodes
    val nodes = spark.range(200).toDF("id")
    val edges = (
      (0L until 40L).map(i => (i, i + 1)) ++
        (100L until 130L).map(i => (i, 100L)) ++
        Seq((40L, 115L), (150L, 151L))
    ).toDF("src", "dst")
    val local = labels(Components.connectedComponents(nodes, edges, 10))
    val dist = labels(Components.connectedComponentsWithRounds(nodes, edges, 10,
      localEdgeLimit = 0L)._1)
    assert(local == dist, "the two execution paths must agree exactly")
    assert(local(115L) == 0L, "cross-link must merge the chain and the star")
  }

  test("non-integral ids fall through to the distributed loop instead of throwing") {
    import spark.implicits._
    // string ids: the driver shortcut's long collect cannot represent
    // them — the integral-id gate must route to the distributed loop,
    // where min-label is lexicographic and everything still works
    val nodes = Seq("a", "b", "c", "d").toDF("id")
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val got = Components.connectedComponents(nodes, edges, 10)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d"))
  }

  test("int ids use the driver shortcut and keep the caller's id type") {
    import spark.implicits._
    val nodes = Seq(1, 2, 3, 9).toDF("id")
    val edges = Seq((1, 2), (2, 3)).toDF("src", "dst")
    val out = Components.connectedComponents(nodes, edges, 10)
    assert(out.schema("id").dataType == org.apache.spark.sql.types.IntegerType)
    assert(out.schema("cluster_rep").dataType ==
      org.apache.spark.sql.types.IntegerType,
      "shortcut must cast labels back to the caller's id type")
    val got = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(got == Map(1 -> 1, 2 -> 1, 3 -> 1, 9 -> 9))
  }

  test("fractional ids: chain within one integer unit converges exactly, not early") {
    import spark.implicits._
    // ten double ids packed inside [5.10, 5.19]: every label truncates to
    // decimal(38,0) 5, so a rounded-label-sum convergence check would see
    // an unchanged sum after round 1 and stop with the chain only
    // partially labeled — fractional types must take the changed-row
    // check instead
    val ids = (0 until 10).map(i => 5.10 + i * 0.01)
    val nodes = ids.toDF("id")
    val edges = ids.zip(ids.tail).toDF("src", "dst")
    val got = Components.connectedComponents(nodes, edges, 20)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    assert(got.size == 10 && got.values.forall(_ == ids.head),
      s"every chain node must label to ${ids.head}, got $got")
  }

  test("edges wider than the node id type take the distributed loop (no downcast wrap)") {
    import spark.implicits._
    // int nodes, LONG edges with an endpoint 2^32+1 that is absent from
    // nodes (allowed): the driver shortcut would cast its label back to
    // int, wrapping 4294967297 -> 1 and colliding with the real node 1.
    // The width gate must route this to the distributed loop, where node
    // 1 keeps its own component and no duplicate output rows appear.
    val nodes = Seq(1, 2, 3).toDF("id")
    val edges = Seq((2L, 3L), (4294967297L, 4294967298L)).toDF("src", "dst")
    val out = Components.connectedComponents(nodes, edges, 10).collect()
    assert(out.length == 3, s"one row per node expected, got ${out.length}")
    val got = out.map(r =>
      r.get(0).toString.toLong -> r.get(1).toString.toLong).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L), s"labels wrong: $got")
  }

  test("disconnected halves stay separate; isolated nodes self-label") {
    import spark.implicits._
    val nodes = spark.range(100).toDF("id")
    // cluster 10..19 chained; cluster 50..54 chained; the rest isolated
    val e1 = spark.range(10, 19).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val e2 = spark.range(50, 54).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val got = labels(Components.connectedComponents(nodes, e1.unionByName(e2), 10))
    (10L to 19L).foreach(i => assert(got(i) == 10L))
    (50L to 54L).foreach(i => assert(got(i) == 50L))
    (0L until 100L).filterNot(i => (i >= 10 && i <= 19) || (i >= 50 && i <= 54))
      .foreach(i => assert(got(i) == i, s"isolated node $i must self-label"))
  }

  test("BFS hops: exact shortest paths, unreachable nodes absent, cutoff honored") {
    import spark.implicits._
    // directed: 0→1→2→3→4 chain, a shortcut 0→3, an off-component 9→10
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L), (9L, 10L))
      .toDF("src", "dst")
    val got = Components.bfsHops(e, "src", "dst", source = 0L, maxHops = 8)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // the 0→3 shortcut must win over the 3-hop chain path
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
    // cutoff: maxHops 1 stops after the first frontier
    val cut = Components.bfsHops(e, "src", "dst", source = 0L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cut == Map(0L -> 0, 1L -> 1, 3L -> 1))
    // a source with no out-edges is just itself at hop 0
    val lone = Components.bfsHops(e, "src", "dst", source = 10L, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lone == Map(10L -> 0))
  }

  test("label propagation: two planted cliques converge to two min-id communities") {
    import spark.implicits._
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    // two 5-cliques joined by ONE bridge edge: LP must keep them as two
    // communities labeled by each clique's min id (the bridge's single
    // vote can never outnumber 4 intra-clique votes)
    val e = (clique(1L to 5L) ++ clique(11L to 15L) :+ ((5L, 11L)))
      .toDF("src", "dst")
    val got = Components.labelPropagation(e, "src", "dst", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(got(_) == 1L), s"clique A labels: $got")
    assert((11L to 15L).forall(got(_) == 11L), s"clique B labels: $got")
    // deterministic: same input, same labeling
    val again = Components.labelPropagation(e, "src", "dst", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }
}
