package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining by the Apriori candidate lattice (Agrawal &
  * Srikant, VLDB'94) over (basket, item) rows — the market-basket /
  * co-occurrence generalization of the pairwise co-purchase query
  * (q111): all itemsets of size 1..3 appearing in at least `minSupport`
  * baskets.
  *
  * Why Apriori-shaped joins and not brute enumeration: a basket of w
  * frequent items contributes C(w,3) triples, so the downward-closure
  * prune is what bounds the blowup — items below support never enter
  * pair counting, pairs below support never extend to triples (each
  * prune is a semi-join against the previous level's survivors). All
  * arithmetic is integer counts; every level is one equi-join keyed on
  * the basket id plus one hash aggregation — shuffle keys are
  * basket/itemset, never a cross product. The result is EXACTLY the
  * same set a HAVING-count oracle computes without pruning; pruning
  * changes cost, not answers.
  */
object Itemsets {

  /** Itemsets of size 1..`maxSize` (2 or 3) with support >=
    * `minSupport` baskets. Output: (size int, items string "a,b,c" with
    * ascending numeric item ids, support bigint).
    */
  def apriori(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long, maxSize: Int = 3): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(maxSize >= 1 && maxSize <= 3, s"maxSize must be 1..3, got $maxSize")
    // items keep their native (orderable) type — a cast here would
    // silently NULL non-numeric ids and corrupt every level; NULL items
    // are excluded explicitly instead (they cannot form an itemset)
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull)
      .distinct()
    val l1 = b.groupBy("it").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    def out(df: DataFrame, size: Int, items: org.apache.spark.sql.Column) =
      df.select(lit(size).as("size"), items.as("items"), col("support"))
    var res = out(l1, 1, col("it").cast("string"))
    if (maxSize >= 2) {
      // downward closure: only L1 survivors enter pair generation
      val fb = b.join(l1.select("it"), Seq("it"), "left_semi")
      val p2 = fb.as("u").join(fb.as("v"),
          col("u.bk") === col("v.bk") && col("u.it") < col("v.it"))
        .select(col("u.bk").as("bk"), col("u.it").as("a"), col("v.it").as("b"))
      val l2 = p2.groupBy("a", "b").agg(count(lit(1)).as("support"))
        .filter(col("support") >= minSupport)
      res = res.unionByName(out(l2, 2,
        concat_ws(",", col("a").cast("string"), col("b").cast("string"))))
      if (maxSize >= 3) {
        // candidate triples: L2 pairs sharing the head item, pruned by
        // the (b, c) tail also being in L2 (full Apriori-gen)
        val cand3 = l2.as("p").join(l2.as("q"),
            col("p.a") === col("q.a") && col("p.b") < col("q.b"))
          .select(col("p.a").as("a"), col("p.b").as("b"), col("q.b").as("c"))
          .join(l2.select(col("a").as("b"), col("b").as("c")),
            Seq("b", "c"), "left_semi")
        // count candidates only: occurrences = frequent pair occurrence
        // extended by a third basket item, semi-joined to candidates
        val p2f = p2.join(l2.select("a", "b"), Seq("a", "b"), "left_semi")
          .as("p2f")
        val t3 = p2f.join(fb.as("w"),
            col("p2f.bk") === col("w.bk") && col("w.it") > col("p2f.b"))
          .select(col("a"), col("b"), col("w.it").as("c"))
          .join(cand3, Seq("a", "b", "c"), "left_semi")
        val l3 = t3.groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
          .filter(col("support") >= minSupport)
        res = res.unionByName(out(l3, 3, concat_ws(",",
          col("a").cast("string"), col("b").cast("string"),
          col("c").cast("string"))))
      }
    }
    res
  }

  /** Association rules x → y from the frequent pairs: confidence =
    * supp(xy)/supp(x), lift = confidence / (supp(y)/n_baskets). Both
    * directions of every frequent unordered pair are emitted. All
    * statistics are single divisions of exact integer counts, so the
    * doubles are deterministic under any partitioning; the basket total
    * re-enters the plan as a broadcast 1-row frame (stat-broadcast,
    * SURVEY §4.1). Shuffle keys are basket/item — never a cross
    * product — so the plan scales like [[apriori]]'s L2 level.
    */
  def rules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val b = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("it"))
      .filter(col("it").isNotNull)
      .distinct()
    val nb = b.agg(countDistinct("bk").as("n_baskets"))
    val l1 = b.groupBy("it").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    val fb = b.join(l1.select("it"), Seq("it"), "left_semi")
    val l2 = fb.as("u").join(fb.as("v"),
        col("u.bk") === col("v.bk") && col("u.it") < col("v.it"))
      .groupBy(col("u.it").as("a"), col("v.it").as("b"))
      .agg(count(lit(1)).as("support_ab"))
      .filter(col("support_ab") >= minSupport)
    val directed = l2.select(col("a").as("x"), col("b").as("y"), col("support_ab"))
      .unionByName(l2.select(col("b").as("x"), col("a").as("y"), col("support_ab")))
    directed
      .join(l1.select(col("it").as("x"), col("support").as("support_x")), "x")
      .join(l1.select(col("it").as("y"), col("support").as("support_y")), "y")
      .crossJoin(broadcast(nb))
      .select(col("x").as("antecedent"), col("y").as("consequent"),
        col("support_x"), col("support_y"), col("support_ab"), col("n_baskets"),
        (col("support_ab").cast("double") / col("support_x")).as("confidence"),
        ((col("support_ab").cast("double") / col("support_x")) /
          (col("support_y").cast("double") / col("n_baskets"))).as("lift"))
  }
}
