package graft

import graft.ops.Itemsets

/** Planted-basket contracts for the Apriori lattice: exact supports,
  * downward-closure pruning, and bound checks.
  */
class ItemsetsSpec extends SparkSpec {
  import spark.implicits._

  private def run(baskets: Seq[(Long, Long)], minSup: Long, maxSize: Int = 3) =
    Itemsets.apriori(baskets.toDF("bk", "it"), "bk", "it", minSup, maxSize)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  test("exact supports on planted baskets, including a frequent triple") {
    // baskets: {1,2,3} x2, {1,2} x1, {4} x1 — itemsets >= 2 baskets:
    // singles 1,2,3; pairs (1,2)x3, (1,3)x2, (2,3)x2; triple (1,2,3)x2
    val b = Seq(
      10L -> 1L, 10L -> 2L, 10L -> 3L,
      11L -> 1L, 11L -> 2L, 11L -> 3L,
      12L -> 1L, 12L -> 2L,
      13L -> 4L)
    assert(run(b, 2) == Set(
      (1, "1", 3L), (1, "2", 3L), (1, "3", 2L),
      (2, "1,2", 3L), (2, "1,3", 2L), (2, "2,3", 2L),
      (3, "1,2,3", 2L)))
    // duplicate (basket, item) rows must not inflate supports
    assert(run(b ++ Seq(10L -> 1L, 10L -> 1L), 2) == run(b, 2))
  }

  test("downward closure: an infrequent sub-pair kills the triple") {
    // {1,2,3} once + {1,2} once: pair (1,2) support 2, pairs (1,3)/(2,3)
    // support 1 -> no triple survives even though all items are frequent
    val b = Seq(
      10L -> 1L, 10L -> 2L, 10L -> 3L,
      11L -> 1L, 11L -> 2L,
      12L -> 3L)
    val got = run(b, 2)
    assert(got == Set((1, "1", 2L), (1, "2", 2L), (1, "3", 2L), (2, "1,2", 2L)))
  }

  test("maxSize truncates the lattice; bounds rejected loudly") {
    val b = Seq(10L -> 1L, 10L -> 2L, 11L -> 1L, 11L -> 2L)
    assert(run(b, 2, maxSize = 1) == Set((1, "1", 2L), (1, "2", 2L)))
    intercept[IllegalArgumentException] { run(b, 0) }
    intercept[IllegalArgumentException] { run(b, 2, maxSize = 4) }
  }

  test("rules: exact confidence and lift on planted baskets, both directions") {
    // baskets: {1,2} x3, {1} x1, {2,3} x1 — 5 baskets; pair (1,2) supp 3
    // supp(1)=4, supp(2)=4: conf(1→2)=3/4, lift = (3/4)/(4/5) = 15/16
    val b = Seq(
      10L -> 1L, 10L -> 2L, 11L -> 1L, 11L -> 2L, 12L -> 1L, 12L -> 2L,
      13L -> 1L, 14L -> 2L, 14L -> 3L)
    val got = Itemsets.rules(b.toDF("bk", "it"), "bk", "it", minSupport = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getDouble(7))).toMap
    // frequent pairs: (1,2) supp 3; (2,3) supp 1 -> pruned
    assert(got.keySet == Set(1L -> 2L, 2L -> 1L))
    assert(got(1L -> 2L) == ((4L, 4L, 3L, 5L, 3.0 / 4, (3.0 / 4) / (4.0 / 5))))
    assert(got(2L -> 1L) == ((4L, 4L, 3L, 5L, 3.0 / 4, (3.0 / 4) / (4.0 / 5))))
  }
}
