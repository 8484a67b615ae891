package graft
import org.apache.spark.sql.functions._
import graft.functions.WinnowExprs.{winnowMins, winnowSelect, winnowSelectGrams}
import graft.ops.{TextDedup, TextRank}

class RrfSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Rrf

  test("rrf fuses ranks exactly: both-lists sum, single-list contributes, topK cut") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val vec = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("id", "rank")
    val out = Rrf.fuse(Seq(lex, vec), "id", "rank", k0 = 60, topK = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toList
    // hand-computed: 10 -> 1/61 + 1/63; 20 -> 1/62 + 1/61; 30 -> 1/63;
    // 40 -> 1/62. Order: 20 > 10 > 40 > 30; topK=3 drops 30.
    val exp = List(
      (20L, 1.0 / 62 + 1.0 / 61, 2),
      (10L, 1.0 / 61 + 1.0 / 63, 2),
      (40L, 1.0 / 62, 1))
    assert(out == exp, s"got $out")
  }

  test("rrf ties break on id ascending; single list is a rank passthrough order") {
    // identical ranks in disjoint lists -> equal scores, id breaks the tie
    val a = Seq((7L, 1)).toDF("id", "rank")
    val b = Seq((3L, 1)).toDF("id", "rank")
    val out = Rrf.fuse(Seq(a, b), "id", "rank", k0 = 60, topK = 2)
      .collect().map(_.getLong(0)).toList
    assert(out == List(3L, 7L))
    val solo = Rrf.fuse(Seq(Seq((5L, 2), (6L, 1)).toDF("id", "rank")),
      "id", "rank", k0 = 60, topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toList
    assert(solo == List((6L, 1), (5L, 1)))
  }
}
