package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Contracts for the BinnedRangeJoin optimizer rule: armed by
  * spark.graft.rangeJoin.binWidth, it must turn a key-less
  * point-in-interval join into an equi-join on the bin with identical
  * results, and must leave everything else alone.
  */
class BinnedRangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private val Width = graft.plans.BinnedRangeJoin.WidthKey

  private def withWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(Width, w.toString)
    try body finally spark.conf.unset(Width)
  }

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, 1999L), (6L, -7L),
  ).toDF("pid", "t")
  private lazy val intervals = Seq(
    (10L, 0L, 10L), (11L, 10L, 20L), (12L, 0L, 2000L), (13L, 50L, 40L),
    (14L, -10L, -1L), // negative range: floor-div binning must stay exact
  ).toDF("iid", "s", "e")

  private def naiveJoin: DataFrame =
    points.join(intervals, $"t" >= $"s" && $"t" < $"e").select("pid", "iid")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.as[(Long, Long)].collect().toSet

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("armed rule rewrites the key-less range join to a bin equi-join, same result") {
    val expected = pairs(naiveJoin) // rule off: BroadcastNestedLoopJoin
    assert(planOf(naiveJoin).contains("BroadcastNestedLoopJoin"),
      "sanity: without the rule this plan IS a nested-loop join")
    for (w <- Seq(1L, 7L, 64L, 100000L)) withWidth(w) {
      val df = naiveJoin
      val p = planOf(df)
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"w=$w: rewrite did not fire:\n$p")
      assert(p.contains("Generate"), s"w=$w: interval side must explode to bins")
      val got = df.as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w: duplicate pairs")
      assert(got.toSet == expected, s"w=$w")
    }
  }

  test("orientation flip: points on the right side rewrites too") {
    withWidth(16L) {
      val df = intervals.join(points, $"t" >= $"s" && $"t" < $"e").select("pid", "iid")
      assert(!planOf(df).contains("BroadcastNestedLoopJoin"))
      assert(pairs(df) == pairs(naiveJoin))
    }
  }

  test("integer columns and mixed strict/inclusive bounds rewrite correctly") {
    val p = Seq((1, 5), (2, 10), (3, 20)).toDF("pid", "t")
    val iv = Seq((10, 0, 10), (11, 10, 20)).toDF("iid", "s", "e")
    val cond = p("t") > iv("s") && p("t") <= iv("e")
    val expected = withWidth(0L) { // guard off
      p.join(iv, cond).select("pid", "iid").as[(Int, Int)].collect().toSet
    }
    withWidth(4L) {
      val df = p.join(iv, cond).select("pid", "iid")
      assert(!planOf(df).contains("BroadcastNestedLoopJoin"))
      assert(df.as[(Int, Int)].collect().toSet == expected)
      // t=10 matches (0,10] but NOT (10,20] (strict lower bound)
      assert(expected == Set((1, 10), (2, 10), (3, 11)))
    }
  }

  test("joins with a cross-side equi key are left untouched") {
    withWidth(8L) {
      val p = Seq((1L, "a", 5L)).toDF("pid", "pk", "t")
      val iv = Seq((10L, "a", 0L, 10L)).toDF("iid", "ik", "s", "e")
      val df = p.join(iv, $"pk" === $"ik" && $"t" >= $"s" && $"t" < $"e")
      assert(!planOf(df).contains("Generate"),
        "equi-keyed join must not be rewritten")
      assert(df.count() == 1)
    }
  }

  test("null points and null bounds drop rows identically to the naive join") {
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("pid", "t")
    val iv = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L))).toDF("iid", "s", "e")
    val cond = p("t") >= iv("s") && p("t") < iv("e")
    val expected = p.join(iv, cond).select("pid", "iid").as[(Long, Long)].collect().toSet
    withWidth(4L) {
      val got = p.join(iv, cond).select("pid", "iid").as[(Long, Long)].collect().toSet
      assert(got == expected && got == Set((1L, 10L)))
    }
  }

  test("a malformed binWidth conf is ignored instead of failing every query") {
    val expected = pairs(naiveJoin)
    spark.conf.set(Width, "not-a-number")
    try {
      val df = naiveJoin
      assert(planOf(df).contains("BroadcastNestedLoopJoin"),
        "malformed width must disarm the rule, not arm or break it")
      assert(pairs(df) == expected)
    } finally spark.conf.unset(Width)
  }

  test("a one-side literal equality does not suppress the rewrite") {
    // Pushdown usually strips `kind = 'click'` before the rule runs, so
    // exercise the rule directly on the analyzed (pre-pushdown) plan: a
    // literal canEvaluate on either side and must not count as an equi key.
    withWidth(8L) {
      val p = Seq((1L, "click", 5L), (2L, "view", 5L)).toDF("pid", "kind", "t")
      val iv = Seq((10L, 0L, 10L)).toDF("iid", "s", "e")
      val j = p.join(iv,
        p("kind") === lit("click") && p("t") >= iv("s") && p("t") < iv("e"))
      val rewritten = graft.plans.BinnedRangeJoin(j.queryExecution.analyzed)
      val generates = rewritten.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      assert(generates.nonEmpty,
        s"literal equality suppressed the rewrite:\n$rewritten")
      assert(j.select("pid", "iid").as[(Long, Long)].collect().toSet ==
        Set((1L, 10L)))
    }
  }

  test("a join whose only range bounds are literals is left untouched") {
    // `p.t >= 5 AND p.t < 10` over a cross join has no interval side —
    // binning it would shuffle everything onto a few constant bins.
    withWidth(4L) {
      val p = Seq((1L, 6L), (2L, 20L)).toDF("pid", "t")
      val other = Seq(Tuple1(10L), Tuple1(11L)).toDF("oid")
      val j = p.join(other, p("t") >= lit(5L) && p("t") < lit(10L))
      val rewritten = graft.plans.BinnedRangeJoin(j.queryExecution.analyzed)
      val generates = rewritten.collect {
        case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
      }
      assert(generates.isEmpty, s"constant-bound filter was binned:\n$rewritten")
    }
  }

  test("SQL-registered kernels resolve through the extension") {
    val r = spark.sql(
      "SELECT dot_f32(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d").collect()(0)
    assert(math.abs(r.getDouble(0) - 11.0) < 1e-9)
  }
}
