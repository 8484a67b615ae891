package graft

import org.apache.spark.sql.functions._
import graft.ops.{AsofJoin, Multimodal, Sessionize}

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward asof picks latest right row at-or-before left time") {
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2026-01-01 10:00:00")),
      (2L, 10L, ts("2026-01-01 12:00:00")),
      (3L, 20L, ts("2026-01-01 09:00:00")), // no prior right row
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2026-01-01 09:30:00"), "a"),
      (10L, ts("2026-01-01 10:00:00"), "b"), // exactly at left #1 time
      (10L, ts("2026-01-01 11:00:00"), "c"),
      (20L, ts("2026-01-01 11:00:00"), "d"), // after left #3
    ).toDF("k", "ts", "v")
    val out = AsofJoin.asofBackward(left, right, "k", "ts", "ts", Seq("v"))
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("asof_v")).toSeq == Seq("b", "c", null))
  }
}

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.RangeJoin

  private lazy val points = Seq(
    (1L, 5L), (2L, 10L), (3L, 15L), (4L, 100L), (5L, 1999L), (6L, 2000L),
  ).toDF("pid", "t")
  private lazy val intervals = Seq(
    (10L, 0L, 10L),      // [0,10): catches 5
    (11L, 10L, 20L),     // [10,20): catches 10, 15
    (12L, 0L, 2000L),    // long interval spanning many bins: 5..1999
    (13L, 50L, 50L),     // empty for exclusive end
    (14L, 30L, 20L),     // inverted — must match nothing, not explode
  ).toDF("iid", "s", "e")

  private def naive(endInclusive: Boolean) = {
    val exact = if (endInclusive) $"t" >= $"s" && $"t" <= $"e"
                else $"t" >= $"s" && $"t" < $"e"
    points.join(intervals, exact)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
  }

  test("binned join equals the naive cross-filter join at several bin widths") {
    for (w <- Seq(1L, 3L, 7L, 64L, 10000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == naive(endInclusive = false), s"w=$w")
    }
  }

  test("inclusive end admits the boundary point and the degenerate interval") {
    val got = RangeJoin.pointInInterval(points, intervals, "t", "s", "e",
      binWidth = 8L, endInclusive = true)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive(endInclusive = true))
    // spot-check semantics: t=10 now matches [0,10] and t=2000 matches [0,2000]
    assert(got.contains((2L, 10L)) && got.contains((6L, 12L)))
  }

  test("equi-keys prune cross-key candidates") {
    val p = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("pid", "pk", "t")
    val iv = Seq((10L, "a", 0L, 10L)).toDF("iid", "ik", "s", "e")
    val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e", binWidth = 4L,
      keys = Seq(("pk", "ik")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L)))
  }

  test("overlapping column names are rejected up front") {
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(points, points, "t", "t", "t", binWidth = 1L)
    }
    assert(ex.getMessage.contains("disjoint"))
  }

  test("inputs carrying the reserved _bin column are rejected") {
    val p = points.withColumn("_bin", lit(0L))
    val ex = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(p, intervals, "t", "s", "e", binWidth = 4L)
    }
    assert(ex.getMessage.contains("_bin"))
  }

  test("binning stays exact at magnitudes beyond 2^53") {
    // floor(c / w) in doubles collapses adjacent bins up here (one ulp at
    // 2^62 is 512); the exact long floor-div must keep every pair and
    // emit it exactly once, positive and negative.
    val base = 1L << 62
    val p = Seq((1L, base + 5L), (2L, base + 1000L), (3L, -base - 7L)).toDF("pid", "t")
    val iv = Seq(
      (10L, base, base + 10L),
      (11L, base + 999L, base + 1001L),
      (12L, -base - 10L, -base - 1L),
    ).toDF("iid", "s", "e")
    val expected = p.join(iv, $"t" >= $"s" && $"t" < $"e")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(expected == Set((1L, 10L), (2L, 11L), (3L, 12L)))
    for (w <- Seq(1L, 512L, 4096L)) {
      val got = RangeJoin.pointInInterval(p, iv, "t", "s", "e", binWidth = w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"w=$w produced duplicate pairs")
      assert(got.toSet == expected, s"w=$w")
    }
  }

  test("interval overlap equals the naive join, exactly once, at several widths") {
    val a = Seq(
      (1L, 0L, 10L), (2L, 5L, 50L), (3L, 100L, 101L), (4L, 40L, 40L),
      (5L, 60L, 55L), // inverted
    ).toDF("aid", "as", "ae")
    val b = Seq(
      (10L, 9L, 12L), (11L, 45L, 200L), (12L, 0L, 1000L), (13L, 10L, 10L),
    ).toDF("bid", "bs", "be")
    for (inclusive <- Seq(false, true)) {
      val pred = if (inclusive) $"as" <= $"be" && $"bs" <= $"ae"
                 else $"as" < $"be" && $"bs" < $"ae"
      val nonEmpty = if (inclusive) $"ae" >= $"as" && $"be" >= $"bs"
                     else $"ae" > $"as" && $"be" > $"bs"
      val expected = a.join(b, pred && nonEmpty)
        .select("aid", "bid").as[(Long, Long)].collect().toSet
      for (w <- Seq(1L, 7L, 64L, 5000L)) {
        val got = RangeJoin.intervalOverlap(a, b, "as", "ae", "bs", "be",
          binWidth = w, endInclusive = inclusive)
          .select("aid", "bid").as[(Long, Long)].collect()
        assert(got.length == got.toSet.size,
          s"w=$w inclusive=$inclusive: pair emitted more than once")
        assert(got.toSet == expected, s"w=$w inclusive=$inclusive")
      }
    }
  }
}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("sessions split at the inactivity gap, ids are 0-based per user") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    val ev = Seq(
      (1L, new java.sql.Timestamp(t0), 1.0),
      (1L, new java.sql.Timestamp(t0 + 60 * 1000), 2.0), // same session
      (1L, new java.sql.Timestamp(t0 + 3 * 3600 * 1000), 3.0), // new session
      (2L, new java.sql.Timestamp(t0), 4.0),
    ).toDF("user_id", "ts", "value")
    val stats = Sessionize.sessionStats(ev, "user_id", "ts", "value", gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
    assert(stats.length == 3)
    assert(stats(0).getAs[Long]("n_events") == 2 && stats(0).getAs[Double]("sum_value") == 3.0)
    assert(stats(1).getAs[Long]("session_id") == 1 && stats(1).getAs[Long]("n_events") == 1)
    assert(stats(2).getAs[Long]("user_id") == 2 && stats(2).getAs[Long]("session_id") == 0)
  }
}
