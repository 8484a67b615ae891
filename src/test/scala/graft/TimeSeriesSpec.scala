package graft

import java.sql.Timestamp

import graft.ops.TimeSeries

/** Contracts for the per-key daily gap-fill + forward-fill grid (q105). */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap days appear with zero activity and carry the last sum forward") {
    val df = Seq(
      (1L, ts("2024-03-01 10:00:00"), 5.0),
      (1L, ts("2024-03-01 11:00:00"), 2.0),
      (1L, ts("2024-03-04 09:00:00"), 1.5), // 2 gap days in between
      (2L, ts("2024-03-10 00:00:00"), 4.0), // single-day span, no gaps
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .orderBy("user_id", "day")
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(
      (1L, "2024-03-01", 2L, 7.0, 7.0),
      (1L, "2024-03-02", 0L, 0.0, 7.0), // gap: zero day, ffill holds
      (1L, "2024-03-03", 0L, 0.0, 7.0),
      (1L, "2024-03-04", 1L, 1.5, 1.5),
      (2L, "2024-03-10", 1L, 4.0, 4.0),
    ))
  }

  test("burst heads: one survivor per island, chained bursts stay one burst") {
    val df = Seq(
      // user 1 click: a burst that OUTLIVES one gap through chaining —
      // islands keep exactly its head (the sequential variant would not)
      (1L, 1L, "click", ts("2024-01-01 00:00:00")),
      (2L, 1L, "click", ts("2024-01-01 00:40:00")),
      (3L, 1L, "click", ts("2024-01-01 01:20:00")), // 80min after head, 40min chain
      (4L, 1L, "click", ts("2024-01-01 05:00:00")), // new burst
      // separate key (same user, other type): independent islands
      (5L, 1L, "view", ts("2024-01-01 00:10:00")),
      // equal timestamps: tie column decides deterministically
      (6L, 2L, "click", ts("2024-01-01 00:00:00")),
      (7L, 2L, "click", ts("2024-01-01 00:00:00")),
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = TimeSeries.burstHeads(df, Seq("user_id", "event_type"),
        "ts", "event_id", gapSeconds = 3600L)
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 4L, 5L, 6L))
  }

  test("grid spans exactly [first active day, last active day] per key") {
    val df = Seq(
      (7L, ts("2024-01-05 12:00:00"), 1.0),
      (7L, ts("2024-01-20 12:00:00"), 1.0),
    ).toDF("user_id", "ts", "value")
    val days = TimeSeries.gapFillDaily(df, "user_id", "ts", "value")
      .select("day").orderBy("day").collect().map(_.getDate(0).toString)
    assert(days.length == 16)
    assert(days.head == "2024-01-05" && days.last == "2024-01-20")
  }
}
