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
