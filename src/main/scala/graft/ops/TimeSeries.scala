package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Det.dsum

/** Regular-grid time-series preparation over an event stream: per-key
  * daily gap-fill (materialize the missing days of each key's active
  * span) plus forward-fill — the resample/ffill step every activity-
  * feature pipeline needs before windowed models see the data (a user
  * with no events on a day is a ZERO observation, not a missing row).
  *
  * Scale shape: one hash aggregation to the per-(key, day) grain, one
  * per-key span aggregation, then the calendar EXPLODES from the span
  * row (`sequence(d0, d1)`) — the dense grid is generated, never
  * shuffled at event grain — and a per-key window forward-fills. Every
  * window is partitioned by key (per-shard, no global ordering); skew =
  * one key's span length, bounded by the calendar, not by event count.
  */
object TimeSeries {

  /** Per-key daily grid over each key's [min active day, max active day]
    * span: (keyCol, day, n_events, day_sum, ffill_sum) where gap days
    * carry n_events = 0 and day_sum = 0.0, and ffill_sum is the last
    * ACTIVE day's sum (forward fill; the span starts on an active day,
    * so it is never null). Sums are decimal-exact ([[graft.core.Det]]).
    */
  def gapFillDaily(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val daily = df
      .groupBy(col(keyCol), col(tsCol).cast("date").as("day"))
      .agg(count(lit(1)).as("n_events"), dsum(col(valueCol)).as("_sum"))
    val cal = daily
      .groupBy(col(keyCol))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val w = Window.partitionBy(keyCol).orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("_sum"), lit(0.0)).as("day_sum"),
        last(col("_sum"), ignoreNulls = true).over(w).as("ffill_sum"))
  }

  /** Burst-head dedup ("debounce" for event pipelines): keep the FIRST
    * event of every activity burst per key, where bursts are the q43
    * gap-and-island sessions (successive gaps < gapSeconds chain). This
    * is the island formulation — deterministic and windows-expressible —
    * not the sequential "within gap of the last KEPT event" variant,
    * which is order-chained and cannot be expressed as one window pass
    * (the two differ once a burst outlives one gap: islands keep 1 row
    * per burst however long it runs). Per-key windows only; the tie
    * column makes equal-timestamp order total.
    */
  def burstHeads(df: DataFrame, keyCols: Seq[String], tsCol: String,
      tieCol: String, gapSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("_prev", lag(col(tsCol), 1).over(w))
      .withColumn("_ns", when(col("_prev").isNull ||
        unix_micros(col(tsCol)) - unix_micros(col("_prev")) >=
          gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("_sid",
        sum(col("_ns")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("_rn", row_number().over(
        Window.partitionBy((keyCols.map(col) :+ col("_sid")): _*)
          .orderBy(col(tsCol), col(tieCol))))
      .filter(col("_rn") === 1)
      .drop("_prev", "_ns", "_sid", "_rn")
  }

  /** The DuckDB oracle twin of [[gapFillDaily]] over the `events` table
    * (generate_series calendar, IGNORE NULLS last_value forward fill,
    * the same decimal-exact sum).
    */
  def gapFillDailyOracleSql: String = {
    val s = graft.core.Det.sqlSum("value")
    s"""
      WITH daily AS (
        SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
               COUNT(*) AS n_events, $s AS day_sum
        FROM events GROUP BY 1, 2),
      span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      cal AS (SELECT user_id,
                     CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                       CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
              FROM span)
      SELECT c.user_id, c.day,
             COALESCE(d.n_events, 0) AS n_events,
             COALESCE(d.day_sum, CAST(0 AS DOUBLE)) AS day_sum,
             last_value(d.day_sum IGNORE NULLS) OVER (
               PARTITION BY c.user_id ORDER BY c.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill_sum
      FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
      ORDER BY c.user_id, c.day"""
  }
}
