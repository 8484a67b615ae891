package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — an operator Spark lacks natively
  * when there is no selective equi-key (ref: api.py:1538-1585 exposes a
  * time-window analytics surface; the reference computes windows
  * in-memory per request).
  *
  * Why this exists: a join whose ONLY predicates are range comparisons
  * (`p.t BETWEEN i.start AND i.end`) gives Catalyst no equi-key, so the
  * physical plan is BroadcastNestedLoopJoin — O(points x intervals)
  * comparisons. At 100 TB that is the difference between a job and no
  * job. The fix is the standard bin-bucketing decomposition (as in
  * DuckDB's IEJoin literature and Databricks' range-join hints, both
  * public): pick a bin width W, explode each interval to the bins it
  * covers, map each point to its single bin, equi-join on
  * (keys..., bin), and re-check the exact predicate. Each qualifying
  * (point, interval) pair meets in EXACTLY one bin — the point's — so no
  * dedup pass is needed. Cost: one shuffle hash/sort-merge join on a
  * composite key with cardinality ~ time-span/W, plus interval fan-out
  * len/W + 1.
  *
  * Choosing W: near the TYPICAL interval length. W too small inflates
  * the interval fan-out (len/W copies); W too large inflates candidate
  * pairs sharing a bin (back toward nested-loop work). For mixed
  * interval lengths, pick W near the upper quantile and rely on the
  * exact re-check.
  *
  * Scale posture: the bin join shuffles on `_bin` (plus any equi-keys),
  * so hot bins (a burst window) are the skew axis — AQE skew-join
  * handles moderate cases; extreme cases can salt the bin key. Bin
  * cardinality grows with the time span, keeping partitions fine-grained
  * at any corpus size.
  */
object RangeJoin {

  /** Join each point row to every interval row whose `[start, end)` (or
    * `[start, end]` when `endInclusive`) contains the point, matching
    * any equi-`keys` too. Point/start/end columns must be LongType on a
    * shared scale (e.g. `unix_micros`) — the caller converts timestamps,
    * which keeps binning arithmetic exact (no double rounding).
    *
    * Column names of `points` and `intervals` must be disjoint (same
    * contract as a plain join); output carries both sides' columns.
    *
    * @param keys equi-key pairs (pointsCol, intervalsCol) joined
    *             alongside the bin — co-partitions the bin join further
    *             and prunes cross-key candidates
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long,
      keys: Seq[(String, String)] = Nil,
      endInclusive: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"points/intervals column names must be disjoint, both have: ${overlap.mkString(", ")}")

    def bin(c: Column): Column = floor(c / binWidth)

    val p = points.withColumn("_bin", bin(col(pointCol)))
    // Last covered bin: for an exclusive end the interval's max point is
    // end-1. Empty intervals (end <= start exclusive, end < start
    // inclusive) are dropped up front — Spark's `sequence(a, b)` runs
    // DESCENDING when a > b, which would fabricate bins.
    val lastPoint = if (endInclusive) col(endCol) else col(endCol) - 1L
    val iv = intervals
      .filter(lastPoint >= col(startCol))
      .withColumn("_bin", explode(sequence(bin(col(startCol)), bin(lastPoint))))

    val exact =
      if (endInclusive) col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol)
      else col(pointCol) >= col(startCol) && col(pointCol) < col(endCol)
    val keyConds = keys.map { case (pk, ik) => p(pk) === iv(ik) }
    val cond = (Seq(p("_bin") === iv("_bin"), exact) ++ keyConds).reduce(_ && _)

    p.join(iv, cond).drop("_bin")
  }

  /** Join every left interval to every right interval it overlaps
    * (`lStart < rEnd && rStart < lEnd`, or `<=` when `endInclusive`),
    * plus any equi-`keys`. Same bin decomposition as
    * [[pointInInterval]], but BOTH sides explode to their covered bins,
    * so an overlapping pair can share many bins — exactly-once output
    * comes from keeping only the FIRST shared bin, which is always the
    * bin of the later-starting interval (`_bin === greatest(bin(lStart),
    * bin(rStart))`), a filter instead of a dedup shuffle.
    *
    * Bound columns must be LongType on a shared scale (caller converts
    * timestamps via `unix_micros`); column names must be disjoint.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      lStartCol: String, lEndCol: String,
      rStartCol: String, rEndCol: String,
      binWidth: Long,
      keys: Seq[(String, String)] = Nil,
      endInclusive: Boolean = false): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"left/right column names must be disjoint, both have: ${overlapCols.mkString(", ")}")

    def bin(c: Column): Column = floor(c / binWidth)

    def explodeBins(df: DataFrame, sCol: String, eCol: String): DataFrame = {
      val lastPoint = if (endInclusive) col(eCol) else col(eCol) - 1L
      df.filter(lastPoint >= col(sCol))
        .withColumn("_bin", explode(sequence(bin(col(sCol)), bin(lastPoint))))
    }

    val l = explodeBins(left, lStartCol, lEndCol)
    val r = explodeBins(right, rStartCol, rEndCol)

    val overlapPred =
      if (endInclusive) col(lStartCol) <= col(rEndCol) && col(rStartCol) <= col(lEndCol)
      else col(lStartCol) < col(rEndCol) && col(rStartCol) < col(lEndCol)
    val firstSharedBin =
      l("_bin") === greatest(bin(col(lStartCol)), bin(col(rStartCol)))
    val keyConds = keys.map { case (lk, rk) => l(lk) === r(rk) }
    val cond = (Seq(l("_bin") === r("_bin"), overlapPred, firstSharedBin) ++ keyConds)
      .reduce(_ && _)

    l.join(r, cond).drop("_bin")
  }
}
