package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — the multi-dimensional clustering
  * step behind Delta's `OPTIMIZE ZORDER BY` and every warehouse's
  * data-skipping story. A table range-sorted on ONE column prunes
  * filters on that column only; interleaving the bucket bits of SEVERAL
  * columns into one sort key clusters rows so that EVERY z-column's
  * per-file min/max span is narrow — parquet footer stats then let the
  * scan skip whole files/row-groups for multi-dimensional predicates.
  *
  * Why it matters at 100 TB: predicate pushdown can only skip what the
  * LAYOUT makes skippable. A `(user_id, ts)` filter over files written
  * in arrival order touches every file; over a z-ordered layout it
  * touches ~the files actually containing matches. This is a pure
  * rewrite — no engine hooks — so the payoff compounds with the
  * PushedFilters the plan contracts already assert.
  *
  * Mechanics: each z-column is uniformly bucketed into `2^bits` ranges
  * over its global [min, max] (ONE tiny aggregate; `width_bucket` is the
  * bucketing primitive), bucket bits are interleaved into the Morton
  * value by a shift/or expression tree (codegen-friendly — no UDF), and
  * rows are range-partitioned then sorted by z. Uniform bucketing is the
  * documented simplification vs Delta's range-boundary sampling: heavy
  * skew concentrates buckets, degrading (never breaking) skipping.
  * Nulls bucket to 0 and cluster together at the curve's origin.
  */
object ZOrder {

  /** The Morton (bit-interleaved) z-value of pre-bucketed columns, each
    * holding an integer in [0, 2^bits). Bit b of column i lands at
    * position `b * n + i` — the standard interleave, expressed as a
    * fold of shifts and ORs that whole-stage codegen compiles flat.
    */
  private[graft] def morton(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    val terms = for {
      (c, i) <- buckets.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduceLeft(_ bitwiseOR _)
  }

  /** Bucket a numeric column uniformly into [0, 2^bits) over [lo, hi].
    * `width_bucket` returns 1..n in-range with n+1 for v == hi's edge
    * overflow — clamp and shift to 0-based; nulls and degenerate
    * (lo == hi) columns bucket to 0.
    */
  private def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val n = 1 << bits
    if (!(lo < hi)) lit(0L)
    else coalesce(
      least(width_bucket(c.cast("double"), lit(lo), lit(hi), lit(n)),
        lit(n.toLong)) - lit(1L),
      lit(0L))
  }

  /** A z-column rendered as a bucketable double: DATE has no direct
    * double cast in Spark, so it goes through its epoch-day int first;
    * numeric and timestamp types cast directly.
    */
  private def asDouble(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType => unix_date(col(c)).cast("double")
      case _ => col(c).cast("double")
    }

  /** The z-value column for `df` over `zCols` (numeric/date/timestamp),
    * bucketing each over its global [min, max]. Runs ONE stats aggregate
    * (collected as a handful of doubles) and returns a pure projection —
    * callers can cluster with it however they like.
    */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int = 8): Column = {
    require(zCols.size >= 2, "z-ordering needs at least 2 columns (use a plain sort for 1)")
    require(bits >= 1 && bits * zCols.size <= 63,
      s"bits * columns must fit a long, got $bits * ${zCols.size}")
    val aggs = zCols.flatMap(c => Seq(
      min(asDouble(df, c)).as(s"_lo_$c"),
      max(asDouble(df, c)).as(s"_hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val buckets = zCols.zipWithIndex.map { case (c, i) =>
      val lo = Option(stats.get(2 * i)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      val hi = Option(stats.get(2 * i + 1)).map(_.asInstanceOf[Double]).getOrElse(0.0)
      bucket(asDouble(df, c), lo, hi, bits)
    }
    morton(buckets, bits)
  }

  /** Rewrite `df` as a z-ordered parquet table at `dir`: rows
    * range-partitioned into `targetFiles` splits of the Morton value and
    * sorted by it within each split — one file per split, every
    * z-column's per-file span narrow. The shuffle is the rewrite's
    * entire cost (a compaction-style job, run at publish cadence, never
    * per query); skipping then pays on every subsequent scan.
    */
  def writeZOrdered(df: DataFrame, dir: String, zCols: Seq[String],
      bits: Int = 8, targetFiles: Int = 32): Unit = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    df.withColumn("_z", zValue(df, zCols, bits))
      .repartitionByRange(targetFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(dir)
  }

  /** Per-file [min, max] spans of `statCols` for the parquet table at
    * `dir` — the skipping potential a layout offers, measurable: a scan
    * with predicate p can skip every file whose span misses p. One
    * column-pruned pass grouped by `input_file_name`.
    */
  def fileSpans(spark: org.apache.spark.sql.SparkSession, dir: String,
      statCols: Seq[String]): DataFrame = {
    val aggs = statCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
