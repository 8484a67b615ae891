package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Det

/** Version-over-version column-statistics drift for a versioned table —
  * the publish-time quality gate: a bad load (nulled column, unit-shift,
  * truncated join) shows up as a null-fraction or mean jump between
  * snapshots BEFORE consumers read it. Composes the reference's quality
  * checks (null fraction, distribution stats — `data_quality.py`'s
  * surface) with the snapshot lifecycle the reference lacks.
  *
  * Output: one row per monitored column —
  * (col_name, n_old, n_new, null_frac_old, null_frac_new,
  * mean_old, mean_new) — enough to threshold "null rate moved > x%" or
  * "mean shifted > y sigma" in a publish gate.
  *
  * Scale shape: ONE wide aggregate per snapshot (count + per-column
  * non-null count + exact decimal sum — all map-side combined, a single
  * 1-row result each), then a 1-row×1-row join projected to per-column
  * rows. No shuffle beyond the two aggregates.
  *
  * Float determinism: sums go through [[graft.core.Det]] (exact decimal,
  * cast once to double); null fractions and means are single double
  * divisions of exact integers/sums — bit-identical across engines, so
  * the whole monitor is oracle-hash-checkable.
  */
object StatsDrift {

  private def snapStats(df: DataFrame, cols: Seq[String], tag: String): DataFrame = {
    val aggs = count(lit(1)).as(s"n_$tag") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"nn_${c}_$tag"),
        Det.dsum(col(c)).as(s"s_${c}_$tag")))
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Drift report between two committed snapshot versions over numeric
    * `cols`. Means are over NON-NULL values (null when a column is
    * entirely null in a snapshot — loud in any threshold check).
    */
  def statsDrift(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to monitor")
    val a = VersionedTable.read(spark, dir, Some(fromVersion))
    val b = VersionedTable.read(spark, dir, Some(toVersion))
    val j = snapStats(a, cols, "old").crossJoin(snapStats(b, cols, "new"))
    // ONE plan regardless of column count: a union of per-column selects
    // would embed a copy of both aggregates per column — project the
    // 1-row join to an array of per-column structs and explode instead
    val perCol = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("n_old"), col("n_new"),
        ((col("n_old") - col(s"nn_${c}_old")) / col("n_old").cast("double"))
          .as("null_frac_old"),
        ((col("n_new") - col(s"nn_${c}_new")) / col("n_new").cast("double"))
          .as("null_frac_new"),
        (col(s"s_${c}_old") / col(s"nn_${c}_old")).as("mean_old"),
        (col(s"s_${c}_new") / col(s"nn_${c}_new")).as("mean_new"))
    }
    j.select(explode(array(perCol: _*)).as("_r")).select("_r.*")
  }
}
