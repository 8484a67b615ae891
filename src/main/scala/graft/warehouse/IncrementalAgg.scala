package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Det

/** Incremental view maintenance for grouped count/sum aggregates over a
  * CDC feed — the delta-processing classic (Griffin/Libkin-style view
  * maintenance; what Materialize/Delta Live Tables productize): a
  * maintained (group, n, s) view is updated from the change feed alone,
  * never by re-scanning the snapshot it summarizes.
  *
  * Why it matters at 100 TB: a dashboard aggregate over a versioned
  * table would otherwise cost a full snapshot scan per publish; the CDC
  * feed ([[VersionedTable.diffValues]]) is proportional to what CHANGED,
  * so maintenance cost tracks churn, not table size.
  *
  * Exactness is the whole design: the sum column is held as
  * DECIMAL(38,6) ([[graft.core.Det]]'s fixed-scale trick) at rest, so
  * addition is exact and associative — (base ± per-change deltas) is
  * BIT-IDENTICAL to a direct recompute over the new snapshot, whatever
  * the fold order (oracle-hash-checked in q96, contract-tested against
  * recompute including group-migrating updates and emptied groups). A
  * double-typed running sum could never promise that: error would
  * accumulate per applied batch and drift from recompute.
  *
  * Scale shape: one group-keyed shuffle per maintenance application
  * (the contributions union is map-side combined into the same
  * aggregation), broadcast-sized when churn is small; no snapshot access
  * at all.
  */
object IncrementalAgg {

  /** Build the maintained view from a snapshot: one row per `groupCol`
    * value with `n` (row count) and `s` (exact DECIMAL(38,6) sum of
    * `measureCol`). Keep `s` in its decimal form at rest — casting to
    * double and back would break the exact-maintenance contract.
    */
  def countSumView(snapshot: DataFrame, groupCol: String,
      measureCol: String): DataFrame =
    snapshot.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(Det.dec(col(measureCol))).as("s"))

  /** Fold one CDC batch ([[VersionedTable.diffValues]] shape: rows with
    * `change_type`, `_old`, `_new` structs holding `groupCol` and
    * `measureCol`) into the maintained view. Every change contributes
    * uniformly: the `_old` side retracts (-1, -value) from its group,
    * the `_new` side asserts (+1, +value) — an update that migrates a
    * row between groups is thereby handled with no special case, and a
    * group whose count reaches zero leaves the view. Returns the updated
    * view, equal to [[countSumView]] over the new snapshot.
    */
  def applyCdc(view: DataFrame, cdc: DataFrame, groupCol: String,
      measureCol: String): DataFrame = {
    val retract = cdc.filter(col("_old").isNotNull).select(
      col(s"_old.$groupCol").as(groupCol),
      lit(-1L).as("n"),
      (-Det.dec(col(s"_old.$measureCol"))).as("s"))
    val affirm = cdc.filter(col("_new").isNotNull).select(
      col(s"_new.$groupCol").as(groupCol),
      lit(1L).as("n"),
      Det.dec(col(s"_new.$measureCol")).as("s"))
    view.select(col(groupCol), col("n"), col("s"))
      .unionByName(retract).unionByName(affirm)
      .groupBy(col(groupCol))
      .agg(sum("n").as("n"), sum("s").cast(org.apache.spark.sql.types
        .DataTypes.createDecimalType(38, 6)).as("s"))
      .filter(col("n") > 0)
  }

  /** Present the maintained view for consumption: the exact decimal sum
    * surfaces as a double in one deterministic final rounding (the same
    * single cast a [[graft.core.Det.dsum]] aggregate ends with). */
  def present(view: DataFrame, groupCol: String,
      sumName: String = "sum_value"): DataFrame =
    view.select(col(groupCol), col("n"),
      col("s").cast("double").as(sumName))
}
