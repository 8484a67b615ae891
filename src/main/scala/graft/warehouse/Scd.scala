package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance (Kimball SCD Type 2): apply a
  * change batch to a versioned dimension, closing out superseded rows and
  * opening new versions, without ever rewriting history.
  *
  * Beyond-reference warehouse depth: the reference's warehouse writes are
  * whole-table `replace` / blind `append` (`src/storage/data_warehouse
  * .py:101-138`), which destroys history on every load. A dimension at
  * warehouse scale needs the merge/upsert lifecycle instead — this is the
  * deterministic DataFrame formulation of `MERGE INTO` for the Type-2
  * pattern.
  *
  * Dimension schema contract: `keyCol`, the `trackedCols`, plus the three
  * versioning columns `valid_from DATE`, `valid_to DATE` (null = open),
  * `is_current BOOLEAN`. The change batch carries `keyCol` + `trackedCols`
  * (new attribute values, one row per key).
  *
  * Scale shape, 100 TB framing: ONE key-partitioned full-outer join
  * between the dimension's CURRENT slice and the batch — history rows
  * pass through untouched (no join, no shuffle for the usually-dominant
  * closed-row mass). The change batch is small next to the dimension, so
  * AQE broadcasts it and even the current slice does not shuffle; a
  * bucketed dimension ([[Bucketing]]) makes the join zero-exchange
  * outright. Change detection is null-safe column equality — no hashing,
  * no UDFs, all codegen.
  */
object Scd {

  /** Apply `changes` to the Type-2 dimension `dim` effective `effDate`.
    *
    * Semantics per current dimension row / change row pair:
    *  - history rows (`is_current = false`): pass through unchanged;
    *  - current row, no change row for the key: unchanged;
    *  - current row + change row with IDENTICAL tracked values: no-op
    *    (idempotent re-delivery of an already-applied batch changes
    *    nothing);
    *  - current row + differing change row: the current row closes
    *    (`valid_to = effDate`, `is_current = false`) and a new open
    *    version with the change's tracked values starts at `effDate`;
    *  - change row with no dimension match: a brand-new member, inserted
    *    open at `effDate`.
    *
    * Output column order: key, tracked, valid_from, valid_to, is_current.
    * Deterministic: no timestamps are read from the clock — `effDate` is
    * caller-supplied, so retries produce byte-identical results.
    */
  def scd2Apply(dim: DataFrame, changes: DataFrame, keyCol: String,
      trackedCols: Seq[String], effDate: Column,
      validateKeys: Boolean = true): DataFrame = {
    require(trackedCols.nonEmpty, "trackedCols must be non-empty")
    if (validateKeys) {
      // a change batch with two rows for one key would silently emit two
      // open versions of that member — fail loudly instead. One
      // column-pruned aggregate over the (small) batch; callers whose
      // upstream already dedups per key can pass validateKeys = false.
      val dup = changes.groupBy(col(keyCol)).agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select(keyCol).take(1)
      require(dup.isEmpty,
        s"change batch holds key ${dup.headOption.map(_.get(0)).orNull} more than " +
          "once; dedup the batch (latest-wins) before applying")
    }
    // a NULL natural key can never match a member (SQL equality) —
    // applying it would "insert" a NULL-keyed ghost open version; reject
    // loudly. OUTSIDE the validateKeys block (ADVICE r12): this is a
    // correctness invariant, not a dedup optimization — the documented
    // validateKeys=false opt-out for pre-deduped batches must not also
    // opt out of ghost-row prevention, and the probe is O(1)-cheap
    // (take(1) on a column-pruned filter of the small batch).
    require(changes.filter(col(keyCol).isNull).take(1).isEmpty,
      s"change batch holds a NULL $keyCol; a NULL key matches no member")
    val verCols = Seq("valid_from", "valid_to", "is_current")
    val dimCols = keyCol +: trackedCols.toIndexedSeq
    require((dimCols ++ verCols).forall(dim.columns.contains),
      s"dim must carry ${(dimCols ++ verCols).mkString(", ")}; has ${dim.columns.mkString(", ")}")
    require(dimCols.forall(changes.columns.contains),
      s"changes must carry ${dimCols.mkString(", ")}; has ${changes.columns.mkString(", ")}")
    val outCols = (dimCols ++ verCols).map(col)

    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current")).select(outCols: _*)
    // presence MARKERS, not key-nullness, decide which side matched:
    // inferring "no dimension match" from d_key IS NULL would misread a
    // NULL-keyed current row (which joins nothing) as a brand-new member
    // and silently replace its values with the change side's NULLs
    val d = cur.select((dimCols ++ verCols).map(c => col(c).as(s"d_$c")) :+
      lit(true).as("_in_d"): _*)
    val c = changes.select(dimCols.map(cc => col(cc).as(s"c_$cc")) :+
      lit(true).as("_in_c"): _*)
    val j = d.join(c, col(s"d_$keyCol") === col(s"c_$keyCol"), "full_outer")

    // null-safe inequality: a tracked value moving to/from NULL is a change
    val differs = trackedCols
      .map(t => !(col(s"d_$t") <=> col(s"c_$t"))).reduceLeft(_ || _)

    // ONE pass over the joined rows: each row emits its disposition as an
    // array of output structs, inlined back to rows. Filter+union of
    // per-disposition branches would re-plan (and re-execute) the join
    // once per branch — three joins instead of one at 100 TB
    // (plan-contract-tested in PlanAuditSpec).
    def outRow(vals: Seq[Column], vf: Column, vt: Column, cur: Column) =
      struct(vals.zip(dimCols).map { case (v, n) => v.as(n) } ++
        Seq(vf.as("valid_from"), vt.cast("date").as("valid_to"),
          cur.as("is_current")): _*)
    val dVals = dimCols.map(cc => col(s"d_$cc"))
    val cVals = dimCols.map(cc => col(s"c_$cc"))
    val asIs = outRow(dVals, col("d_valid_from"), col("d_valid_to"),
      col("d_is_current"))
    val closed = outRow(dVals, col("d_valid_from"), effDate, lit(false))
    val opened = outRow(cVals, effDate, lit(null), lit(true))
    val disposition =
      when(col("_in_d").isNull, array(opened)) // brand-new member
        .when(col("_in_c").isNull || !differs, array(asIs)) // untouched / no-op
        .otherwise(array(closed, opened)) // close out + successor version

    hist.union(j.select(inline(disposition)))
  }
}
