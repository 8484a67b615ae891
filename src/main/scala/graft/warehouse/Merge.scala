package graft.warehouse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO semantics (the Delta/Iceberg upsert statement, ANSI
  * SQL:2003 MERGE) as one full-outer join — the warehouse write pattern
  * the reference's replace-whole-table loads can't express:
  *
  *   WHEN MATCHED [AND deleteCond] THEN DELETE
  *   WHEN MATCHED                  THEN UPDATE SET * (source wins)
  *   WHEN NOT MATCHED              THEN INSERT *
  *
  * Base rows with no source match pass through untouched. One shuffle on
  * the key (both sides hash-partition; AQE broadcasts a small source),
  * no window, no driver-side state — the plan is identical at any scale.
  */
object Merge {

  /** Upsert `source` into `base` on `keys`. Both frames must share the
    * schema (`SET *` / `INSERT *` semantics). `deleteCond` is evaluated
    * against the SOURCE row of a matched pair (SQL MERGE's
    * WHEN MATCHED AND cond THEN DELETE); a NULL condition keeps the row
    * (DELETE only on definite TRUE — the purge() lesson).
    */
  def mergeUpsert(base: DataFrame, source: DataFrame, keys: Seq[String],
      deleteCond: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "keys must be non-empty")
    require(base.columns.sorted.sameElements(source.columns.sorted),
      s"schemas differ: base ${base.columns.sorted.mkString(",")} vs " +
        s"source ${source.columns.sorted.mkString(",")}")
    require(keys.forall(base.columns.contains),
      s"keys ${keys.mkString(",")} missing from schema")
    // loud on duplicate source keys — MERGE's "cannot update the same
    // row twice" rule; silently letting both through would make the
    // survivor partition-order-dependent. NULL-bearing keys are exempt:
    // SQL MERGE's ON clause never matches NULL = NULL, so two NULL-key
    // source rows update nothing — they are two legal INSERTs, not a
    // double update (groupBy would have lumped them as one key).
    val dup = source.filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select(keys.map(col): _*).take(1)
    require(dup.isEmpty,
      s"source holds key ${dup.headOption.mkString} more than once; " +
        "dedup (latest-wins) before merging")

    val vals = base.columns.filterNot(keys.contains).toSeq
    val b = base.select(
      keys.map(col) ++ vals.map(c => col(c).as(s"_b_$c")) :+
        lit(true).as("_in_b"): _*)
    // the delete predicate reads SOURCE columns — evaluate it on the
    // un-renamed source frame so callers write it naturally
    val s = source
      .withColumn("_del", coalesce(
        deleteCond.getOrElse(lit(false)), lit(false)))
      .select(keys.map(col) ++ vals.map(c => col(c).as(s"_s_$c")) ++
        Seq(col("_del"), lit(true).as("_in_s")): _*)
    val j = b.join(s, keys, "full_outer")
    val matched = col("_in_b").isNotNull && col("_in_s").isNotNull
    val deleted = matched && col("_del")
    j.filter(!deleted)
      .select(keys.map(col) ++ vals.map(c =>
        when(col("_in_s").isNotNull, col(s"_s_$c"))
          .otherwise(col(s"_b_$c")).as(c)): _*)
      .select(base.columns.map(col): _*) // original column order
  }

  /** [[mergeUpsert]] committed as the next snapshot of a
    * [[VersionedTable]]: read current, merge, commit — the upsert write
    * path with time travel over every merge.
    */
  def mergeCommit(spark: org.apache.spark.sql.SparkSession, dir: String,
      source: DataFrame, keys: Seq[String],
      deleteCond: Option[Column] = None): Long = {
    val merged = mergeUpsert(VersionedTable.read(spark, dir), source, keys,
      deleteCond)
    VersionedTable.commit(merged, dir)
  }
}
