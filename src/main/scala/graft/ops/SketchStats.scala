package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE distinct-count sketches — incremental statistics
  * over batch-wise ingest, the stats twin of the persisted index family:
  * each ingest batch writes its own tiny HLL sketch segment
  * (idempotently, `seg=<batchKey>` overwrite), and the corpus-wide
  * distinct count is served by UNIONING the sketches — never by
  * re-scanning ingested data. Spark's Apache DataSketches HLL functions
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`, public API
  * since 3.5) do the math; this adds the durable segmented lifecycle.
  *
  * Why it matters at 100 TB: "distinct users per source, updated per
  * ingest" over raw data is a full-history shuffle per refresh; with
  * per-batch sketches the refresh reads kilobytes. Sketch unions are
  * associative/commutative, so ANY merge order serves the same state —
  * and a batch's sketch is sized by lgK (2^lgK registers), not by the
  * batch.
  *
  * Determinism/estimate contract: DataSketches HLL hashing is seeded and
  * deterministic, so the same data yields byte-identical sketches and
  * identical estimates across runs. A UNIONED estimate is not guaranteed
  * numerically equal to a single-pass sketch of the same data (union
  * serves the composite estimator where a directly-built sketch serves
  * HIP — a documented DataSketches property), but both carry the same
  * ~1.04/sqrt(2^lgK) relative-error bound; the contract tests pin both
  * paths against the exact count.
  *
  * lgK is a frozen index parameter (the quantizer-freeze pattern of the
  * IVF/PQ indexes): every segment must be built with the SAME lgK, and
  * serving fails loudly on a mixed-parameter index rather than silently
  * degrading through a lossy downsampling union.
  */
object SketchStats {

  private def checkKey(batchKey: String): Unit =
    require(batchKey.nonEmpty && !batchKey.exists(c => c == '/' || c == '='),
      s"batchKey must be a plain partition value, got '$batchKey'")

  /** Append one ingest batch's HLL sketch(es) of `valueCol` — one row
    * per `groupCols` value (or a single global row) holding the binary
    * sketch — as its own `seg=<batchKey>` partition. Idempotent under
    * retries: a re-delivered batch overwrites its previous attempt, and
    * because the union serves max-of-registers state, even a transient
    * double-count cannot inflate the estimate.
    */
  def appendHllBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, groupCols: Seq[String] = Nil, lgK: Int = 12): Unit = {
    checkKey(batchKey)
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    val sk = hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch")
    val out =
      if (groupCols.isEmpty) df.agg(sk)
      else df.groupBy(groupCols.map(col): _*).agg(sk)
    out.withColumn("lgk", lit(lgK))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve the distinct-count estimate from the persisted sketches: one
    * row per `groupCols` value (or one global row) with `n_distinct`.
    * Reads ONLY the sketch segments — bytes per batch, independent of
    * ingested volume. Mixed-lgK segments are rejected loudly (see class
    * doc); the union itself is the exact register-wise max, so serving
    * from N segments equals serving from any compaction of them.
    */
  def hllDistinct(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val sk = spark.read.parquet(dir)
    val lgks = sk.select("lgk").distinct().collect().map(_.getInt(0))
    require(lgks.length == 1,
      s"sketch index at $dir mixes lgK values ${lgks.sorted.mkString(",")}; " +
        "rebuild the offending segments with one lgK — a lossy " +
        "mixed-precision union would silently degrade every estimate")
    val est = hll_sketch_estimate(
      hll_union_agg(col("sketch"), lit(false))).as("n_distinct")
    if (groupCols.isEmpty) sk.agg(est)
    else sk.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** Compact all sketch segments into one `base` segment — the
    * segment-merge lifecycle step of the sketch index. The union is the
    * exact register-wise max and associative, so serving from the
    * compacted segment is IDENTICAL to serving from the N inputs
    * (contract-tested) — unlike the estimate-vs-single-pass relation,
    * this equality is exact, because both paths serve the same merged
    * register state. Staged-swap protected like every index compaction
    * here: a crashed merge leaves the live index intact, a crash between
    * delete and rename promotes the stage ([[StagedSwap]]).
    */
  def compactHll(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val sk = spark.read.parquet(dir)
    val lgks = sk.select("lgk").distinct().collect().map(_.getInt(0))
    require(lgks.length == 1,
      s"sketch index at $dir mixes lgK values ${lgks.sorted.mkString(",")}; " +
        "repair before compacting — the merge would bake the precision " +
        "loss into the base segment permanently")
    val merged = hll_union_agg(col("sketch"), lit(false)).as("sketch")
    val out =
      if (groupCols.isEmpty) sk.agg(merged)
      else sk.groupBy(groupCols.map(col): _*).agg(merged)
    out.withColumn("lgk", lit(lgks.head))
      .write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }
}
