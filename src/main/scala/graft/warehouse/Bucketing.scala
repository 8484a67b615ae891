package graft.warehouse

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) storage for the big fact↔fact joins
  * (ref: data_warehouse.py:486-527 declares the FK graph; the reference
  * never joins at scale — at 100 TB the join strategy IS the feature).
  *
  * A table written with `bucketBy(n, key).sortBy(key)` is hash-split into
  * `n` files per partition by the key; two tables bucketed the SAME way
  * on the SAME key join with ZERO exchange — the sort-merge join reads
  * matching buckets directly (and with `sortBy` the per-bucket sort is
  * free too). That converts the recurring shuffle of every
  * orders⋈lineitem-shaped join into a one-time cost paid at write time —
  * the right trade whenever a fact table is joined more often than it is
  * rewritten.
  *
  * Sizing rule for 100 TB: pick `numBuckets` so one bucket of the LARGER
  * fact fits an executor's task comfortably (~128-512 MB compressed),
  * and reuse the same count on every table sharing the key — mismatched
  * counts forfeit co-location (Spark re-shuffles the smaller side unless
  * one count divides the other).
  */
object Bucketing {

  /** Write `df` as a parquet table bucketed and sorted on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).format("parquet")
      .bucketBy(numBuckets, key).sortBy(key)
      .saveAsTable(table)

  /** Equi-join two co-bucketed tables on their shared bucket key. The
    * `merge` hint pins sort-merge so the plan exploits bucketing even
    * when one side is small enough to broadcast — callers who prefer
    * broadcast for genuinely small dims should just `join` directly.
    */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), key)

  /** Compact a parquet directory's small files into `ceil(bytes/target)`
    * files at `outPath`. Small files are the silent killer of a 100 TB
    * lake: every scan pays per-file open/footer costs and the driver pays
    * listing, so streaming/incremental sinks (which land one file per
    * micro-batch per partition) need periodic compaction. Sizing uses the
    * ACTUAL on-disk bytes (FileSystem listing), not row counts, so skewed
    * row widths still land near the target. Returns the output file count.
    */
  def compactTo(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L << 20): Int = {
    require(targetFileBytes > 0)
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val hPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hPath.getFileSystem(hadoopConf)
    val outHPath = new org.apache.hadoop.fs.Path(outPath)
    val outFs = outHPath.getFileSystem(hadoopConf)
    // Qualify against each path's own FileSystem + working dir so equivalent
    // spellings (file:/x vs /x, relative vs absolute) can't slip past the
    // guard: write.mode(overwrite) deletes outPath before the lazy read runs.
    require(fs.makeQualified(hPath) != outFs.makeQualified(outHPath),
      "compactTo overwrites outPath — compacting a directory onto itself would destroy it")
    val bytes = fs.getContentSummary(hPath).getLength
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inPath)
      .repartition(nFiles)
      .write.mode("overwrite").option("compression", "snappy").parquet(outPath)
    nFiles
  }
}
