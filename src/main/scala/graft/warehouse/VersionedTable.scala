package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table with time travel and rollback — the
  * minimal transactional-table shape (Delta/Iceberg's core idea) built
  * on nothing but parquet + an atomic manifest rename.
  *
  * Beyond-reference warehouse depth: the reference overwrites its
  * warehouse tables in place (`data_warehouse.py:101-138`), so a bad
  * load destroys the previous state with no way back; production tables
  * need versioned commits, reads of a consistent snapshot while a write
  * is in flight, and rollback.
  *
  * Layout:
  *   dir/v=<N>/...parquet     — immutable snapshot data (never rewritten)
  *   dir/_latest              — one-line manifest: the committed version N
  *
  * Commit protocol: write the snapshot dir, then write `_latest.tmp` and
  * RENAME it over `_latest` — the rename is the atomic commit point
  * (single-writer; HDFS/posix rename semantics). A crash before the
  * rename leaves a dangling `v=` dir the next commit ignores and
  * overwrites-by-version-number never touches — readers only ever follow
  * the manifest, so they see either the old or the new snapshot, never a
  * partial write. Rollback = write a manifest pointing at an older
  * version; no data moves.
  *
  * At 100 TB: snapshots share nothing (no copy-on-write file reuse — the
  * simplification vs Delta), so this suits dimension/metadata tables and
  * periodic full publishes, not per-row upserts; [[Scd.scd2Apply]] plus
  * a versioned publish is exactly the dimension-maintenance pair.
  * Old snapshots are pruned with [[vacuum]], which refuses to remove the
  * committed version.
  */
object VersionedTable {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifest(dir: String) = new Path(s"$dir/_latest")

  private def readManifest(spark: SparkSession, dir: String): Option[(Long, Option[String])] = {
    val f = fs(spark, dir)
    val m = manifest(dir)
    if (!f.exists(m)) None
    else {
      val in = f.open(m)
      try {
        val lines = scala.io.Source.fromInputStream(in).getLines().toList
        val v = lines.head.trim.toLong
        val key = lines.drop(1).collectFirst {
          case l if l.startsWith("batch=") => l.stripPrefix("batch=").trim
        }
        Some((v, key))
      } finally in.close()
    }
  }

  /** The committed version, or None for an empty/uninitialized table. */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] =
    readManifest(spark, dir).map(_._1)

  /** The batch key recorded by the LAST committed [[commitBatch]], or
    * None for plain commits / uninitialized tables. */
  def lastBatchKey(spark: SparkSession, dir: String): Option[String] =
    readManifest(spark, dir).flatMap(_._2)

  /** All snapshot versions present on disk (committed or dangling). */
  def versions(spark: SparkSession, dir: String): Seq[Long] = {
    val f = fs(spark, dir)
    val p = new Path(dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v=\\d+")) // ignore stage dirs (_purge etc.)
      .map(_.stripPrefix("v=").toLong)
      .sorted
  }

  private def writeManifest(spark: SparkSession, dir: String, v: Long,
      batchKey: Option[String] = None): Unit = {
    val f = fs(spark, dir)
    val tmp = new Path(s"$dir/_latest.tmp")
    val out = f.create(tmp, true)
    val body = s"$v\n" + batchKey.map(k => s"batch=$k\n").getOrElse("")
    try out.write(body.getBytes("UTF-8")) finally out.close()
    // rename-with-OVERWRITE is the atomic commit point. A delete-then-
    // rename pair would open a window with NO manifest at all: a crash
    // inside it silently resets the version counter (the next commit
    // would clobber snapshot v=0) and loses the commitBatch replay key —
    // exactly the state the exactly-once contract depends on. The
    // FileContext API exposes the overwriting rename that FileSystem
    // hides; on posix/HDFS it is a single atomic metadata op.
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = f.makeQualified(manifest(dir))
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
    fc.rename(f.makeQualified(tmp), dst,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  /** Commit `df` as the next version and return it. Retry-safe: a
    * re-run after a crash overwrites the dangling (uncommitted) snapshot
    * dir it left behind, because the version number is derived from the
    * MANIFEST (committed state), not from what's on disk.
    */
  def commit(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val v = currentVersion(spark, dir).map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(s"$dir/v=$v")
    writeManifest(spark, dir, v)
    v
  }

  /** [[commit]] keyed by a batch identifier, EXACTLY-ONCE under
    * micro-batch replay: if the committed manifest already records
    * `batchKey`, the call is a no-op returning None. Structured
    * Streaming's `foreachBatch` replays only the LAST uncommitted batch
    * after a restart, so remembering one key is sufficient for the
    * exactly-once contract — this is the standard idempotent-sink
    * pattern (txnVersion/txnAppId in Delta's foreachBatch docs) on plain
    * parquet. A crash after the snapshot write but before the manifest
    * rename re-runs the batch: the retry overwrites the dangling
    * snapshot dir and commits once.
    */
  def commitBatch(df: DataFrame, dir: String, batchKey: String): Option[Long] = {
    require(batchKey.nonEmpty, "batchKey must be non-empty")
    val spark = df.sparkSession
    readManifest(spark, dir) match {
      case Some((_, Some(k))) if k == batchKey => None // replayed batch
      case m =>
        val v = m.map(_._1 + 1).getOrElse(0L)
        df.write.mode("overwrite").parquet(s"$dir/v=$v")
        writeManifest(spark, dir, v, Some(batchKey))
        Some(v)
    }
  }

  /** Read the committed snapshot (or a specific `asOf` version). Reads
    * never follow in-flight writes: the manifest names a fully-written
    * snapshot or the read fails loudly.
    */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.orElse(currentVersion(spark, dir)).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $dir"))
    val snap = new Path(s"$dir/v=$v")
    require(fs(spark, dir).exists(snap),
      s"version $v does not exist at $dir (vacuumed? never committed?)")
    spark.read.parquet(snap.toString)
  }

  /** Change-data-capture diff between two committed snapshots: one row
    * per key whose row was inserted, deleted, or updated going
    * `fromVersion` -> `toVersion`. Output: (keyCols..., change_type in
    * {'insert','delete','update'}); unchanged keys are dropped. Keys must
    * be unique per snapshot (enforced loudly — a duplicated key would
    * make the join fan out and the verdict ambiguous).
    *
    * Scale shape: ONE key-shuffled full-outer join of the two snapshots
    * — non-key columns ride as a single struct, so the change test is a
    * null-safe struct compare, never N per-column passes; AQE handles
    * skewed keys. This is the downstream-incremental primitive: a
    * consumer reads the diff instead of re-scanning the full snapshot.
    */
  def diff(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    diffValues(spark, dir, fromVersion, toVersion, keyCols)
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }

  /** [[diff]] with the full BEFORE/AFTER row images (Debezium's CDC
    * envelope shape): (keyCols..., change_type, _old, _new) where
    * `_old`/`_new` are structs of the non-key columns — null on the
    * insert/delete side respectively. The value-bearing feed is what
    * incremental consumers need ([[IncrementalAgg.applyCdc]] folds it
    * into maintained aggregates without touching the snapshots).
    */
  /** Implementation shape: ONE union + ONE key-grouped aggregation —
    * each snapshot is scanned exactly once and the data moves through a
    * single key shuffle (a full-outer join would cost the same shuffle
    * but needs a SEPARATE pre-pass per side for the duplicate-key gate;
    * here the gate rides the same aggregation as a per-side count and
    * fails LOUDLY at execution time via `raise_error`). Keys must be
    * non-null and data columns orderable (struct max carries the single
    * row image per side).
    */
  def diffValues(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val a = read(spark, dir, Some(fromVersion))
    val b = read(spark, dir, Some(toVersion))
    require(a.columns.sameElements(b.columns),
      s"snapshot schemas diverge: v$fromVersion has ${a.columns.mkString(",")} " +
        s"vs v$toVersion ${b.columns.mkString(",")}")
    val dataCols = a.columns.filterNot(keyCols.contains)
    require(dataCols.nonEmpty, "snapshots must have non-key columns to compare")
    import org.apache.spark.sql.functions._
    def packed(df: DataFrame, side: Int) =
      df.select(keyCols.map(col) ++ Seq(lit(side).as("_side"),
        struct(dataCols.map(col): _*).as("_p")): _*)
    packed(a, 0).unionByName(packed(b, 1))
      .groupBy(keyCols.map(col): _*)
      .agg(
        count(when(col("_side") === 0, 1)).as("_cOld"),
        count(when(col("_side") === 1, 1)).as("_cNew"),
        max(when(col("_side") === 0, col("_p"))).as("_old"),
        max(when(col("_side") === 1, col("_p"))).as("_new"))
      .withColumn("change_type",
        when(col("_cOld") > 1 || col("_cNew") > 1, raise_error(concat(
          lit(s"snapshot v$fromVersion/v$toVersion has a duplicated key ("),
          concat_ws(",", keyCols.map(c => col(c).cast("string")): _*),
          lit("); diff requires key-unique snapshots"))))
          .when(col("_old").isNull, "insert")
          .when(col("_new").isNull, "delete")
          .when(!(col("_old") <=> col("_new")), "update"))
      .filter(col("change_type").isNotNull)
      .select(keyCols.map(col) ++ Seq(col("change_type"), col("_old"), col("_new")): _*)
  }

  /** Point the table back at an existing older version. No data moves;
    * the abandoned versions remain readable via `asOf` until [[vacuum]].
    */
  def rollback(spark: SparkSession, dir: String, toVersion: Long): Unit = {
    require(fs(spark, dir).exists(new Path(s"$dir/v=$toVersion")),
      s"cannot roll back to missing version $toVersion")
    writeManifest(spark, dir, toVersion)
  }

  /** Delete all snapshots except the newest `keep` AND the committed
    * one (which is always retained, whatever its age). */
  def vacuum(spark: SparkSession, dir: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, "keep must be >= 1")
    val cur = currentVersion(spark, dir)
    val all = versions(spark, dir)
    val doomed = all.dropRight(keep).filterNot(cur.contains)
    val f = fs(spark, dir)
    doomed.foreach(v => f.delete(new Path(s"$dir/v=$v"), true))
    doomed
  }

  /** HISTORY PURGE (the right-to-be-forgotten shape): rewrite EVERY
    * on-disk snapshot dropping the rows matching `condition`, so the
    * data is gone from the current version AND from all time travel —
    * [[rollback]] and `asOf` reads can no longer resurrect it. Nothing
    * else changes: version numbering, the committed pointer, and the
    * exactly-once batch key all survive, and non-matching rows pass
    * through untouched.
    *
    * Crash-safe per version via the shared staged-swap idiom (stage
    * write -> delete -> rename; a crash between delete and rename is
    * recovered stage-first on the next run), and IDEMPOTENT overall: a
    * purge re-run filters already-clean snapshots to themselves, so a
    * crashed purge is completed by running it again — the operational
    * contract a deletion-request queue needs. Returns the versions
    * rewritten.
    */
  def purge(spark: SparkSession, dir: String,
      condition: org.apache.spark.sql.Column): Seq[Long] = {
    val f = fs(spark, dir)
    // recovery sweep FIRST: a crash between a prior purge's delete and
    // rename leaves that version's only copy in its stage dir and the
    // live dir missing — versions() cannot see it, so promote any such
    // stage back to live before listing, or the re-run would silently
    // skip (and eventually orphan) that snapshot
    val root = new Path(dir)
    if (f.exists(root))
      f.listStatus(root).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("_purge_v")).foreach { n =>
          graft.ops.StagedSwap.recoverCrashedSwap(f,
            new Path(s"$dir/v=${n.stripPrefix("_purge_v")}"), new Path(s"$dir/$n"))
        }
    val all = versions(spark, dir)
    all.foreach { v =>
      val live = new Path(s"$dir/v=$v")
      val stage = new Path(s"$dir/_purge_v$v")
      graft.ops.StagedSwap.recoverOrClearStage(f, live, stage)
      // SQL DELETE semantics: drop a row only when the predicate is
      // definitely TRUE — a NULL predicate (e.g. purge keyed on a
      // nullable column) must keep the row, so coalesce NULL to false
      // before negating; bare !condition would silently delete it.
      spark.read.parquet(live.toString)
        .filter(!org.apache.spark.sql.functions.coalesce(
          condition, org.apache.spark.sql.functions.lit(false)))
        .write.mode("overwrite").parquet(stage.toString)
      graft.ops.StagedSwap.swap(f, live, stage)
    }
    all
  }
}
