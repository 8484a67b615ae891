package graft

import org.apache.spark.sql.functions._
import graft.warehouse.VersionedTable

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-vtable").toString + "/t"

  test("commit/read/time-travel: versions are immutable snapshots") {
    val dir = tmp()
    assert(VersionedTable.currentVersion(spark, dir).isEmpty)
    val v0 = VersionedTable.commit(Seq((1, "a")).toDF("k", "v"), dir)
    val v1 = VersionedTable.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), dir)
    assert((v0, v1) == ((0L, 1L)))
    assert(VersionedTable.read(spark, dir).count() == 2)
    assert(VersionedTable.read(spark, dir, asOf = Some(0L)).count() == 1)
    assert(VersionedTable.currentVersion(spark, dir).contains(1L))
  }

  test("rollback re-points the manifest; data stays readable; next commit continues") {
    val dir = tmp()
    VersionedTable.commit(Seq(1).toDF("x"), dir)
    VersionedTable.commit(Seq(1, 2).toDF("x"), dir)
    VersionedTable.rollback(spark, dir, 0L)
    assert(VersionedTable.read(spark, dir).count() == 1)
    // the abandoned version is still time-travel readable
    assert(VersionedTable.read(spark, dir, asOf = Some(1L)).count() == 2)
    // next commit goes to v=1+? — derived from the MANIFEST (0), so v=1:
    // it overwrites the abandoned snapshot, which is exactly the
    // crash-retry semantics (uncommitted/abandoned dirs are reclaimable)
    val v = VersionedTable.commit(Seq(1, 2, 3).toDF("x"), dir)
    assert(v == 1L && VersionedTable.read(spark, dir).count() == 3)
    intercept[IllegalArgumentException] {
      VersionedTable.rollback(spark, dir, 99L)
    }
  }

  test("a dangling (uncommitted) snapshot is invisible to readers and reclaimed") {
    val dir = tmp()
    VersionedTable.commit(Seq(1).toDF("x"), dir)
    // simulate a crash AFTER the snapshot write, BEFORE the manifest
    // rename: v=1 exists on disk but the manifest still says 0
    Seq(9, 9).toDF("x").write.parquet(s"$dir/v=1")
    assert(VersionedTable.currentVersion(spark, dir).contains(0L))
    assert(VersionedTable.read(spark, dir).count() == 1)
    // the retry overwrites the dangling dir and commits
    val v = VersionedTable.commit(Seq(5, 6, 7).toDF("x"), dir)
    assert(v == 1L && VersionedTable.read(spark, dir).count() == 3)
  }

  test("vacuum keeps the newest N and never deletes the committed version") {
    val dir = tmp()
    (1 to 5).foreach(i => VersionedTable.commit(Seq.fill(i)(i).toDF("x"), dir))
    VersionedTable.rollback(spark, dir, 0L) // committed = oldest
    val doomed = VersionedTable.vacuum(spark, dir, keep = 2)
    // versions 1,2 deleted; 0 (committed), 3, 4 retained
    assert(doomed == Seq(1L, 2L), doomed.toString)
    assert(VersionedTable.versions(spark, dir) == Seq(0L, 3L, 4L))
    assert(VersionedTable.read(spark, dir).count() == 1)
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, dir, asOf = Some(2L)).count()
    }
  }

  test("diff emits insert/delete/update per key, drops unchanged, null-safe") {
    val dir = tmp()
    VersionedTable.commit(Seq(
      (1L, "a", Some(1.0)),  // unchanged
      (2L, "b", Some(2.0)),  // deleted
      (3L, "c", None),       // null -> value: update
      (4L, "d", Some(4.0)),  // value change: update
    ).toDF("k", "s", "x"), dir)
    VersionedTable.commit(Seq(
      (1L, "a", Some(1.0)),
      (3L, "c", Some(3.0)),
      (4L, "d", Some(40.0)),
      (5L, "e", Some(5.0)),  // inserted
    ).toDF("k", "s", "x"), dir)
    val d = VersionedTable.diff(spark, dir, 0L, 1L, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(d == Set((2L, "delete"), (3L, "update"), (4L, "update"), (5L, "insert")))
    // reverse direction flips insert/delete
    val rev = VersionedTable.diff(spark, dir, 1L, 0L, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rev == Set((2L, "insert"), (3L, "update"), (4L, "update"), (5L, "delete")))
  }

  test("diff rejects duplicated keys and diverged schemas loudly") {
    val dir = tmp()
    VersionedTable.commit(Seq((1L, "a"), (1L, "b")).toDF("k", "s"), dir)
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "s"), dir)
    // the dup gate rides the diff's own aggregation (raise_error), so it
    // fires at ACTION time, wrapped by Spark's task-failure chain
    val e = intercept[Exception] {
      VersionedTable.diff(spark, dir, 0L, 1L, Seq("k")).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} | ${chain(t.getCause)}"
    assert(chain(e).contains("duplicated key"), chain(e))
    val dir2 = tmp()
    VersionedTable.commit(Seq((1L, "a")).toDF("k", "s"), dir2)
    VersionedTable.commit(Seq((1L, 2.0)).toDF("k", "x"), dir2)
    intercept[IllegalArgumentException] {
      VersionedTable.diff(spark, dir2, 0L, 1L, Seq("k")).collect()
    }
  }

  test("commitBatch is exactly-once per batch key; plain commits interleave") {
    val dir = tmp()
    assert(VersionedTable.commitBatch(Seq(1).toDF("x"), dir, "b0").contains(0L))
    // replay of the SAME batch: no new version, data unchanged
    assert(VersionedTable.commitBatch(Seq(9, 9).toDF("x"), dir, "b0").isEmpty)
    assert(VersionedTable.currentVersion(spark, dir).contains(0L))
    assert(VersionedTable.read(spark, dir).count() == 1)
    assert(VersionedTable.lastBatchKey(spark, dir).contains("b0"))
    // next batch commits; a plain commit clears the key (so a later
    // commitBatch with an old key is NOT considered a replay)
    assert(VersionedTable.commitBatch(Seq(1, 2).toDF("x"), dir, "b1").contains(1L))
    VersionedTable.commit(Seq(1, 2, 3).toDF("x"), dir)
    assert(VersionedTable.lastBatchKey(spark, dir).isEmpty)
    assert(VersionedTable.commitBatch(Seq(4).toDF("x"), dir, "b1").contains(3L))
  }

  test("versionedPublishStream commits one snapshot per wave, exactly-once under replay") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_vpub").toString
    val raw = s"$work/raw"; val tbl = s"$work/tbl"; val ckpt = s"$work/ckpt"
    val waves = Seq(Seq(1, 2, 3), Seq(4, 5), Seq(6))
    def run(): Unit = {
      val stream = spark.readStream
        .schema(waves.head.toDF("x").schema).parquet(raw)
      val q = Streaming.versionedPublishStream(stream, tbl, ckpt,
        df => df.groupBy().agg(count(lit(1)).as("n"), sum("x").as("s")))
      assert(q.awaitTermination(120000), "publish stream did not finish")
    }
    waves.zipWithIndex.foreach { case (w, k) =>
      w.toDF("x").write.mode("append").parquet(raw)
      run()
      assert(VersionedTable.currentVersion(spark, tbl).contains(k.toLong),
        s"wave $k must publish version $k")
      val row = VersionedTable.read(spark, tbl).collect().head
      assert(row.getLong(0) == w.size && row.getLong(1) == w.sum.toLong,
        s"wave $k snapshot must aggregate exactly that wave")
    }
    // replayed micro-batch (restart after commit, before offset advance):
    // same incarnation-qualified key -> no-op, no duplicate version
    val key = s"${Streaming.runKey(ckpt)}-2"
    assert(VersionedTable.lastBatchKey(spark, tbl).contains(key))
    assert(VersionedTable.commitBatch(
      Seq(99).toDF("x"), tbl, key).isEmpty)
    assert(VersionedTable.currentVersion(spark, tbl).contains(2L))
    // every wave's snapshot remains time-travel readable
    assert(VersionedTable.read(spark, tbl, asOf = Some(0L))
      .collect().head.getLong(0) == 3L)
  }

  test("incremental count/sum view equals direct recompute across chained CDC batches") {
    import graft.warehouse.IncrementalAgg
    val dir = tmp()
    VersionedTable.commit(Seq(
      (1L, "a", 1.5), (2L, "a", 2.25), (3L, "b", 3.0)).toDF("k", "g", "m"), dir)
    // v1: in-group update (1), group-migrating update (2: a->b),
    // delete (3), insert into a NEW group (4: c)
    VersionedTable.commit(Seq(
      (1L, "a", 10.0), (2L, "b", 2.25), (4L, "c", 4.0)).toDF("k", "g", "m"), dir)
    // v2: group b EMPTIES (2 deleted), c updates
    VersionedTable.commit(Seq(
      (1L, "a", 10.0), (4L, "c", 4.5)).toDF("k", "g", "m"), dir)

    def rows(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.present(df, "g").orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList

    var view = IncrementalAgg.countSumView(
      VersionedTable.read(spark, dir, Some(0L)), "g", "m")
    Seq((0L, 1L), (1L, 2L)).foreach { case (f, t) =>
      view = IncrementalAgg.applyCdc(view,
        VersionedTable.diffValues(spark, dir, f, t, Seq("k")), "g", "m")
      val direct = IncrementalAgg.countSumView(
        VersionedTable.read(spark, dir, Some(t)), "g", "m")
      assert(rows(view) == rows(direct),
        s"after $f->$t maintained=${rows(view)} direct=${rows(direct)}")
    }
    // the emptied group left the view entirely
    assert(rows(view).map(_._1) == List("a", "c"))
    assert(rows(view) == List(("a", 1L, 10.0), ("c", 1L, 4.5)))
  }

  test("materializedViewStream keeps table and view consistently versioned per wave") {
    import graft.streaming.Streaming
    import graft.warehouse.IncrementalAgg
    val work = java.nio.file.Files.createTempDirectory("graft_mvs").toString
    val raw = s"$work/raw"; val tbl = s"$work/tbl"
    val vw = s"$work/vw"; val ckpt = s"$work/ckpt"
    // each wave is the table's COMPLETE new state: in-group update,
    // delete, insert, then a group-migrating update and an emptied group
    val waves = Seq(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)),
      Seq((1L, "a", 5.0), (3L, "b", 3.0)),
      Seq((3L, "c", 3.0)))
    def run(): Unit = {
      val stream = spark.readStream
        .schema(waves.head.toDF("k", "g", "m").schema).parquet(raw)
      val q = Streaming.materializedViewStream(stream, tbl, vw, ckpt,
        Seq("k"), "g", "m")
      assert(q.awaitTermination(120000), "view stream did not finish")
    }
    def rows(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.present(df, "g").orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    waves.zipWithIndex.foreach { case (w, k) =>
      w.toDF("k", "g", "m").write.mode("append").parquet(raw)
      run()
      assert(VersionedTable.currentVersion(spark, tbl).contains(k.toLong))
      assert(VersionedTable.currentVersion(spark, vw).contains(k.toLong))
      val maintained = rows(VersionedTable.read(spark, vw))
      val direct = rows(IncrementalAgg.countSumView(
        VersionedTable.read(spark, tbl), "g", "m"))
      assert(maintained == direct,
        s"wave $k maintained=$maintained direct=$direct")
    }
    assert(rows(VersionedTable.read(spark, vw)) == List(("c", 1L, 3.0)))
    // every wave's VIEW snapshot is itself time-travel readable
    assert(rows(VersionedTable.read(spark, vw, asOf = Some(0L))) ==
      List(("a", 1L, 1.0), ("b", 1L, 2.0)))
  }

  test("stream retention bounds snapshots; view maintenance survives vacuumed history") {
    import graft.streaming.Streaming
    import graft.warehouse.IncrementalAgg
    val work = java.nio.file.Files.createTempDirectory("graft_mvsv").toString
    val raw = s"$work/raw"; val tbl = s"$work/tbl"
    val vw = s"$work/vw"; val ckpt = s"$work/ckpt"
    val waves = Seq(
      Seq((1L, "a", 1.0)),
      Seq((1L, "a", 2.0), (2L, "b", 2.0)),
      Seq((2L, "b", 4.0), (3L, "a", 1.5)),
      Seq((3L, "c", 1.5)))
    waves.zipWithIndex.foreach { case (w, k) =>
      w.toDF("k", "g", "m").write.mode("append").parquet(raw)
      val stream = spark.readStream
        .schema(waves.head.toDF("k", "g", "m").schema).parquet(raw)
      val q = Streaming.materializedViewStream(stream, tbl, vw, ckpt,
        Seq("k"), "g", "m", keepVersions = 2)
      assert(q.awaitTermination(120000), s"wave $k did not finish")
    }
    // current version advanced to 3; only the newest 2 snapshots survive
    assert(VersionedTable.currentVersion(spark, tbl).contains(3L))
    assert(VersionedTable.versions(spark, tbl) == Seq(2L, 3L))
    assert(VersionedTable.versions(spark, vw) == Seq(2L, 3L))
    // the maintained view — built across vacuumed history — still equals
    // the direct recompute of the final snapshot
    def rows(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.present(df, "g").orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toList
    assert(rows(VersionedTable.read(spark, vw)) ==
      rows(IncrementalAgg.countSumView(VersionedTable.read(spark, tbl), "g", "m")))
    assert(rows(VersionedTable.read(spark, vw)) == List(("c", 1L, 1.5)))
  }

  test("scd2 + versioned publish: the dimension-maintenance pair") {
    val dir = tmp()
    val dim0 = Seq((1L, "A", 10.0, java.sql.Date.valueOf("2024-01-01"),
      null.asInstanceOf[java.sql.Date], true))
      .toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
    VersionedTable.commit(dim0, dir)
    val merged = graft.warehouse.Scd.scd2Apply(
      VersionedTable.read(spark, dir),
      Seq((1L, "B", 11.0)).toDF("k", "seg", "bal"),
      "k", Seq("seg", "bal"), to_date(lit("2025-06-01")))
    VersionedTable.commit(merged, dir)
    assert(VersionedTable.read(spark, dir).count() == 2) // closed + open
    assert(VersionedTable.read(spark, dir, asOf = Some(0L)).count() == 1)
  }

  test("purge erases a key from EVERY version; everything else survives") {
    val dir = java.nio.file.Files.createTempDirectory("graft_purge").toString
    VersionedTable.commitBatch(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, "w0")
    VersionedTable.commitBatch(Seq((1L, "a2"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir, "w1")
    VersionedTable.commitBatch(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), dir, "w2")
    val before = VersionedTable.versions(spark, dir)
    val curBefore = VersionedTable.currentVersion(spark, dir)

    val purged = VersionedTable.purge(spark, dir, col("k") === 1L)
    assert(purged == before)
    // the key is gone from current AND all time travel
    VersionedTable.versions(spark, dir).foreach { v =>
      val snap = VersionedTable.read(spark, dir, asOf = Some(v))
      assert(snap.filter(col("k") === 1L).count() == 0, s"k=1 survives in v=$v")
    }
    // version list, committed pointer, batch key, and other rows intact
    assert(VersionedTable.versions(spark, dir) == before)
    assert(VersionedTable.currentVersion(spark, dir) == curBefore)
    assert(VersionedTable.lastBatchKey(spark, dir).contains("w2"))
    assert(VersionedTable.read(spark, dir, asOf = Some(1L))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "b"), (3L, "c")))
    // exactly-once replay of an already-committed batch is still a no-op
    assert(VersionedTable.commitBatch(
      Seq((9L, "z")).toDF("k", "v"), dir, "w2").isEmpty)
    // idempotent: purging again rewrites clean snapshots to themselves
    VersionedTable.purge(spark, dir, col("k") === 1L)
    assert(VersionedTable.read(spark, dir).count() == 2)
  }

  test("merge upsert: update matched, insert unmatched, delete on condition, pass-through") {
    import graft.warehouse.Merge
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val src = Seq((2L, "B", 99.0), (4L, "d", 40.0), (3L, "die", 0.0))
      .toDF("k", "v", "x")
    val out = Merge.mergeUpsert(base, src, Seq("k"),
        deleteCond = Some(col("v") === "die"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(out == Seq(
      (1L, "a", 10.0),   // untouched base row passes through
      (2L, "B", 99.0),   // matched -> source wins
      (4L, "d", 40.0)))  // unmatched source -> insert; k=3 deleted

    // NULL delete predicate keeps the row (DELETE only on definite TRUE)
    val src2 = Seq((1L, null.asInstanceOf[String], 11.0)).toDF("k", "v", "x")
    val out2 = Merge.mergeUpsert(base, src2, Seq("k"),
        deleteCond = Some(col("v") === "die"))
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(out2 == Seq(1L, 2L, 3L))

    // duplicate source keys rejected loudly
    val e = intercept[IllegalArgumentException] {
      Merge.mergeUpsert(base,
        Seq((2L, "x", 1.0), (2L, "y", 2.0)).toDF("k", "v", "x"), Seq("k"))
    }
    assert(e.getMessage.contains("more than once"))

    // NULL keys never match (SQL MERGE ON NULL = NULL is not TRUE):
    // a NULL-key base row passes through UNtouched, a NULL-key source
    // row INSERTS (it can never be an update), and two NULL-key source
    // rows are two inserts, not a rejected double-update
    val baseN = Seq((java.lang.Long.valueOf(1L), "a", 10.0),
      (null.asInstanceOf[java.lang.Long], "nb", 20.0)).toDF("k", "v", "x")
    val srcN = Seq((null.asInstanceOf[java.lang.Long], "ns1", 1.0),
      (null.asInstanceOf[java.lang.Long], "ns2", 2.0),
      (java.lang.Long.valueOf(1L), "A", 11.0)).toDF("k", "v", "x")
    val outN = Merge.mergeUpsert(baseN, srcN, Seq("k"),
        deleteCond = Some(col("v") === "die"))
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(outN == Set((Some(1L), "A"), (None, "nb"),
      (None, "ns1"), (None, "ns2")),
      s"NULL-key rows must pass through / insert, got $outN")

    // mergeCommit: versioned — pre-merge state stays time travelable
    val dir = java.nio.file.Files.createTempDirectory("graft_merge").toString
    VersionedTable.commit(base, dir)
    Merge.mergeCommit(spark, dir, src, Seq("k"),
      deleteCond = Some(col("v") === "die"))
    assert(VersionedTable.read(spark, dir).count() == 3)
    assert(VersionedTable.read(spark, dir, asOf = Some(0L)).count() == 3)
    assert(VersionedTable.read(spark, dir).filter(col("k") === 3L).isEmpty)
    assert(!VersionedTable.read(spark, dir, asOf = Some(0L))
      .filter(col("k") === 3L).isEmpty)
  }

  test("purge keeps rows where the predicate is NULL (SQL DELETE semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_purgenull").toString
    // nullable email column: the purge predicate evaluates to NULL on
    // the null-email rows — those rows must SURVIVE, exactly like
    // DELETE WHERE email = '...' would keep them
    VersionedTable.commit(Seq((1L, Some("a@x")), (2L, None), (3L, Some("c@x")))
      .toDF("k", "email"), dir)
    VersionedTable.purge(spark, dir, col("email") === "a@x")
    val left = VersionedTable.read(spark, dir).orderBy("k")
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L, 3L),
      s"null-predicate rows must pass through untouched, got $left")
  }

  test("a purge crashed between delete and rename is recovered by the re-run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_purgecrash").toString
    VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    VersionedTable.commit(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir)
    // simulate the crash window on v=0: stage holds the purged copy,
    // live dir already deleted
    val conf = spark.sparkContext.hadoopConfiguration
    val f = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    VersionedTable.read(spark, dir, asOf = Some(0L)).filter(col("k") =!= 1L)
      .write.parquet(s"$dir/_purge_v0")
    f.delete(new org.apache.hadoop.fs.Path(s"$dir/v=0"), true)
    assert(VersionedTable.versions(spark, dir) == Seq(1L), "crash hides v=0")

    VersionedTable.purge(spark, dir, col("k") === 1L)
    assert(VersionedTable.versions(spark, dir) == Seq(0L, 1L),
      "re-run must recover the crashed version")
    Seq(0L, 1L).foreach { v =>
      assert(VersionedTable.read(spark, dir, asOf = Some(v))
        .filter(col("k") === 1L).count() == 0)
    }
    assert(VersionedTable.read(spark, dir, asOf = Some(0L)).count() == 1)
  }
}
