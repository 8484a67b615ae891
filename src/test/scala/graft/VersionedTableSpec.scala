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
}
