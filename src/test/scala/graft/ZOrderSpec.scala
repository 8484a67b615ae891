package graft

import org.apache.spark.sql.functions._
import graft.warehouse.ZOrder

/** Z-order layout: Morton interleave exactness and the measurable
  * skipping contract — a multi-dimensional predicate over the z-ordered
  * layout must touch a fraction of the files an arrival-order layout
  * forces a scan to touch.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave matches hand-computed bit positions") {
    // x=3 (11), y=1 (01), bits=2: bit b of col i -> position b*2+i
    // positions: x0->0, y0->1, x1->2, y1->3 => 0b0111 = 7
    val z = Seq((3L, 1L)).toDF("x", "y")
      .select(ZOrder.morton(Seq(col("x"), col("y")), 2).as("z"))
      .head.getLong(0)
    assert(z == 7L, s"z=$z")
    // identity on a single bit: x=1,y=0 -> 1; x=0,y=1 -> 2
    val z2 = Seq((1L, 0L), (0L, 1L)).toDF("x", "y")
      .select(ZOrder.morton(Seq(col("x"), col("y")), 1).as("z"))
      .collect().map(_.getLong(0)).toList
    assert(z2 == List(1L, 2L))
  }

  test("z-ordered layout prunes a band predicate to a fraction of the files") {
    // 128x128 grid in shuffled arrival order
    val grid = spark.range(128L * 128L)
      .select((col("id") % 128).as("x"),
        floor(col("id") / 128).cast("long").as("y"), col("id"))
      .orderBy(xxhash64(col("id"))) // arrival order: uncorrelated with x,y
    val work = java.nio.file.Files.createTempDirectory("graft_zord").toString
    val plain = s"$work/plain"; val zdir = s"$work/z"
    grid.repartition(16).write.parquet(plain) // 16 arrival-order files
    ZOrder.writeZOrdered(grid, zdir, Seq("x", "y"), bits = 7, targetFiles = 16)

    // same content, either direction
    val a = spark.read.parquet(plain); val b = spark.read.parquet(zdir)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)

    def touched(dir: String, pred: org.apache.spark.sql.Row => Boolean): Int =
      ZOrder.fileSpans(spark, dir, Seq("x", "y")).collect().count(pred)
    // band predicate x in [0, 7]: a file can be skipped iff its x-span
    // misses the band entirely
    def hitsBand(r: org.apache.spark.sql.Row) =
      r.getLong(1) <= 7L && r.getLong(2) >= 0L // min_x <= 7 && max_x >= 0
    val plainTouched = touched(plain, hitsBand)
    val zTouched = touched(zdir, hitsBand)
    assert(plainTouched == 16,
      s"arrival order leaves every file spanning all x: touched=$plainTouched")
    assert(zTouched * 2 <= plainTouched,
      s"z-order must at least halve the touched files, got $zTouched/$plainTouched")

    // point predicate (x=5, y=5): both dims narrow simultaneously —
    // the property one-column sorting cannot give
    def hitsPoint(r: org.apache.spark.sql.Row) =
      r.getLong(1) <= 5L && r.getLong(2) >= 5L &&
        r.getLong(3) <= 5L && r.getLong(4) >= 5L
    assert(touched(zdir, hitsPoint) <= 2,
      "a point lookup over the z layout touches at most a couple of files")
  }

  test("date columns z-order through their epoch day (no DATE->DOUBLE cast error)") {
    val df = spark.range(256)
      .select(col("id"),
        date_add(lit(java.sql.Date.valueOf("2026-01-01")),
          (col("id") % 64).cast("int")).as("d"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zdate").toString + "/t"
    ZOrder.writeZOrdered(df, dir, Seq("d", "id"), bits = 5, targetFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 256)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }
}
