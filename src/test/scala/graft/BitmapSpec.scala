package graft

import org.apache.spark.sql.functions._

import graft.functions.BitmapOps
import graft.ops.SketchStats

class BitmapSpec extends SparkSpec {
  import spark.implicits._

  private def build(vs: Seq[Long]): BitmapOps.LongBitmap = {
    val bm = new BitmapOps.LongBitmap
    vs.foreach(bm.add)
    bm
  }

  test("randomized or/and cardinalities match the Set reference (incl. negatives and container edges)") {
    val rnd = new scala.util.Random(7)
    val edge = Seq(0L, 1L, 65535L, 65536L, 65537L, -1L, -65536L, -65537L,
      Long.MaxValue, Long.MinValue)
    val a = Seq.fill(3000)(rnd.nextLong() % 200000L) ++ edge
    val b = Seq.fill(3000)(rnd.nextLong() % 200000L) ++ edge.take(4)
    val (ba, bb) = (build(a), build(b))
    assert(ba.cardinality == a.toSet.size)
    assert(bb.cardinality == b.toSet.size)
    assert(ba.andCardinality(bb) == (a.toSet & b.toSet).size)
    val or = BitmapOps.deserialize(ba.serialize())
    or.or(bb)
    assert(or.cardinality == (a.toSet | b.toSet).size)
  }

  test("serialization is canonical: any build/merge order yields identical bytes") {
    val vs = (0L until 9000L).map(v => v * 31 % 70000) // crosses the dense threshold
    val shuffled = new scala.util.Random(1).shuffle(vs)
    val whole = build(shuffled)
    val (p1, p2) = shuffled.splitAt(1234)
    val merged = build(p2.reverse)
    merged.or(build(p1))
    assert(java.util.Arrays.equals(whole.serialize(), merged.serialize()))
    // round-trip preserves bytes exactly
    assert(java.util.Arrays.equals(
      BitmapOps.deserialize(whole.serialize()).serialize(), whole.serialize()))
  }

  test("dense containers: > 4096 entries in one block stay exact through serialize and and-count") {
    val dense = (0L until 60000L by 3L)       // 20000 entries, container 0 dense
    val sparse = (0L until 60000L by 999L)
    val (bd, bs) = (build(dense), build(sparse))
    val rt = BitmapOps.deserialize(bd.serialize())
    assert(rt.cardinality == dense.size)
    assert(rt.andCardinality(bs) == (dense.toSet & sparse.toSet).size)
    assert(bs.andCardinality(rt) == (dense.toSet & sparse.toSet).size)
  }

  test("Spark aggregate matches countDistinct under any partitioning") {
    val df = (1L to 5000L).map(i => (i % 7, i % 911)).toDF("g", "id")
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts)
        .groupBy("g").agg(
          BitmapOps.bitmapCount(BitmapOps.bitmapBuild(col("id"))).as("n"))
      val want = df.groupBy("g").agg(countDistinct(col("id")).as("n"))
      assert(got.orderBy("g").collect().toSeq ==
        want.orderBy("g").collect().toSeq)
    }
  }

  test("segment lifecycle: append x3 == direct distinct; re-append idempotent; compaction exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bmseg").toString
    val df = (1L to 3000L).map(i => (s"s${i % 3}", i % 500)).toDF("src", "id")
    (0 to 2).foreach { k =>
      SketchStats.appendBitmapBatch(
        df.filter(col("id") % 3 === k), "id", dir, s"b$k", Seq("src"))
    }
    val want = df.groupBy("src").agg(countDistinct(col("id")).as("n_distinct"))
      .orderBy("src").collect().toSeq
    assert(SketchStats.bitmapDistinct(spark, dir, Seq("src"))
      .orderBy("src").collect().toSeq == want)
    // re-delivered batch overwrites, count unchanged (idempotent by value)
    SketchStats.appendBitmapBatch(
      df.filter(col("id") % 3 === 1), "id", dir, "b1", Seq("src"))
    assert(SketchStats.bitmapDistinct(spark, dir, Seq("src"))
      .orderBy("src").collect().toSeq == want)
    // compaction: serving state byte-identical, one segment left
    val before = spark.read.parquet(dir).groupBy("src")
      .agg(BitmapOps.bitmapMerge(col("bitmap")).as("bm"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    SketchStats.compactBitmap(spark, dir, Seq("src"))
    assert(SketchStats.bitmapDistinct(spark, dir, Seq("src"))
      .orderBy("src").collect().toSeq == want)
    val after = spark.read.parquet(dir)
      .collect().map(r => r.getAs[String]("src") -> r.getAs[Array[Byte]]("bitmap")).toMap
    assert(before.keySet == after.keySet)
    before.keys.foreach { k =>
      assert(java.util.Arrays.equals(before(k), after(k)),
        s"compacted bitmap for $k must be byte-identical to the pre-merge union")
    }
  }

  test("interpreted and codegen paths agree on the scalar counts") {
    val df = (1L to 2000L).map(i => (i % 2, i % 300)).toDF("g", "id")
      .groupBy("g").agg(BitmapOps.bitmapBuild(col("id")).as("bm"))
    val withCounts = df.select(col("g"),
      BitmapOps.bitmapCount(col("bm")).as("n"),
      BitmapOps.bitmapAndCount(col("bm"), col("bm")).as("self_and"))
    val rows = withCounts.orderBy("g").collect()
    // both groups contain ids {0..299} with both parities -> 150 each? no:
    // g = i%2, id = i%300; for g=0 ids are even residues + odd ones where
    // i%300 parity differs from i%2 only when 300 | wraps — compute via ref
    val ref = (1L to 2000L).map(i => (i % 2, i % 300))
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).distinct.size }
    rows.foreach { r =>
      assert(r.getLong(1) == ref(r.getLong(0)).toLong)
      assert(r.getLong(2) == r.getLong(1), "self-intersection = cardinality")
    }
  }
}
