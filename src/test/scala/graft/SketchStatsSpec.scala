package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SketchStats

/** Persisted mergeable HLL sketches: batch-merged serving vs single-pass
  * sketches vs exact counts, retry idempotence, and the frozen-lgK gate.
  */
class SketchStatsSpec extends SparkSpec {

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("merged per-batch estimate tracks exact count; idempotent under re-delivery") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val batches = (0 until 3).map(k => docs.filter(pmod(col("doc_id"), lit(3)) === k))
    batches.zipWithIndex.foreach { case (b, k) =>
      SketchStats.appendHllBatch(b, "doc_id", dir, s"b$k")
    }
    val exact = docs.select("doc_id").distinct().count()
    def est() = SketchStats.hllDistinct(spark, dir).head.getLong(0)
    val merged = est()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    // deterministic serving: same sketches, same estimate
    assert(est() == merged)
    // re-delivered batch overwrites its segment: estimate unchanged
    SketchStats.appendHllBatch(batches(1), "doc_id", dir, "b1")
    assert(est() == merged, "retried append must not move the estimate")
    // single-pass sketch over the whole corpus agrees within the bound
    // (union serves the composite estimator, direct build serves HIP —
    // equality is not guaranteed, closeness is)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hll1").toString
    SketchStats.appendHllBatch(docs, "doc_id", dir2, "all")
    val single = SketchStats.hllDistinct(spark, dir2).head.getLong(0)
    assert(math.abs(merged - single).toDouble / exact < 0.05,
      s"merged=$merged single=$single")
  }

  test("grouped estimates track per-group exact counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hllg").toString
    (0 until 2).foreach { k =>
      SketchStats.appendHllBatch(
        docs.filter(pmod(col("doc_id"), lit(2)) === k),
        "doc_id", dir, s"b$k", groupCols = Seq("source"))
    }
    val got = SketchStats.hllDistinct(spark, dir, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (s, n) =>
      assert(math.abs(got(s) - n).toDouble / n.max(1L) < 0.08,
        s"source=$s got=${got(s)} exact=$n")
    }
  }

  test("mixed-lgK segments are rejected loudly, reserved chars too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hllm").toString
    SketchStats.appendHllBatch(docs.limit(50), "doc_id", dir, "b0", lgK = 12)
    SketchStats.appendHllBatch(docs.limit(50), "doc_id", dir, "b1", lgK = 14)
    intercept[IllegalArgumentException] {
      SketchStats.hllDistinct(spark, dir).collect()
    }
    intercept[IllegalArgumentException] {
      SketchStats.appendHllBatch(docs.limit(1), "doc_id", dir, "a=b")
    }
  }
}
