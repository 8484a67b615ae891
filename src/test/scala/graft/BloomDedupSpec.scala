package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BloomExprs
import graft.ops.TextDedup

/** Contracts for the persisted fingerprint-Bloom index and the
  * Bloom-pruned incremental exact dedup path (q101).
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val corpus = docs(
    1L -> "alpha beta gamma", 2L -> "delta epsilon", 3L -> "zeta eta theta",
    4L -> "iota kappa", 5L -> "lambda mu nu", 6L -> "xi omicron pi")
  // 10, 12 duplicate corpus docs (12 modulo whitespace); 11, 13 new;
  // 14 duplicates 13 within the batch
  private val batch = docs(
    10L -> "alpha beta gamma", 11L -> "brand new text",
    12L -> "  delta   epsilon ", 13L -> "another new one",
    14L -> "another new one")

  private def fpIndex(df: DataFrame): DataFrame =
    df.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()

  private def bloomOf(df: DataFrame) =
    df.select(TextDedup.fpProbeKey(col("text")).as("k"))
      .stat.bloomFilter("k", 1000L, 0.01)

  test("bloom-pruned incremental dedup is bit-identical to the exact path") {
    val exact = TextDedup.incrementalExactDedup(batch, fpIndex(corpus),
      "text", "doc_id").orderBy("doc_id").collect().toSeq
    val pruned = TextDedup.bloomPrunedIncrementalExactDedup(batch,
      fpIndex(corpus), bloomOf(corpus), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(pruned == exact)
    assert(pruned.map(_.getLong(0)) == Seq(11L, 13L))
  }

  test("bloom probe has no false negatives over inserted fingerprints") {
    val bloom = bloomOf(corpus)
    val probes = corpus
      .withColumn("hit",
        BloomExprs.bloomMightContain(TextDedup.fpProbeKey(col("text")), bloom))
      .collect()
    assert(probes.forall(_.getBoolean(2)), "an inserted fp probed false")
  }

  test("bloom probe prunes most genuinely-new rows (fpp honored in practice)") {
    val bloom = bloomOf(corpus)
    val novel = docs((1L to 500L).map(i => (1000L + i) -> s"novel doc number $i"): _*)
    val admitted = novel
      .filter(BloomExprs.bloomMightContain(TextDedup.fpProbeKey(col("text")), bloom))
      .count()
    assert(admitted <= 25, s"bloom admitted $admitted of 500 novel docs (fpp=0.01)")
  }

  test("segments round-trip through parquet and OR-merge to the union") {
    val dir = Files.createTempDirectory("graft-bloom").toString
    TextDedup.writeFpBloomSegment(corpus.filter($"doc_id" <= 3), "text",
      dir, segKey = "b0", expectedItems = 1000L)
    TextDedup.writeFpBloomSegment(corpus.filter($"doc_id" > 3), "text",
      dir, segKey = "b1", expectedItems = 1000L)
    val merged = TextDedup.readFpBloom(spark, dir)
    val pruned = TextDedup.bloomPrunedIncrementalExactDedup(batch,
      fpIndex(corpus), merged, "text", "doc_id")
      .orderBy("doc_id").select("doc_id").as[Long].collect().toSeq
    assert(pruned == Seq(11L, 13L))
  }

  test("segment write is idempotent under retries (overwrite, not append)") {
    val dir = Files.createTempDirectory("graft-bloom-retry").toString
    TextDedup.writeFpBloomSegment(corpus, "text", dir, "b0", 1000L)
    TextDedup.writeFpBloomSegment(corpus, "text", dir, "b0", 1000L) // retry
    assert(spark.read.parquet(dir).count() == 1L)
    val bloom = TextDedup.readFpBloom(spark, dir)
    val hits = corpus.filter(
      BloomExprs.bloomMightContain(TextDedup.fpProbeKey(col("text")), bloom)).count()
    assert(hits == corpus.count())
  }

  test("mismatched segment geometry fails loudly at read time") {
    val dir = Files.createTempDirectory("graft-bloom-geom").toString
    TextDedup.writeFpBloomSegment(corpus, "text", dir, "b0", 1000L)
    TextDedup.writeFpBloomSegment(corpus, "text", dir, "b1", 2000L)
    val e = intercept[IllegalArgumentException] {
      TextDedup.readFpBloom(spark, dir)
    }
    assert(e.getMessage.contains("incompatible Bloom segment geometries"))
  }

  test("bloom bytes are deterministic across builds (merge-order-free bits)") {
    val a = bloomOf(corpus.repartition(4))
    val b = bloomOf(corpus.repartition(1))
    val (oa, ob) = (new java.io.ByteArrayOutputStream(), new java.io.ByteArrayOutputStream())
    a.writeTo(oa); b.writeTo(ob)
    assert(java.util.Arrays.equals(oa.toByteArray, ob.toByteArray))
  }
}
