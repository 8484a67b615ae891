package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextDedup
import graft.streaming.Streaming

/** The streaming incremental-dedup loop against its batch ground truth:
  * stream the corpus in waves and the emitted pairs must equal running
  * the persisted-index probe batch-by-batch, with the index growing
  * monotonically and micro-batch retries leaving no duplicates.
  */
class StreamingDedupSpec extends SparkSpec {

  test("streamed waves emit exactly the batch-by-batch probe pairs; index grows; retries idempotent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val waves = (0 until 3).map(k => docs.filter(col("doc_id") % 3 === k))
    val work = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val raw = s"$work/raw"; val idx = s"$work/idx"
    val pairsDir = s"$work/pairs"; val ckpt = s"$work/ckpt"

    // one checkpoint across all runs: each restart resumes file-source
    // offsets, so run k sees ONLY wave k — the state-resume contract
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(raw)
      val q = Streaming.incrementalDedupStream(stream, idx, pairsDir, ckpt)
      assert(q.awaitTermination(180000), "streaming batch did not finish in time")
    }
    var expectIndexRows = 0L
    waves.zipWithIndex.foreach { case (w, k) =>
      w.write.mode("append").parquet(raw)
      run()
      expectIndexRows += w.count()
      val idxRows = TextDedup.readMinhashIndex(spark, idx)
      assert(idxRows.count() == expectIndexRows,
        s"after wave $k the index must hold every ingested signature")
      assert(idxRows.select("id").distinct().count() == expectIndexRows,
        "index ids stay unique across appends")
    }

    // ground truth: the same probe run batch-by-batch directly
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_new", "id_old").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = (1 until 3).flatMap { k =>
      val prior = waves.take(k).reduce(_ unionByName _)
      pairSet(TextDedup.incrementalNearDups(waves(k),
        TextDedup.minhashSignatures(prior, "text", "doc_id"), "text", "doc_id"))
        .map { case (n, o) => (k.toLong, n, o) }
    }.toSet
    val streamed = spark.read.parquet(pairsDir)
      .select(col("batch").cast("long"), col("id_new"), col("id_old")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct.nonEmpty, "waves must collide for the test to mean anything")
    assert(streamed == direct,
      s"stream pairs must equal batch-by-batch probes; " +
        s"extra=${(streamed -- direct).take(3)} missing=${(direct -- streamed).take(3)}")

    // a retried micro-batch (same batch id) must replace, not duplicate:
    // re-append wave 2's signatures under its original batch id
    TextDedup.appendMinhashIndexBatch(waves(2), "text", "doc_id", idx, 2L)
    val after = TextDedup.readMinhashIndex(spark, idx)
    assert(after.count() == expectIndexRows, "retried append must not grow the index")
    // and the index stays probe-able (no duplicate-id rejection)
    TextDedup.incrementalNearDups(
      docs.filter(col("doc_id") === 1L), after, "text", "doc_id").count()
  }

  test("retry after a crash between index append and commit emits no intra-batch pairs") {
    // the crash window: attempt 1 of batch k appended its signatures to
    // the index, then died before the streaming commit. The retry re-runs
    // batch k with its OWN signatures already in the index; the probe
    // must exclude batch=k or it emits spurious intra-batch pairs.
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val waves = (0 until 2).map(k => docs.filter(col("doc_id") % 2 === k))
    val work = java.nio.file.Files.createTempDirectory("graft_sretry").toString
    val raw = s"$work/raw"; val idx = s"$work/idx"
    val pairsDir = s"$work/pairs"; val ckpt = s"$work/ckpt"
    def run(): Unit = {
      val stream = spark.readStream.schema(docs.schema).parquet(raw)
      val q = Streaming.incrementalDedupStream(stream, idx, pairsDir, ckpt)
      assert(q.awaitTermination(180000), "streaming batch did not finish in time")
    }
    waves(0).write.mode("append").parquet(raw)
    run() // batch 0 seeds the index
    // simulate attempt 1 of batch 1 crashing AFTER its append
    TextDedup.appendMinhashIndexBatch(waves(1), "text", "doc_id", idx, 1L)
    waves(1).write.mode("append").parquet(raw)
    run() // the "retry" — must probe only batch 0's signatures
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_new", "id_old").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairSet(spark.read.parquet(s"$pairsDir/batch=1"))
    val direct = pairSet(TextDedup.incrementalNearDups(waves(1),
      TextDedup.minhashSignatures(waves(0), "text", "doc_id"), "text", "doc_id"))
    assert(direct.nonEmpty, "waves must collide for the test to mean anything")
    assert(streamed == direct,
      s"retry must ignore its own pre-appended signatures; " +
        s"extra=${(streamed -- direct).take(3)}")
    // vector twin, same crash window
    import graft.ops.VectorSim
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val vwaves = (0 until 2).map(k => emb.filter(col("vec_id") % 2 === k))
    val vwork = java.nio.file.Files.createTempDirectory("graft_svretry").toString
    def vrun(): Unit = {
      val stream = spark.readStream.schema(emb.schema).parquet(s"$vwork/raw")
      val q = Streaming.incrementalVectorDedupStream(stream, s"$vwork/idx",
        s"$vwork/pairs", s"$vwork/ckpt", threshold = 0.25)
      assert(q.awaitTermination(180000), "streaming batch did not finish in time")
    }
    vwaves(0).write.mode("append").parquet(s"$vwork/raw")
    vrun()
    VectorSim.appendSignIndexBatch(vwaves(1), "vec_id", "embedding", s"$vwork/idx", 1L)
    vwaves(1).write.mode("append").parquet(s"$vwork/raw")
    vrun()
    val vStreamed = pairSet(spark.read.parquet(s"$vwork/pairs/batch=1"))
    val vDirect = pairSet(VectorSim.incrementalCosineNearDups(vwaves(1),
      VectorSim.signIndex(vwaves(0), "vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.25, probeBits = 1))
    assert(vDirect.nonEmpty)
    assert(vStreamed == vDirect,
      s"vector retry must ignore its own pre-appended signatures; " +
        s"extra=${(vStreamed -- vDirect).take(3)}")
  }

  test("vector twin: streamed waves emit the batch-by-batch cosine probe pairs; index grows") {
    import graft.ops.VectorSim
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select("vec_id", "embedding")
    val waves = (0 until 3).map(k => emb.filter(col("vec_id") % 3 === k))
    val work = java.nio.file.Files.createTempDirectory("graft_svdedup").toString
    val raw = s"$work/raw"; val idx = s"$work/idx"
    val pairsDir = s"$work/pairs"; val ckpt = s"$work/ckpt"

    def run(): Unit = {
      val stream = spark.readStream.schema(emb.schema).parquet(raw)
      val q = Streaming.incrementalVectorDedupStream(stream, idx, pairsDir, ckpt,
        threshold = 0.25)
      assert(q.awaitTermination(180000), "streaming batch did not finish in time")
    }
    var expectIndexRows = 0L
    waves.zipWithIndex.foreach { case (w, k) =>
      w.write.mode("append").parquet(raw)
      run()
      expectIndexRows += w.count()
      val idxRows = VectorSim.readSignIndex(spark, idx)
      assert(idxRows.count() == expectIndexRows,
        s"after wave $k the index must hold every ingested signature")
      assert(idxRows.select("id").distinct().count() == expectIndexRows,
        "index ids stay unique across appends")
    }

    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id_new", "id_old").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = (1 until 3).flatMap { k =>
      val prior = waves.take(k).reduce(_ unionByName _)
      pairSet(VectorSim.incrementalCosineNearDups(waves(k),
        VectorSim.signIndex(prior, "vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.25, probeBits = 1))
        .map { case (n, o) => (k.toLong, n, o) }
    }.toSet
    val streamed = spark.read.parquet(pairsDir)
      .select(col("batch").cast("long"), col("id_new"), col("id_old")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(direct.nonEmpty, "waves must collide for the test to mean anything")
    assert(streamed == direct,
      s"stream pairs must equal batch-by-batch probes; " +
        s"extra=${(streamed -- direct).take(3)} missing=${(direct -- streamed).take(3)}")
  }
}
