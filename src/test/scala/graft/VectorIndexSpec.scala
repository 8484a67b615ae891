package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.VectorSim

/** Contracts for the persisted sign-bucket index and the incremental
  * embedding near-dup probe (q80) — the vector twins of the MinHash
  * index contracts in CorpusOpsSpec.
  */
class VectorIndexSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"

  private def crossPairs(df: org.apache.spark.sql.DataFrame,
      aCol: String, bCol: String): Set[(Long, Long)] =
    df.select(aCol, bCol).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet

  test("q80: incremental probe equals cosineNearDups restricted to (new, old)") {
    val emb = Tables.embeddings(spark, sf001)
    val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val fresh = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    for (probeBits <- Seq(0, 1)) {
      val inc = crossPairs(VectorSim.incrementalCosineNearDups(
        fresh, VectorSim.signIndex(old, "vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.25, probeBits = probeBits),
        "id_new", "id_old")
      // direct: whole-corpus pairs, keep only (new, old) cross pairs.
      // The close-table test popcount(xor) <= probeBits is symmetric, so
      // probing from the new side emits exactly the cross slice of the
      // whole-corpus run.
      val isNew = (id: Long) => id % 5 == 0
      val direct = crossPairs(VectorSim.cosineNearDups(emb, "vec_id", "embedding",
        threshold = 0.25, probeBits = probeBits), "id_a", "id_b")
        .filter { case (a, b) => isNew(a) != isNew(b) }
      assert(inc == direct,
        s"probeBits=$probeBits: incremental != direct cross slice " +
          s"(${(inc -- direct).take(3)} extra, ${(direct -- inc).take(3)} missing)")
      assert(inc.nonEmpty, "trivially-empty batch equivalence proves nothing")
    }
  }

  test("q80: emitted pairs are exact-verified and recall >= 0.9 at cosine 0.5") {
    // threshold 0.5: the SAME operating point q42's recall contract
    // measures (at the q80 analysis threshold 0.25, LSH recall is ~0.87
    // by design — soundness still holds and the batch-equivalence test
    // covers that regime). The driver embeddings have no true near-dups
    // (max pairwise cosine ~0.48), so plant NEW-side (id % 5 = 0)
    // jittered copies of OLD-side vectors: every planted pair lands in
    // the cross (new, old) slice the incremental probe emits.
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val rnd = new scala.util.Random(4321)
    val planted = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0).limit(100)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getSeq[Float](1).toArray
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val c = 0.5 + 0.45 * (i % 10) / 9.0 // target cosines 0.5 .. 0.95
        val sigma = norm * math.sqrt(1.0 / (c * c) - 1.0) / math.sqrt(v.length.toDouble)
        (100000L + 5L * i,
          v.map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq)
      }.toSeq.toDF("vec_id", "embedding")
    val aug = emb.union(planted)
    val old = aug.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val fresh = aug.filter(pmod(col("vec_id"), lit(5)) === 0)
    val truth = crossPairs(VectorSim.exactCosinePairs(aug, "vec_id", "embedding",
      threshold = 0.5), "id_a", "id_b")
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
    assert(truth.size >= 80, s"planting failed: only ${truth.size} true cross pairs")
    val got = crossPairs(VectorSim.incrementalCosineNearDups(
      fresh, VectorSim.signIndex(old, "vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.5, probeBits = 1),
      "id_new", "id_old")
    assert(got.subsetOf(truth), s"${(got -- truth).take(5)} not exact-verified")
    val recall = got.size.toDouble / truth.size
    info(f"q80 incremental cosine recall vs exact@0.5: $recall%.4f (${got.size}/${truth.size})")
    assert(recall >= 0.9, f"recall $recall%.4f below contract 0.9")
  }

  test("index round-trip: persisted index probes like the in-memory one; retries idempotent") {
    val emb = Tables.embeddings(spark, sf001)
    val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val fresh = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("signidx").toString
    val b0 = old.filter(col("vec_id") < 250)
    val b1 = old.filter(col("vec_id") >= 250)
    VectorSim.appendSignIndexBatch(b0, "vec_id", "embedding", dir, batchId = 0)
    VectorSim.appendSignIndexBatch(b1, "vec_id", "embedding", dir, batchId = 1)
    // a RETRIED append overwrites its own batch dir instead of duplicating
    VectorSim.appendSignIndexBatch(b1, "vec_id", "embedding", dir, batchId = 1)
    val persisted = VectorSim.readSignIndex(spark, dir)
    assert(persisted.count() == old.count(), "retry must not duplicate rows")
    val viaFile = crossPairs(VectorSim.incrementalCosineNearDups(
      fresh, persisted, "vec_id", "embedding", threshold = 0.25, probeBits = 1),
      "id_new", "id_old")
    val viaMem = crossPairs(VectorSim.incrementalCosineNearDups(
      fresh, VectorSim.signIndex(old, "vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.25, probeBits = 1),
      "id_new", "id_old")
    assert(viaFile == viaMem, "persisted and in-memory index must probe identically")
  }

  test("IVF batch appends: frozen quantizer, pruning preserved, retries idempotent") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val base = emb.filter(col("vec_id") < 300)
    val restA = emb.filter(col("vec_id") >= 300 && col("vec_id") < 400)
    val restB = emb.filter(col("vec_id") >= 400)
    val queries = emb.filter(col("vec_id") < 8)
    def probe(path: String) = VectorSim.cosineTopKIvfIndexed(
      queries, path, "vec_id", "embedding", 3, nprobe = 8)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).sorted.toSeq

    // one append vs the same rows split across two appends: the batch
    // layout must not affect semantics (cells come from the FROZEN
    // persisted centroids, not from what happens to share a batch)
    val p1 = java.nio.file.Files.createTempDirectory("ivf1").toString
    VectorSim.writeIvfIndex(base, "vec_id", "embedding", p1, numCells = 16)
    VectorSim.appendIvfIndexBatch(restA.unionByName(restB), "vec_id", "embedding", p1, 1L)
    val p2 = java.nio.file.Files.createTempDirectory("ivf2").toString
    VectorSim.writeIvfIndex(base, "vec_id", "embedding", p2, numCells = 16)
    VectorSim.appendIvfIndexBatch(restA, "vec_id", "embedding", p2, 1L)
    VectorSim.appendIvfIndexBatch(restB, "vec_id", "embedding", p2, 2L)
    // a retried append overwrites its own batch dir instead of duplicating
    VectorSim.appendIvfIndexBatch(restB, "vec_id", "embedding", p2, 2L)
    assert(spark.read.parquet(s"$p2/data").count() == emb.count(),
      "retry must not duplicate index rows")
    assert(keyed(probe(p1)) == keyed(probe(p2)),
      "batch layout changed probe results")

    // appended vectors are actually found: an identical copy of query 0's
    // vector appended later must probe back as its top-1 neighbor
    val twin = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    VectorSim.appendIvfIndexBatch(twin, "vec_id", "embedding", p2, 3L)
    val top = probe(p2).filter(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").collect()
    assert(top.head.getLong(0) == 900000L,
      s"appended identical twin must rank first, got ${top.head.getLong(0)}")

    // the probe read keeps partition pruning across batch directories
    val plan = probe(p2).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "probe read lost partition pruning after batch appends:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("PQ persisted index: indexed IVFADC equals in-memory; frozen-quantizer appends; pruned") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).sorted.toSeq

    // whole-corpus index: same deterministic quantizer training as the
    // in-memory operator -> identical cells, codes, shortlists, ranking
    val p1 = java.nio.file.Files.createTempDirectory("pq1").toString
    VectorSim.writePqIndex(emb, "vec_id", "embedding", p1)
    val indexed = VectorSim.cosineTopKPqIndexed(
      queries, p1, "vec_id", "embedding", 3)
    assert(keyed(indexed) == keyed(VectorSim.cosineTopKPq(
      queries, emb, "vec_id", "embedding", 3)),
      "persisted-index IVFADC must reproduce the in-memory result")

    // appended vectors are encoded with the FROZEN persisted quantizers
    // and actually found: an identical twin of query 0 ranks first
    val base = emb.filter(col("vec_id") < 400)
    val rest = emb.filter(col("vec_id") >= 400)
    val p2 = java.nio.file.Files.createTempDirectory("pq2").toString
    VectorSim.writePqIndex(base, "vec_id", "embedding", p2)
    VectorSim.appendPqIndexBatch(rest, "vec_id", "embedding", p2, 1L)
    VectorSim.appendPqIndexBatch(rest, "vec_id", "embedding", p2, 1L) // retry
    assert(spark.read.parquet(s"$p2/data").count() == emb.count(),
      "retry must not duplicate index rows")
    val twin = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    VectorSim.appendPqIndexBatch(twin, "vec_id", "embedding", p2, 2L)
    val top = VectorSim.cosineTopKPqIndexed(queries, p2, "vec_id", "embedding", 3)
      .filter(col("query_id") === 0 && col("rank") === 1)
      .select("neighbor_id").collect()
    assert(top.head.getLong(0) == 900000L,
      s"appended identical twin must rank first, got ${top.head.getLong(0)}")

    val plan = VectorSim.cosineTopKPqIndexed(queries, p2, "vec_id", "embedding", 3)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "PQ probe read lost partition pruning:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("sign index compaction: one batch=base partition, probes identically, rejects dups") {
    val emb = Tables.embeddings(spark, sf001)
    val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val fresh = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("signcompact").toString
    VectorSim.appendSignIndexBatch(old.filter(col("vec_id") < 250),
      "vec_id", "embedding", dir, batchId = 0)
    VectorSim.appendSignIndexBatch(old.filter(col("vec_id") >= 250),
      "vec_id", "embedding", dir, batchId = 1)
    def probe() = crossPairs(VectorSim.incrementalCosineNearDups(
      fresh, VectorSim.readSignIndex(spark, dir), "vec_id", "embedding",
      threshold = 0.25, probeBits = 1), "id_new", "id_old")
    val before = probe()
    VectorSim.compactSignIndex(spark, dir)
    val parts = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(parts == Set("batch=base"), s"not compacted: $parts")
    assert(!new java.io.File(dir + "_compacting").exists(), "stage dir left behind")
    assert(probe() == before, "compaction changed probe results")
    assert(VectorSim.readSignIndex(spark, dir).count() == old.count())
    // a duplicated id must be rejected, never folded into a clean layout
    VectorSim.appendSignIndexBatchKeyed(old.limit(1), "vec_id", "embedding",
      dir, "dup")
    val ex = intercept[IllegalArgumentException] {
      VectorSim.compactSignIndex(spark, dir)
    }
    assert(ex.getMessage.contains("duplicate id"), ex.getMessage)
  }

  test("IVF/PQ data compaction: one batch=0 layout, probes identically, pruning kept") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 8)
    def keyed(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"))).sorted.toSeq
    def batchDirs(p: String) = new java.io.File(s"$p/data").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet

    val ivf = java.nio.file.Files.createTempDirectory("ivfcompact").toString
    VectorSim.writeIvfIndex(emb.filter(col("vec_id") < 300), "vec_id",
      "embedding", ivf, numCells = 16)
    VectorSim.appendIvfIndexBatch(emb.filter(col("vec_id") >= 300 &&
      col("vec_id") < 400), "vec_id", "embedding", ivf, 1L)
    VectorSim.appendIvfIndexBatch(emb.filter(col("vec_id") >= 400), "vec_id",
      "embedding", ivf, 2L)
    def probeIvf() = keyed(VectorSim.cosineTopKIvfIndexed(
      queries, ivf, "vec_id", "embedding", 3, nprobe = 8))
    val beforeIvf = probeIvf()
    VectorSim.compactVectorIndexData(spark, ivf)
    assert(batchDirs(ivf) == Set("batch=0"), s"IVF not compacted: ${batchDirs(ivf)}")
    assert(probeIvf() == beforeIvf, "IVF compaction changed probe results")
    assert(spark.read.parquet(s"$ivf/data").count() == emb.count())
    val plan = VectorSim.cosineTopKIvfIndexed(queries, ivf, "vec_id",
      "embedding", 3, nprobe = 8).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "compacted IVF read lost partition pruning")

    val pq = java.nio.file.Files.createTempDirectory("pqcompact").toString
    VectorSim.writePqIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", pq)
    VectorSim.appendPqIndexBatch(emb.filter(col("vec_id") >= 400), "vec_id",
      "embedding", pq, 1L)
    def probePq() = keyed(VectorSim.cosineTopKPqIndexed(
      queries, pq, "vec_id", "embedding", 3))
    val beforePq = probePq()
    VectorSim.compactVectorIndexData(spark, pq)
    assert(batchDirs(pq) == Set("batch=0"), s"PQ not compacted: ${batchDirs(pq)}")
    assert(probePq() == beforePq, "PQ compaction changed probe results")
    // duplicate ids across batches are rejected, never laundered. The
    // append path's own gate blocks this corruption, so fabricate it the
    // way it happens in the wild: a batch directory duplicated under a
    // second key (a retry that landed under a NEW id instead of its own)
    spark.read.parquet(s"$pq/data/batch=0").limit(5)
      .write.partitionBy("cell").parquet(s"$pq/data/batch=9")
    val ex = intercept[IllegalArgumentException] {
      VectorSim.compactVectorIndexData(spark, pq)
    }
    assert(ex.getMessage.contains("duplicate id"), ex.getMessage)
  }

  test("per-append drift telemetry: recall on drifted batches holds the 0.9 floor") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    // the shipped drift scenario runs on CLUSTERED embeddings — the
    // regime real corpora live in and the regime the 0.9 serving floor
    // is defined for (the driver's isotropic vectors are IVF's
    // documented adversarial case, floored at 0.7 in RecallContractSpec).
    // 20 tight clusters; each appended batch draws from the same
    // clusters with every CENTER shifted by alpha per component — the
    // gradual distribution creep a frozen quantizer must tolerate
    // between offline retrains.
    val rnd = new scala.util.Random(99)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    def draw(n: Int, offset: Long, alpha: Double) = (0 until n).map { i =>
      val c = centers(i % 20)
      (offset + i,
        c.map(x => (x + alpha + 0.15 * rnd.nextGaussian()).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val base = draw(800, 0L, 0.0)

    val ivf = java.nio.file.Files.createTempDirectory("ivfdrift").toString
    VectorSim.writeIvfIndex(base, "vec_id", "embedding", ivf, numCells = 16,
      sampleN = 800)
    val ivfR = (1 to 2).map { b =>
      val r = VectorSim.appendIvfIndexBatch(draw(100, 10000L * b, 0.05 * b),
        "vec_id", "embedding", ivf, b.toLong, measureRecall = true).get
      info(f"ivf drift batch $b (alpha=${0.05 * b}%.2f): recall@10 = $r%.4f")
      r
    }
    assert(ivfR.forall(_ >= 0.9),
      s"IVF per-append recall fell below the retrain floor: $ivfR")

    // PQ is the full lifecycle story: the codebooks quantize POSITIONS
    // (not just routes), so their error grows with distribution distance
    // much faster than IVF's — mild drift holds the floor, heavy drift
    // must VISIBLY degrade the telemetry (that drop below the floor IS
    // the retrain trigger), and retraining restores it.
    val pq = java.nio.file.Files.createTempDirectory("pqdrift").toString
    VectorSim.writePqIndex(base, "vec_id", "embedding", pq, sampleN = 800)
    val r1 = VectorSim.appendPqIndexBatch(draw(100, 10000L, 0.05),
      "vec_id", "embedding", pq, 1L, measureRecall = true).get
    info(f"pq mild drift (alpha=0.05): recall@10 = $r1%.4f")
    assert(r1 >= 0.9, f"PQ recall $r1%.4f under mild drift broke the floor")
    val r2 = VectorSim.appendPqIndexBatch(draw(100, 20000L, 0.10),
      "vec_id", "embedding", pq, 2L, measureRecall = true).get
    info(f"pq heavy drift (alpha=0.10): recall@10 = $r2%.4f — retrain trigger")
    assert(r2 < r1,
      f"telemetry must surface codebook drift: batch2 $r2%.4f !< batch1 $r1%.4f")
    // retrain on the CURRENT regime — the drifted batches, i.e. the
    // distribution the corpus has moved to (writePqIndex re-reads its own
    // data dir safely via the temp+swap). A fresh same-regime batch then
    // holds the floor again with the refreshed quantizers.
    VectorSim.writePqIndex(
      spark.read.parquet(s"$pq/data").select("vec_id", "embedding")
        .filter(col("vec_id") >= 10000L),
      "vec_id", "embedding", pq, sampleN = 1000)
    val r3 = VectorSim.appendPqIndexBatch(draw(100, 30000L, 0.10),
      "vec_id", "embedding", pq, 1L, measureRecall = true).get
    info(f"pq post-retrain (alpha=0.10): recall@10 = $r3%.4f")
    assert(r3 >= 0.9, f"retrain must restore the floor, got $r3%.4f")

    // sign index: a threshold-pair surface needs true pairs to measure,
    // so the drifted batch carries jittered twins of indexed vectors
    // (the q80 recall recipe) — target cosines 0.5..0.95 at threshold 0.5
    val jrnd = new scala.util.Random(4321)
    val twins = emb.filter(col("vec_id") < 300).limit(100)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getSeq[Float](1).toArray
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val c = 0.5 + 0.45 * (i % 10) / 9.0
        val sigma = norm * math.sqrt(1.0 / (c * c) - 1.0) /
          math.sqrt(v.length.toDouble)
        (50000L + i,
          v.map(x => (x + 0.01f + (sigma * jrnd.nextGaussian()).toFloat)))
      }.toSeq.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val sign = java.nio.file.Files.createTempDirectory("signdrift").toString
    VectorSim.appendSignIndexBatch(emb.filter(col("vec_id") < 300),
      "vec_id", "embedding", sign, batchId = 0)
    val sr = VectorSim.appendSignIndexBatch(twins, "vec_id", "embedding",
      sign, batchId = 1, measureRecall = true, recallThreshold = 0.5,
      recallSample = 100).get
    info(f"sign drift batch (jittered twins): pair recall@0.5 = $sr%.4f")
    assert(sr >= 0.9, f"sign per-append recall $sr%.4f below the retrain floor")
  }

  test("params-mismatched index is rejected; duplicate ids are rejected; empty index yields empty") {
    val emb = Tables.embeddings(spark, sf001)
    val old = emb.filter(pmod(col("vec_id"), lit(5)) =!= 0)
    val fresh = emb.filter(pmod(col("vec_id"), lit(5)) === 0)
    val dir = java.nio.file.Files.createTempDirectory("signidx").toString
    VectorSim.writeSignIndex(old, "vec_id", "embedding", dir, numTables = 4)
    val idx = VectorSim.readSignIndex(spark, dir)
    val e = intercept[IllegalArgumentException] {
      VectorSim.incrementalCosineNearDups(fresh, idx, "vec_id", "embedding",
        threshold = 0.25, numTables = 8)
    }
    assert(e.getMessage.contains("numTables=4"))

    val dup = intercept[IllegalArgumentException] {
      VectorSim.incrementalCosineNearDups(fresh,
        VectorSim.signIndex(old.union(old.limit(1)), "vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.25)
    }
    assert(dup.getMessage.contains("duplicate id"))

    val empty = VectorSim.incrementalCosineNearDups(fresh,
      VectorSim.signIndex(old.limit(0), "vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.25)
    assert(empty.count() == 0, "empty index (first ingest) must probe to empty")
  }

  test("semDedup == in-memory reference (cells + upper-triangular prune); clones dropped") {
    val emb = Tables.embeddings(spark, sf001)
    val numCells = 8; val threshold = 0.35
    // plant an exact clone of the lowest-id vector under a higher id:
    // same vector => same argmax cell, cosine 1.0 => must be dropped
    val first = emb.orderBy("vec_id").limit(1)
      .collect()(0)
    val clone = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(999999L, first.getSeq[Float](1), 0)),
      emb.schema)
    val corpus = emb.unionByName(clone)

    val got = VectorSim.semDedup(corpus, "vec_id", "embedding",
      numCells, threshold).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(!got.contains(999999L), "planted clone must be pruned")
    assert(got.contains(first.getLong(0)), "the lower-id original survives")

    // reference: take the CELL assignment from the shared (already
    // IVF-contract-tested) kernel, then independently re-apply the prune
    // rule in memory — drop iff a lower-id cell-mate clears the threshold
    val cents = VectorSim.trainIvfCentroids(corpus, "vec_id", "embedding",
      numCells)
    val rows = corpus.select(col("vec_id"), col("embedding"),
        element_at(graft.functions.IvfExprs.nearestCentroids(
          col("embedding"), cents, 1), 1).as("cell"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
      .sortBy(_._1)
    def dot(a: Array[Float], b: Array[Float]): Double =
      a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
    val byCell = rows.groupBy(_._3)
    val refSurvivors = byCell.toSeq.flatMap { case (cell, members) =>
      val sorted = members.sortBy(_._1)
      sorted.filter { case (id, v, _) =>
        val nv = math.sqrt(dot(v, v))
        !sorted.exists { case (id2, v2, _) =>
          id2 < id && dot(v, v2) / (nv * math.sqrt(dot(v2, v2))) >= threshold
        }
      }.map(m => m._1 -> cell)
    }.toMap
    assert(got == refSurvivors,
      s"diverges on ${(got.keySet diff refSurvivors.keySet) ++
        (refSurvivors.keySet diff got.keySet)}")
  }

  test("q139: MMR demotes the redundant twin below the diverse candidate") {
    import spark.implicits._
    import graft.ops.VectorSim
    // query along e0. Candidates: 10/11 near-twins hugging e0
    // (rel ≈ .995/.994, mutual sim ≈ .99996), 12 diverse (rel = .6,
    // sim to twins ≈ .6), 13 anti-relevant filler (rel ≈ -.196).
    // λ=0.5 after picking 10: score(11) ≈ -.003 < score(13) ≈ -.098
    // < score(12) ≈ .0015 → the diverse 12 leapfrogs the redundant
    // twin; round 3 takes 11 back over the negative-relevance filler.
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f)
      parts.foreach { case (i, x) => a(i) = x }
      a
    }
    val corpus = Seq(
      (10L, v(0 -> 1.0f, 1 -> 0.1f)),
      (11L, v(0 -> 1.0f, 1 -> 0.11f)),
      (12L, v(2 -> 1.0f, 0 -> 0.75f)),
      (13L, v(3 -> 1.0f, 0 -> -0.2f))
    ).toDF("vec_id", "embedding")
    val q = Seq((0L, v(0 -> 1.0f))).toDF("vec_id", "embedding")
    val got = VectorSim.mmrRerank(q, corpus, "vec_id", "embedding",
        topN = 4, k = 3, lam = 0.5)
      .orderBy("mmr_rank")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toList
    // rank 1: twin 10 (highest rel); rank 2: diverse 12 (twin 11's
    // redundancy penalty sinks it); rank 3: twin 11 over filler 13
    assert(got.map(_._1) == List(10L, 12L, 11L), got.toString)
    // and relevance-only ordering would have been 10, 11, 12 — assert
    // the contrast so the test actually pins the diversification
    val rel = VectorSim.cosineTopK(q, corpus, "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(_.getLong(1)).toList
    assert(rel == List(10L, 11L, 12L), rel.toString)
  }

  test("q139: lam=1 degenerates to pure relevance order; k bounds enforced") {
    import spark.implicits._
    import graft.ops.VectorSim
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 3)
    val mmr = VectorSim.mmrRerank(q, emb, "vec_id", "embedding",
        topN = 6, k = 6, lam = 1.0)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3)))
    // λ=1: no redundancy penalty — mmr_rank must equal rel_rank
    assert(mmr.nonEmpty && mmr.forall { case (_, m, r) => m == r })
    intercept[IllegalArgumentException] {
      VectorSim.mmrRerank(q, emb, "vec_id", "embedding", 3, 5, 0.7)
    }
    intercept[IllegalArgumentException] {
      VectorSim.mmrRerank(q, emb, "vec_id", "embedding", 5, 3, 1.5)
    }
  }

  test("signProject preserves norms on average (JL contract) and is deterministic") {
    val emb = Tables.embeddings(spark, sf001)
    val proj = VectorSim.signProject(emb, "vec_id", "embedding", 64, 32)
    val pn = proj.groupBy("vec_id")
      .agg(sum(col("value") * col("value")).as("pn"))
    val on = emb.select(col("vec_id"),
      aggregate(col("embedding"), lit(0.0),
        (a, x) => a + x.cast("double") * x.cast("double")).as("on"))
    val ratios = pn.join(on, "vec_id")
      .select((col("pn") / col("on")).as("r")).collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    // E[||Px||^2] = ||x||^2 for a ±1/sqrt(d) JL map; at dOut=32 the mean
    // over the corpus concentrates tightly around 1
    assert(mean > 0.85 && mean < 1.15, s"mean norm ratio $mean")
    // re-derived sign matrix: same projection on every run
    val a = proj.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val b = VectorSim.signProject(emb, "vec_id", "embedding", 64, 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(a == b)
  }

  private def decontamRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("anchor index: probe == broadcast path bit-for-bit; appends+compaction idempotent; dim stamp loud") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val anchors = emb.filter(pmod(col("vec_id"), lit(40)) === 0)
    val corpus = emb.filter(pmod(col("vec_id"), lit(40)) =!= 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_anchoridx").toString
    // split the eval set across a base build + one appended suite —
    // the release-cadence lifecycle the index exists for
    VectorSim.writeEvalAnchorIndex(
      anchors.filter(pmod(col("vec_id"), lit(80)) === 0),
      "vec_id", "embedding", idx)
    VectorSim.appendEvalAnchorBatch(
      anchors.filter(pmod(col("vec_id"), lit(80)) =!= 0),
      "vec_id", "embedding", idx, "suite1")
    val direct = decontamRows(VectorSim.semanticDecontam(
      anchors, corpus, "vec_id", "embedding", 0.25))
    val probed = decontamRows(VectorSim.incrementalSemanticDecontam(
      corpus, "vec_id", "embedding", idx, 0.25))
    assert(direct.nonEmpty, "fixture must flag something")
    assert(probed == direct, "indexed probe must equal the broadcast path")
    // re-appended suite (re-delivery) folds away in the DISTINCT read:
    // match counts cannot double
    VectorSim.appendEvalAnchorBatch(
      anchors.filter(pmod(col("vec_id"), lit(80)) =!= 0),
      "vec_id", "embedding", idx, "suite1-retry")
    assert(decontamRows(VectorSim.incrementalSemanticDecontam(
      corpus, "vec_id", "embedding", idx, 0.25)) == direct,
      "duplicate anchor delivery must not change match counts")
    // compaction: one batch=base partition, identical probe
    VectorSim.compactEvalAnchorIndex(spark, idx)
    val parts = new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(parts == Set("batch=base"), parts.toString)
    assert(decontamRows(VectorSim.incrementalSemanticDecontam(
      corpus, "vec_id", "embedding", idx, 0.25)) == direct)
    // degenerate anchors (zero-norm / NaN) are dropped at BUILD time
    import spark.implicits._
    val poisoned = Seq(
      (9001L, Array.fill(64)(0.0f)),
      (9002L, Array.fill(64)(Float.NaN))).toDF("vec_id", "embedding")
    VectorSim.appendEvalAnchorBatch(poisoned, "vec_id", "embedding", idx,
      "poison")
    assert(decontamRows(VectorSim.incrementalSemanticDecontam(
      corpus, "vec_id", "embedding", idx, 0.25)) == direct,
      "degenerate anchors must be guarded out of the index")
    // dim-mismatched append and probe both fail loudly. The probe's
    // guard is PER-ROW (raise_error in the scan): a mixed-dim batch
    // cannot slip past a sampled-row check, and the error surfaces at
    // execution wrapped by Spark — walk the chain for the message
    val wrongDim = Seq((9003L, Array.fill(16)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      VectorSim.appendEvalAnchorBatch(wrongDim, "vec_id", "embedding", idx,
        "wrongdim")
    }
    assert(e.getMessage.contains("dim"))
    def chainHas(t: Throwable, needle: String): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .exists(x => Option(x.getMessage).exists(_.contains(needle)))
    val mixed = corpus.limit(3).unionByName(wrongDim) // mostly-good batch
    val e2 = intercept[Throwable] {
      VectorSim.incrementalSemanticDecontam(mixed, "vec_id", "embedding",
        idx, 0.25).collect()
    }
    assert(chainHas(e2, "-dim"), s"per-row dim guard must fire: $e2")
    val e3 = intercept[Throwable] {
      VectorSim.incrementalSemanticDecontamIvf(mixed, "vec_id", "embedding",
        idx, 0.25).collect()
    }
    assert(chainHas(e3, "-dim"), "the IVF front must carry the same guard")
    // a NULL embedding row is NOT a dim violation: it falls to the norm
    // guard and is silently (correctly) dropped — a stream must not
    // wedge on a row the batch path would filter
    val withNull = corpus.limit(3).unionByName(
      Seq((9004L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    VectorSim.incrementalSemanticDecontam(withNull, "vec_id", "embedding",
      idx, 0.25).collect()
    // an ALL-degenerate eval set refuses to build (no stampless indexes)
    val e4 = intercept[IllegalArgumentException] {
      VectorSim.writeEvalAnchorIndex(
        Seq((9005L, Array.fill(64)(0.0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding",
        java.nio.file.Files.createTempDirectory("graft_emptyidx").toString)
    }
    assert(e4.getMessage.contains("no usable anchors"))
  }

  test("IVF decontam front: flags subset of exact, undercounted matches only, recall telemetry >= 0.9") {
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val anchors = emb.filter(pmod(col("vec_id"), lit(40)) === 0)
    val corpus = emb.filter(pmod(col("vec_id"), lit(40)) =!= 0)
    val exact = VectorSim.semanticDecontam(anchors, corpus,
      "vec_id", "embedding", 0.25).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ivf = VectorSim.semanticDecontamIvf(anchors, corpus,
      "vec_id", "embedding", 0.25).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty)
    // exact cosines on the candidate set: a flag can be MISSED, never
    // invented, and a doc's match count can only undercount
    ivf.foreach { case (doc, n) =>
      assert(exact.contains(doc), s"IVF invented a flag for doc $doc")
      assert(n <= exact(doc), s"IVF overcounted matches for doc $doc")
    }
    val recall = VectorSim.semanticDecontamIvfRecall(anchors, corpus,
      "vec_id", "embedding", 0.25)
    assert(recall >= 0.9, f"IVF decontam flag recall $recall%.3f < 0.9")
  }
}
