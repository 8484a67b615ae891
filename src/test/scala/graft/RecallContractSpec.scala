package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{TextDedup, VectorSim}

/** Corpus-scale recall contracts for the approximate (no-SQL-oracle)
  * operators: each one is checked against its exact twin on the driver
  * testdata, so the LSH/banding parameters carry measured guarantees
  * rather than vibes. (VERDICT r2 item 4.)
  */
class RecallContractSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("q38 contract: minhash pairs are exact-verified and recall >= 0.9 vs brute force") {
    val docs = Tables.documents(spark, sf001)
    // ground truth: exact Jaccard over ALL pairs (single blocking group)
    val truth = pairSet(TextDedup.jaccardPairs(
      docs.withColumn("blk", lit(1)), "text", "doc_id", "blk", 0.5))
    val got = pairSet(TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5))
    // soundness: the verify stage re-checks exact Jaccard, so every
    // emitted pair must be in the brute-force set
    assert(got.subsetOf(truth), s"${(got -- truth).take(5)} not exact-verified")
    val recall = got.size.toDouble / truth.size
    info(f"q38 minhash recall vs exact Jaccard@0.5: $recall%.4f (${got.size}/${truth.size})")
    assert(recall >= 0.9, f"recall $recall%.4f below contract 0.9")
  }

  test("q38 telemetry: minhash recall measured at sf0.01 (drift visibility)") {
    // telemetry only (the contract assertion lives in the sf0.001 test):
    // logged every round so band/row parameter drift shows up as a trend,
    // not a surprise — a weaker sanity floor guards against collapse
    val docs = Tables.documents(spark, sf01)
    val truth = pairSet(TextDedup.jaccardPairs(
      docs.withColumn("blk", lit(1)), "text", "doc_id", "blk", 0.5))
    val got = pairSet(TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5))
    assert(got.subsetOf(truth))
    val recall = got.size.toDouble / truth.size
    info(f"q38 minhash recall at sf0.01 vs exact Jaccard@0.5: $recall%.4f (${got.size}/${truth.size})")
    assert(recall >= 0.8, f"sf0.01 recall $recall%.4f collapsed below sanity floor 0.8")
  }

  test("q79 telemetry: incremental-probe recall vs direct minhash near-dups at sf0.01") {
    // the q38 pattern applied to the index path: logged every round so
    // drift in the persisted-index probe parameters (band layout, cap
    // gate) surfaces as a trend rather than relying on the fixed
    // batch-equivalence fixture to happen to catch it
    val docs = Tables.documents(spark, sf01)
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val fresh = docs.filter(col("doc_id") % 5 === 0)
    // ground truth: VERIFIED near-dup pairs from the whole-corpus run,
    // restricted to (new, old) cross-slice pairs — exactly what an ingest
    // probe of `fresh` against the corpus index must surface
    val want = pairSet(TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5))
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
    assert(want.nonEmpty, "corpus must contain cross-slice near-dups")
    val probe = TextDedup.incrementalNearDups(fresh,
      TextDedup.minhashSignatures(old, "text", "doc_id"), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (n, o) => if (n < o) (n, o) else (o, n) }.toSet
    val recall = want.count(probe.contains).toDouble / want.size
    info(f"q79 incremental-probe recall at sf0.01 vs verified near-dups: " +
      f"$recall%.4f (${want.count(probe.contains)}/${want.size})")
    // every verified pair shares >= 1 band, so an uncapped probe must see
    // it; the floor matches q38's so cap-gate drift cannot hide
    assert(recall >= 0.9, f"recall $recall%.4f below contract 0.9")
  }

  test("q39 contract: 4-chunk blocking is EXACT for hamming <= 3 (pigeonhole)") {
    val docs = Tables.documents(spark, sf001)
    val base = docs.select(col("doc_id").as("id"),
      TextDedup.simhash(col("text")).as("sh"))
    val a = base.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = base.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= 3)
    val truthSet = pairSet(truth)
    val got = pairSet(TextDedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 3))
    // <= 3 differing bits can touch at most 3 of the 4 chunks, so at least
    // one chunk always collides: the blocked result must EQUAL brute force
    assert(got == truthSet,
      s"missed=${(truthSet -- got).take(5)} extra=${(got -- truthSet).take(5)}")
    info(s"q39 simhash blocked pairs = brute force: ${got.size} pairs")
  }

  test("q41 contract: LSH kNN is rank-contiguous and recovers exact neighbors") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 8)
    val exact = VectorSim.cosineTopK(q, emb, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorSim.cosineTopKLsh(q, emb, "vec_id", "embedding", 3)
    val rows = lsh.collect()
    // structural contract: <= k rows per query, ranks contiguous from 1
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"query $qid ranks $ranks not contiguous")
      assert(ranks.size <= 3)
    }
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"q41 LSH kNN recall vs exact top-3: $recall%.4f ((${(got & exact).size}/${exact.size}))")
    // multi-probe (probeBits=1 default): each query scans its bucket plus
    // all single-bit flips in each of the 8 tables, lifting per-table
    // collision probability from p^4 to p^4 + 4p^3(1-p) — the measured
    // floor rises from the old exact-bucket 0.25 to 0.7
    assert(recall >= 0.7, f"recall $recall%.4f collapsed below floor 0.7")
  }

  test("q60 contract: IVF kNN recall vs exact top-3 (sf0.001)") {
    val emb = Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") < 8)
    val exact = VectorSim.cosineTopK(queries, emb, "vec_id", "embedding", 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val rows = VectorSim.cosineTopKIvf(queries, emb, "vec_id", "embedding", 3)
      .collect()
    // rank contract: contiguous 1..n per query, no duplicate neighbors
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
      val nb = rs.map(_.getAs[Long]("neighbor_id"))
      assert(nb.distinct.length == nb.length)
    }
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"q60 IVF kNN recall vs exact top-3: $recall%.4f ((${(got & exact).size}/${exact.size}))")
    // 16 cells / probe 8: each query scans ~half the corpus. The driver's
    // isotropic random embeddings are IVF's adversarial case — nearest
    // neighbors are near-orthogonal (max cosine ~0.48), so cell locality
    // is weak and recall is bounded near the scan fraction; clustered
    // real-world embeddings do far better at much smaller probe counts.
    // The floor is a measured tripwire at this worst case.
    assert(recall >= 0.7, f"recall $recall%.4f collapsed below floor 0.7")
  }

  test("q60 contract: IVF recall >= 0.9 on clustered embeddings at 1/8 scan fraction") {
    // the flip side of the isotropic worst case above: on CLUSTERED data —
    // the regime real embedding corpora live in — cell locality is strong
    // and small probe counts recover almost everything. 20 tight clusters,
    // nprobe 2 of 16 cells (each query scans ~1/8 of the corpus).
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val centers = Array.fill(20)(Array.fill(64)(rnd.nextGaussian()))
    val corpus = (0 until 800).map { i =>
      val c = centers(i % 20)
      (i.toLong, c.map(x => (x + 0.15 * rnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val exact = VectorSim.cosineTopK(queries, corpus, "vec_id", "embedding", 5)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = VectorSim.cosineTopKIvf(queries, corpus, "vec_id", "embedding", 5,
      numCells = 16, nprobe = 2, sampleN = 800)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"q60 IVF recall on clustered corpus (nprobe 2/16): $recall%.4f")
    assert(recall >= 0.9, f"clustered-regime recall $recall%.4f below 0.9")
  }

  test("q42 contract: emitted pairs are exact-verified and recall >= 0.9 at cosine 0.5") {
    // the driver embeddings have NO true near-dups (max pairwise cosine
    // 0.48 at sf0.001 — measured via brute force), so the contract corpus
    // PLANTS them: 100 jittered copies whose cosines to their source spread
    // over ~[0.5, 0.97] — the whole regime the operator advertises
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf001).select("vec_id", "embedding")
    val rnd = new scala.util.Random(1234)
    val planted = emb.filter(col("vec_id") < 100)
      .collect().zipWithIndex.map { case (r, i) =>
        val v = r.getSeq[Float](1).toArray
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        val c = 0.5 + 0.45 * (i % 10) / 9.0 // target cosines 0.5 .. 0.95
        val sigma = norm * math.sqrt(1.0 / (c * c) - 1.0) / math.sqrt(v.length.toDouble)
        (r.getLong(0) + 100000L,
          v.map(x => (x + sigma * rnd.nextGaussian()).toFloat).toSeq)
      }.toSeq.toDF("vec_id", "embedding")
    val aug = emb.union(planted)
    // ground truth: brute-force cosine over all pairs of the augmented corpus
    val a = aug.select(col("vec_id").as("id_a"), col("embedding").as("ea"))
    val b = aug.select(col("vec_id").as("id_b"), col("embedding").as("eb"))
    val truth = pairSet(a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .filter(VectorSim.cosine(col("ea"), col("eb")) >= 0.5))
    assert(truth.size >= 80, s"planting failed: only ${truth.size} true pairs")
    val got = pairSet(VectorSim.cosineNearDups(aug, "vec_id", "embedding",
      threshold = 0.5, probeBits = 1))
    // soundness: every emitted pair passed the exact cosine filter, so it
    // must appear in the brute-force set
    assert(got.subsetOf(truth), s"${(got -- truth).take(5)} not exact-verified")
    val recall = got.size.toDouble / truth.size
    info(f"q42 cosine near-dup recall vs brute force@0.5: $recall%.4f (${got.size}/${truth.size})")
    assert(recall >= 0.9, f"recall $recall%.4f below contract 0.9")
    // the exact-bucket configuration trades recall for 7x less candidate
    // fan-in: log it so the tradeoff stays measured, not assumed
    val got0 = pairSet(VectorSim.cosineNearDups(aug, "vec_id", "embedding",
      threshold = 0.5, probeBits = 0))
    assert(got0.subsetOf(truth))
    info(f"q42 exact-bucket (probeBits=0) recall: ${got0.size.toDouble / truth.size}%.4f")
  }

  test("q55 contract: every verified q38 near-dup pair lands in one cluster (sf0.01)") {
    val docs = Tables.documents(spark, sf01)
    val labels = TextDedup.minhashDedupClusters(docs, "text", "doc_id")
    val pairs = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
    val la = labels.select(col("id").as("id_a"), col("cluster_rep").as("rep_a"))
    val lb = labels.select(col("id").as("id_b"), col("cluster_rep").as("rep_b"))
    val split = pairs.join(la, "id_a").join(lb, "id_b")
      .filter(col("rep_a") =!= col("rep_b")).count()
    assert(split == 0L,
      s"$split verified near-dup pairs straddle two clusters")
    // and clustering labels every document exactly once
    assert(labels.count() == docs.count())
  }

  test("q243 contract: IVF hard negatives never leak positives; recall measured vs exact") {
    val emb = Tables.embeddings(spark, sf001)
    val anchors = emb.filter(pmod(col("vec_id"), lit(40)) === 0)
    val rows = VectorSim.hardNegativesIvf(anchors, emb, "vec_id", "embedding",
      k = 3, posThreshold = 0.25).collect()
    // UNCONDITIONAL guarantee: the threshold cut runs on exact cosines of
    // the candidates, so approximation can never admit a positive
    assert(rows.forall(_.getAs[Double]("cosine") < 0.25),
      "an above-threshold (positive) vector leaked into the negative set")
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length))
    }
    // recall telemetry vs the exact brute-force selection
    val exact = VectorSim.hardNegatives(anchors, emb, "vec_id", "embedding",
        k = 3, posThreshold = 0.25)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = rows.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"q243 IVF hard-negative recall vs exact: $recall%.4f ((${(got & exact).size}/${exact.size}))")
    // same isotropic-worst-case floor argument as the q60 contract:
    // 16 cells / probe 8 scans ~half the corpus on random embeddings
    assert(recall >= 0.5, f"recall $recall%.4f collapsed below floor 0.5")
  }
}
