package graft

import org.apache.spark.sql.functions._
import graft.ops.{CorpusOps, ImageHash, TextDedup, VectorSim}

/** Cardinality contracts for every incremental probe surface (VERDICT
  * r12 task 8): round 12's q226 bug was a CONSUMER that needed
  * best-match-per-probe but read the pair-fan-out surface raw — one row
  * per Hamming-ball member instead of one per probe. Each surface's
  * documented contract (PAIRS fan out one row per qualifying (new, old);
  * per-doc aggregates emit one row per doc) is pinned here with a
  * planted multi-match fixture, so any consumer that assumes the wrong
  * cardinality fails a named test instead of silently double-counting.
  */
class IncrementalContractSpec extends SparkSpec {

  import spark.implicits._

  test("incrementalNearDups is a PAIR surface: one row per (new, old) match") {
    // two indexed docs with identical text, one probe with the same text:
    // the probe must emit BOTH pairs — consumers wanting a single
    // attribution must aggregate (min hamming / min id), as q226 does
    val text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val old = Seq((1L, text), (2L, text), (3L, "completely different words " +
      "nothing shared here at all today")).toDF("doc_id", "text")
    val fresh = Seq((100L, text)).toDF("doc_id", "text")
    val index = TextDedup.minhashSignatures(old, "text", "doc_id")
    val got = TextDedup.incrementalNearDups(fresh, index, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 1L), (100L, 2L)),
      s"expected exactly the two planted (new, old) pairs, got $got")
  }

  test("incrementalCosineNearDups is a PAIR surface: one row per (new, old) match") {
    val v = Array.tabulate(64)(i => if (i == 0) 1.0f else 0.0f)
    val w = Array.tabulate(64)(i => if (i == 1) 1.0f else 0.0f) // orthogonal
    val old = Seq((1L, v), (2L, v), (3L, w)).toDF("vec_id", "embedding")
    val fresh = Seq((100L, v)).toDF("vec_id", "embedding")
    val index = VectorSim.signIndex(old, "vec_id", "embedding")
    val got = VectorSim.incrementalCosineNearDups(fresh, index,
        "vec_id", "embedding", threshold = 0.25, probeBits = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((100L, 1L), (100L, 2L)),
      s"expected exactly the two planted (new, old) pairs, got $got")
  }

  test("incrementalExactDedup is a SURVIVOR surface: one row per surviving doc") {
    val dup = "the same normalized text appears here"
    val freshOnly = "a brand new document unseen before"
    val old = Seq((1L, dup)).toDF("doc_id", "text")
    val fpIndex = old.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()
    // the batch: one doc matching the index (dropped), one fresh doc
    // duplicated inside the batch (ONE survivor — batch-internal dedup),
    // so neither direction fans out
    val fresh = Seq((10L, dup), (11L, freshOnly), (12L, freshOnly))
      .toDF("doc_id", "text")
    val got = TextDedup.incrementalExactDedup(fresh, fpIndex, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(11L), s"expected the single batch survivor, got $got")
  }

  test("phashMatches is a PAIR surface; the q226 consumer folds to best-per-probe") {
    // probe at Hamming 1 of index id 1 and Hamming 2 of index id 2
    val probeHash = 0xF0F0F0F0L
    val index = Seq((1L, probeHash ^ 1L), (2L, probeHash ^ 3L),
      (3L, ~probeHash)).toDF("media_id", "dhash")
    val probe = Seq((100L, probeHash)).toDF("media_id", "dhash")
    val pairs = ImageHash.phashMatches(probe, index, "media_id", "dhash",
        maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((100L, 1L, 1), (100L, 2L, 2)),
      s"expected both ball members as pairs, got $pairs")
    // the documented consumer fold: best match per probe (min hamming,
    // then min index id) — exactly one row per probe
    val best = ImageHash.phashMatches(probe, index, "media_id", "dhash", 6)
      .groupBy("id_probe")
      .agg(min(struct(col("hamming"), col("id_index"))).as("_b"))
      .select(col("id_probe"), col("_b.id_index"), col("_b.hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(best.toSeq == Seq((100L, 1L, 1)))
  }

  test("incrementalContamination is a PER-DOC aggregate: shared grams never fan out") {
    val dir = java.nio.file.Files.createTempDirectory("gramidx").toString
    val evalSet = Seq((1L, "north south east west up down left right"))
      .toDF("doc_id", "text")
    CorpusOps.writeEvalGramIndex(evalSet, "text", n = 2, path = dir)
    // the batch doc shares THREE distinct eval bigrams: still ONE row
    val batch = Seq(
      (10L, "north south xx east west yy up down"),
      (11L, "totally clean words with no overlap at all")).toDF("doc_id", "text")
    val got = CorpusOps.incrementalContamination(batch, "doc_id", "text", dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 3L)), s"got ${got.toSeq}")
    val clean = CorpusOps.incrementalDecontaminate(batch, "doc_id", "text", dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(11L))
  }
}
