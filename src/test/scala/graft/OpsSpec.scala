package graft

import org.apache.spark.sql.functions._
import graft.ops.{TextDedup, VectorSim}

class TextWinnowSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.analytics.TextQueries

  private def fps(texts: Seq[String], k: Int = 5, w: Int = 8): Map[Long, Set[Long]] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), TextQueries.charGramHashes(col("text"), k).as("_g"))
      .select(col("id"), TextQueries.winnowFromGrams(col("_g"), w).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap

  test("winnowing guarantee: docs sharing a substring >= w+k-1 chars share a fingerprint") {
    val shared = "the quick brown fox jumps over the lazy dog" // 43 >= 12 chars
    // the negative control shares NO 5-gram with the others (no spaces, no
    // common 5-char substring) — winnowing only guarantees the POSITIVE
    // direction, so the control must be gram-disjoint, not merely unrelated
    val m = fps(Seq(
      s"PREFIX AAA $shared SUFFIX one",
      s"completely different lead-in text $shared and a different tail",
      "zebraquartzlighthousevixenglyph"))
    assert((m(0) & m(1)).nonEmpty, "shared-substring docs must share a fingerprint")
    assert((m(0) & m(2)).isEmpty && (m(1) & m(2)).isEmpty,
      "gram-disjoint doc must not share fingerprints")
  }

  test("winnowing is deterministic and short docs still fingerprint") {
    val a = fps(Seq("tiny", "just-over-k!", "x"))
    val b = fps(Seq("tiny", "just-over-k!", "x"))
    assert(a == b)
    assert(a.values.forall(_.nonEmpty))
    // identical short docs get identical (whole-text) fingerprints
    val c = fps(Seq("tiny", "tiny"))
    assert(c(0) == c(1))
  }

  test("WinnowMins kernel is bit-identical to the built-in formulation") {
    // the production q63 path runs the O(n) deque kernel; this is its
    // agreement oracle: same minima, same first-occurrence order, same
    // short-doc (n < w) whole-array-minimum fallback
    val rnd = new scala.util.Random(23)
    val alpha = "abcdefg hij"
    val texts = (0 until 60).map { i =>
      val len = i % 3 match {
        case 0 => 1 + rnd.nextInt(4)   // below k: whole-text gram
        case 1 => 5 + rnd.nextInt(8)   // grams present but fewer than w
        case _ => 20 + rnd.nextInt(80) // full deque path
      }
      (i.toLong, Array.fill(len)(alpha(rnd.nextInt(alpha.length))).mkString)
    }
    val grams = texts.toDF("id", "text")
      .select(col("id"), TextQueries.charGramHashes(col("text"), 5).as("_g"))
    def run(c: org.apache.spark.sql.Column): Seq[Seq[Long]] =
      grams.select(col("id"), c.as("fps")).orderBy("id")
        .collect().map(_.getSeq[Long](1).toSeq).toSeq
    assert(run(graft.functions.WinnowExprs.winnowMins(col("_g"), 8)) ==
      run(TextQueries.winnowFromGrams(col("_g"), 8)))
  }
}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words appear here instead"),
    (3L, "the  quick   brown fox jumps over the lazy dog"), // ws-normalized dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per normalized fingerprint") {
    val out = TextDedup.exactDedup(docs, "text", "doc_id")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L))
  }

  test("jaccard pairs finds the near-dup above threshold") {
    val pairs = TextDedup.jaccardPairs(
      docs.withColumn("blk", lit(1)), "text", "doc_id", "blk", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 1L && j > 0.7 })
    assert(pairs.exists { case (a, b, j) => a == 0L && b == 3L && j == 1.0 })
    assert(!pairs.exists { case (a, b, _) => b == 2L || a == 2L })
  }

  test("jaccard salted repartition path returns the same pairs as broadcast") {
    // forcing broadcastMaxRows below the corpus size exercises the
    // salt-replicated join the operator auto-switches to at scale
    val blocked = docs.withColumn("blk", lit(1))
    val bcast = TextDedup.jaccardPairs(blocked, "text", "doc_id", "blk", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = TextDedup.jaccardPairs(blocked, "text", "doc_id", "blk", 0.5,
      broadcastMaxRows = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == bcast && salted.nonEmpty)
  }

  test("simhash pairs are emitted exactly once (no duplicate chunk copies)") {
    val pairs = TextDedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.size == pairs.size)
  }

  test("minhash LSH finds near-dups and exact dups, skips unrelated") {
    val got = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((0L, 1L)) && got.contains((0L, 3L)) && got.contains((1L, 3L)))
    assert(!got.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("simhash: whitespace variants collide at hamming 0, near-dups close") {
    val pairs = TextDedup.simhashNearDups(docs, "text", "doc_id", maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 0L && b == 3L && h == 0 })
  }

  test("forced bucket cap (maxBucket=2) keeps exact-verified pairs, never invents") {
    // docs 0/1/3 share every band bucket; capping at 2 members (rank by
    // id) keeps 0,1 and evicts 3 everywhere — the capped result must be a
    // subset of the uncapped pairs and still contain the surviving pair
    val uncapped = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = TextDedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5,
      maxBucket = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(uncapped))
    assert(capped.contains((0L, 1L)))
    assert(!capped.exists { case (a, b) => a == 2L || b == 2L })
  }

  test("minhash near-dups on an empty corpus slice returns empty, not NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextDedup.minhashNearDups(empty, "text", "doc_id", threshold = 0.5)
      .collect().isEmpty)
  }

  test("minhash signature has k entries and is deterministic") {
    val sig = docs.select(TextDedup.minhashSignature(
      TextDedup.tokens(col("text")), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sig.forall(_.size == 16))
    val sig2 = docs.select(TextDedup.minhashSignature(
      TextDedup.tokens(col("text")), 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    assert(sig.toSeq == sig2.toSeq)
  }

  test("pagerank: hand-computed fixed-point values on cycle and star graphs") {
    import graft.ops.PageRank
    // 3-cycle: symmetric flow, every rank identical each round
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val r1 = PageRank.pageRank(cyc, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // r0 = 1e12 div 3 = 333333333333; r1 = 15e10 + (85 * 333333333333) div 100
    assert(r1.values.toSet == Set(150000000000L + 283333333333L), r1.toString)
    // two rounds (exercises the checkpoint path): cycle stays uniform
    val r2 = PageRank.pageRank(cyc, "src", "dst", iters = 2)
      .collect().map(_.getLong(1)).toSet
    assert(r2.size == 1)
    // star a->b, c->b: b collects both contributions, a/c keep teleport only
    val star = Seq((1L, 2L), (3L, 2L)).toDF("src", "dst")
    val s1 = PageRank.pageRank(star, "src", "dst", iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1(2L) == 150000000000L + (85L * 666666666666L) / 100L, s1.toString)
    assert(s1(1L) == 150000000000L && s1(3L) == 150000000000L)
    // ranks order the hub first
    assert(s1.maxBy(_._2)._1 == 2L)
  }

  test("triangle counts: K4 has 3 per vertex, direction/duplicates ignored") {
    import graft.ops.PageRank
    // K4 on {1,2,3,4} with mixed directions and a duplicate edge
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L), (2L, 3L), (4L, 2L),
      (3L, 4L)).toDF("src", "dst")
    val got = PageRank.triangleCounts(e, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 holds 4 triangles; each vertex sits in exactly 3
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
    // a triangle-free path yields no rows
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(PageRank.triangleCounts(path, "src", "dst").isEmpty)
  }

  test("fuzzy decontamination flags paraphrase-level overlap, not light touch") {
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
    ).toDF("doc_id", "text")
    val train = Seq(
      // one-word change: most trigram shingles shared -> flagged
      (1L, "the quick brown fox jumps over the lazy cat"),
      // verbatim copy -> jaccard 1.0
      (2L, "the quick brown fox jumps over the lazy dog"),
      // shares only the tokens, not the trigram order -> clean
      (3L, "dog lazy the over jumps fox brown quick the"),
      // unrelated -> clean
      (4L, "completely different text with no overlap at all"),
    ).toDF("doc_id", "text")
    val got = graft.ops.TextDedup.fuzzyDecontaminate(
        train, evalSet, "doc_id", "text", threshold = 0.5, shingleLen = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set(1L, 2L), got.toString)
    assert(got(2L) == 1.0)
    // 9 tokens -> 7 trigrams each; doc 1 shares 6 -> 6 / (7+7-6)
    assert(math.abs(got(1L) - 0.75) < 1e-15, got(1L).toString)
    // survivors = anti-join on the flagged ids
    val clean = train.join(
      graft.ops.TextDedup.fuzzyDecontaminate(train, evalSet, "doc_id", "text",
        0.5, 3).select(col("id_t").as("doc_id")),
      Seq("doc_id"), "left_anti").collect().map(_.getLong(0)).sorted.toSeq
    assert(clean == Seq(3L, 4L))
  }

  test("cross-doc tile scrub: global keep-first, tails untouched") {
    val docs = Seq(
      // doc 1 owns three full tiles (9 tokens, no tail)
      (1L, "t1 t2 t3 u1 u2 u3 a b c"),
      // doc 2 repeats doc 1's first tile, keeps its own second
      (2L, "t1 t2 t3 v1 v2 v3"),
      // doc 3 repeats tiles from docs 1 and 2 -> everything removed, tail stays
      (3L, "u1 u2 u3 v1 v2 v3 zz"),
      // doc 4: within-doc duplicate tile, global rule keeps only the first
      (4L, "w1 w2 w3 w1 w2 w3"),
      // shorter than k: pure tail, untouched
      (5L, "x y"),
    ).toDF("doc_id", "text")
    val got = graft.ops.TextDedup.crossDocTileScrub(docs, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((3L, 0L, "t1 t2 t3 u1 u2 u3 a b c")), got(1L).toString)
    assert(got(2L) == ((2L, 1L, "v1 v2 v3")))
    assert(got(3L) == ((2L, 2L, "zz")))
    assert(got(4L) == ((2L, 1L, "w1 w2 w3")))
    assert(got(5L) == ((0L, 0L, "x y")))
  }

  test("repeated-span scrub: planted repetition removed, first copy kept") {
    val reps = Seq(
      // "b c d" repeats: second copy (positions 5-7, 0-based 4..6) scrubbed
      (1L, "a b c d x b c d y"),
      // no k-gram repeats at k=3 (only a 2-gram "a b" repeats)
      (2L, "a b c a b d a c e"),
      // whole doc one repeated span: first copy survives
      (3L, "p q r p q r"),
      // overlapping repeats chain: "a a a a a" — every gram equal
      (4L, "a a a a a"),
      // shorter than k: untouched
      (5L, "x y"),
    ).toDF("doc_id", "text")
    val got = graft.ops.TextDedup.repeatedSpanScrub(reps, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((9L, 3L, "a b c d x y")), got(1L).toString)
    assert(got(2L) == ((9L, 0L, "a b c a b d a c e")))
    assert(got(3L) == ((6L, 3L, "p q r")))
    // grams at starts 0,1,2 all "a a a"; starts 1,2 repeat -> cover 1..4
    assert(got(4L) == ((5L, 4L, "a")))
    assert(got(5L) == ((2L, 0L, "x y")))
  }

  test("exact-substring spans: any-length >= L, cross+within doc, maximal merge, sub-L ignored") {
    // L = 3; the planted 4-token shared span is the case every FIXED
    // granularity can split or miss — here it must come out as ONE
    // maximal [start, end] per occurrence
    val docs = Seq(
      (1L, "a b c d e f g h"),           // shares 'a b c d' with doc 2
      (2L, "x y a b c d z w"),
      (3L, "p q r s p q r s"),           // within-doc repeat: fully covered
      (4L, "a b c m1 m2 m3 m4 m5 a b c"), // two disjoint occurrences
      (5L, "a b q1 q2 q3 q4"),           // 'a b' repeats but 2 < L: ignored
      (6L, "x y"),                       // shorter than L
    ).toDF("doc_id", "text")
    val spans = graft.ops.TextDedup
      .exactSubstringSpans(docs, "text", "doc_id", minTokens = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set(
      (1L, 0L, 3L, 4L),   // the maximal 4-token span, not two 3-grams
      (2L, 2L, 5L, 4L),
      (3L, 0L, 7L, 8L),   // 'p q r s' twice: runs merge to the whole doc
      (4L, 0L, 2L, 3L), (4L, 8L, 10L, 3L)), spans.toString)
    val scrub = graft.ops.TextDedup
      .exactSubstringScrub(docs, "text", "doc_id", minTokens = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(scrub(1L) == ((8L, 4L, "e f g h")), scrub(1L).toString)
    assert(scrub(2L) == ((8L, 4L, "x y z w")))
    assert(scrub(3L) == ((8L, 8L, "")))   // every occurrence removed
    assert(scrub(4L) == ((11L, 6L, "m1 m2 m3 m4 m5")))
    assert(scrub(5L) == ((6L, 0L, "a b q1 q2 q3 q4")))
    assert(scrub(6L) == ((2L, 0L, "x y")))
  }

  test("incremental exact-substring == full operator over old∪new restricted to the batch") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_gcidx").toString
    graft.ops.TextDedup.writeGramCountIndex(old, "text", "doc_id", 8, idx)
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val inc = spans(graft.ops.TextDedup.incrementalExactSubstringSpans(
      batch, "text", "doc_id", idx))
    val fullRestricted = spans(graft.ops.TextDedup.exactSubstringSpans(
      docs, "text", "doc_id", 8).filter(col("doc_id") % 5 === 0))
    assert(fullRestricted.nonEmpty, "fixture must hold cross-slice spans")
    assert(inc == fullRestricted,
      "incremental probe must equal the full operator on old∪new")
    // grow the corpus: append the batch, probe a SECOND wave — counts
    // saturate at 2 and keep merging exactly
    graft.ops.TextDedup.appendGramCountBatchKeyed(batch, "text", "doc_id",
      idx, "b1")
    val batch2 = docs.filter(col("doc_id") % 5 === 1)
    val inc2 = spans(graft.ops.TextDedup.incrementalExactSubstringSpans(
      batch2, "text", "doc_id", idx))
    val full2 = spans(graft.ops.TextDedup.exactSubstringSpans(
      old.unionByName(batch).unionByName(batch2), "text", "doc_id", 8)
      .filter(col("doc_id") % 5 === 1))
    assert(inc2 == full2, "second wave must see the appended counts")
    // retry idempotence: re-append under the same key, nothing changes
    graft.ops.TextDedup.appendGramCountBatchKeyed(batch, "text", "doc_id",
      idx, "b1")
    assert(spans(graft.ops.TextDedup.incrementalExactSubstringSpans(
      batch2, "text", "doc_id", idx)) == full2)
    // compaction folds to one base partition, probes identically
    graft.ops.TextDedup.compactGramCountIndex(spark, idx)
    assert(new java.io.File(idx).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet == Set("batch=base"))
    assert(spans(graft.ops.TextDedup.incrementalExactSubstringSpans(
      batch2, "text", "doc_id", idx)) == full2)
    // a probe against a mismatched-parameter index cannot happen: the
    // gram shape rides the stamp; mixed stamps fail loudly
    spark.read.parquet(s"$idx/batch=base").limit(5)
      .withColumn("_n", org.apache.spark.sql.functions.lit(4))
      .write.mode("overwrite").parquet(s"$idx/batch=rogue")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TextDedup.incrementalExactSubstringSpans(
        batch2, "text", "doc_id", idx).collect()
    }
    assert(e.getMessage.contains("param"))
  }

  test("retro exact-substring: splice == full rerun over old docs; q255 ∪ q256 == full; cost-shape + legacy guards") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val old = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)
    val idx = java.nio.file.Files.createTempDirectory("graft_rcidx").toString
    graft.ops.TextDedup.writeGramCountIndex(old, "text", "doc_id", 8, idx)
    graft.ops.TextDedup.appendGramCountBatchKeyed(batch, "text", "doc_id",
      idx, "b1")
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val retro = spans(graft.ops.TextDedup.retroExactSubstringSpans(
      old, "text", "doc_id", idx, "b1"))
    val prior = spans(graft.ops.TextDedup.exactSubstringSpans(
      old, "text", "doc_id", 8))
    val full = spans(graft.ops.TextDedup.exactSubstringSpans(
      docs, "text", "doc_id", 8))
    val fullOld = full.filter(_._1 % 5 != 0)
    // the production splice: prior ledger for unaffected docs, retro
    // recomputation for affected — must equal the full rerun over old
    val retroIds = retro.map(_._1)
    val splice = prior.filter(s => !retroIds.contains(s._1)) ++ retro
    assert(splice == fullOld,
      "prior-unaffected ∪ retro must equal the full operator over old docs")
    // ... and with the q255 incremental output covering the batch side,
    // the two together ARE the full batch answer (the union contract)
    val inc = spans(graft.ops.TextDedup.incrementalExactSubstringSpans(
      batch, "text", "doc_id", idx, excludeBatch = Some("b1")))
    assert(splice ++ inc == full, "q256 ∪ q255 must equal q249 over old∪new")
    // cost shape: retro touched a PROPER subset of the old docs — docs
    // whose spans predate the batch and gained nothing must not rescan
    val priorOnlyIds = prior.map(_._1) -- retroIds
    assert(retro.nonEmpty, "fixture must hold retro-affected old docs")
    assert(priorOnlyIds.nonEmpty,
      "fixture must hold old docs with old-only spans the retro probe skips")
    // (a retro doc's span set need not differ from the prior ledger —
    // the newly duplicated gram can land inside an already-covered
    // span — but it must equal the full rerun, which splice == fullOld
    // above already pins per doc)
    // compaction carries holders: fold everything except the batch's
    // own partition, retro answer identical
    graft.ops.TextDedup.compactGramCountIndexExcept(spark, idx, Set("b1"))
    assert(spans(graft.ops.TextDedup.retroExactSubstringSpans(
      old, "text", "doc_id", idx, "b1")) == retro,
      "retro must be invariant under compaction (holder rides the fold)")
    // a legacy index (no holder column) fails loudly, never empty-retro
    val legacy = java.nio.file.Files.createTempDirectory("graft_rcleg").toString
    spark.read.parquet(s"$idx/batch=base").drop("holder")
      .write.mode("overwrite").parquet(s"$legacy/batch=base")
    spark.read.parquet(s"$idx/batch=b1").drop("holder")
      .write.mode("overwrite").parquet(s"$legacy/batch=b1")
    val e = intercept[IllegalArgumentException] {
      graft.ops.TextDedup.retroExactSubstringSpans(
        old, "text", "doc_id", legacy, "b1").collect()
    }
    assert(e.getMessage.contains("holder"))
  }

  test("exact-substring hashed-gram scale path agrees with the string path on the real corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    def spanSet(hashed: Boolean) = graft.ops.TextDedup
      .exactSubstringSpans(docs, "text", "doc_id", minTokens = 8,
        hashGrams = hashed)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val strings = spanSet(false)
    assert(strings.nonEmpty, "corpus must hold duplicated spans")
    assert(spanSet(true) == strings,
      "hashed and string gram keys must agree absent xxh collisions")
  }
}

class VectorSimSpec extends SparkSpec {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite of 0
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by true cosine") {
    val out = VectorSim.cosineTopK(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(math.abs(out(0).getAs[Double]("cosine") - 0.9 / math.sqrt(0.82)) < 1e-9)
    assert(out(2).getAs[Double]("cosine") == -1.0)
  }

  test("semanticDecontam: planted paraphrase flagged with argmax anchor, clean docs pass") {
    // anchors 0 and 3 are OPPOSITE directions; corpus doc 1 is a
    // near-clone of anchor 0 (cos ~0.994 to 0, ~-0.994 to 3), doc 2 is
    // orthogonal to both. τ=0.9: doc 1 flagged with best anchor 0 and
    // exactly ONE match; doc 2 unflagged.
    val out = VectorSim.semanticDecontam(
      vecs.filter($"vec_id".isin(0L, 3L)),
      vecs.filter($"vec_id".isin(1L, 2L)),
      "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 0L)))
    // lowering τ to -1 flags everything, and a doc matching BOTH anchors
    // (the orthogonal doc 2 at cos 0) counts both with the lower anchor
    // id attributed on the tie
    val all = VectorSim.semanticDecontam(
      vecs.filter($"vec_id".isin(0L, 3L)),
      vecs.filter($"vec_id".isin(1L, 2L)),
      "vec_id", "embedding", threshold = -1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(all(1L) == ((2L, 0L))) // matches both, best = anchor 0
    assert(all(2L) == ((2L, 0L))) // cos 0 to both: tie -> lower anchor id
  }

  test("semanticDecontam: zero- and NaN-norm vectors are dropped, never NaN-flagged") {
    // a 0/0 cosine is NaN and NaN compares GREATEST in Spark — without
    // the norm guard an all-zero embedding (padding) passes ANY
    // threshold against every anchor; a NaN COMPONENT (failed encode)
    // gives a NaN norm, and `qn > 0` ALONE admits it (NaN > 0 is true
    // under nanSafeCompareDoubles) — the !isnan leg is load-bearing
    val withBad = vecs.unionByName(Seq(
      (9L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(Float.NaN, 1.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding"))
    val out = VectorSim.semanticDecontam(
      withBad.filter($"vec_id" === 0L),
      withBad.filter($"vec_id".isin(1L, 9L, 10L)),
      "vec_id", "embedding", threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L), "zero/NaN vectors must be excluded, near-clone kept")
    // degenerate ANCHORS are dropped too (no NaN rows, no flags from them)
    val out2 = VectorSim.semanticDecontam(
      withBad.filter($"vec_id".isin(9L, 10L)),
      withBad.filter($"vec_id" < 4L),
      "vec_id", "embedding", threshold = -2.0)
    assert(out2.collect().isEmpty)
  }

  test("hardNegatives: below-threshold top-k, positives never leak") {
    // anchor 0: vec 1 is a near-positive (cos ~0.994), vecs 2/3 are true
    // negatives. With posThreshold 0.9 the near-positive must be EXCLUDED
    // and the negatives ranked by descending cosine.
    val out = VectorSim.hardNegatives(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding",
      k = 3, posThreshold = 0.9)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 3L))
    assert(out.forall(_.getAs[Double]("cosine") < 0.9))
    // brute-force replay: same selection from a driver-side scan
    val all = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / (math.sqrt(d(a, a)) * math.sqrt(d(b, b)))
    }
    val anchor = all.find(_._1 == 0L).get._2
    val expect = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(anchor, v)) }
      .filter(_._2 < 0.9).sortBy { case (id, c) => (-c, id) }
      .take(3).map(_._1).toSeq
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == expect)
  }

  test("identical vectors land in the same LSH bucket") {
    val dup = Seq((10L, Array(0.5f, -0.2f, 0.3f, 0.9f)),
      (11L, Array(0.5f, -0.2f, 0.3f, 0.9f))).toDF("vec_id", "embedding")
    val buckets = dup.select(VectorSim.lshBucket(
      col("embedding"), VectorSim.hyperplanes(8, 4), 8).as("b"))
      .collect().map(_.getLong(0))
    assert(buckets(0) == buckets(1))
  }

  test("cosineNearDups finds the identical pair via LSH blocking") {
    val dup = Seq((10L, Array(0.5f, -0.2f, 0.3f, 0.9f)),
      (11L, Array(0.5f, -0.2f, 0.3f, 0.9f)),
      (12L, Array(-0.5f, 0.2f, -0.3f, -0.9f))).toDF("vec_id", "embedding")
    val got = VectorSim.cosineNearDups(dup, "vec_id", "embedding", 0.99,
      numTables = 4, planesPerTable = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((10L, 11L)))
  }

  test("multi-probe near-dups emit each pair exactly once and never lose pairs") {
    val dup = Seq((10L, Array(0.5f, -0.2f, 0.3f, 0.9f)),
      (11L, Array(0.5f, -0.2f, 0.3f, 0.9f)),
      (13L, Array(0.48f, -0.21f, 0.33f, 0.88f)), // near 10/11
      (12L, Array(-0.5f, 0.2f, -0.3f, -0.9f))).toDF("vec_id", "embedding")
    def pairs(probe: Int) = VectorSim.cosineNearDups(dup, "vec_id", "embedding",
      0.9, numTables = 4, planesPerTable = 2, dim = 4, probeBits = probe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = pairs(0)
    val probed = pairs(1)
    // first_close_index dedup: probing must not duplicate any pair...
    assert(probed.distinct.size == probed.size)
    // ...and the probed candidate set is a superset of the exact-bucket one
    assert(exact.toSet.subsetOf(probed.toSet))
    assert(probed.toSet.contains((10L, 11L)))
  }

  test("persisted IVF index: pruned probe reads reproduce the in-memory result") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val queries = emb.filter($"vec_id" < 8)
    val path = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    VectorSim.writeIvfIndex(emb, "vec_id", "embedding", path, numCells = 16)
    val indexed = VectorSim.cosineTopKIvfIndexed(
      queries, path, "vec_id", "embedding", 3, nprobe = 8)
    // same deterministic quantizer -> identical cells, probes, and ranking
    val direct = VectorSim.cosineTopKIvf(
      queries, emb, "vec_id", "embedding", 3, numCells = 16, nprobe = 8)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id"))
    assert(indexed.collect().map(key).sorted.toSeq ==
      direct.collect().map(key).sorted.toSeq)
    // the probe filter must land on the partition column: a pruned file
    // listing, not a full-index scan
    val plan = indexed.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      "probe read lost partition pruning:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("IVF kNN finds the true neighbor and keeps ranks contiguous") {
    // 12 vectors in 3 tight axis-aligned groups: every cell boundary the
    // quantizer can draw keeps each group together, so nprobe=1 already
    // recovers the within-group exact neighbors
    val rnd = new scala.util.Random(5)
    val grouped = (0 until 12).map { i =>
      val axis = i % 3
      val base = Array.fill(4)(0.02f * rnd.nextGaussian().toFloat)
      base(axis) = 1.0f
      (i.toLong, base)
    }.toDF("vec_id", "embedding")
    val out = VectorSim.cosineTopKIvf(
      grouped.filter($"vec_id" === 0), grouped, "vec_id", "embedding", 3,
      numCells = 3, nprobe = 1, sampleN = 12, iters = 5)
      .orderBy("rank").collect()
    val nbs = out.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(nbs.distinct.size == nbs.size && !nbs.contains(0L))
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    // all returned neighbors share query 0's axis group (ids ≡ 0 mod 3)
    assert(nbs.forall(_ % 3 == 0), nbs)
  }

  test("multi-probe kNN keeps ranks contiguous with no duplicate neighbors") {
    val out = VectorSim.cosineTopKLsh(
      vecs.filter($"vec_id" === 0), vecs, "vec_id", "embedding", 3,
      numTables = 4, planesPerTable = 2, dim = 4, probeBits = 1)
      .orderBy("rank").collect()
    val nbs = out.map(_.getAs[Long]("neighbor_id")).toSeq
    assert(nbs.distinct.size == nbs.size)
    assert(out.map(_.getAs[Int]("rank")).toSeq == (1 to out.length))
    assert(!nbs.contains(0L))
  }
}

class DedupClusterSpec extends SparkSpec {
  import spark.implicits._

  test("minhash clustering finds transitive components and keeps min rep") {
    // 0,1,3 near-identical (one cluster via transitivity); 2 unrelated
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta iota"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "completely different content with other words entirely"),
    ).toDF("doc_id", "text")
    val clusters = graft.ops.TextDedup.minhashDedupClusters(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters(0L) == 0L && clusters(1L) == 0L && clusters(3L) == 0L)
    assert(clusters(2L) == 2L)
    // dedup keep-list = rows where id == rep
    assert(clusters.count { case (id, rep) => id == rep } == 2)
  }

  test("clustering at corpus scale agrees with pair connectivity") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val clusters = graft.ops.TextDedup.minhashDedupClusters(docs, "text", "doc_id")
    val n = clusters.count()
    assert(n == 500) // every doc labeled exactly once
    val reps = clusters.filter(org.apache.spark.sql.functions
      .col("id") === org.apache.spark.sql.functions.col("cluster_rep")).count()
    assert(reps > 0 && reps < 500) // dense corpus: real clustering happened
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._
  import graft.ops.Sampling

  lazy val cust = graft.core.Tables.customer(spark, "/root/testdata/sf0.001")

  test("seeded exact sample: exact size, deterministic, seed-sensitive") {
    val a = Sampling.sampleExact(cust, "c_custkey", 100, 42L)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleExact(cust, "c_custkey", 100, 42L)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val c = Sampling.sampleExact(cust, "c_custkey", 100, 7L)
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(a.size == 100 && a == b)
    assert(a != c) // a different seed draws a different set
  }

  test("seeded exact sample compiles to bounded TakeOrderedAndProject") {
    val plan = Sampling.sampleExact(cust, "c_custkey", 100, 42L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }
}
