package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowExprs.{winnowMins, winnowSelect, winnowSelectGrams}
import graft.ops.{TextDedup, TextRank}

class WinnowSelectSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaaaa",  // repetitive: many equal grams/hashes
    "ab",            // shorter than k: single whole-text gram
    "abcdefgh",      // fewer grams than w: global-min branch
  ).map(Tuple1(_)).toDF("text")

  private val k = 4
  private val w = 5

  private def grams = when(length(col("text")) < k, array(col("text")))
    .otherwise(transform(sequence(lit(1), length(col("text")) - lit(k - 1)),
      i => col("text").substr(i, lit(k))))

  private def selected(): Seq[Seq[String]] =
    docs.select(col("text"), grams.as("_t"))
      .select(winnowSelect(col("_t"), w))
      .collect().map(_.getSeq[String](0).toSeq).toSeq

  test("selected gram hashes equal winnowMins of the gram hashes, in order") {
    val viaSelect = docs.select(col("text"), grams.as("_t"))
      .select(transform(winnowSelect(col("_t"), w), g => xxhash64(g)))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val viaMins = docs.select(col("text"), grams.as("_t"))
      .select(col("_t"), transform(col("_t"), g => xxhash64(g)).as("_g"))
      .select(winnowMins(col("_g"), w))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(viaSelect == viaMins)
  }

  test("every selected gram is a substring of its document") {
    val rows = docs.select(col("text"), grams.as("_t"))
      .select(col("text"), winnowSelect(col("_t"), w).as("sel"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      r.getSeq[String](1).foreach(g => assert(text.contains(g), s"'$g' not in '$text'"))
    }
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val gen = selected()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try selected() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(interp == gen)
  }

  test("fused winnowSelectGrams agrees with the composed gram-array form") {
    // includes multi-byte UTF-8 (é, €, 漢) so the char→byte offset walk is
    // exercised, plus short-text (< k) and short-gram-array (< w) branches
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld — 漢字テスト € and ascii tail for length",
      "aaaaaaaaaaaa", "ab", "abcdefgh", "",
    ).map(Tuple1(_)).toDF("text")
    val composed = texts
      .select(col("text"), grams.as("_t"))
      .select(winnowSelect(col("_t"), w))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    val fused = texts.select(winnowSelectGrams(col("text"), k, w))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(fused == composed)
  }

  test("fused kernel interpreted path agrees with codegen path") {
    val texts = Seq("the quick brown fox", "héllo wörld 漢字", "ab")
      .map(Tuple1(_)).toDF("text")
    def run(): Seq[Seq[String]] =
      texts.select(winnowSelectGrams(col("text"), k, w))
        .collect().map(_.getSeq[String](0).toSeq).toSeq
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(interp == gen)
  }

  test("rejects non-string-array input at analysis time") {
    val df = Seq(Tuple1(Seq(1L, 2L))).toDF("g")
    val ex = intercept[Exception] {
      df.select(winnowSelect(col("g"), 3)).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("winnow_select") ||
      ex.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("null array input yields null") {
    val df = Seq(Tuple1(Option.empty[Seq[String]])).toDF("g")
    assert(df.select(winnowSelect(col("g"), 3)).collect()(0).isNullAt(0))
  }

  test("null gram ELEMENT fails loudly, not with an NPE") {
    val df = Seq(Tuple1(Seq("ab", null, "cd"))).toDF("g")
    val ex = intercept[Exception] {
      df.select(winnowSelect(col("g"), 2)).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(t =>
      Option(t.getMessage).exists(_.contains("null gram"))), ex.toString)
  }
}

class WinnowDupPairsSpec extends SparkSpec {
  import spark.implicits._

  private val k = 12
  private val w = 10
  // shared run of exactly w + k - 1 = 21 chars — the guarantee boundary
  private val shared = "SHAREDSUBSTRINGRUN_21"

  test("pairs sharing a >= w+k-1 char substring are always reported") {
    assert(shared.length == w + k - 1)
    val docs = Seq(
      (1L, s"left padding text A $shared and a distinct tail xyzzy"),
      (2L, s"completely different prelude $shared unrelated suffix qq"),
      (3L, "no overlap here at all: the quick brown fox jumps again"),
    ).toDF("doc_id", "text")
    val pairs = TextDedup.winnowDupPairs(docs, "text", "doc_id",
      k = k, w = w, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"guaranteed pair missing: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"doc 3 shares no 12-gram yet was paired: $pairs")
  }

  test("maxDf cap drops boilerplate grams before the pair join") {
    // four docs all share one viral run; capping df at 3 kills the block
    val viral = "VIRALBOILERPLATERUN_X"
    val docs = (1L to 4L).map(i => (i, s"doc $i has $viral inside " +
      ("u%02d".format(i) * 6))).toDF("doc_id", "text")
    val uncapped = TextDedup.winnowDupPairs(docs, "text", "doc_id",
      k = k, w = w, minShared = 1, maxDf = 1000).count()
    val capped = TextDedup.winnowDupPairs(docs, "text", "doc_id",
      k = k, w = w, minShared = 1, maxDf = 3).count()
    assert(uncapped >= 6, s"all 6 pairs expected, got $uncapped") // C(4,2)
    assert(capped < uncapped)
  }
}

class TextRankSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "spark join spark window"),
    (2L, "spark stream"),
    (3L, "filter scan merge sort"),
    (4L, "join join join window stream spark"),
    (5L, "the quick fox"),
  ).toDF("doc_id", "text")

  private val terms = Seq("spark", "join", "window", "stream")

  test("bm25 matches a driver-side brute-force computation") {
    val k1 = 1.2; val b = 0.75
    val corpus = docs.collect().map(r => (r.getLong(0),
      r.getString(1).trim.split("\\s+").toSeq)).toSeq
    val n = corpus.size
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    def df(t: String) = corpus.count(_._2.contains(t))
    val expected = corpus.flatMap { case (id, toks) =>
      val score = terms.map { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) 0.0
        else math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5)) *
          (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * toks.size / avgdl))
      }.sum
      val matched = terms.count(toks.contains)
      if (matched > 0) Some(id -> score) else None
    }.toMap
    val got = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, s) =>
      val exp = new java.math.BigDecimal(expected(id))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      assert(s == exp, s"doc $id: $s vs $exp")
    }
    // doc 4 (most matches, high tf) must outrank doc 3 (no matches: absent)
    assert(!got.contains(3L))
  }

  test("bm25 topK bounds the output and keeps the best scores") {
    val top1 = TextRank.bm25(docs, "text", "doc_id", terms, topK = 1).collect()
    assert(top1.length == 1)
    val all = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
      .collect().map(_.getDouble(1))
    assert(top1.head.getDouble(1) == all.max)
  }

  test("tfidf ranks are 1..topN per doc and df=N terms score zero") {
    val out = TextRank.tfidfTopTerms(docs, "text", "doc_id", topN = 3)
    val rows = out.collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
    // every score is tf * ln(N/df) rounded — df == N implies exactly 0.0
    rows.filter(_.getLong(4) == docs.count()).foreach { r =>
      assert(r.getDouble(5) == 0.0)
    }
    // scores are non-increasing with rank within a doc
    byDoc.foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getDouble(5))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("inverted index: blocked postings reassemble sorted, mass conserved") {
    // blockSize 2 forces multi-block terms on this 5-doc fixture
    val idx = TextRank.invertedIndex(docs, "text", "doc_id", blockSize = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4).split(",").map(_.toLong).toSeq))
    idx.groupBy(_._1).foreach { case (term, rows) =>
      val byBlock = rows.sortBy(_._2)
      assert(byBlock.map(_._2).toSeq == (0 until byBlock.length), s"$term block gap")
      // every block bounded; concatenation in block order is the sorted list
      assert(byBlock.forall(_._5.length <= 2), s"$term block exceeds blockSize")
      val full = byBlock.flatMap(_._5).toSeq
      assert(full == full.sorted && full.distinct == full, s"$term postings broken")
      val df = rows.head._3
      assert(rows.forall(_._3 == df) && full.length == df, s"$term df mismatch")
      assert(rows.head._4 >= df, s"$term total_tf < df")
    }
    val totalTokens = docs.collect()
      .map(_.getString(1).trim.split("\\s+").length).sum
    val perTermTf = idx.groupBy(_._1).values.map(_.head._4).sum
    assert(perTermTf == totalTokens, "token mass not conserved")
  }

  test("vocab drift: identical slices give zero drift, ranking is |kl| desc") {
    val zero = graft.ops.CorpusOps.vocabDrift(docs, docs, "text", topN = 50)
      .collect()
    assert(zero.nonEmpty)
    zero.foreach { r =>
      assert(r.getDouble(5) == 0.0 &&
        java.lang.Double.doubleToRawLongBits(r.getDouble(5)) == 0L,
        s"kl not +0.0 for identical slices: ${r.getString(0)}")
    }
    val a = docs.filter(col("doc_id") <= 3)
    val b = docs.filter(col("doc_id") > 3)
    val drift = graft.ops.CorpusOps.vocabDrift(a, b, "text", topN = 5).collect()
    assert(drift.length <= 5)
    val absKl = drift.map(r => math.abs(r.getDouble(5))).toSeq
    assert(absKl.zip(absKl.tail).forall { case (x, y) => x >= y },
      s"not ranked by |kl| desc: $absKl")
  }

  private def bm25Key(r: org.apache.spark.sql.Row) =
    (r.getLong(0), r.getDouble(1), r.getInt(2))

  test("indexed BM25 equals scan BM25 bit-for-bit, with a pruned postings read") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchidx").toString
    // blockSize 2 so the query-time path must reassemble multi-block terms
    TextRank.writeSearchIndex(docs, "text", "doc_id", dir, blockSize = 2)
    val scan = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    val served = TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
    val got = served.collect().map(bm25Key).toSet
    assert(got == scan, s"indexed != scan:\n$got\nvs\n$scan")
    // the postings read must prune to the query terms' partitions
    val plan = served.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert("PartitionFilters: \\[[^\\]]*term".r.findFirstIn(plan).isDefined,
      "postings read lost partition pruning:\n" +
        plan.linesIterator.filter(_.contains("PartitionFilters")).mkString("\n"))
  }

  test("segment appends serve bit-identically to one full build; dup ids fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchseg").toString
    TextRank.writeSearchIndex(docs.filter(col("doc_id") <= 2), "text", "doc_id",
      dir, blockSize = 2)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 3), "text",
      "doc_id", dir, "b1", blockSize = 2)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") >= 4), "text",
      "doc_id", dir, "b2", blockSize = 2)
    val scan = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    val segmented = TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    assert(segmented == scan, s"segmented != scan:\n$segmented\nvs\n$scan")
    // retried append (same key) replaces itself — results unchanged
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 3), "text",
      "doc_id", dir, "b1", blockSize = 2)
    val retried = TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    assert(retried == scan, "retried append changed the served results")
    // the same doc appended under a DIFFERENT key must trip the gate
    // (doc 2 carries query terms — the gate is scoped to the pruned
    // posting rows, so the duplicate must be visible to the query)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 2), "text",
      "doc_id", dir, "b3", blockSize = 2)
    val ex = intercept[Exception] {
      TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10).collect()
    }
    assert(ex.getMessage.contains("duplicate postings"), ex.getMessage)
  }

  test("segment merge: one base segment, serves bit-identically, equals a rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchmerge").toString
    TextRank.writeSearchIndex(docs.filter(col("doc_id") <= 2), "text", "doc_id",
      dir, blockSize = 2)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 3), "text",
      "doc_id", dir, "b1", blockSize = 2)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") >= 4), "text",
      "doc_id", dir, "b2", blockSize = 2)
    val before = TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    // a leftover stage dir from a crashed merge must not break the retry
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir + "_merging", "junk"))
    TextRank.mergeSearchIndexSegments(spark, dir, blockSize = 2)
    def segsOf(sub: String) = new java.io.File(s"$dir/$sub").listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).toSet
    Seq("postings", "norms", "stats").foreach { sub =>
      assert(segsOf(sub) == Set("seg=base"), s"$sub not compacted: ${segsOf(sub)}")
    }
    assert(!new java.io.File(dir + "_merging").exists(), "stage dir left behind")
    val after = TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    assert(after == before, s"merge changed served results:\n$after\nvs\n$before")
    val scan = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet
    assert(after == scan, "merged index diverged from the scan path")
    // the merged postings are EXACTLY a full rebuild's postings — df,
    // block boundaries, id/tf alignment, everything
    val rebuilt = java.nio.file.Files.createTempDirectory("graft-searchrb").toString
    TextRank.writeSearchIndex(docs, "text", "doc_id", rebuilt, blockSize = 2)
    def postingRows(d: String) = spark.read
      .schema("block INT, df BIGINT, ids ARRAY<BIGINT>, tfs ARRAY<BIGINT>, " +
        "term STRING, seg STRING")
      .parquet(s"$d/postings")
      .collect().map(r => (r.getString(4), r.getInt(0), r.getLong(1),
        r.getSeq[Long](2), r.getSeq[Long](3))).toSet
    assert(postingRows(dir) == postingRows(rebuilt),
      "merged postings differ from a full rebuild")
    // merging an already-merged index is a no-op rewrite
    TextRank.mergeSearchIndexSegments(spark, dir, blockSize = 2)
    assert(TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet == before)
    // the reserved corpus-segment key is rejected on the append path
    assertThrows[IllegalArgumentException] {
      TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 5), "text",
        "doc_id", dir, "base", blockSize = 2)
    }
    // crash recovery: live gone, complete stage present (the state a
    // crash between the swap's delete and rename leaves) — a re-merge
    // must promote the stage, not wipe the only copy
    java.nio.file.Files.move(java.nio.file.Paths.get(dir),
      java.nio.file.Paths.get(dir + "_merging"))
    TextRank.mergeSearchIndexSegments(spark, dir, blockSize = 2)
    assert(TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10)
      .collect().map(bm25Key).toSet == before, "recovery lost the index")
    // a doc id duplicated across segments is rejected, never laundered
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 5), "text",
      "doc_id", dir, "dup", blockSize = 2)
    val ex = intercept[IllegalArgumentException] {
      TextRank.mergeSearchIndexSegments(spark, dir, blockSize = 2)
    }
    assert(ex.getMessage.contains("more than one"), ex.getMessage)
  }

  test("a dup id invisible to the query terms still trips the norms gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-searchnorm").toString
    TextRank.writeSearchIndex(docs, "text", "doc_id", dir, blockSize = 2)
    // doc 5 carries NONE of the query terms: its duplicate never appears
    // in the pruned posting rows, so only the norms uniqueness pass can
    // catch the double-counted score row / inflated n_docs+sum_dl
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") === 5), "text",
      "doc_id", dir, "dup", blockSize = 2)
    val ex = intercept[Exception] {
      TextRank.bm25Indexed(spark, dir, "doc_id", terms, topK = 10).collect()
    }
    assert(ex.getMessage.contains("norms hold id"), ex.getMessage)
  }

  test("shard assignment is deterministic, in-range, and dense per shard") {
    val n = 16
    val base = spark.range(0, 500).select(col("id").as("doc_id"),
      xxhash64(col("id")).as("h"))
      .withColumn("shard", pmod(col("h"), lit(n.toLong)).cast("int"))
    val withPos = base.withColumn("pos",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("shard").orderBy(col("h"), col("doc_id"))))
    val rows = withPos.collect()
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) < n))
    rows.groupBy(_.getInt(2)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length))
    }
    val again = withPos.collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  private val batchQs: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("spark", "join"),
    2 -> Seq("stream", "window"),
    3 -> Seq("join", "spark", "stream"), // overlapping vocab, reordered
  )

  test("bm25Batch is bit-identical to N independent bm25 calls") {
    val batch = TextRank.bm25Batch(docs, "text", "doc_id", batchQs, topK = 10)
      .collect()
      .groupBy(_.getInt(0))
      .map { case (qid, rs) =>
        qid -> rs.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3))).toSeq
      }
    batchQs.foreach { case (qid, terms) =>
      val single = TextRank.bm25(docs, "text", "doc_id", terms, topK = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(qid) == single,
        s"query $qid: batch=${batch(qid)} single=$single")
    }
  }

  test("bm25Batch ranks are dense 1..k per query, ordered by rounded score") {
    val rows = TextRank.bm25Batch(docs, "text", "doc_id", batchQs, topK = 2)
      .collect()
    rows.groupBy(_.getInt(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      val scores = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("bm25Batch rejects duplicate query ids and duplicate terms") {
    intercept[IllegalArgumentException] {
      TextRank.bm25Batch(docs, "text", "doc_id", Seq(1 -> Seq("a"), 1 -> Seq("b")))
    }
    intercept[IllegalArgumentException] {
      TextRank.bm25Batch(docs, "text", "doc_id", Seq(1 -> Seq("a", "a")))
    }
  }

  test("bm25BatchIndexed serves bit-identically to the scan path, incl. segments") {
    val dir = java.nio.file.Files.createTempDirectory("graft-batchidx").toString
    TextRank.writeSearchIndex(docs.filter(col("doc_id") <= 3), "text", "doc_id",
      dir, blockSize = 2)
    TextRank.appendSearchIndexBatch(docs.filter(col("doc_id") > 3), "text",
      "doc_id", dir, "b1", blockSize = 2)
    val scan = TextRank.bm25Batch(docs, "text", "doc_id", batchQs, topK = 10)
      .collect().map(_.toSeq).toSeq
    val served = TextRank.bm25BatchIndexed(spark, dir, "doc_id", batchQs,
      topK = 10).collect().map(_.toSeq).toSeq
    assert(served == scan)
  }

  test("phraseMatch counts overlapping occurrences and honors positions") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),        // "a a" occurs 3x (overlapping), first at 1
      (2L, "b a a b a a"),    // 2x, first at 2
      (3L, "a b a b a"),      // 0x
      (4L, "a"),              // shorter than the phrase: no fabricated match
      (5L, ""),               // empty text
    ).toDF("doc_id", "text")
    val out = TextRank.phraseMatch(d, "text", "doc_id", Seq("a", "a"), topK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 3, 1), (2L, 2, 2)))
  }

  test("phraseMatch topK cuts on (n_occ desc, id asc)") {
    import spark.implicits._
    val d = Seq(
      (1L, "x y"), (2L, "x y x y"), (3L, "x y"), (4L, "z")
    ).toDF("doc_id", "text")
    val out = TextRank.phraseMatch(d, "text", "doc_id", Seq("x", "y"), topK = 2)
      .collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 1L))
  }

  test("phraseMatchIndexed == scan phraseMatch across segments, incl. repeated-token phrases") {
    import spark.implicits._
    val d = Seq(
      (1L, "a a a a"),
      (2L, "b a a b a a"),
      (3L, "a b a b a"),
      (4L, "table hash join table hash"),
      (5L, ""),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-positions").toString
    TextRank.writePositionsIndex(d.filter(col("doc_id") <= 3), "text", "doc_id", dir)
    TextRank.appendPositionsBatch(d.filter(col("doc_id") > 3), "text", "doc_id",
      dir, "b1")
    TextRank.appendPositionsBatch(d.filter(col("doc_id") > 3), "text", "doc_id",
      dir, "b1") // retry: same key overwrites, no duplicates
    for (phrase <- Seq(Seq("a", "a"), Seq("table", "hash"), Seq("a", "b", "a"),
        Seq("missing", "tokens"))) {
      val scan = TextRank.phraseMatch(d, "text", "doc_id", phrase, topK = 10)
        .collect().map(_.toSeq).toSeq
      val served = TextRank.phraseMatchIndexed(spark, dir, "doc_id", phrase,
        topK = 10).collect().map(_.toSeq).toSeq
      assert(served == scan, s"phrase $phrase: served=$served scan=$scan")
    }
  }

  test("phraseMatchIndexed prunes the positions read and rejects duplicate ids") {
    import spark.implicits._
    val d = Seq((1L, "p q r"), (2L, "p q")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-positions2").toString
    TextRank.writePositionsIndex(d, "text", "doc_id", dir)
    val df = TextRank.phraseMatchIndexed(spark, dir, "doc_id", Seq("p", "q"),
      validateIds = false)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters") && plan.contains("term#"),
      "positions read must prune on the term partition column")
    // duplicate id across segment keys trips the gate
    TextRank.appendPositionsBatch(d.filter(col("doc_id") === 1), "text",
      "doc_id", dir, "dup")
    val e = intercept[IllegalArgumentException] {
      TextRank.phraseMatchIndexed(spark, dir, "doc_id", Seq("p", "q")).collect()
    }
    assert(e.getMessage.contains("two"), e.getMessage)
  }

  test("segment merge folds the positions component; phrase serving unchanged") {
    import spark.implicits._
    val d = Seq(
      (1L, "m n m n m"), (2L, "m n"), (3L, "n m"), (4L, "m n o m n"),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-posmerge").toString
    // co-located index: BM25 components + positions, two segments each
    TextRank.writeSearchIndex(d.filter(col("doc_id") <= 2), "text", "doc_id",
      dir, blockSize = 2)
    TextRank.writePositionsIndex(d.filter(col("doc_id") <= 2), "text", "doc_id", dir)
    // writePositionsIndex wipes only dir/positions — rebuild base AFTER it
    TextRank.appendSearchIndexBatch(d.filter(col("doc_id") > 2), "text",
      "doc_id", dir, "b1", blockSize = 2)
    TextRank.appendPositionsBatch(d.filter(col("doc_id") > 2), "text",
      "doc_id", dir, "b1")
    val phrase = Seq("m", "n")
    val before = TextRank.phraseMatchIndexed(spark, dir, "doc_id", phrase)
      .collect().map(_.toSeq).toSeq
    TextRank.mergeSearchIndexSegments(spark, dir, blockSize = 2)
    // one base segment for positions too
    val segs = new java.io.File(s"$dir/positions").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs == Set("seg=base"), segs.toString)
    val after = TextRank.phraseMatchIndexed(spark, dir, "doc_id", phrase)
      .collect().map(_.toSeq).toSeq
    val scan = TextRank.phraseMatch(d, "text", "doc_id", phrase)
      .collect().map(_.toSeq).toSeq
    assert(before == scan && after == scan,
      s"before=$before after=$after scan=$scan")
    // and BM25 serving still works off the merged co-located index
    assert(TextRank.bm25Indexed(spark, dir, "doc_id", Seq("m"), topK = 5)
      .collect().nonEmpty)
  }
}
