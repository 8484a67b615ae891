package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bpe, UnigramLm}

/** Unigram-LM tokenizer contracts: the distributed EM trainer and the
  * Viterbi encoder are pinned against an in-memory reference that
  * mirrors every float operation in the same order (log-space
  * forward-backward, max-stabilized logsumexp folds in span order,
  * DECIMAL(38,18)-rounded expected-count sums, ascending-sorted
  * normalization fold) — so equality is exact, not approximate — plus
  * the EM likelihood-monotonicity property on the real corpus.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
  }

  // ---- in-memory reference, op-order-identical to ops/UnigramLm ----

  private case class Span(st: Int, ln: Int, tok: String, lp: Double)

  private def refLse(terms: Seq[Double]): Double =
    if (terms.isEmpty) Double.NegativeInfinity
    else {
      val m = terms.max
      if (m == Double.NegativeInfinity) m
      else m + StrictMath.log(terms.foldLeft(0.0)((s, v) => s + StrictMath.exp(v - m)))
    }

  private def refSpans(w: String, logp: Map[String, Double],
      maxLen: Int): Vector[Span] =
    (for {
      st <- 1 to w.length
      ln <- 1 to math.min(maxLen, w.length - st + 1)
      tok = w.substring(st - 1, st - 1 + ln)
      lp <- logp.get(tok)
    } yield Span(st, ln, tok, lp)).toVector
      .sortWith { (a, b) =>
        if (a.st != b.st) a.st < b.st
        else if (a.ln != b.ln) a.ln < b.ln
        else utf8Order.lt(a.tok, b.tok)
      }

  private def refAlphas(w: String, spans: Vector[Span]): Array[Double] = {
    val a = new Array[Double](w.length + 1)
    a(0) = 0.0
    for (i <- 1 to w.length)
      a(i) = refLse(spans.filter(sp => sp.st + sp.ln - 1 == i)
        .map(sp => a(sp.st - 1) + sp.lp))
    a
  }

  private def refBetas(w: String, spans: Vector[Span]): Array[Double] = {
    val b = new Array[Double](w.length + 1)
    b(w.length) = 0.0
    for (j <- w.length - 1 to 0 by -1)
      b(j) = refLse(spans.filter(_.st == j + 1).map(sp => sp.lp + b(j + sp.ln)))
    b
  }

  /** Expected counts with the SAME per-span DECIMAL(38,18) rounding the
    * distributed M-step applies before summation. */
  private def refExpected(freqs: Map[String, Long], logp: Map[String, Double],
      maxLen: Int): Map[String, BigDecimal] = {
    val acc = scala.collection.mutable.Map.empty[String, BigDecimal]
    freqs.foreach { case (w, cnt) =>
      val spans = refSpans(w, logp, maxLen)
      val a = refAlphas(w, spans)
      val b = refBetas(w, spans)
      spans.foreach { sp =>
        // unsegmentable word (a(n) = -inf): contributes nothing
        val e = if (a(w.length) == Double.NegativeInfinity) 0.0
          else StrictMath.exp(a(sp.st - 1) + sp.lp + b(sp.st - 1 + sp.ln) -
            a(w.length)) * cnt
        val d = BigDecimal(e).setScale(18, BigDecimal.RoundingMode.HALF_UP)
        acc(sp.tok) = acc.getOrElse(sp.tok, BigDecimal(0)) + d
      }
    }
    acc.toMap
  }

  private def refNormalize(logp: Map[String, Double]): Map[String, Double] = {
    val lps = logp.values.toArray.sorted
    val m = lps.last
    val z = m + StrictMath.log(lps.foldLeft(0.0)((s, x) => s + StrictMath.exp(x - m)))
    logp.map { case (t, lp) => t -> (lp - z) }
  }

  private def refMStep(exp0: Map[String, BigDecimal]): Map[String, Double] = {
    val exp = exp0.filter(_._2 > 0) // zero-mass tokens die, as in mStep
    val tot = exp.values.foldLeft(BigDecimal(0))(_ + _)
    refNormalize(exp.map { case (t, e) =>
      t -> (StrictMath.log(e.toDouble) - StrictMath.log(tot.toDouble))
    })
  }

  private def refSeed(freqs: Map[String, Long], seedSize: Int,
      maxLen: Int): Map[String, Long] = {
    val acc = scala.collection.mutable.Map.empty[String, Long]
    freqs.foreach { case (w, cnt) =>
      for {
        st <- 1 to w.length
        ln <- 1 to math.min(maxLen, w.length - st + 1)
      } acc(w.substring(st - 1, st - 1 + ln)) =
        acc.getOrElse(w.substring(st - 1, st - 1 + ln), 0L) + cnt
    }
    val top = acc.toSeq.sortWith { case ((t1, f1), (t2, f2)) =>
      if (f1 != f2) f1 > f2 else utf8Order.lt(t1, t2)
    }.take(seedSize)
    (top ++ acc.filter(_._1.length == 1)).toMap
  }

  private def refTrain(freqs: Map[String, Long], vocabSize: Int,
      seedSize: Int, emIters: Int, maxLen: Int): Map[String, Double] = {
    val seeds = refSeed(freqs, seedSize, maxLen)
    var logp = refNormalize(seeds.map { case (t, f) =>
      t -> StrictMath.log(f.toDouble)
    })
    for (_ <- 1 to emIters) logp = refMStep(refExpected(freqs, logp, maxLen))
    val chars = logp.filter(_._1.length == 1)
    val multi = logp.filter(_._1.length > 1).toSeq.sortWith {
      case ((t1, p1), (t2, p2)) =>
        if (p1 != p2) p1 > p2 else utf8Order.lt(t1, t2)
    }.take(math.max(0, vocabSize - chars.size))
    logp = (chars ++ multi).toMap
    refMStep(refExpected(freqs, logp, maxLen))
  }

  private def refViterbi(w: String, logp: Map[String, Double],
      maxLen: Int): Vector[String] = {
    val spans = refSpans(w, logp, maxLen)
    val best = new Array[Double](w.length + 1)
    val backLn = new Array[Int](w.length + 1)
    val backTok = new Array[String](w.length + 1)
    for (i <- 1 to w.length) {
      // candidates + the penalized <unk> hop; max by (s, ln, tok-utf8)
      var s = best(i - 1) - 1.0e9
      var ln = 1
      var tok = "<unk>"
      spans.filter(sp => sp.st + sp.ln - 1 == i).foreach { sp =>
        val cs = best(sp.st - 1) + sp.lp
        val better = cs > s || (cs == s && (sp.ln > ln ||
          (sp.ln == ln && utf8Order.gt(sp.tok, tok))))
        if (better) { s = cs; ln = sp.ln; tok = sp.tok }
      }
      best(i) = s; backLn(i) = ln; backTok(i) = tok
    }
    var pos = w.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { out += backTok(pos); pos -= backLn(pos) }
    out.reverse.toVector
  }

  // ---- contracts ----

  test("distributed trainer == in-memory reference on planted words, exactly") {
    val freqs = Map("abab" -> 10L, "abc" -> 4L, "cab" -> 3L, "bb" -> 2L)
    val got = UnigramLm.trainUnigramOnFreqs(
        freqs.toSeq.toDF("word", "cnt"), vocabSize = 8, seedSize = 20,
        emIters = 3, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = refTrain(freqs, 8, 20, 3, 4)
    assert(got.keySet == ref.keySet,
      s"vocab diverges: ${got.keySet diff ref.keySet} / ${ref.keySet diff got.keySet}")
    got.foreach { case (t, lp) =>
      assert(lp == ref(t), s"token '$t': $lp vs ${ref(t)}")
    }
  }

  test("distributed trainer == reference over real corpus words") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(120)
    val freqs = Bpe.wordFreqs(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = UnigramLm.trainUnigramOnFreqs(
        Bpe.wordFreqs(docs, "text"), vocabSize = 120, seedSize = 300,
        emIters = 2, maxPieceLen = 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = refTrain(freqs, 120, 300, 2, 6)
    assert(got.keySet == ref.keySet,
      s"vocab diverges (${got.size} vs ${ref.size}): " +
        s"${(got.keySet diff ref.keySet).take(5)} / ${(ref.keySet diff got.keySet).take(5)}")
    val maxErr = got.map { case (t, lp) => math.abs(lp - ref(t)) }.max
    assert(maxErr <= 1e-9, s"max logp divergence $maxErr")
  }

  test("EM likelihood is non-decreasing across iterations") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(120)
    val freqsDf = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    def corpusLl(vocab: org.apache.spark.sql.DataFrame): Double =
      UnigramLm.wordLogLikelihood(freqsDf, vocab)
        .select(sum(col("cnt") * col("loglik"))).collect()(0).getDouble(0)
    val lls = (1 to 3).map { iters =>
      corpusLl(UnigramLm.trainUnigramOnFreqs(freqsDf, vocabSize = 120,
        seedSize = 300, emIters = iters, maxPieceLen = 6))
    }
    lls.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"likelihood decreased: $lls")
    }
  }

  test("Viterbi: distributed == reference; probable piece beats char split; <unk>") {
    // hand model: p(ab) >> p(a)p(b) so "ab" must stay fused; "zq" has no
    // vocab cover and segments as per-char <unk>
    val logp = Map("a" -> math.log(0.1), "b" -> math.log(0.1),
      "ab" -> math.log(0.5), "c" -> math.log(0.3))
    val vocab = logp.toSeq.toDF("token", "logp")
    val words = Seq("abab", "abc", "cab", "zq", "azb").toDF("word")
    val got = UnigramLm.viterbiSegment(words, vocab, maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got("abab") == Vector("ab", "ab"))
    assert(got("abc") == Vector("ab", "c"))
    assert(got("zq") == Vector("<unk>", "<unk>"))
    assert(got("azb") == Vector("a", "<unk>", "b"))
    got.keys.foreach { w =>
      assert(got(w) == refViterbi(w, logp, 4), s"word '$w'")
    }
  }

  test("Viterbi over the real corpus == reference under a trained model") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(120)
    val freqsDf = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    val vocabDf = UnigramLm.trainUnigramOnFreqs(freqsDf, vocabSize = 120,
      seedSize = 300, emIters = 2, maxPieceLen = 6)
    val logp = vocabDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val got = UnigramLm.viterbiSegment(freqsDf.select("word"), vocabDf, 6)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    got.foreach { case (w, toks) =>
      assert(toks == refViterbi(w, logp, 6), s"word '$w': $toks")
      assert(toks.filter(_ != "<unk>").mkString == w ||
        toks.contains("<unk>"), s"segmentation must cover the word: $w")
    }
  }

  test("model artifacts round-trip: loaded vocab segments identically") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60)
    val freqsDf = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    val vocab = UnigramLm.trainUnigramOnFreqs(freqsDf, vocabSize = 80,
      seedSize = 200, emIters = 2)
    val dir = java.nio.file.Files.createTempDirectory("ug_model").toString
    UnigramLm.saveModel(vocab, dir)
    val loaded = UnigramLm.loadModel(spark, dir)
    // doubles round-trip bit-exactly through parquet
    assert(loaded.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap ==
      vocab.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap)
    def seg(v: org.apache.spark.sql.DataFrame) =
      UnigramLm.viterbiSegment(freqsDf.select("word"), v, 6)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(seg(loaded) == seg(vocab), "loaded model must segment identically")
  }

  test("compression query: per-doc totals match the per-word Viterbi") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(40)
    val freqsDf = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    val vocabDf = UnigramLm.trainUnigramOnFreqs(freqsDf, vocabSize = 100,
      seedSize = 250, emIters = 2, maxPieceLen = 6).localCheckpoint(true)
    val logp = vocabDf.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val out = UnigramLm.tokenCompression(docs, "text", "doc_id", vocabDf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pat = Bpe.preTokenPattern.r
    val docRows = docs.select("doc_id", "text").collect()
    assert(out.keySet == docRows.map(_.getLong(0)).toSet)
    docRows.foreach { r =>
      val words = pat.findAllIn(r.getString(1)).toVector
      val exp = (words.size.toLong,
        words.map(w => refViterbi(w, logp, 6).size.toLong).sum)
      assert(out(r.getLong(0)) == exp, s"doc ${r.getLong(0)}")
    }
  }
}
