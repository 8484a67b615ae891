package graft

import org.apache.spark.sql.functions._
import graft.ops.{Bpe, WordPiece}

/** WordPiece contracts, mirroring BpeSpec's scheme: the distributed
  * trainer and the greedy encoder are pinned by EXACT equality against
  * independent in-memory references over the real sf0.001 corpus, plus
  * hand-built cases where the likelihood score must diverge from BPE's
  * raw-frequency choice and where longest-match must beat merge order.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
  }

  /** In-memory WordPiece trainer: same likelihood score, same
    * (score DESC, l ASC, r ASC) tie-break in UTF-8 order, same
    * left-to-right non-overlapping merge. */
  private def referenceWp(freqs: Map[String, Long],
      nMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = freqs.map { case (w, c) =>
      w.toVector.map(_.toString) -> c
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      val uni = scala.collection.mutable.Map.empty[String, Long]
      words.foreach { case (syms, c) =>
        syms.foreach(s => uni(s) = uni.getOrElse(s, 0L) + c)
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val scored = counts.toSeq.map { case ((l, rt), c) =>
          (l, rt, c, c.toDouble / (uni(l).toDouble * uni(rt).toDouble))
        }
        val (l, rt, c, _) = scored.min(Ordering.fromLessThan[(String, String, Long, Double)] {
          case ((l1, r1, _, s1), (l2, r2, _, s2)) =>
            if (s1 != s2) s1 > s2
            else if (l1 != l2) utf8Order.lt(l1, l2)
            else utf8Order.lt(r1, r2)
        })
        out += ((l, rt, c))
        words = words.toSeq.map { case (syms, cnt) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
              merged += (l + rt); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> cnt
        }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
      }
      r += 1
    }
    out.toSeq
  }

  /** In-memory greedy longest-match segmentation. */
  private def refGreedy(w: String, pieces: Set[String],
      maxLen: Int): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < w.length) {
      val best = (math.min(maxLen, w.length - i) to 1 by -1).iterator
        .map(l => w.substring(i, i + l)).find(pieces.contains)
      best match {
        case Some(p) => out += p; i += p.length
        case None => out += "<unk>"; i += 1
      }
    }
    out.toVector
  }

  test("likelihood scoring diverges from raw pair frequency where it must") {
    // (a,b) count 10 but unigrams 10/10 -> score .1; (c,d) count 3 with
    // unigrams 3/3 -> score 1/3. BPE merges (a,b) first; WordPiece (c,d).
    val freqs = Seq(("ab", 10L), ("cd", 3L)).toDF("word", "cnt")
    val wp = WordPiece.trainWordPieceOnFreqs(freqs, 1).head
    assert((wp.left, wp.right, wp.count) == (("c", "d", 3L)), wp.toString)
    val bpe = Bpe.trainBpeOnFreqs(freqs, 1).head
    assert((bpe.left, bpe.right) == (("a", "b")))
  }

  test("distributed trainer == in-memory reference over the real sf0.001 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(docs, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 12 // crosses a checkpointEvery boundary (8)
    val dist = WordPiece.trainWordPiece(docs, "text", n)
      .map(r => (r.left, r.right, r.count))
    val ref = referenceWp(freqs, n)
    assert(dist == ref,
      s"divergence at rank ${dist.zip(ref).indexWhere(t => t._1 != t._2) + 1}: $dist vs $ref")
  }

  test("greedy encoder: longest match beats merge order; <unk> is per-character") {
    // inventory {a, b, c, ab, abc}: "abab" -> [ab, ab]; "abcab" ->
    // [abc, ab] (longest-first, not the BPE merge replay); unseen 'z'
    // inside a word becomes one <unk> and the scan resumes
    val trainFreqs = Seq(("abc", 1L), ("ab", 1L)).toDF("word", "cnt")
    val rules = Seq(Bpe.MergeRule(1, "a", "b", 2L), Bpe.MergeRule(2, "ab", "c", 1L))
    val got = WordPiece.segmentGreedy(
        Seq("abab", "abcab", "azb", "zzz").toDF("word"), trainFreqs, rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    assert(got("abab") == Vector("ab", "ab"), got("abab").toString)
    assert(got("abcab") == Vector("abc", "ab"), got("abcab").toString)
    assert(got("azb") == Vector("a", "<unk>", "b"), got("azb").toString)
    assert(got("zzz") == Vector("<unk>", "<unk>", "<unk>"))
  }

  test("distributed greedy segmentation == reference over corpus words") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val freqs = Bpe.wordFreqs(docs, "text")
    freqs.persist()
    val rules = WordPiece.trainWordPieceOnFreqs(freqs, 12)
    val pieces = WordPiece.pieceInventory(freqs, rules)
      .collect().map(_.getString(0)).toSet
    val maxLen = (1 +: rules.map(r => (r.left + r.right).length)).max
    val got = WordPiece.segmentGreedy(freqs.select("word"), freqs, rules)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val words = freqs.select("word").collect().map(_.getString(0))
    freqs.unpersist(false)
    assert(got.keySet == words.toSet)
    words.foreach { w =>
      val ref = refGreedy(w, pieces, maxLen)
      assert(got(w) == ref, s"word '$w': ${got(w)} vs $ref")
    }
    // segmentation is a partition: pieces re-concatenate to the word
    // (every corpus char is in the inventory, so no <unk> here)
    words.foreach(w => assert(got(w).mkString == w))
  }

  test("model artifacts round-trip: loaded pieces segment identically") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(60)
    val freqs = Bpe.wordFreqs(docs, "text").localCheckpoint(true)
    val rules = WordPiece.trainWordPieceOnFreqs(freqs, 8)
    val dir = java.nio.file.Files.createTempDirectory("wp_model").toString
    WordPiece.saveModel(spark, dir, rules, freqs)
    val (loadedRules, pieces) = WordPiece.loadModel(spark, dir)
    assert(loadedRules == rules, "rules must round-trip in rank order")
    def seg(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    val direct = seg(WordPiece.segmentGreedy(freqs.select("word"), freqs, rules))
    val viaModel = seg(WordPiece.segmentGreedyWithPieces(
      freqs.select("word"), pieces))
    assert(viaModel == direct, "loaded model must segment identically")
  }

  test("compression query: per-doc totals match the per-word segmentation") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val freqs = Bpe.wordFreqs(docs, "text")
    freqs.persist()
    val rules = WordPiece.trainWordPieceOnFreqs(freqs, 10)
    val out = WordPiece.tokenCompression(docs, "text", "doc_id", freqs, rules)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val pieces = WordPiece.pieceInventory(freqs, rules)
      .collect().map(_.getString(0)).toSet
    val maxLen = (1 +: rules.map(r => (r.left + r.right).length)).max
    freqs.unpersist(false)
    val pat = Bpe.preTokenPattern.r
    val docRows = docs.select("doc_id", "text").collect()
    assert(out.nonEmpty && out.keySet == docRows.map(_.getLong(0)).toSet)
    docRows.foreach { r =>
      val words = pat.findAllIn(r.getString(1)).toVector
      val exp = (words.size.toLong,
        words.map(w => refGreedy(w, pieces, maxLen).size.toLong).sum)
      assert(out(r.getLong(0)) == exp, s"doc ${r.getLong(0)}")
    }
  }
}
