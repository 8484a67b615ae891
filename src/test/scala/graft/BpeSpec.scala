package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

/** The distributed BPE trainer against an independent in-memory reference
  * implementation — EXACT merge-sequence equality over the real sf0.001
  * corpus, plus the kernel and compression contracts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Straight-line reference BPE over a word-frequency map (the textbook
    * algorithm, no Spark): same tie-break (count desc, left asc, right
    * asc), same left-to-right non-overlapping merge application.
    */
  private def referenceBpe(freqs: Map[String, Long], nMerges: Int): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = freqs.map { case (w, c) =>
      w.toVector.map(_.toString) -> c
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sum }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, rt), c) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
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
        r += 1
      }
    }
    out.toSeq
  }

  test("bpe_merge kernel: left-to-right non-overlap, interpreted==codegen") {
    import graft.functions.BpeMerge
    val df = Seq(
      Seq("a", "a", "a"),          // -> ["aa","a"], NOT ["a","aa"]
      Seq("a", "b", "a", "b"),     // -> ["ab","ab"]
      Seq("x"), Seq.empty[String],
    ).toDF("s")
    val expected = Seq(Seq("aa", "a"), Seq("ab", "ab"), Seq("x"), Seq())
    def run() = df.select(BpeMerge.merge(col("s"), "a",
      "a")).collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(run().head == Seq("aa", "a"))
    def runAB() = df.select(BpeMerge.merge(col("s"), "a", "b"))
      .collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(runAB()(1) == Seq("ab", "ab"))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      assert(run().head == Seq("aa", "a"))
      assert(runAB() == Seq(Seq("a", "a", "a"), Seq("ab", "ab"), Seq("x"), Seq())
        .map(s => if (s == Seq("a", "a", "a")) s else s)) // same shapes
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val _ = expected // shape documented above
  }

  test("trainBpe matches the textbook example") {
    // Sennrich-style fixture: {"hug":10, "pug":5, "pun":12, "bun":4, "hugs":5}
    val freqs = Seq(("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L),
      ("hugs", 5L)).toDF("word", "cnt")
    val rules = Bpe.trainBpeOnFreqs(freqs, nMerges = 3)
    val ref = referenceBpe(Map("hug" -> 10L, "pug" -> 5L, "pun" -> 12L,
      "bun" -> 4L, "hugs" -> 5L), 3)
    assert(rules.map(r => (r.left, r.right, r.count)) == ref, s"$rules vs $ref")
    // first merge must be (u,g) c=20 or (u,n) c=16 — (u,g) wins
    assert(rules.head.left == "u" && rules.head.right == "g" &&
      rules.head.count == 20L)
  }

  test("distributed trainer == in-memory reference over the real sf0.001 corpus") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val freqsDf = Bpe.wordFreqs(docs, "text")
    val freqs = freqsDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 12 // crosses a checkpointEvery boundary (8)
    // threshold 0 pins the DISTRIBUTED loop (the default would fold this
    // dimension-sized vocab to the driver — covered by the next test)
    val dist = Bpe.trainBpeOnFreqs(Bpe.wordFreqs(docs, "text"), n,
        localFoldThreshold = 0L)
      .map(r => (r.left, r.right, r.count))
    val ref = referenceBpe(freqs, n)
    assert(dist == ref,
      s"divergence at rank ${dist.zip(ref).indexWhere(t => t._1 != t._2) + 1}: $dist vs $ref")
  }

  test("driver-local fold == distributed loop over the real corpus (threshold gate)") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val n = 12
    val dist = Bpe.trainBpeOnFreqs(Bpe.wordFreqs(docs, "text"), n,
      localFoldThreshold = 0L)
    // the default threshold routes this vocabulary to the local fold
    val local = Bpe.trainBpeOnFreqs(Bpe.wordFreqs(docs, "text"), n)
    assert(local == dist,
      s"local fold diverged at rank ${local.zip(dist)
        .indexWhere(t => t._1 != t._2) + 1}: $local vs $dist")
    // tie-break parity probe: equal counts forced onto every pair; both
    // paths must pick the UTF-8-byte-minimal (l, r)
    val ties = Seq(("ba", 3L), ("dc", 3L), ("fe", 3L)).toDF("word", "cnt")
    assert(Bpe.trainBpeOnFreqs(ties, 1) ==
      Bpe.trainBpeOnFreqs(Seq(("ba", 3L), ("dc", 3L), ("fe", 3L))
        .toDF("word", "cnt"), 1, localFoldThreshold = 0L))
    // the segmentation table folds to the driver under the same gate:
    // both routes must emit identical (word, n, tokens) rows
    def segSet(th: Long) = Bpe.segmentVocab(Bpe.wordFreqs(docs, "text"),
        dist, localFoldThreshold = th)
      .collect()
      .map(r => (r.getString(0), r.getInt(1),
        r.getSeq[String](2).toList)).toSet
    assert(segSet(65536L) == segSet(0L),
      "driver-local segmentation diverged from the BpeMerge plan route")
  }

  test("token compression is monotone and exact on in-vocabulary text") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(50)
    val freqs = Bpe.wordFreqs(docs, "text")
    val rules = Bpe.trainBpe(docs.limit(50), "text", 10)
    val out = Bpe.tokenCompression(docs, "text", "doc_id", freqs, rules)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // BPE only fuses: per-doc bpe tokens <= total chars, >= pretokens
    out.foreach { case (id, pre, bpe) =>
      assert(bpe >= pre, s"doc $id: bpe tokens $bpe below pretoken floor $pre")
    }
    // merges strictly reduce total tokens vs the no-merge segmentation
    val none = Bpe.tokenCompression(docs, "text", "doc_id", freqs, Seq.empty)
      .agg(sum("n_bpe_tokens")).collect()(0).getLong(0)
    val trained = out.map(_._3).sum
    assert(trained < none, s"10 merges must compress: $trained vs $none")
  }

  /** Reference segmentation: apply reference merges in rank order with
    * the same left-to-right non-overlap loop. */
  private def refSegment(w: String, rules: Seq[(String, String, Long)]): Vector[String] = {
    var syms = w.toVector.map(_.toString)
    rules.foreach { case (l, r, _) =>
      val merged = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          merged += (l + r); i += 2
        } else { merged += syms(i); i += 1 }
      }
      syms = merged.toVector
    }
    syms
  }

  // Spark string sort order is UTF-8 binary; Scala's default String
  // ordering is UTF-16 — they disagree above the BMP, so the reference
  // id assignment must compare UTF-8 bytes
  private val utf8Order: Ordering[String] = (a: String, b: String) => {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n && x(i) == y(i)) i += 1
    if (i < n) (x(i) & 0xff) - (y(i) & 0xff) else x.length - y.length
  }

  test("corpus token-id encoding == in-memory reference over sf0.001") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val freqsDf = Bpe.wordFreqs(docs, "text")
    val freqs = freqsDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 12
    val refRules = referenceBpe(freqs, n)
    val rules = Bpe.trainBpe(docs, "text", n)
    val seg = freqs.keys.map(w => w -> refSegment(w, refRules)).toMap
    // learned ids start at 256: 0..255 are the reserved byte-fallback block
    val ids = seg.values.flatten.toSeq.distinct.sorted(utf8Order).zipWithIndex
      .map { case (t, i) => t -> (i + Bpe.ByteIdCount) }.toMap
    val refEnc = docs.select("doc_id", "text").collect().flatMap { r =>
      val words = Bpe.preTokenPattern.r.findAllIn(r.getString(1)).toSeq
      if (words.isEmpty) None
      else Some(r.getLong(0) -> words.flatMap(w => seg(w).map(ids)))
    }.toMap
    val got = Bpe.encodeTokenIds(docs, "text", "doc_id", freqsDf, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
    assert(got.keySet == refEnc.keySet)
    val bad = got.keys.filter(k => got(k) != refEnc(k))
    assert(bad.isEmpty, s"docs diverge: ${bad.take(3).map(k =>
      s"$k: ${got(k).take(10)} vs ${refEnc(k).take(10)}")}")
    // n_tokens agrees with the compression query's count
    val comp = Bpe.tokenCompression(docs, "text", "doc_id", freqsDf, rules)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (k, v) => assert(v.length.toLong == comp(k)) }
  }

  test("decoding the id sequence reconstructs the pre-token character stream") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(30)
    val freqsDf = Bpe.wordFreqs(docs, "text")
    val rules = Bpe.trainBpe(docs, "text", 8)
    val idToTok = Bpe.tokenVocab(freqsDf, rules)
      .collect().map(r => r.getInt(1) -> r.getString(0)).toMap
    val enc = Bpe.encodeTokenIds(docs, "text", "doc_id", freqsDf, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    enc.foreach { case (id, tids) =>
      val decoded = tids.map(idToTok).mkString
      val expected = Bpe.preTokenPattern.r.findAllIn(texts(id)).mkString
      assert(decoded == expected, s"doc $id round-trip broke")
    }
  }

  test("tokenizer artifacts round-trip: merges in rank order, vocab ids intact") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001").limit(40)
    val freqs = Bpe.wordFreqs(docs, "text")
    val rules = Bpe.trainBpe(docs.limit(40), "text", 10)
    val vocab = Bpe.tokenVocab(freqs, rules)
    val dir = java.nio.file.Files.createTempDirectory("graft_tok").toString
    Bpe.saveTokenizer(spark, dir, rules, vocab)
    val (r2, v2) = Bpe.loadTokenizer(spark, dir)
    assert(r2 == rules, "merge rules must round-trip in rank order")
    val a = vocab.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val b = v2.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(a == b, "vocab ids must round-trip")
    // a loaded tokenizer encodes identically to the in-memory one
    val e1 = Bpe.encodeTokenIds(docs, "text", "doc_id", freqs, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    val e2 = Bpe.encodeTokenIds(docs, "text", "doc_id", freqs, r2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(e1 == e2)
  }

  test("OOV words byte-fallback: total encode, round-trip, in-vocab ids unchanged") {
    val trainDocs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val freqsDf = Bpe.wordFreqs(trainDocs, "text")
    val rules = Bpe.trainBpe(trainDocs, "text", 2)
    val idToTok = Bpe.tokenVocab(freqsDf, rules)
      .collect().map(r => r.getInt(1) -> r.getString(0)).toMap
    // the byte block occupies exactly 0..255; learned tokens start at 256
    (0 until 256).foreach(i => assert(idToTok(i) == f"<0x$i%02X>"))
    assert(idToTok.keys.filter(_ >= 256).nonEmpty)

    // planted OOV words (ascii + multi-byte UTF-8) encode TOTALLY
    val probe = Seq((9L, "aa zz"), (10L, "bb é中")).toDF("doc_id", "text")
    val enc = Bpe.encodeTokenIds(probe, "text", "doc_id", freqsDf, rules)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2).toSeq).toMap
    // round-trip: learned ids via vocab, byte ids via the raw byte
    def decode(tids: Seq[Int]): String = {
      val bytes = scala.collection.mutable.ArrayBuffer.empty[Byte]
      val sb = new StringBuilder
      def flush(): Unit =
        if (bytes.nonEmpty) { sb ++= new String(bytes.toArray, "UTF-8"); bytes.clear() }
      tids.foreach { id =>
        if (id < Bpe.ByteIdCount) bytes += id.toByte
        else { flush(); sb ++= idToTok(id) }
      }
      flush(); sb.toString
    }
    assert(decode(enc(9L)) == "aazz")
    assert(decode(enc(10L)) == "bbé中")
    // in-vocab words' ids are unchanged by the presence of OOV words
    val clean = Bpe.encodeTokenIds(
      Seq((1L, "aa bb cc")).toDF("doc_id", "text"), "text", "doc_id",
      freqsDf, rules).collect().map(r => r.getSeq[Int](2).toSeq).head
    val aaIds = enc(9L).takeWhile(_ >= Bpe.ByteIdCount)
    assert(clean.startsWith(aaIds) && aaIds.nonEmpty,
      s"in-vocab prefix ids must match: $clean vs ${enc(9L)}")
    // every byte-fallback id is a real byte of the OOV word
    assert(enc(9L).drop(aaIds.length) == "zz".getBytes("UTF-8").map(_ & 0xff).toSeq)
  }

  test("strict mode: encoding an OOV word fails loudly when byteFallback=false") {
    val trainDocs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val freqsDf = Bpe.wordFreqs(trainDocs, "text")
    val rules = Bpe.trainBpe(trainDocs, "text", 2)
    val probe = Seq((9L, "aa zz")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Bpe.encodeTokenIds(probe, "text", "doc_id", freqsDf, rules,
        byteFallback = false).collect()
    }
    assert(e.getMessage.contains("not in training vocabulary") ||
      e.getCause != null && e.getCause.getMessage.contains("not in training vocabulary"),
      s"unexpected error: ${e.getMessage}")
  }
}
