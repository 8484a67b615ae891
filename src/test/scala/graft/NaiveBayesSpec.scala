package graft

import org.apache.spark.sql.functions._

import graft.ops.NaiveBayes

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent in-memory mirror of the scoring formula (StrictMath.log
    * like Spark's codegen, 6-dp rounding at the same points, exact
    * decimal sums) — op-order-exact, so equality is ==, not approx.
    */
  private def refScores(train: Seq[(String, String)], testText: String)
      : Map[String, Double] = {
    val toks = train.flatMap { case (lab, t) => t.trim.split("\\s+").map(lab -> _) }
    val tc = toks.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val nl = toks.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = toks.map(_._2).distinct.size.toLong
    val nDocs = train.size.toLong
    val dl = train.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    nl.keys.map { lab =>
      val prior = round6(StrictMath.log(dl(lab).toDouble / nDocs))
      val lps = testText.trim.split("\\s+").toSeq.map { t =>
        val c = tc.getOrElse((lab, t), 0L)
        BigDecimal(round6(StrictMath.log((c + 1).toDouble / (nl(lab) + v))))
      }
      lab -> (prior + lps.sum.toDouble)
    }.toMap
  }

  private val train = Seq(
    (1L, "red red blue crimson", "warm"),
    (2L, "red orange red", "warm"),
    (3L, "blue teal blue navy", "cool"),
    (4L, "teal blue cyan", "cool"),
    (5L, "blue ice navy", "cool"),
  ).toDF("doc_id", "text", "lang")

  test("scores match the op-order-exact in-memory reference") {
    val test = Seq((10L, "red red orange", "warm")).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.trainScore(train, test, "doc_id", "text", "lang")
      .collect().map(r => (r.getString(2), r.getDouble(4))).toMap
    val ref = refScores(
      Seq(("warm", "red red blue crimson"), ("warm", "red orange red"),
        ("cool", "blue teal blue navy"), ("cool", "teal blue cyan"),
        ("cool", "blue ice navy")),
      "red red orange")
    val best = ref.toSeq.sortBy { case (l, s) => (-s, l) }.head
    assert(out.keySet == Set(best._1))
    assert(out(best._1) == best._2, s"engine ${out(best._1)} vs ref ${best._2}")
  }

  test("separable corpus classifies held-out docs correctly") {
    val test = Seq(
      (10L, "red crimson orange", "warm"),
      (11L, "navy teal ice", "cool"),
    ).toDF("doc_id", "text", "lang")
    val out = NaiveBayes.trainScore(train, test, "doc_id", "text", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq.sortBy(_._1) ==
      Seq((10L, "warm", "warm"), (11L, "cool", "cool")))
  }

  test("all-OOV doc still scores (smoothing totality) and n_tokens counts occurrences") {
    val test = Seq((10L, "zzz yyy zzz", "warm")).toDF("doc_id", "text", "lang")
    val rows = NaiveBayes.trainScore(train, test, "doc_id", "text", "lang").collect()
    assert(rows.length == 1)
    assert(rows.head.getInt(3) == 3)
    // every token unseen -> per-class score = prior + ntok * ln(1/(N_y+V)):
    // warm = ln(2/5) + 3*ln(1/15) ~= -9.04 beats
    // cool = ln(3/5) + 3*ln(1/18) ~= -9.18 — the smaller class corpus
    // (N_warm=7 < N_cool=10) outweighs the smaller prior on OOV text
    assert(rows.head.getString(2) == "warm")
  }

  test("exact score ties break to the lexicographically smallest class") {
    val sym = Seq(
      (1L, "aa bb", "y2"), (2L, "aa bb", "y1"),
    ).toDF("doc_id", "text", "lang")
    val test = Seq((10L, "aa bb", "y1")).toDF("doc_id", "text", "lang")
    val rows = NaiveBayes.trainScore(sym, test, "doc_id", "text", "lang").collect()
    assert(rows.head.getString(2) == "y1")
  }
}
