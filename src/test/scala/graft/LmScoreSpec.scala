package graft

import org.apache.spark.sql.functions._
import graft.ops.LmScore

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramScore matches a hand-computed add-alpha model") {
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "z")).toDF("doc_id", "text")
    val out = LmScore.bigramScore(docs, ref, "doc_id", "text", alpha = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // ref bigrams: "a b" x2, "b a" x1; contexts: a->2, b->1; V=2
    // doc 1: "a b" -> ln((2+.4)/(2+.8)); "b c" -> OOV, ln((0+.4)/(1+.8))
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val lp1 = r6(math.log(2.4 / 2.8))
    val lp2 = r6(math.log(0.4 / 1.8))
    val expAvg = r6((BigDecimal(lp1) + BigDecimal(lp2)).toDouble / 2)
    assert(out.length == 1, "a 1-token doc has no bigram and no row")
    assert(out.head == ((1L, 2L, 1L, expAvg)), s"${out.head} vs $expAvg")
  }

  test("reference-like text outscores OOV gibberish") {
    val ref = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "zxq wvu tsr qpo nml"),
    ).toDF("doc_id", "text")
    val scores = LmScore.bigramScore(docs, ref, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val byId = scores.map(t => t._1 -> t).toMap
    assert(byId(1L)._2 == 0L, "in-reference bigrams are not OOV")
    assert(byId(2L)._2 == 4L, "all gibberish bigrams are OOV")
    assert(byId(1L)._3 > byId(2L)._3, "reference-like text must score higher")
  }

  test("bigramScore rejects alpha <= 0 and reserved columns") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      LmScore.bigramScore(df, df, "doc_id", "text", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      LmScore.bigramScore(df.withColumnRenamed("doc_id", "g"), df, "g", "text")
    }
  }

  test("knBigramScore matches a hand-computed Kneser-Ney model") {
    val ref = Seq((100L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b c"), (2L, "z"), (3L, "z z")).toDF("doc_id", "text")
    val out = LmScore.knBigramScore(docs, ref, "doc_id", "text", discount = 0.75)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // model: cb("a b")=2, cb("b a")=1; cu(a)=2 n1f(a)=1, cu(b)=1
    // n1f(b)=1; n1r(a)=1, n1r(b)=1; T=2 bigram types, V=2.
    // doc 1 "a b": max(2-.75,0)/2 + (.75*1/2)*((1+1)/4) = .625+.1875
    // doc 1 "b c": max(0-.75,0)/1 + (.75*1/1)*((0+1)/4) = 0+.1875, OOV
    // doc 3 "z z": unseen context -> pure continuation (0+1)/4 = .25, OOV
    def r6(x: Double) = new java.math.BigDecimal(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val lp1 = r6(math.log(0.8125))
    val lp2 = r6(math.log(0.1875))
    val avg1 = r6((BigDecimal(lp1) + BigDecimal(lp2)).toDouble / 2)
    assert(out.length == 2, "the 1-token doc has no bigram and no row")
    assert(out(0) == ((1L, 2L, 1L, avg1)), s"${out(0)} vs $avg1")
    assert(out(1) == ((3L, 1L, 1L, r6(math.log(0.25)))), out(1).toString)
  }

  test("KN: reference-like text outscores gibberish; bounds enforced") {
    val ref = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "zxq wvu tsr qpo nml"),
    ).toDF("doc_id", "text")
    val byId = LmScore.knBigramScore(docs, ref, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(byId(1L)._1 == 0L && byId(2L)._1 == 4L)
    assert(byId(1L)._2 > byId(2L)._2, "reference-like text must score higher")
    intercept[IllegalArgumentException] {
      LmScore.knBigramScore(docs, ref, "doc_id", "text", discount = 1.0)
    }
    intercept[IllegalArgumentException] {
      LmScore.knBigramScore(docs.withColumnRenamed("doc_id", "w2"), ref, "w2", "text")
    }
  }
}
