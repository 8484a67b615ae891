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
}
