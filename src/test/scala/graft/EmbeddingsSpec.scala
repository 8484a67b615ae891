package graft

import org.apache.spark.sql.functions._

import graft.ml.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("word2vec: planted co-occurrence becomes cosine proximity") {
    // two disjoint topic clusters: {alpha,beta} sentences vs {gamma,delta}
    // sentences — alpha's nearest trained neighbor must come from its own
    // cluster, never the other
    val docs = ((1 to 300).map(i => (i.toLong, "alpha beta alpha beta alpha")) ++
      (301 to 600).map(i => (i.toLong, "gamma delta gamma delta gamma")))
      .toDF("doc_id", "text")
    val model = Embeddings.word2vec(docs, "text",
      vectorSize = 8, minCount = 1, maxIter = 3)
    val syn = Embeddings.topSynonyms(model, Seq("alpha"), k = 1)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(syn.toSeq == Seq(("alpha", 1, "beta")),
      s"alpha's nearest neighbor must be beta, got ${syn.toSeq}")
  }

  test("topSynonyms: shape, rank ordering, OOV words skipped, all-OOV loud") {
    val docs = (1 to 200).map(i => (i.toLong, "aa bb cc aa bb cc")).toDF("doc_id", "text")
    val model = Embeddings.word2vec(docs, "text",
      vectorSize = 4, minCount = 1, maxIter = 1)
    val out = Embeddings.topSynonyms(model, Seq("aa", "zz_unseen"), k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(out.forall(_._1 == "aa"), "OOV word must be skipped, not throw")
    assert(out.map(_._2).toSeq == Seq(1, 2))
    assert(out(0)._4 >= out(1)._4, "similarity must descend with rank")
    intercept[IllegalArgumentException] {
      Embeddings.topSynonyms(model, Seq("zz_unseen"), k = 2)
    }
  }
}
