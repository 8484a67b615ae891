package graft

import org.apache.spark.sql.functions._
import graft.ops.DictTag

/** Planted contracts for the anchor-join dictionary tagger: exact
  * occurrence counts with overlaps, rarest-token anchoring, and the
  * vacuous-anchor edge (phrase token absent from the corpus).
  */
class DictTagSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], dict: Seq[(Int, String)]) =
    DictTag.tagDictionary(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      dict.toDF("phrase_id", "phrase"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap

  test("exact counts including overlapping occurrences") {
    val docs = Seq(
      1L -> "a b a b a",   // "a b a" occurs at 1 and 3 (overlap)
      2L -> "x a b y",
      3L -> "b a b")
    val dict = Seq(1 -> "a b a", 2 -> "a b", 3 -> "q")
    assert(run(docs, dict) == Map(
      (1L, 1) -> 2L, (1L, 2) -> 2L,
      (2L, 2) -> 1L,
      (3L, 2) -> 1L))
  }

  test("a stopword-heavy phrase still matches (anchor lands on the rare token)") {
    // "the" floods the corpus; the phrase's rare token keeps candidate
    // volume at its own frequency. Result equality is the contract —
    // the anchor choice is an internal optimization the planted corpus
    // makes observable only through cost, so assert correctness here.
    val docs = (1L to 30L).map(i => i -> "the the the the").toSeq ++
      Seq(100L -> "the zebra the", 101L -> "zebra the")
    val dict = Seq(7 -> "the zebra")
    assert(run(docs, dict) == Map((100L, 7) -> 1L))
  }

  test("a phrase with a corpus-absent token matches nothing, loudly nothing") {
    val docs = Seq(1L -> "a b c")
    assert(run(docs, Seq(1 -> "a zz")) == Map.empty)
    // and a phrase longer than every document cannot match
    assert(run(docs, Seq(1 -> "a b c d e")) == Map.empty)
  }

  test("matches at document boundaries are found") {
    val docs = Seq(1L -> "a b c d")
    val dict = Seq(1 -> "a b", 2 -> "c d", 3 -> "a b c d")
    assert(run(docs, dict) == Map((1L, 1) -> 1L, (1L, 2) -> 1L, (1L, 3) -> 1L))
  }
}
