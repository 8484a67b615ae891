package graft

import org.apache.spark.sql.functions._

import graft.ops.EditJoin

/** Contracts for the PassJoin-blocked edit-distance self-join (q108). */
class EditJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib
      d = lev(sa, sb)
      if d <= k
    } yield (ia, ib, d)).toSet
  }

  // varied-prefix fixture: base words plus planted typos (substitution,
  // deletion, insertion) and unrelated strings
  private val rows: Seq[(Long, String)] = Seq(
    1L -> "johnson", 2L -> "jonson",     // deletion
    3L -> "johnsen",                     // substitution of 1
    4L -> "thompson", 5L -> "thomson",   // deletion
    6L -> "thompsons",                   // insertion
    7L -> "walker", 8L -> "walter",      // 2 substitutions
    9L -> "completely", 10L -> "different",
    11L -> "abcdefgh", 12L -> "abxdefgh", 13L -> "abxdyfgh", // 1 and 2 subs
  )

  test("blocked join equals brute force (deletion path k=1,2; PassJoin path k=3)") {
    for (k <- Seq(1, 2, 3)) {
      val got = EditJoin.levenshteinSelfJoin(rows.toDF("id", "name"),
        "id", "name", k).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == brute(rows, k), s"k=$k mismatch")
    }
  }

  test("typo'd twins are found across lengths (insertion/deletion shift)") {
    val got = EditJoin.levenshteinSelfJoin(rows.toDF("id", "name"),
      "id", "name", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)) && got.contains((4L, 5L)) &&
      got.contains((4L, 6L)) && got.contains((11L, 12L)))
    assert(!got.contains((11L, 13L)), "distance-2 pair must not appear at k=1")
  }

  test("PassJoin path rejects strings shorter than k+1; deletion path takes them") {
    val e = intercept[IllegalArgumentException] {
      EditJoin.levenshteinSelfJoin(
        Seq(1L -> "ab", 2L -> "xy").toDF("id", "name"), "id", "name", 3)
    }
    assert(e.getMessage.contains("length >="))
    // deletion path: short strings fine, incl. distance through ""
    val got = EditJoin.levenshteinSelfJoin(
      Seq(1L -> "a", 2L -> "b", 3L -> "ab").toDF("id", "name"),
      "id", "name", 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1)))
  }

  test("NULL strings are rejected loudly on BOTH blocking paths") {
    val withNull = Seq((1L, "abc"), (2L, null)).toDF("id", "name")
    Seq(1, 3).foreach { k =>
      val e = intercept[IllegalArgumentException] {
        EditJoin.levenshteinSelfJoin(withNull, "id", "name", k)
      }
      assert(e.getMessage.contains("NULL"), s"k=$k: ${e.getMessage}")
    }
  }

  test("lev_within == builtin levenshtein (capped) on random unicode strings") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcxyz 0123é中😀" // ascii, accents, CJK, emoji
    def randStr() = (0 until (1 + rnd.nextInt(12)))
      .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      .replaceAll("(?<=[\uD800-\uDBFF])$", "") // no dangling high surrogate
    val pairs = (0 until 500).map(_ => (randStr(), randStr()))
    for (k <- Seq(0, 1, 2, 3)) {
      val df = pairs.toDF("a", "b")
        .withColumn("mine", graft.functions.LevWithin.levWithin(col("a"), col("b"), k))
        .withColumn("ref", levenshtein(col("a"), col("b")))
      val bad = df.filter(
        (col("ref") <= k && col("mine") =!= col("ref")) ||
          (col("ref") > k && col("mine") =!= -1)).collect()
      assert(bad.isEmpty, s"k=$k diverges: ${bad.take(3).mkString("; ")}")
    }
  }

  test("blocking prunes: candidates far under all-pairs on a varied corpus") {
    // 200 distinct random-ish words, no near pairs: the segment join must
    // not degenerate to all-pairs (it would under a shared constant
    // prefix — the documented entropy caveat)
    val words = (0 until 200).map(i => i.toLong -> s"w${i}x${i * 7 % 97}q${i * 13 % 89}")
    val out = EditJoin.levenshteinSelfJoin(words.toDF("id", "name"),
      "id", "name", 1)
    assert(out.count() == brute(words, 1).size.toLong)
  }
}
