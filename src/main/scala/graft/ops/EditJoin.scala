package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join — entity resolution's core
  * primitive ("which records are the same thing, modulo typos"), as an
  * EXACT blocked join: candidate generation by the PassJoin segment
  * scheme (Li, Deng, Feng: "PASS-JOIN: a partition-based method for
  * similarity joins", ICDE 2011 / PVLDB 5(3)), verification by
  * `levenshtein` — Spark's codegen'd DP kernel.
  *
  * Completeness (why the blocked result EQUALS brute force, which is
  * exactly what the q108 oracle hash checks): partition every string
  * into k+1 contiguous segments; an edit script of <= k operations can
  * damage at most k of them, so at least one segment survives VERBATIM
  * in the partner, displaced by at most the net insertions/deletions
  * before it — i.e. found at a start position within +-k of its own.
  * Generating, per probe string, every substring of the right length at
  * those +-k positions (a superset of PassJoin's tighter multi-match
  * window — more candidates, never fewer) therefore co-keys every true
  * pair; the final levenshtein filter removes the rest. No false
  * negatives by pigeonhole, no false positives by verification.
  *
  * Scale shape: segments/substrings explode linearly — (k+1) keys per
  * indexed row, O(k²) per probe row — and candidates meet in one
  * equi-join on (target length, segment id, segment text); there is no
  * all-pairs path. Blocking selectivity is the segment-text entropy:
  * corpora whose strings share a long constant prefix (so a whole
  * segment is constant) degrade toward verify-all-pairs — the join
  * stays correct, the shuffle pays for the corpus's lack of entropy.
  */
object EditJoin {

  /** 0-based start of segment `i` of a length-`len` string cut into
    * k+1 even segments (PassJoin's scheme): floor(i * len / (k+1)).
    */
  private def segStart(i: Column, len: Column, k: Int): Column =
    floor(i * len / (k + 1)).cast("int")

  /** All (id_a, id_b, dist) pairs with levenshtein(str_a, str_b) <= k,
    * id_a < id_b.
    *
    * Two exact blocking schemes, chosen by k:
    *  - k <= 2: SYMMETRIC-DELETE neighborhoods (Garbe's SymSpell): each
    *    string emits every variant reachable by <= k character
    *    deletions (1 + L + L(L-1)/2 keys at k=2). Soundness of the
    *    block: an edit script of <= k ops decomposes into <= k
    *    deletions on each side reaching a COMMON string (substitution =
    *    delete the differing char from both; insert/delete = delete
    *    from one side), so every true pair shares a variant key. The
    *    reverse direction over-admits (shared variant => lev <= 2k) —
    *    verification removes those. Crucially the key entropy comes
    *    from the WHOLE string, so corpora whose strings share a long
    *    constant prefix (where segment blocking degrades to all-pairs —
    *    measured 112M candidates for 262k true pairs on the customer
    *    fixture) still block selectively: deleting inside the varying
    *    region produces near-unique variants.
    *  - k >= 3: the PassJoin segment scheme below (deletion
    *    neighborhoods grow as L^k and stop paying).
    *
    * Strings shorter than k+1 characters are rejected loudly on the
    * PassJoin path only (they cannot be cut into k+1 non-empty
    * segments); the deletion path handles any length.
    */
  def levenshteinSelfJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // one contract for both paths: NULL strings are rejected loudly
    // here (the deletion path would otherwise drop them silently via
    // explode of a null variants array, while PassJoin failed loudly —
    // the same public API must not change behavior with k)
    require(df.filter(col(strCol).isNull).isEmpty,
      s"levenshteinSelfJoin: NULL values in '$strCol' — filter them first")
    if (k <= 2) deletionSelfJoin(df, idCol, strCol, k)
    else passJoinSelf(df, idCol, strCol, k)
  }

  /** All <= k-deletion variants of `s` (including `s` itself),
    * deduplicated per row. `s`/`len` must be plain attribute columns.
    */
  private def deletionVariants(s: Column, len: Column, k: Int): Column = {
    val self = array(s)
    val singles = transform(sequence(lit(1), len), p =>
      concat(s.substr(lit(1), p - 1), s.substr(p + 1, len - p)))
    val all =
      if (k == 1) concat(self, singles)
      else {
        // ordered position pairs p < q, both deleted
        val pairs = flatten(transform(sequence(lit(1), len - 1), p =>
          transform(sequence(p + 1, len), q =>
            concat(s.substr(lit(1), p - 1), s.substr(p + 1, q - p - 1),
              s.substr(q + 1, len - q)))))
        concat(self, singles, when(len >= 2, pairs)
          .otherwise(array().cast("array<string>")))
      }
    array_distinct(all)
  }

  private def deletionSelfJoin(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))
    val a = base.select(col("id").as("id_a"), col("s").as("sa"),
      explode(deletionVariants(col("s"), col("len"), k)).as("v"))
    val b = base.select(col("id").as("id_b"), col("s").as("sb"),
      explode(deletionVariants(col("s"), col("len"), k)).as("v"))
    a.join(b, "v")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        graft.functions.LevWithin.levWithin(col("sa"), col("sb"), k))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist").distinct()
  }

  private def passJoinSelf(df: DataFrame, idCol: String, strCol: String,
      k: Int): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("len"))
    require(base.filter(col("len") < k + 1 || col("len").isNull).isEmpty,
      s"levenshteinSelfJoin(k=$k) needs all strings of length >= ${k + 1}")

    // partition side: the k+1 segments of each string, keyed by
    // (own length, segment id, segment text)
    val segs = base.select(col("id").as("id_a"), col("s").as("sa"),
        explode(transform(sequence(lit(0), lit(k)), i => {
          val st = segStart(i, col("len"), k)
          val ln = segStart(i + 1, col("len"), k) - st
          struct(col("len").as("la"), i.as("seg"),
            col("s").substr(st + 1, ln).as("txt"))
        })).as("key"))

    // probe side: for each candidate partner length la in [len-k, len+k]
    // (>= k+1), each segment id, each start within +-k of the segment's
    // own start — every substring that could BE a surviving segment
    val probes = base.select(col("id").as("id_b"), col("s").as("sb"),
        explode(flatten(flatten(
          transform(sequence(col("len") - k, col("len") + k), la =>
            when(la >= k + 1,
              transform(sequence(lit(0), lit(k)), i => {
                val st = segStart(i, la, k)
                val ln = segStart(i + 1, la, k) - st
                val pLo = greatest(st + 1 - k, lit(1))
                val pHi = least(st + 1 + k, col("len") - ln + 1)
                when(pLo <= pHi,
                  transform(sequence(pLo, pHi), p =>
                    struct(la.as("la"), i.as("seg"),
                      col("s").substr(p, ln).as("txt"))))
                  .otherwise(array().cast("array<struct<la:int,seg:int,txt:string>>"))
              }))
              .otherwise(array().cast("array<array<struct<la:int,seg:int,txt:string>>>"))
          )))).as("key"))

    // verify BEFORE deduplicating: candidate rows stream straight out of
    // the (tiny-keyed) segment join through the codegen'd levenshtein
    // filter, so the only exchange after the join carries VERIFIED pairs.
    // A distinct on raw candidates would shuffle the candidate set
    // itself — on a low-entropy corpus that approaches all-pairs and
    // dominates everything (measured 6x on the customer-name fixture).
    // A pair matching on m segment keys pays m levenshtein evaluations
    // (m <= k+1, typically 1) — far cheaper than exchanging the rows.
    // the verify kernel is the custom banded `lev_within` (buffer-reuse,
    // byte-level ASCII fast path, early exit) — it runs once per
    // candidate, and candidates approach all-pairs on low-entropy
    // corpora, so its constant factor dominates the whole join
    segs.join(probes, "key")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist",
        graft.functions.LevWithin.levWithin(col("sa"), col("sb"), k))
      .filter(col("dist") >= 0)
      .select("id_a", "id_b", "dist").distinct()
  }
}
