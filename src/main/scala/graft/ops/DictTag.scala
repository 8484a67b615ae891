package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-phrase dictionary tagging — match a dictionary of N multi-token
  * phrases (blocklists, PII terms, keyword taxonomies, mined
  * collocations) against every document in ONE corpus pass.
  *
  * The scalable formulation is anchor-join, not N phrase scans: each
  * phrase picks ONE anchor token — its RAREST token by corpus document
  * frequency — and the corpus's exploded (token, position) stream joins
  * the broadcast anchor table; only anchor hits expand to candidate
  * spans, which one row-local slice comparison then verifies. Anchoring
  * on the rarest token is what bounds fan-out: a phrase containing a
  * stopword never anchors on it, so candidate volume tracks the RARE
  * token's frequency (near the true match count), not the stopword's.
  * Per-position work is O(anchor hits). Corpus scans: 3 (the df table,
  * the candidate stream, and the verification rejoin) regardless of
  * dictionary size — versus N full scans for per-phrase matching (q88
  * does one phrase); a caller that persists the tokenized corpus pays
  * one materialization plus two cached reads instead.
  */
object DictTag {

  /** Occurrences of every dictionary phrase in every document:
    * (idCol, phrase_id, n_matches > 0). `dict` carries (phrase_id,
    * phrase) with single-space-separated tokens; matching is
    * whitespace-token exact (the q30 tokenizer), overlapping
    * occurrences all count.
    */
  def tagDictionary(docs: DataFrame, idCol: String, textCol: String,
      dict: DataFrame): DataFrame = {
    val docToks = docs.select(col(idCol),
      graft.core.Cols.wsTokens(col(textCol)).as("_toks"))
    val dictTok = dict.select(col("phrase_id"),
      split(col("phrase"), " ").as("ptoks"))
      .withColumn("plen", size(col("ptoks")))
    // corpus document frequency per token — the anchor-choice statistic
    val dfTab = docToks
      .select(col(idCol), explode(array_distinct(col("_toks"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    // per phrase: the (df, offset)-minimal token anchors it; a token
    // absent from the corpus has df 0 — the phrase then cannot match,
    // and its anchor also cannot hit, which is vacuously correct
    val anchors = dictTok
      .select(col("phrase_id"), col("ptoks"), col("plen"),
        posexplode(col("ptoks")).as(Seq("off", "tok")))
      .join(dfTab, Seq("tok"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("phrase_id")
          .orderBy(col("df"), col("off"))))
      .filter(col("_rk") === 1)
      .select(col("tok"), col("phrase_id"), col("ptoks"), col("plen"),
        col("off"))
    // candidate spans from anchor hits. The exploded stream carries ONLY
    // (id, len, pos, token) — never the token array itself: a Generate
    // that keeps the array in its output copies the whole document into
    // every one of its token rows, which is a corpus-size^2-ish blowup.
    // Verification rejoins the few anchor-hit candidates against the
    // one-row-per-doc token table and slice-compares row-locally.
    val cand = docToks
      .select(col(idCol), size(col("_toks")).as("_len"),
        posexplode(col("_toks")).as(Seq("_p0", "tok")))
      .join(broadcast(anchors), Seq("tok"))
      .withColumn("_start", col("_p0") + 1 - col("off")) // 1-based
      .filter(col("_start") >= 1 &&
        col("_start") + col("plen") - 1 <= col("_len"))
      .select(col(idCol), col("phrase_id"), col("_start"),
        col("ptoks"), col("plen"))
    cand.join(docToks, Seq(idCol))
      .filter(slice(col("_toks"), col("_start"), col("plen")) === col("ptoks"))
      .groupBy(col(idCol), col("phrase_id"))
      .agg(count(lit(1)).as("n_matches"))
  }
}
