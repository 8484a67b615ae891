package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Unigram-LM subword tokenizer (Kudo 2018; the SentencePiece `unigram`
  * model) — the third major subword family next to [[Bpe]] and
  * [[WordPiece]], trained distributed:
  *
  *   1. SEED: all word substrings up to `maxPieceLen`, weighted by
  *      corpus word frequency; top `seedSize` by (freq DESC, token ASC)
  *      plus every single character (so every word stays segmentable).
  *   2. EM (`emIters` rounds): the E-step runs forward-backward over
  *      each word's segmentation lattice ROW-LOCALLY in Catalyst HOFs
  *      (log-space, logsumexp-stabilized) producing expected token
  *      counts; the M-step is one aggregation — expected counts summed
  *      as DECIMAL(38,18) so the reduction is associative-exact and
  *      partitioning-independent, then logp = ln(count) - ln(total).
  *   3. PRUNE to `vocabSize`: keep all single characters plus the top
  *      multi-character pieces by probability, then one more EM round
  *      renormalizes over the kept inventory.
  *
  * ENCODING is Viterbi (max-probability segmentation), again row-local;
  * score ties break to the longer final piece, then the
  * lexicographically LARGER token (one fixed rule, mirrored by the
  * in-memory reference in UnigramLmSpec).
  *
  * Scale shape: the corpus is touched once (the word-frequency
  * aggregation); everything else runs over the distinct-word table —
  * per-word lattice work is O(len · maxPieceLen) per EM round, the
  * M-step shuffles (token, expected) pairs, and the vocab table stays
  * broadcastable. No SQL oracle (iterative EM); contracts are
  * reference equality on discrete outputs, 1e-9-relative agreement on
  * expected counts, and the EM likelihood-monotonicity property.
  */
object UnigramLm {

  private val ExpDec = DecimalType(38, 18)
  private val NegInf = Double.NegativeInfinity

  /** log(Σ exp(t)) of a double-array column, max-stabilized; empty
    * arrays and all-`-inf` arrays yield `-inf` (log of zero mass). The
    * fold runs in array order — deterministic under any partitioning
    * because it is row-local.
    */
  private def lse(terms: Column): Column = {
    val m = array_max(terms)
    when(size(terms) === 0 || m === lit(NegInf), lit(NegInf))
      .otherwise(m + log(aggregate(terms, lit(0.0),
        (s, v) => s + exp(v - array_max(terms)))))
  }

  /** All (st, ln, tok) substrings of `word` up to `maxPieceLen`,
    * 1-based start. */
  private def spansOf(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), st =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - st + 1)),
        ln => struct(st.as("st"), ln.as("ln"),
          word.substr(st, ln).as("tok")))))

  /** Seed inventory: top `seedSize` substrings by weighted frequency
    * plus every single character. (token, freq). */
  def seedVocab(freqs: DataFrame, seedSize: Int, maxPieceLen: Int): DataFrame = {
    val subs = freqs
      .select(explode(spansOf(col("word"), maxPieceLen)).as("sp"), col("cnt"))
      .select(col("sp.tok").as("token"), col("sp.ln").as("ln"), col("cnt"))
      .groupBy("token", "ln").agg(sum("cnt").as("freq"))
    val top = subs.orderBy(desc("freq"), asc("token")).limit(seedSize)
    val chars = subs.filter(col("ln") === 1)
    top.unionByName(chars).select("token", "freq").distinct()
  }

  /** One E-step: per-word expected token counts under `vocab`
    * (token, logp), as (token, e) rows ready for the M-step sum. All
    * lattice math is row-local; the likelihood view of the same lattice
    * is [[wordLogLikelihood]].
    */
  private def eStepRows(freqs: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val withSpans = latticeSpans(freqs, vocab, maxPieceLen)
    val n = length(col("word"))
    val alphas = forwardAlphas(n)
    val betas = backwardBetas(n)
    // posterior of each lattice edge: exp(a[st-1] + lp + b[st-1+ln] - a[n]);
    // a word no path covers (a[n] = -inf after a token death) contributes
    // nothing — guarded, because (-inf) - (-inf) would be NaN
    val expected = transform(col("spans"), sp => struct(
      sp.getField("tok").as("token"),
      when(element_at(col("_a"), n + 1) === lit(NegInf), lit(0.0))
        .otherwise(exp(element_at(col("_a"), sp.getField("st")) +
          sp.getField("lp") +
          element_at(col("_b"), n - (sp.getField("st") - 1 + sp.getField("ln")) + 1) -
          element_at(col("_a"), n + 1)) * col("cnt")).as("e")))
    withSpans
      .withColumn("_a", alphas)
      .withColumn("_b", betas)
      .select(explode(expected).as("te"))
      .select(col("te.token").as("token"), col("te.e").as("e"))
  }

  /** Per-word corpus log-likelihood rows (word, cnt, loglik) under
    * `vocab` — Σ cnt·loglik is the EM objective. Every input word gets
    * a row: one with NO in-vocab substring (all its characters died in
    * pruning) carries loglik = -inf, the true likelihood of an
    * uncoverable word — dropping it would make the objective finite
    * where the model assigns zero mass. */
  def wordLogLikelihood(freqs: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val withSpans = latticeSpans(freqs, vocab, maxPieceLen)
    val n = length(col("word"))
    val covered = withSpans
      .withColumn("_a", forwardAlphas(n))
      .select(col("word"), element_at(col("_a"), n + 1).as("loglik"))
    freqs.select(col("word"), col("cnt"))
      .join(covered, Seq("word"), "left")
      .select(col("word"), col("cnt"),
        coalesce(col("loglik"), lit(NegInf)).as("loglik"))
  }

  /** (word, cnt, spans sorted by (st, ln, tok) with logp) — the lattice
    * rows every pass shares. Tokens of the word absent from `vocab`
    * contribute no edge. */
  private def latticeSpans(freqs: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val exploded = freqs
      .select(col("word"), col("cnt"),
        explode(spansOf(col("word"), maxPieceLen)).as("sp"))
      .select(col("word"), col("cnt"), col("sp.st").as("st"),
        col("sp.ln").as("ln"), col("sp.tok").as("token"))
      .join(broadcast(vocab.select(col("token"), col("logp"))), Seq("token"))
    exploded.groupBy("word", "cnt")
      .agg(array_sort(collect_list(struct(col("st"), col("ln"),
        col("token").as("tok"), col("logp").as("lp")))).as("spans"))
  }

  /** Forward pass: array [alpha(0)..alpha(n)], alpha(i) at element i+1.
    * alpha(i) = lse over edges ending at i of alpha(st-1) + lp. */
  private def forwardAlphas(n: Column): Column =
    aggregate(sequence(lit(1), n), array(lit(0.0)),
      (acc, i) => concat(acc, array(lse(
        transform(filter(col("spans"),
          sp => sp.getField("st") + sp.getField("ln") - 1 === i),
          sp => element_at(acc, sp.getField("st")) + sp.getField("lp"))))))

  /** Backward pass: array [beta(n)..beta(0)], beta(k) at element
    * n-k+1. beta(j) = lse over edges starting at j+1 of
    * lp + beta(j+ln). */
  private def backwardBetas(n: Column): Column =
    aggregate(sequence(lit(1), n), array(lit(0.0)),
      (acc, i) => {
        val j = n - i // positions n-1 down to 0
        concat(acc, array(lse(
          transform(filter(col("spans"), sp => sp.getField("st") === j + 1),
            sp => sp.getField("lp") +
              element_at(acc, n - (j + sp.getField("ln")) + 1)))))
      })

  /** Train the unigram model: (token, logp). Deterministic. */
  def trainUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
      seedSize: Int = 1024, emIters: Int = 3, maxPieceLen: Int = 6): DataFrame =
    trainUnigramOnFreqs(Bpe.wordFreqs(docs, textCol), vocabSize, seedSize,
      emIters, maxPieceLen)

  /** [[trainUnigram]] over a precomputed (word, cnt) table. */
  def trainUnigramOnFreqs(freqs: DataFrame, vocabSize: Int,
      seedSize: Int = 1024, emIters: Int = 3,
      maxPieceLen: Int = 6): DataFrame = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize >= 1, got seedSize=$seedSize vocabSize=$vocabSize")
    require(emIters >= 1 && maxPieceLen >= 1, "emIters and maxPieceLen must be >= 1")
    val f = freqs.localCheckpoint(true)
    val seeds = seedVocab(f, seedSize, maxPieceLen).localCheckpoint(true)
    // init: p proportional to weighted substring frequency
    var vocab = normalize(seeds.select(col("token"),
      log(col("freq").cast("double")).as("logp")))
    for (_ <- 1 to emIters) vocab = mStep(eStepRows(f, vocab, maxPieceLen))
    // prune: keep every single char + the top multi-char pieces
    val chars = vocab.filter(length(col("token")) === 1)
    val nChars = chars.count().toInt
    val multi = vocab.filter(length(col("token")) > 1)
      .orderBy(desc("logp"), asc("token"))
      .limit(math.max(0, vocabSize - nChars))
    vocab = chars.unionByName(multi).localCheckpoint(true)
    // renormalize over the kept inventory with one more EM round
    mStep(eStepRows(f, vocab, maxPieceLen)).localCheckpoint(true)
  }

  /** M-step: logp = ln(expected) - ln(total), expected summed
    * DECIMAL-exact so the result is partitioning-independent. A token
    * whose expected mass rounds to ZERO at the decimal scale leaves the
    * vocabulary — EM's natural death of unused pieces (Spark's ln(0) is
    * NULL, so the zero rows must go regardless; dropping them is also
    * the correct semantics). A dead single character leaves its
    * positions to the Viterbi <unk> hop. */
  private def mStep(expRows: DataFrame): DataFrame = {
    val agg = expRows.groupBy("token")
      .agg(sum(col("e").cast(ExpDec)).as("exp"))
      .filter(col("exp") > 0)
    val tot = agg.agg(sum("exp").as("tot"))
    normalize(agg.crossJoin(broadcast(tot))
      .select(col("token"),
        (log(col("exp").cast("double")) - log(col("tot").cast("double")))
          .as("logp")))
  }

  /** Re-center log-probs to a proper distribution: logp - lse(all). The
    * global lse runs over the BOUNDED vocab table on the driver —
    * with StrictMath, matching Spark's codegen'd log/exp exactly (Math
    * may differ by an ulp, which would break the reference-equality
    * contract). */
  private def normalize(vocab: DataFrame): DataFrame = {
    val v = vocab.localCheckpoint(true)
    val lps = v.select("logp").collect().map(_.getDouble(0)).sorted
    val m = lps.last
    val z = m + StrictMath.log(
      lps.foldLeft(0.0)((s, x) => s + StrictMath.exp(x - m)))
    v.select(col("token"), (col("logp") - lit(z)).as("logp"))
  }

  /** Persist the trained model — the (token, logp) table — under `dir`.
    * Doubles round-trip bit-exactly through parquet, so a loaded model
    * segments identically (contract-tested, UnigramLmSpec). */
  def saveModel(vocab: DataFrame, dir: String): Unit =
    vocab.select("token", "logp").coalesce(1)
      .write.mode("overwrite").parquet(dir)

  /** Load a persisted model. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = spark.read.parquet(dir)

  /** Viterbi (max-probability) segmentation of every distinct word in
    * `targetWords` under the model: (word, tokens, n_tokens). Words
    * containing a character absent from the vocabulary are segmented
    * with `<unk>` for each uncovered position. Tie-break: higher
    * score, then longer final piece, then lexicographically larger
    * token.
    */
  def viterbiSegment(targetWords: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val words = targetWords.select(col("word")).distinct()
      .withColumn("cnt", lit(1L))
    val withSpans = latticeSpans(words, vocab, maxPieceLen)
      .drop("cnt")
    // words with NO in-vocab substring at all still need rows
    val all = words.drop("cnt").join(withSpans, Seq("word"), "left")
      .withColumn("spans", coalesce(col("spans"),
        array().cast("array<struct<st:int,ln:int,tok:string,lp:double>>")))
    val n = length(col("word"))
    // forward Viterbi: best[i] at element i+1; back[i] = the winning
    // edge as struct(ln, tok) at element i (1-based), ln=0 => <unk> hop
    val vit = aggregate(sequence(lit(1), n),
      struct(array(lit(0.0)).as("best"),
        array().cast("array<struct<ln:int,tok:string>>").as("back")),
      (st0, i) => {
        val best = st0.getField("best")
        val cands = transform(filter(col("spans"),
          sp => sp.getField("st") + sp.getField("ln") - 1 === i),
          sp => struct(
            (element_at(best, sp.getField("st")) + sp.getField("lp")).as("s"),
            sp.getField("ln").as("ln"), sp.getField("tok").as("tok")))
        // the <unk> hop: one uncovered char, heavily penalized so any
        // real path dominates (score floor keeps -inf out of the math)
        val unk = struct((element_at(best, i) + lit(-1.0e9)).as("s"),
          lit(1).as("ln"), lit("<unk>").as("tok"))
        val win = array_max(concat(cands, array(unk)))
        struct(
          concat(best, array(win.getField("s"))).as("best"),
          concat(st0.getField("back"), array(struct(
            win.getField("ln").as("ln"),
            win.getField("tok").as("tok")))).as("back"))
      }).getField("back")
    // backtrack: walk the chosen edges from n to 0 (at most n hops)
    val toks = aggregate(sequence(lit(1), n),
      struct(n.as("pos"), array().cast("array<string>").as("acc")),
      (st0, _) => {
        val pos = st0.getField("pos")
        val e = element_at(col("_back"), pos)
        when(pos <= 0, st0).otherwise(struct(
          (pos - e.getField("ln")).as("pos"),
          concat(st0.getField("acc"), array(e.getField("tok"))).as("acc")))
      }).getField("acc")
    all
      .withColumn("_back", vit)
      .withColumn("tokens", reverse(toks))
      .select(col("word"), col("tokens"), size(col("tokens")).as("n_tokens"))
  }

  /** Per-document compression under the trained model:
    * (idCol, n_pretokens, n_unigram_tokens) — the q93/q143 shape with
    * the Viterbi encoder inside. */
  def tokenCompression(docs: DataFrame, textCol: String, idCol: String,
      vocab: DataFrame, maxPieceLen: Int = 6): DataFrame = {
    val targetWords = docs.select(
      explode(regexp_extract_all(col(textCol), lit(Bpe.preTokenPattern),
        lit(0))).as("word"))
    val lookup = viterbiSegment(targetWords, vocab, maxPieceLen)
      .select(col("word"), col("n_tokens"))
    docs
      .select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(Bpe.preTokenPattern), lit(0))).as("word"))
      .join(broadcast(lookup), Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_pretokens"),
        sum(col("n_tokens").cast("long")).as("n_unigram_tokens"))
  }
}
