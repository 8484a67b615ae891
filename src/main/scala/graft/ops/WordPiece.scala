package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BpeMerge
import graft.ops.Bpe.MergeRule

/** WordPiece vocabulary induction and greedy encoding (Schuster &
  * Nakajima 2012; the BERT tokenizer family) — the likelihood-driven
  * sibling of [[Bpe]]:
  *
  *   - TRAINING runs the same merge loop over the word-frequency table,
  *     but each round fuses the pair maximizing
  *     `count(l,r) / (count(l) * count(r))` — the pair whose merge most
  *     increases corpus unigram-LM likelihood — instead of raw pair
  *     frequency. One extra unigram aggregation per round, same
  *     bounded-driver-argmax shape and determinism scheme (score DESC,
  *     then left/right symbol ascending).
  *   - ENCODING ignores merge order entirely (the defining WordPiece
  *     difference from BPE): a word is segmented by GREEDY LONGEST
  *     PREFIX match against the piece inventory (initial characters +
  *     every merge's output). An unmatched character becomes `<unk>`
  *     and the scan advances one — total over arbitrary corpora.
  *     BERT's `##` continuation marker is presentation, not model —
  *     pre-tokens here never cross whitespace, so it is omitted.
  *
  * Scale shape of the encoder: candidate spans are enumerated per
  * DISTINCT word (positions × piece lengths, bounded by the longest
  * trained piece), semi-joined against the broadcast piece inventory,
  * and the greedy scan itself is a row-local Catalyst fold — the
  * corpus-sized pass stays the single explode+join+aggregate of the
  * BPE compression query. No SQL oracle (iterative argmax training);
  * correctness is EXACT equality against an in-memory reference over
  * the real corpus (WordPieceSpec), mirroring the BpeSpec contract.
  */
object WordPiece {

  /** Train `nMerges` WordPiece merges over `docs`. Deterministic. */
  def trainWordPiece(docs: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 8): Seq[MergeRule] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    trainWordPieceOnFreqs(Bpe.wordFreqs(docs, textCol), nMerges, checkpointEvery)
  }

  /** [[trainWordPiece]] over a precomputed (word, cnt) frequency table.
    * Runs [[Bpe.trainMergeLoop]] with the likelihood scorer: per round
    * one extra unigram aggregation (symbol occurrences weighted by word
    * count — the denominators) joined onto the pair counts. */
  def trainWordPieceOnFreqs(freqs: DataFrame, nMerges: Int,
      checkpointEvery: Int = 8): Seq[MergeRule] =
    Bpe.trainMergeLoop(freqs, nMerges, checkpointEvery) { (pairs, words) =>
      val uni = words.select(explode(col("syms")).as("s"), col("cnt"))
        .groupBy("s").agg(sum("cnt").as("cu"))
      pairs
        .join(uni.select(col("s").as("l"), col("cu").as("cl")), "l")
        .join(uni.select(col("s").as("r"), col("cu").as("cr")), "r")
        .select(col("l"), col("r"), col("c"),
          (col("c").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double"))).as("ord"))
    }

  /** The trained piece inventory: every character of the training
    * vocabulary plus every merge's fused output. */
  def pieceInventory(trainFreqs: DataFrame, rules: Seq[MergeRule]): DataFrame = {
    val spark = trainFreqs.sparkSession
    import spark.implicits._
    val chars = trainFreqs.select(
      explode(transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("piece")).distinct()
    val merged = rules.map(r => r.left + r.right).distinct.toDF("piece")
    chars.unionByName(merged).distinct()
  }

  /** Persist the trained model — merge rules in rank order plus the
    * piece inventory — as two parquet tables under `dir`; the
    * self-contained artifact the greedy encoder needs (contract-tested
    * round trip, WordPieceSpec). */
  def saveModel(spark: org.apache.spark.sql.SparkSession, dir: String,
      rules: Seq[MergeRule], trainFreqs: DataFrame): Unit = {
    import spark.implicits._
    rules.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/merges")
    pieceInventory(trainFreqs, rules).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/pieces")
  }

  /** Load a persisted model: (rules in rank order, piece inventory). */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[MergeRule], DataFrame) = {
    val rules = spark.read.parquet(s"$dir/merges")
      .select("rank", "left", "right", "count").collect()
      .map(r => MergeRule(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq
    (rules, spark.read.parquet(s"$dir/pieces"))
  }

  /** [[segmentGreedy]] against an explicit piece-inventory table (e.g.
    * one loaded from a persisted model). The span bound comes from the
    * longest piece — one tiny aggregate over the bounded inventory. */
  def segmentGreedyWithPieces(targetWords: DataFrame,
      piecesIn: DataFrame): DataFrame = {
    val pieces = piecesIn.select("piece").localCheckpoint(true)
    // an empty inventory aggregates to a NULL max — floor at 1 (every
    // position then falls to the <unk> hop) instead of NPE-ing
    val maxRow = pieces.agg(max(length(col("piece")))).head
    val maxLen = if (maxRow.isNullAt(0)) 1 else math.max(1, maxRow.getInt(0))
    segmentImpl(targetWords, pieces, maxLen)
  }

  /** Greedy longest-match segmentation of every distinct word in
    * `targetWords` ("word" column) under the piece inventory:
    * (word, tokens array<string>, n_wp_tokens). Candidate spans bounded
    * by the longest trained piece; the scan is a row-local fold.
    */
  def segmentGreedy(targetWords: DataFrame, trainFreqs: DataFrame,
      rules: Seq[MergeRule]): DataFrame = {
    val pieces = pieceInventory(trainFreqs, rules).localCheckpoint(true)
    val maxLen = (1 +: rules.map(r => (r.left + r.right).length)).max
    segmentImpl(targetWords, pieces, maxLen)
  }

  private def segmentImpl(targetWords: DataFrame, pieces: DataFrame,
      maxLen: Int): DataFrame = {
    val words = targetWords.select(col("word")).distinct()
    val spans = words
      .select(col("word"),
        explode(sequence(lit(1), length(col("word")))).as("st"))
      .select(col("word"), col("st"), explode(sequence(lit(1),
        least(lit(maxLen), length(col("word")) - col("st") + 1))).as("ln"))
      .select(col("word"), col("st"), col("ln"),
        col("word").substr(col("st"), col("ln")).as("piece"))
      .join(broadcast(pieces), Seq("piece"), "left_semi")
    val spanArr = spans.groupBy("word")
      .agg(array_sort(collect_list(
        struct(col("st"), col("ln"), col("piece")))).as("spans"))
    val emptySpans =
      array().cast("array<struct<st:int,ln:int,piece:string>>")
    val withSpans = words.join(spanArr, Seq("word"), "left")
      .withColumn("spans", coalesce(col("spans"), emptySpans))
    // greedy scan: at most length(word) steps; each step either consumes
    // the longest piece starting at pos (struct max: same st -> max ln)
    // or emits <unk> for one unmatched character
    val init = struct(lit(1).as("pos"),
      array().cast("array<string>").as("toks"))
    val scan = aggregate(
      sequence(lit(1), length(col("word"))),
      init,
      (st0, _) => {
        val pos = st0.getField("pos")
        val toks = st0.getField("toks")
        val best = array_max(filter(col("spans"),
          sp => sp.getField("st") === pos))
        when(pos > length(col("word")), st0)
          .when(best.isNull,
            struct((pos + 1).as("pos"),
              concat(toks, array(lit("<unk>"))).as("toks")))
          .otherwise(
            struct((pos + best.getField("ln")).as("pos"),
              concat(toks, array(best.getField("piece"))).as("toks")))
      })
    withSpans
      .withColumn("tokens", scan.getField("toks"))
      .select(col("word"), col("tokens"), size(col("tokens")).as("n_wp_tokens"))
  }

  /** Per-document compression under the trained WordPiece inventory:
    * (idCol, n_pretokens, n_wp_tokens). Corpus-sized pass = one explode
    * + one broadcast join against the per-word segmentation + one
    * per-doc sum — the q93 shape with the greedy encoder inside.
    */
  def tokenCompression(docs: DataFrame, textCol: String, idCol: String,
      trainFreqs: DataFrame, rules: Seq[MergeRule]): DataFrame = {
    val targetWords = docs.select(
      explode(regexp_extract_all(col(textCol), lit(Bpe.preTokenPattern),
        lit(0))).as("word"))
    val lookup = segmentGreedy(targetWords, trainFreqs, rules)
      .select("word", "n_wp_tokens")
    docs
      .select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(Bpe.preTokenPattern), lit(0))).as("word"))
      .join(broadcast(lookup), Seq("word"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_pretokens"),
        sum(col("n_wp_tokens").cast("long")).as("n_wp_tokens"))
  }
}
