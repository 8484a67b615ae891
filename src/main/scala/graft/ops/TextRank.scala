package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text relevance ranking over a document corpus: BM25 retrieval for a
  * fixed query and corpus-wide TF-IDF term weighting. Beyond-reference
  * training-data operators (the reference's text surface is exact-dup
  * fingerprinting only); the scoring math follows the public literature —
  * Robertson/Spärck Jones probabilistic relevance, with Lucene
  * `BM25Similarity`'s non-negative idf formulation
  * `ln(1 + (N - df + 0.5)/(df + 0.5))`.
  *
  * Scale shape, 100 TB framing:
  *  - [[bm25]] never shuffles the corpus: term frequencies for the (small,
  *    fixed) query-term list are row-local array filters, corpus stats
  *    (N, Σdl, per-term df) are ONE tiny aggregate broadcast back, and
  *    top-k is `TakeOrderedAndProject` — two linear passes, no wide
  *    exchange.
  *  - [[tfidfTopTerms]] is the general full-vocabulary path: one
  *    map-side-combined (id, term) count, one vocabulary-sized df
  *    aggregate joined back on term (AQE broadcasts it when the
  *    vocabulary is small), one per-doc ranking window keyed by id.
  *
  * Float determinism: every arithmetic op here is IEEE-exact except `ln`,
  * whose last ulp may differ between JVM and C libm — scores are therefore
  * rounded to 6 decimals (HALF_UP agrees bit-for-bit between Spark and
  * DuckDB, verified empirically) and ties under the rounded score break on
  * exact integer/string keys, so the oracle compare stays bit-exact.
  */
object TextRank {

  private def toks(textCol: String) = graft.core.Cols.wsTokens(col(textCol))

  /** BM25 top-`topK` documents for `queryTerms`. Output:
    * (idCol, bm25 = round(score, 6), n_matched). Only documents matching
    * at least one query term participate; ranking AND the topK cut use
    * the rounded score with id as the tie-break, so both engines keep
    * the same survivors.
    */
  def bm25(docs: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    require(queryTerms.forall(_.nonEmpty),
      "empty-string query terms are not meaningful (and not indexable)")
    val base = docs
      .select(col(idCol), toks(textCol).as("_t"))
      .select(col(idCol), col("_t"), size(col("_t")).as("_dl"))
    // Row-local per-term tf — the query-term list is small and fixed, so
    // counting is an array filter per term, not an explode + shuffle.
    val withTf = queryTerms.indices.foldLeft(base) { (d, i) =>
      d.withColumn(s"_tf$i", size(filter(col("_t"), x => x === lit(queryTerms(i)))))
    }.drop("_t")
    // Corpus stats in one aggregate: N, Σdl (exact long sum), df per term.
    val statAggs =
      count(lit(1)).as("n_docs") +:
        sum(col("_dl").cast("long")).as("sum_dl") +:
        queryTerms.indices.map(i => count(when(col(s"_tf$i") > 0, 1)).as(s"_df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val j = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int) =
      log(lit(1.0) + (col("n_docs") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)))
    def termScore(i: Int) = when(col(s"_tf$i") > 0,
      idf(i) * (col(s"_tf$i") * lit(k1 + 1)) /
        (col(s"_tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / avgdl))
    ).otherwise(lit(0.0))
    val score = queryTerms.indices.map(termScore).reduceLeft(_ + _)
    val nMatched = queryTerms.indices
      .map(i => when(col(s"_tf$i") > 0, 1).otherwise(0)).reduceLeft(_ + _)
    // rank and CUT on the rounded score: a raw-score cut would let the two
    // engines' ln() last-ulp disagreement pick different topK survivors
    // when scores straddle the boundary within an ulp
    j.select(col(idCol), round(score, 6).as("bm25"), nMatched.as("n_matched"))
      .filter(col("n_matched") > 0)
      .orderBy(desc("bm25"), col(idCol))
      .limit(topK)
  }

  /** The matching DuckDB oracle SQL for [[bm25]]: the identical operation
    * tree (same association order on every float op), built from the same
    * parameters. Every interpolated numeric parameter is wrapped in
    * `CAST(... AS DOUBLE)`: a bare `2.2` literal is DECIMAL(2,1) to
    * DuckDB, and `tf * 2.2` in exact decimal arithmetic differs from
    * Spark's double multiply by an ulp (`Double.toString` round-trips the
    * binary64 value, so the cast yields the identical constant).
    */
  def bm25OracleSql(queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10): String = {
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val tfCols = queryTerms.indices.map { i =>
      val t = queryTerms(i).replace("'", "''")
      s"len(list_filter(_t, x -> x = '$t')) AS _tf$i"
    }.mkString(", ")
    val dfCols = queryTerms.indices
      .map(i => s"count(CASE WHEN _tf$i > 0 THEN 1 END) AS _df$i").mkString(", ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / n_docs)"
    def idf(i: Int) =
      s"ln(${d(1.0)} + (n_docs - _df$i + ${d(0.5)}) / (_df$i + ${d(0.5)}))"
    def termScore(i: Int) =
      s"CASE WHEN _tf$i > 0 THEN ${idf(i)} * (_tf$i * ${d(k1 + 1)}) / " +
        s"(_tf$i + ${d(k1)} * (${d(1 - b)} + ${d(b)} * _dl / $avgdl)) " +
        s"ELSE ${d(0.0)} END"
    val score = queryTerms.indices.map(termScore).mkString(" + ")
    val nMatched = queryTerms.indices
      .map(i => s"(CASE WHEN _tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
    s"""
      WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS _t FROM documents),
      b2 AS (SELECT doc_id, len(_t) AS _dl, $tfCols FROM base),
      stats AS (SELECT count(*) AS n_docs, CAST(sum(_dl) AS BIGINT) AS sum_dl, $dfCols FROM b2),
      scored AS (SELECT doc_id, round($score, 6) AS bm25, $nMatched AS n_matched
                 FROM b2 CROSS JOIN stats)
      SELECT doc_id, bm25, n_matched FROM (
        SELECT * FROM scored WHERE n_matched > 0
        ORDER BY bm25 DESC, doc_id LIMIT $topK)
      ORDER BY doc_id"""
  }

  /** Top-`topN` TF-IDF terms per document (full-vocabulary path). Output:
    * (idCol, rank, term, tf, df, tfidf = round(tf·ln(N/df), 6)). The
    * ranking key is the ROUNDED score (then tf desc, term asc): two terms
    * whose scores are mathematically equal through different (tf, df) —
    * e.g. 2·ln(N/x) = ln(N/x²)·1 — must order identically in both
    * engines, which raw last-ulp-sensitive doubles would not guarantee.
    */
  def tfidfTopTerms(docs: DataFrame, textCol: String, idCol: String,
      topN: Int = 3): DataFrame = {
    val tf = docs.select(col(idCol), explode(toks(textCol)).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(stats))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(desc("tfidf"), desc("tf"), asc("term"))))
      .filter(col("rank") <= topN)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"), col("tfidf"))
  }

  /** Inverted-index build with BLOCKED posting lists: one row per
    * (term, block) with the term's document frequency, total term
    * frequency, and that block's `blockSize`-bounded run of ascending doc
    * ids (comma-joined — a string so the oracle compare is byte-stable
    * across engines' list types). Blocking is what makes this the real
    * 100 TB layout: a stopword's df is ~the corpus, so one-row-per-term
    * `collect_list` would buffer a corpus-sized posting in a single
    * unspillable aggregation row — segmented postings (exactly how Lucene
    * stores them) keep every row under `blockSize` ids. The df/total_tf
    * window and the block assignment ride the same term-keyed shuffle
    * (WindowExec spills per-partition buffers to disk, it never
    * materializes a term's rows in one aggregate state), and concatenating
    * a term's blocks in block order reconstructs the full sorted posting
    * list (contract-tested).
    */
  /** Shared head of [[invertedIndex]] and [[writeSearchIndex]]: per-
    * (term, id) frequencies with the term's df and the id-ordered block
    * assignment — ONE definition of the blocking semantics, so the
    * persisted layout can never silently diverge from the oracle-checked
    * q85 formulation.
    */
  private def blockedTf(docs: DataFrame, textCol: String, idCol: String,
      blockSize: Int): DataFrame = {
    require(blockSize >= 1, "blockSize must be >= 1")
    val tf = docs.select(col(idCol).as("id"), explode(toks(textCol)).as("term"))
      .groupBy(col("term"), col("id")).agg(count(lit(1)).as("tf"))
    val wTerm = Window.partitionBy("term")
    val wOrder = Window.partitionBy("term").orderBy("id")
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("total_tf", sum("tf").over(wTerm))
      .withColumn("block",
        ((row_number().over(wOrder) - lit(1)) / lit(blockSize)).cast("int"))
  }

  def invertedIndex(docs: DataFrame, textCol: String, idCol: String,
      blockSize: Int = 1024): DataFrame =
    blockedTf(docs, textCol, idCol, blockSize)
      .groupBy("term", "block", "df", "total_tf")
      .agg(concat_ws(",",
        transform(sort_array(collect_list(col("id"))), x => x.cast("string")))
        .as("postings"))
      .select("term", "block", "df", "total_tf", "postings")

  /** Persist the search index: the production layout BM25 serves from.
    *
    *  - `dir/postings` — [[invertedIndex]]-style blocked postings, with
    *    the per-doc term frequencies ALIGNED with the ids (both arrays
    *    sorted by id), written `partitionBy("term")` so a query-time read
    *    prunes to the query's terms (PartitionFilters, contract-tested);
    *  - `dir/norms` — (id, dl): the doc-length norms, exactly Lucene's
    *    norms file;
    *  - `dir/stats` — one row: (n_docs, sum_dl) for idf/avgdl.
    *
    * At 100 TB the postings write is the index-build shuffle (term-keyed,
    * blocked rows, WindowExec spilling); everything query-time reads is
    * either pruned (postings) or tiny (stats). Empty-string terms (a
    * whitespace-only doc tokenizes to `[""]`) are EXCLUDED from the
    * postings: `partitionBy` cannot represent "" (it round-trips as the
    * hive default partition / NULL), and [[bm25Indexed]] rejects "" as a
    * query term, so no reachable query can observe the difference. Stats
    * aggregate the just-written norms parquet, not the corpus — the 1-row
    * output must not cost a third corpus scan.
    *
    * The index is SEGMENTED (Lucene's model): a full build is segment
    * `base`, and [[appendSearchIndexBatch]] adds one segment per ingest
    * batch. df and the corpus stats live per segment at rest and are
    * summed at query time — exact long additions, so serving from N
    * segments is bit-identical to one full rebuild (contract-tested).
    */
  def writeSearchIndex(docs: DataFrame, textCol: String, idCol: String,
      dir: String, blockSize: Int = 1024): Unit = {
    val spark = docs.sparkSession
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true) // full rebuild, not a merge
    writeSegment(docs, textCol, idCol, dir, "base", blockSize)
  }

  /** Append one ingest batch to the index as its own segment,
    * IDEMPOTENTLY under retries: each of postings/norms/stats writes
    * (overwrite) a `seg=<batchKey>` subdirectory, so a retried batch
    * replaces its previous attempt — the same maintenance contract as
    * the MinHash/IVF/PQ index appends. Batches must carry disjoint doc
    * ids across DIFFERENT keys; [[bm25Indexed]]'s validateIds gate fails
    * loudly if they do not. `base` is reserved: it is the
    * [[writeSearchIndex]] / [[mergeSearchIndexSegments]] corpus segment,
    * and an append under that key would overwrite it wholesale.
    */
  def appendSearchIndexBatch(docs: DataFrame, textCol: String, idCol: String,
      dir: String, batchKey: String, blockSize: Int = 1024): Unit = {
    require(batchKey != "base",
      "segment key 'base' is reserved for the full-build/merged corpus segment")
    writeSegment(docs, textCol, idCol, dir, batchKey, blockSize)
  }

  private def writeSegment(docs: DataFrame, textCol: String, idCol: String,
      dir: String, batchKey: String, blockSize: Int): Unit = {
    require(batchKey.nonEmpty && !batchKey.exists(c => c == '/' || c == '='),
      s"batchKey must be a plain partition value, got '$batchKey'")
    blockedTf(docs, textCol, idCol, blockSize)
      .filter(col("term") =!= "")
      .groupBy("term", "block", "df")
      .agg(sort_array(collect_list(struct(col("id"), col("tf")))).as("_ps"))
      .select(col("term"), col("block"), col("df"),
        transform(col("_ps"), p => p.getField("id")).as("ids"),
        transform(col("_ps"), p => p.getField("tf")).as("tfs"))
      .write.mode("overwrite").partitionBy("term")
      .parquet(s"$dir/postings/seg=$batchKey")
    docs.select(col(idCol).as("id"), size(toks(textCol)).as("dl"))
      .write.mode("overwrite").parquet(s"$dir/norms/seg=$batchKey")
    val spark = docs.sparkSession
    spark.read.parquet(s"$dir/norms/seg=$batchKey")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$dir/stats/seg=$batchKey")
  }

  /** Merge all segments of a persisted search index into a single `base`
    * segment — Lucene's segment-merge lifecycle step. [[bm25Indexed]]
    * sums df and corpus stats across every segment on every query, so an
    * index fed by per-ingest [[appendSearchIndexBatch]] calls serves ever
    * more (and ever smaller) files as batches accumulate; a year of
    * hourly appends is ~9k segments read per query. Merging restores the
    * one-segment layout of a full [[writeSearchIndex]] rebuild WITHOUT
    * re-tokenizing the corpus: postings flatten to (term, id, tf) rows —
    * a doc lives in exactly one segment, so the stored tfs are already
    * the per-doc truth — df and the id-ordered `blockSize` blocks are
    * recomputed over the union (the same window semantics as the build),
    * norms concatenate, and stats re-aggregate from the merged norms.
    * Serving from the merged index is bit-identical to serving from the
    * N input segments and to a full rebuild (contract-tested).
    *
    * The merged index is staged under a `<dir>_merging` sibling and
    * swapped in only after all three writes land, so a crashed merge
    * leaves the live index intact: a retry clears a partial stage while
    * the live dir exists, and if the crash landed between the swap's
    * delete and rename (live gone, complete stage present) it promotes
    * the stage instead of wiping the only copy ([[StagedSwap]]).
    * Single-writer, like every index-maintenance op here; the delete+
    * rename swap instant can race a concurrent reader, as with any
    * non-transactional table format.
    *
    * A corrupt index (one doc id under two segment keys) is REJECTED
    * before any write — merging would otherwise fuse the duplicate rows
    * into one well-formed-looking segment and silently launder exactly
    * the corruption [[bm25Indexed]]'s gate exists to catch.
    */
  def mergeSearchIndexSegments(spark: org.apache.spark.sql.SparkSession,
      dir: String, blockSize: Int = 1024): Unit =
    mergeSearchIndexSegmentsExcept(spark, dir, blockSize, Set.empty)

  /** [[mergeSearchIndexSegments]] that folds every segment EXCEPT
    * `keepSegs`, which are carried into the merged index unchanged
    * (byte-copied into the stage, so a crashed merge still leaves the
    * live index intact). This is what makes merging safe INSIDE a
    * running maintenance stream: the current micro-batch's own segment
    * may be an uncommitted crashed attempt, and folding it into `base`
    * would make the retry see its own rows as prior corpus — excluding
    * it keeps the retry contract (the batch still overwrites its own
    * `seg=` dirs). Duplicate-id validation runs across ALL segments,
    * kept ones included.
    */
  def mergeSearchIndexSegmentsExcept(spark: org.apache.spark.sql.SparkSession,
      dir: String, blockSize: Int, keepSegs: Set[String]): Unit = {
    require(!keepSegs.contains("base"), "the base segment is always folded")
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // recovery-first: a crash between the delete and the rename below
    // leaves the only copy in the stage dir — promote it, never wipe it
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val allNorms = spark.read.parquet(s"$dir/norms")
    val dup = allNorms.groupBy("id").agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select("id").take(1)
    require(dup.isEmpty,
      s"search index holds id ${dup.headOption.map(_.get(0)).orNull} in more than one " +
        "segment; merging would launder the duplicate — repair the offending " +
        "segments or rebuild with writeSearchIndex instead")
    val keep = (s: Column) => s.cast("string").isin(keepSegs.toSeq: _*)
    val norms =
      if (keepSegs.isEmpty) allNorms.drop("seg")
      else allNorms.filter(!keep(col("seg"))).drop("seg")
    val post = spark.read
      .schema("block INT, df BIGINT, ids ARRAY<BIGINT>, tfs ARRAY<BIGINT>, " +
        "term STRING, seg STRING")
      .parquet(s"$dir/postings")
      .filter(if (keepSegs.isEmpty) lit(true) else !keep(col("seg")))
    val flat = post
      .select(col("term"), explode(arrays_zip(col("ids"), col("tfs"))).as("p"))
      .select(col("term"), col("p.ids").as("id"), col("p.tfs").as("tf"))
    val wTerm = Window.partitionBy("term")
    val wOrder = Window.partitionBy("term").orderBy("id")
    flat
      .withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("block",
        ((row_number().over(wOrder) - lit(1)) / lit(blockSize)).cast("int"))
      .groupBy("term", "block", "df")
      .agg(sort_array(collect_list(struct(col("id"), col("tf")))).as("_ps"))
      .select(col("term"), col("block"), col("df"),
        transform(col("_ps"), p => p.getField("id")).as("ids"),
        transform(col("_ps"), p => p.getField("tf")).as("tfs"))
      // cluster complete terms per task so the merged layout is one file
      // per term partition — the minimal pruned read the merge exists for
      .repartition(col("term"))
      .write.mode("overwrite").partitionBy("term")
      .parquet(s"$tmpPath/postings/seg=base")
    norms.write.mode("overwrite").parquet(s"$tmpPath/norms/seg=base")
    spark.read.parquet(s"$tmpPath/norms/seg=base")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl").cast("long")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$tmpPath/stats/seg=base")
    // the OPTIONAL positions component (phrase serving) folds with the
    // rest of the index: rows are per (term, doc) and a doc lives in one
    // segment, so the fold is a seg-dropping rewrite. Its own duplicate
    // gate runs too — a positions-only append could hold a dup the norms
    // gate never sees.
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$dir/positions"))) {
      val allPos = spark.read
        .schema("id BIGINT, positions ARRAY<INT>, term STRING, seg STRING")
        .parquet(s"$dir/positions")
      val dupP = allPos.groupBy("id", "term").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("id").take(1)
      require(dupP.isEmpty,
        s"positions index holds id ${dupP.headOption.map(_.get(0)).orNull} under two " +
          "segment keys; merging would launder the duplicate — repair or rebuild")
      allPos
        .filter(if (keepSegs.isEmpty) lit(true) else !keep(col("seg")))
        .drop("seg")
        .repartition(col("term"))
        .write.mode("overwrite").partitionBy("term")
        .parquet(s"$tmpPath/positions/seg=base")
    }
    // carry the kept segments into the stage BY COPY — a rename out of
    // the live dir would mutate it before the swap, and a crash would
    // strand those segments in a stage the retry clears
    keepSegs.foreach { k =>
      Seq("postings", "norms", "stats", "positions").foreach { sub =>
        val src = new org.apache.hadoop.fs.Path(s"$dir/$sub/seg=$k")
        if (fs.exists(src)) {
          val ok = org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
            new org.apache.hadoop.fs.Path(s"$tmpPath/$sub/seg=$k"),
            false, spark.sparkContext.hadoopConfiguration)
          require(ok, s"copying kept segment $src into the merge stage failed")
        }
      }
    }
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  /** BM25 served FROM the persisted index — the query-time production
    * shape: read only the query terms' posting partitions (pruned scan
    * across every segment), sum the per-segment df/stats (exact long
    * adds), join the candidates' norms, score, top-k. Bit-identical to
    * the scan-based [[bm25]] over the union of the indexed batches
    * (contract-tested): the score expression tree is the same, fed from
    * the index's (tf, df) instead of recomputing them, and candidates
    * are exactly the docs with >= 1 query term.
    *
    * `validateIds` (default on) is the loud duplicate-id gate: a doc id
    * indexed under two different segment keys would silently double-count
    * into the pivot. Its cost is one column-pruned pass over the PRUNED
    * posting rows plus one id-only pass over the norms (which catches a
    * duplicate even when only one copy holds a query term) — the norms
    * pass is linear in indexed DOC COUNT, far below a corpus text scan
    * but not free per query. The safe default favors loud corruption
    * detection; a production serving loop whose ingest already enforces
    * uniqueness at write time ([[graft.streaming.Streaming.searchIndexMaintenanceStream]]'s
    * re-delivery gate, [[mergeSearchIndexSegments]]' gate) should pass
    * `validateIds = false` and keep the query path at the pruned reads
    * alone.
    */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, queryTerms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10,
      validateIds: Boolean = true): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct == queryTerms, "queryTerms must be distinct")
    require(queryTerms.forall(_.nonEmpty),
      "empty-string query terms are not indexable (see writeSearchIndex)")
    val j = bm25IndexedPivot(spark, dir, queryTerms, validateIds)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int) =
      log(lit(1.0) + (col("n_docs") - col(s"_df$i") + lit(0.5)) /
        (col(s"_df$i") + lit(0.5)))
    def termScore(i: Int) = when(col(s"_tf$i").isNotNull,
      idf(i) * (col(s"_tf$i") * lit(k1 + 1)) /
        (col(s"_tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    ).otherwise(lit(0.0))
    val score = queryTerms.indices.map(termScore).reduceLeft(_ + _)
    val nMatched = queryTerms.indices
      .map(i => when(col(s"_tf$i").isNotNull, 1).otherwise(0)).reduceLeft(_ + _)
    j.select(col("id").as(idCol), round(score, 6).as("bm25"),
        nMatched.as("n_matched"))
      .orderBy(desc("bm25"), col(idCol))
      .limit(topK)
  }

  /** Shared index-read head of [[bm25Indexed]] and [[bm25BatchIndexed]]:
    * postings pruned to `terms`, the duplicate-id gates, per-term df and
    * corpus stats summed EXACTLY across segments, and the per-doc tf
    * pivot to fixed term order (so downstream score sums fold with the
    * same association as the scan-path [[bm25]]). Returns one row per doc
    * holding ANY of `terms`, with columns
    * (id, `_tf$i` nullable, dl, n_docs, sum_dl, `_df$i`).
    */
  private def bm25IndexedPivot(spark: org.apache.spark.sql.SparkSession,
      dir: String, terms: Seq[String], validateIds: Boolean): DataFrame = {
    // explicit schema: partition-column INFERENCE would coerce
    // numeric-looking terms to ints ('01' and '1' collapse, non-numeric
    // query terms cast to null) — the same silent-coercion class the
    // vector index probe regression-locks against. seg is declared STRING
    // for the same reason (numeric batch keys).
    val post = spark.read
      .schema("block INT, df BIGINT, ids ARRAY<BIGINT>, tfs ARRAY<BIGINT>, " +
        "term STRING, seg STRING")
      .parquet(s"$dir/postings")
      .filter(col("term").isin(terms: _*)) // partition-pruned read
    val flat = post
      .select(col("term"), explode(arrays_zip(col("ids"), col("tfs"))).as("p"))
      .select(col("term"), col("p.ids").as("id"), col("p.tfs").as("tf"))
    val norms = spark.read.parquet(s"$dir/norms").drop("seg")
    if (validateIds) {
      val dup = flat.groupBy("id", "term").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("id").take(1)
      require(dup.isEmpty,
        s"search index holds duplicate postings for id ${dup.headOption.map(_.get(0)).orNull} " +
          "(same doc appended under two segment keys?); rebuild with " +
          "writeSearchIndex or repair the offending segments before serving")
      // the postings check alone can miss a doc duplicated across
      // segments when only ONE copy contains a query term: the norms
      // join then double-counts that doc's score row, and the per-
      // segment stats inflate n_docs/sum_dl. Norms are one (id, dl) row
      // per doc — this pass is column-pruned to id with map-side partial
      // counts, linear in doc count, nowhere near a corpus scan.
      val dupN = norms.groupBy("id").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("id").take(1)
      require(dupN.isEmpty,
        s"search index norms hold id ${dupN.headOption.map(_.get(0)).orNull} in more than " +
          "one segment (same doc appended under two segment keys?); rebuild with " +
          "writeSearchIndex or repair the offending segments before serving")
    }
    // per-term df across segments: one value per (term, seg) repeated on
    // every block row — distinct then exact long sum
    val dfTotals = post.select(col("term"), col("seg"), col("df")).distinct()
      .groupBy("term").agg(sum("df").as("dft"))
    val dfAggs = terms.indices.map(i =>
      max(when(col("term") === lit(terms(i)), col("dft"))).as(s"_df$i"))
    val dfRow = dfTotals.groupBy().agg(dfAggs.head, dfAggs.tail: _*)
    // pivot to fixed term order so the score sum folds exactly like bm25's
    val pivAggs = terms.indices.map(i =>
      max(when(col("term") === lit(terms(i)), col("tf"))).as(s"_tf$i"))
    val piv = flat.groupBy("id").agg(pivAggs.head, pivAggs.tail: _*)
    val stats = spark.read.parquet(s"$dir/stats")
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
    piv.join(norms, "id")
      .crossJoin(broadcast(stats)).crossJoin(broadcast(dfRow))
  }

  /** Exact phrase occurrence ranking: top-`topK` documents by the number
    * of occurrences of the token sequence `phrase` (adjacent whitespace
    * tokens, the positional-match primitive under every phrase query).
    * Output: (idCol, n_occ, first_pos) with first_pos the 1-based token
    * position of the leftmost occurrence; ranked (n_occ DESC, id ASC).
    *
    * Scale shape: ZERO corpus shuffles — candidate start positions are a
    * row-local `filter(sequence(...))` over the token array (every
    * element_at is O(1) on Spark's array), and the top-k cut is
    * `TakeOrderedAndProject`. Integer-only output, so the oracle compare
    * has no float surface at all.
    */
  def phraseMatch(docs: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String], topK: Int = 10): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    require(phrase.forall(_.nonEmpty), "phrase tokens must be non-empty")
    val base = docs.select(col(idCol), toks(textCol).as("_t"))
    // fused codegen kernel — the declarative filter(sequence(...)) form
    // runs interpreted (HOFs are CodegenFallback) and measured 3x slower
    // at sf0.1; see functions/PhraseExprs
    val starts = graft.functions.PhraseStarts.starts(col("_t"), phrase)
    base.select(col(idCol), starts.as("_ps"))
      // get() (0-based) is null-safe on the empty array — ANSI element_at
      // throws on out-of-bounds, and these rows are filtered only after
      // this projection
      .select(col(idCol), size(col("_ps")).as("n_occ"),
        get(col("_ps"), lit(0)).as("first_pos"))
      .filter(col("n_occ") > 0)
      .orderBy(desc("n_occ"), col(idCol))
      .limit(topK)
  }

  /** The matching DuckDB oracle SQL for [[phraseMatch]] (1-based list
    * indexing on both engines; `range(a, b)` is the half-open [a, b)).
    */
  def phraseMatchOracleSql(phrase: Seq[String], topK: Int = 10): String = {
    val L = phrase.length
    val cond = phrase.indices.map { j =>
      val t = phrase(j).replace("'", "''")
      if (j == 0) s"_t[i] = '$t'" else s"_t[i + $j] = '$t'"
    }.mkString(" AND ")
    s"""
      WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS _t FROM documents),
      m AS (SELECT doc_id,
              CASE WHEN len(_t) >= $L
                   THEN list_filter(range(1, len(_t) - ${L - 1} + 1), i -> $cond)
                   ELSE [] END AS _ps
            FROM base)
      SELECT doc_id, n_occ, first_pos FROM (
        SELECT doc_id, len(_ps) AS n_occ, _ps[1] AS first_pos FROM m
        WHERE len(_ps) > 0
        ORDER BY n_occ DESC, doc_id LIMIT $topK)
      ORDER BY doc_id"""
  }

  private def validateBatchQueries(queries: Seq[(Int, Seq[String])]): Unit = {
    require(queries.nonEmpty, "queries must be non-empty")
    require(queries.map(_._1).distinct == queries.map(_._1),
      "query ids must be distinct")
    queries.foreach { case (qid, terms) =>
      require(terms.nonEmpty, s"query $qid has no terms")
      require(terms.distinct == terms, s"query $qid has duplicate terms")
      require(terms.forall(_.nonEmpty), s"query $qid has an empty-string term")
    }
  }

  /** Batch multi-query BM25: top-`topK` documents for EVERY query in one
    * job — the production retrieval shape (N queries amortize the corpus
    * scan that [[bm25]] spends on one). Output:
    * (query_id, rank, idCol, bm25), ranked per query by
    * (rounded score DESC, id ASC).
    *
    * Scale shape: term frequencies for the UNION vocabulary are row-local
    * array filters (one corpus scan regardless of query count), corpus
    * stats and per-term df are ONE tiny broadcast aggregate, each doc
    * emits one (query, score) row per query it matches, and the per-query
    * top-k is the bounded [[graft.functions.TopKPairs]] aggregate — NOT a
    * `row_number` window, whose shuffle would collapse parallelism to the
    * number of queries and sort corpus-sized partitions; the partial
    * aggregate runs map-side, so the shuffle carries
    * O(partitions × queries × topK) rows regardless of corpus size.
    *
    * Float determinism: each query's score is summed in ITS OWN fixed
    * term order (the same association the single-query [[bm25]] uses), so
    * the rounded scores are bit-identical to N independent bm25 calls and
    * to the SQL oracle.
    */
  def bm25Batch(docs: DataFrame, textCol: String, idCol: String,
      queries: Seq[(Int, Seq[String])], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    validateBatchQueries(queries)
    val vocab = queries.flatMap(_._2).distinct
    val base = docs
      .select(col(idCol), toks(textCol).as("_t"))
      .select(col(idCol), col("_t"), size(col("_t")).as("_dl"))
    val withTf = vocab.indices.foldLeft(base) { (d, i) =>
      d.withColumn(s"_tf$i", size(filter(col("_t"), x => x === lit(vocab(i)))))
    }.drop("_t")
    val statAggs =
      count(lit(1)).as("n_docs") +:
        sum(col("_dl").cast("long")).as("sum_dl") +:
        vocab.indices.map(i => count(when(col(s"_tf$i") > 0, 1)).as(s"_df$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val j = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int) =
      log(lit(1.0) + (col("n_docs") - col(s"_df$i") + lit(0.5)) / (col(s"_df$i") + lit(0.5)))
    def termScore(i: Int) = when(col(s"_tf$i") > 0,
      idf(i) * (col(s"_tf$i") * lit(k1 + 1)) /
        (col(s"_tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / avgdl))
    ).otherwise(lit(0.0))
    val vocabIdx = vocab.zipWithIndex.toMap
    val perQuery = queries.map { case (qid, terms) =>
      val idxs = terms.map(vocabIdx)
      val score = idxs.map(termScore).reduceLeft(_ + _)
      val nm = idxs.map(i => when(col(s"_tf$i") > 0, 1).otherwise(0)).reduceLeft(_ + _)
      struct(lit(qid).as("query_id"), round(score, 6).as("bm25"),
        nm.as("n_matched"))
    }
    val exploded = j
      .select(col(idCol), explode(array(perQuery: _*)).as("q"))
      .select(col(idCol), col("q.query_id").as("query_id"),
        col("q.bm25").as("bm25"), col("q.n_matched").as("n_matched"))
      .filter(col("n_matched") > 0)
    rankTopK(exploded, idCol, topK)
  }

  /** Shared tail of [[bm25Batch]] and [[bm25BatchIndexed]]: bounded
    * per-query top-k via TopKPairs (tie-break score DESC, id ASC — the
    * same order the oracle's `row_number` uses on the rounded scores).
    */
  private def rankTopK(scored: DataFrame, idCol: String, topK: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(graft.functions.TopKPairs.topK(col("bm25"), col(idCol).cast("long"), topK).as("_nb"))
      .select(col("query_id"), posexplode(col("_nb")).as(Seq("_p", "_nb")))
      .select(col("query_id"), (col("_p") + 1).cast("int").as("rank"),
        col("_nb.id").as(idCol), col("_nb.score").as("bm25"))
      .orderBy("query_id", "rank")

  /** The matching DuckDB oracle SQL for [[bm25Batch]]: one scored branch
    * per query (each reusing the single-query score tree with the same
    * association order), unioned, then ranked per query on the rounded
    * score. */
  def bm25BatchOracleSql(queries: Seq[(Int, Seq[String])],
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): String = {
    validateBatchQueries(queries)
    val vocab = queries.flatMap(_._2).distinct
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    val tfCols = vocab.indices.map { i =>
      val t = vocab(i).replace("'", "''")
      s"len(list_filter(_t, x -> x = '$t')) AS _tf$i"
    }.mkString(", ")
    val dfCols = vocab.indices
      .map(i => s"count(CASE WHEN _tf$i > 0 THEN 1 END) AS _df$i").mkString(", ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / n_docs)"
    def idf(i: Int) =
      s"ln(${d(1.0)} + (n_docs - _df$i + ${d(0.5)}) / (_df$i + ${d(0.5)}))"
    def termScore(i: Int) =
      s"CASE WHEN _tf$i > 0 THEN ${idf(i)} * (_tf$i * ${d(k1 + 1)}) / " +
        s"(_tf$i + ${d(k1)} * (${d(1 - b)} + ${d(b)} * _dl / $avgdl)) " +
        s"ELSE ${d(0.0)} END"
    val vocabIdx = vocab.zipWithIndex.toMap
    val branches = queries.map { case (qid, terms) =>
      val idxs = terms.map(vocabIdx)
      val score = idxs.map(termScore).mkString(" + ")
      val nm = idxs.map(i => s"(CASE WHEN _tf$i > 0 THEN 1 ELSE 0 END)").mkString(" + ")
      s"SELECT $qid AS query_id, doc_id, round($score, 6) AS bm25, $nm AS n_matched FROM j"
    }.mkString("\n        UNION ALL\n        ")
    s"""
      WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS _t FROM documents),
      b2 AS (SELECT doc_id, len(_t) AS _dl, $tfCols FROM base),
      stats AS (SELECT count(*) AS n_docs, CAST(sum(_dl) AS BIGINT) AS sum_dl, $dfCols FROM b2),
      j AS (SELECT * FROM b2 CROSS JOIN stats),
      scored AS (
        $branches),
      ranked AS (SELECT query_id, doc_id, bm25,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY bm25 DESC, doc_id) AS rank
                 FROM scored WHERE n_matched > 0)
      SELECT query_id, CAST(rank AS INT) AS rank, doc_id, bm25
      FROM ranked WHERE rank <= $topK ORDER BY query_id, rank"""
  }

  /** [[bm25Batch]] served from the PERSISTED search index
    * ([[writeSearchIndex]] layout): postings pruned to the union
    * vocabulary, per-term df and corpus stats summed exactly across
    * segments, every query scored off the one pruned read, bounded
    * per-query top-k. Bit-identical to the scan-path [[bm25Batch]]
    * (contract-tested) — the N-query serving loop the index exists for.
    * `validateIds` as on [[bm25Indexed]].
    */
  def bm25BatchIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, queries: Seq[(Int, Seq[String])], k1: Double = 1.2,
      b: Double = 0.75, topK: Int = 10,
      validateIds: Boolean = true): DataFrame = {
    validateBatchQueries(queries)
    val vocab = queries.flatMap(_._2).distinct
    val base = bm25IndexedPivot(spark, dir, vocab, validateIds)
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    def idf(i: Int) =
      log(lit(1.0) + (col("n_docs") - col(s"_df$i") + lit(0.5)) /
        (col(s"_df$i") + lit(0.5)))
    def termScore(i: Int) = when(col(s"_tf$i").isNotNull,
      idf(i) * (col(s"_tf$i") * lit(k1 + 1)) /
        (col(s"_tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
    ).otherwise(lit(0.0))
    val vocabIdx = vocab.zipWithIndex.toMap
    val perQuery = queries.map { case (qid, terms) =>
      val idxs = terms.map(vocabIdx)
      val score = idxs.map(termScore).reduceLeft(_ + _)
      val nm = idxs.map(i => when(col(s"_tf$i").isNotNull, 1).otherwise(0)).reduceLeft(_ + _)
      struct(lit(qid).as("query_id"), round(score, 6).as("bm25"),
        nm.as("n_matched"))
    }
    val exploded = base
      .select(col("id").as(idCol), explode(array(perQuery: _*)).as("q"))
      .select(col(idCol), col("q.query_id").as("query_id"),
        col("q.bm25").as("bm25"), col("q.n_matched").as("n_matched"))
      .filter(col("n_matched") > 0)
    rankTopK(exploded, idCol, topK)
  }

  // ---------------------------------------------------------------------
  // Positional index (Lucene's prox file): per (term, doc), the sorted
  // 1-based token positions — what phrase queries serve from. Kept as its
  // own component beside postings/norms/stats so BM25 serving pays
  // nothing for it; same seg=<key> append + staged-swap lifecycle.
  // ---------------------------------------------------------------------

  private def positionRows(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("id"), posexplode(toks(textCol)).as(Seq("p0", "term")))
      .filter(col("term") =!= "") // "" is not partitionable nor queryable
      .groupBy(col("term"), col("id"))
      .agg(sort_array(collect_list(col("p0") + 1)).as("positions"))

  /** Full (re)build of the positional index at `dir/positions`: one row
    * per (term, doc) holding the doc's sorted 1-based positions of the
    * term, written `partitionBy("term")` so a phrase query prunes to its
    * terms. Build cost is ONE (term, id)-keyed shuffle (the same shape as
    * the postings build); row size is bounded by a doc's own term count,
    * never by df — a stopword means many ROWS, not a corpus-sized one.
    *
    * Ordering with the BM25 components: [[writeSearchIndex]] wipes the
    * whole index dir (a full rebuild rebuilds everything), so build
    * positions AFTER it when co-locating; [[mergeSearchIndexSegments]]
    * folds and carries the positions component automatically when
    * present.
    */
  def writePositionsIndex(docs: DataFrame, textCol: String, idCol: String,
      dir: String): Unit = {
    val spark = docs.sparkSession
    val path = new org.apache.hadoop.fs.Path(s"$dir/positions")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true)
    positionRows(docs, textCol, idCol)
      .write.mode("overwrite").partitionBy("term")
      .parquet(s"$dir/positions/seg=base")
  }

  /** Append one ingest batch's positions as its own segment, idempotent
    * under retries (`seg=<batchKey>` overwrite — the family contract). */
  def appendPositionsBatch(docs: DataFrame, textCol: String, idCol: String,
      dir: String, batchKey: String): Unit = {
    require(batchKey != "base", "segment key 'base' is reserved for the full build")
    require(batchKey.nonEmpty && !batchKey.exists(c => c == '/' || c == '='),
      s"batchKey must be a plain partition value, got '$batchKey'")
    positionRows(docs, textCol, idCol)
      .write.mode("overwrite").partitionBy("term")
      .parquet(s"$dir/positions/seg=$batchKey")
  }

  /** [[phraseMatch]] served from the PERSISTED positional index: read
    * prunes to the phrase's distinct terms, each doc's candidate starts
    * are the intersection of its per-term position arrays shifted by the
    * term's offset in the phrase (a repeated phrase token intersects the
    * SAME array under two shifts — correct by construction), ranked
    * (n_occ DESC, id ASC). Bit-identical to the scan-path [[phraseMatch]]
    * (contract-tested) with ZERO corpus access — the pruned index rows
    * are the only input. `validateIds` guards a doc id indexed under two
    * segment keys (which would double-count its occurrences); the check
    * scans only the pruned rows.
    */
  def phraseMatchIndexed(spark: org.apache.spark.sql.SparkSession, dir: String,
      idCol: String, phrase: Seq[String], topK: Int = 10,
      validateIds: Boolean = true): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    require(phrase.forall(_.nonEmpty), "phrase tokens must be non-empty")
    val vocab = phrase.distinct
    // explicit schema — partition-column inference would coerce
    // numeric-looking terms (see bm25IndexedPivot)
    val pos = spark.read
      .schema("id BIGINT, positions ARRAY<INT>, term STRING, seg STRING")
      .parquet(s"$dir/positions")
      .filter(col("term").isin(vocab: _*)) // partition-pruned read
    if (validateIds) {
      val dup = pos.groupBy("id", "term").agg(count(lit(1)).as("_n"))
        .filter(col("_n") > 1).select("id").take(1)
      require(dup.isEmpty,
        s"positions index holds id ${dup.headOption.map(_.get(0)).orNull} under two " +
          "segment keys; rebuild with writePositionsIndex or repair the segments")
    }
    val pivAggs = vocab.indices.map(i =>
      max(when(col("term") === lit(vocab(i)), col("positions"))).as(s"_p$i"))
    val piv = pos.groupBy("id").agg(pivAggs.head, pivAggs.tail: _*)
    val vocabIdx = vocab.zipWithIndex.toMap
    // shift term j's positions back by j: a phrase start is a position in
    // EVERY shifted array
    val shifted = phrase.indices.map { j =>
      val arr = col(s"_p${vocabIdx(phrase(j))}")
      if (j == 0) arr else transform(arr, x => x - j)
    }
    val allPresent = phrase.indices
      .map(j => col(s"_p${vocabIdx(phrase(j))}").isNotNull).reduceLeft(_ && _)
    val starts = shifted.reduceLeft(array_intersect)
    piv
      .filter(allPresent)
      .select(col("id").as(idCol), size(starts).as("n_occ"),
        array_min(starts).as("first_pos"))
      .filter(col("n_occ") > 0)
      .orderBy(desc("n_occ"), col(idCol))
      .limit(topK)
  }

  /** The matching DuckDB oracle SQL for [[invertedIndex]]. */
  def invertedIndexOracleSql(blockSize: Int = 1024): String =
    s"""
      WITH tf AS (SELECT tok AS term, doc_id AS id, count(*) AS tf FROM (
                    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
                    FROM documents)
                  GROUP BY tok, doc_id),
      w AS (SELECT term, id, tf,
              count(*) OVER (PARTITION BY term) AS df,
              CAST(sum(tf) OVER (PARTITION BY term) AS BIGINT) AS total_tf,
              CAST((row_number() OVER (PARTITION BY term ORDER BY id) - 1)
                // $blockSize AS INT) AS block
            FROM tf)
      SELECT term, block, df, total_tf,
             array_to_string(list_sort(list(id)), ',') AS postings
      FROM w GROUP BY term, block, df, total_tf ORDER BY term, block"""

  /** The matching DuckDB oracle SQL for [[tfidfTopTerms]]. */
  def tfidfOracleSql(topN: Int = 3): String =
    s"""
      WITH tf AS (SELECT doc_id, tok AS term, count(*) AS tf FROM (
                    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
                    FROM documents)
                  GROUP BY doc_id, tok),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      stats AS (SELECT count(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, term, tf, df,
                   round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
                 FROM tf JOIN df USING (term) CROSS JOIN stats),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, tf DESC, term) AS rank FROM scored)
      SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, tfidf
      FROM r WHERE rank <= $topN ORDER BY doc_id, rank"""
}
