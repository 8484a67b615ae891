package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Cols, Det}

/** Multinomial Naive Bayes text classifier — the distributed stand-in for
  * the fastText/logistic "quality classifier" slot in published LLM data
  * pipelines (GPT-3's WebText-similarity filter, CCNet's per-language
  * models): train token-count statistics on a labeled slice, score every
  * unlabeled document with add-one-smoothed log-likelihoods, keep the
  * argmax class. The engine uses it label-agnostically (here: language id
  * from raw token counts, graded against held-out `lang` labels); the same
  * operator trains a keep/drop quality model when the labels are
  * curator-provided.
  *
  * Model (standard multinomial NB, add-one/Laplace smoothing):
  *   score(d, y) = ln P(y) + Σ_{t ∈ d} ln (c(t,y) + 1) / (N_y + V)
  * with c(t,y) the training count of token t under class y, N_y the total
  * token occurrences of class y, V the global training vocabulary size,
  * and P(y) the document-count prior. Unseen tokens contribute
  * ln(1/(N_y+V)) — smoothing makes scoring total over any corpus.
  *
  * Scale shape (the whole point vs a driver-side sklearn fit): training is
  * ONE groupBy over exploded tokens (map-side combined); scoring joins the
  * test corpus' exploded tokens against the count table key-hashed on
  * (class, token) — no all-pairs, no driver collect, no iteration. The
  * class list, per-class totals, priors, and vocab scalar are tiny
  * broadcast sides. Linear in corpus size, shuffle width bounded by
  * |vocab| x |classes|; at 100 TB the count table itself stays
  * distributed (never collected) — only the O(|classes|) tables
  * broadcast.
  *
  * Float determinism (the [[LmScore]] scheme): each token log-prob and the
  * prior are rounded to 6 dp (ln's last ulp is engine-specific), per-doc
  * per-class sums are decimal-exact ([[graft.core.Det]]), and the final
  * prior+sum add is one correctly-rounded double op — so scores, and
  * therefore the argmax ranking, hash bit-exact against the DuckDB oracle.
  *
  * Ref behavior anchor: reference data_quality.py computes per-column
  * value_counts in pandas for profiling; this operator is the engine's
  * extension of that counting machinery into an actual trained classifier
  * (reference has no classifier-training surface at all).
  */
object NaiveBayes {

  /** Train on `train` (labelCol ∈ small class set), score `test`; returns
    * one row per test doc: (idCol, actual, predicted, n_tokens, score)
    * ordered by idCol. `actual` is test's labelCol carried through for
    * grading; `score` is the winning class' joint log-likelihood.
    * Ties rank deterministically (higher score first, then class asc).
    */
  def trainScore(train: DataFrame, test: DataFrame, idCol: String,
      textCol: String, labelCol: String): DataFrame = {
    val reserved = Set("_lab", "_tok", "_c", "_n", "_v", "_d", "_dt",
      "_prior", "_lp", "_ntok", "_s", "_score", "_rn")
    require(!reserved.contains(idCol) && !reserved.contains(textCol) &&
      !reserved.contains(labelCol),
      s"${reserved.mkString("/")} are reserved by trainScore; rename the input column")
    val toks = train.select(col(labelCol).as("_lab"),
      explode(Cols.wsTokens(col(textCol))).as("_tok"))
    // ONE pass over the training corpus: the (class, token) count table
    // is persisted and every other model table (per-class totals, vocab
    // size) derives from it — without the persist, each derivation
    // re-explodes the whole corpus (a measured 2-3x on the sf0.1 bench)
    val tc = toks.groupBy("_lab", "_tok").agg(count(lit(1)).as("_c"))
    tc.persist()
    val nl = tc.groupBy("_lab").agg(sum("_c").as("_n"))
    val v = tc.agg(countDistinct(col("_tok")).as("_v"))
    val pri = train.groupBy(col(labelCol).as("_lab"))
      .agg(count(lit(1)).as("_d"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("_dt"))))
      .select(col("_lab"),
        round(log(col("_d").cast("double") / col("_dt")), 6).as("_prior"))
    val scored = test
      .select(col(idCol), explode(Cols.wsTokens(col(textCol))).as("_tok"))
      .crossJoin(broadcast(pri.select("_lab")))
      .join(tc, Seq("_lab", "_tok"), "left")
      .join(broadcast(nl), Seq("_lab"))
      .crossJoin(broadcast(v))
      .select(col(idCol), col("_lab"),
        round(log((coalesce(col("_c"), lit(0L)) + lit(1L)).cast("double") /
          (col("_n") + col("_v")).cast("double")), 6).as("_lp"))
    val perClass = scored.groupBy(col(idCol), col("_lab"))
      .agg(count(lit(1)).as("_ntok"), Det.dsum(col("_lp")).as("_s"))
      .join(broadcast(pri), Seq("_lab"))
      .select(col(idCol), col("_lab"), col("_ntok"),
        (col("_prior") + col("_s")).as("_score"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("_score").desc, col("_lab").asc)
    perClass.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(test.select(col(idCol), col(labelCol).as("actual")), Seq(idCol))
      .select(col(idCol), col("actual"), col("_lab").as("predicted"),
        col("_ntok").cast("int").as("n_tokens"), col("_score").as("score"))
      .orderBy(idCol)
  }

  /** The matching DuckDB oracle SQL over `documents` (label = lang), with
    * `trainPred`/`testPred` SQL predicates selecting the two slices. Same
    * operation tree, same rounding points, same tie-break.
    */
  def oracleSql(trainPred: String, testPred: String): String = s"""
    WITH tr AS (SELECT lang AS lab, string_split_regex(trim(text), '\\s+') AS t
                FROM documents WHERE $trainPred),
    tok AS (SELECT lab, unnest(t) AS tok FROM tr),
    tc AS (SELECT lab, tok, count(*) AS c FROM tok GROUP BY lab, tok),
    nl AS (SELECT lab, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY lab),
    vs AS (SELECT count(DISTINCT tok) AS v FROM tok),
    pri AS (SELECT lab, round(ln(CAST(count(*) AS DOUBLE) /
              (SELECT count(*) FROM tr)), 6) AS prior
            FROM tr GROUP BY lab),
    tt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
           FROM documents WHERE $testPred),
    ttok AS (SELECT doc_id, unnest(t) AS tok FROM tt),
    sc AS (SELECT doc_id, lab,
             round(ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE) /
                      CAST(n + v AS DOUBLE)), 6) AS lp
           FROM ttok CROSS JOIN (SELECT lab FROM pri) labs
           LEFT JOIN tc USING (lab, tok)
           JOIN nl USING (lab) CROSS JOIN vs),
    pl AS (SELECT doc_id, lab, count(*) AS ntok,
             ${Det.sqlSum("lp")} AS s
           FROM sc GROUP BY doc_id, lab),
    ranked AS (SELECT doc_id, lab, ntok, prior + s AS score,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY prior + s DESC, lab ASC) AS rn
               FROM pl JOIN pri USING (lab))
    SELECT r.doc_id, d.lang AS actual, r.lab AS predicted,
           CAST(r.ntok AS INT) AS n_tokens, r.score
    FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
    WHERE r.rn = 1
    ORDER BY r.doc_id"""
}
