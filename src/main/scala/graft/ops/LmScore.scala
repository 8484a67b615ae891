package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet/RedPajama-style
  * "perplexity filter": score every document by the average smoothed
  * bigram log-probability under a model counted from a REFERENCE slice
  * (in the published pipelines, Wikipedia; KenLM plays the model role —
  * here the model is an add-alpha bigram LM the engine trains itself, so
  * the whole operator stays inside Spark with no native dependency).
  * Low-scoring documents are the boilerplate/gibberish a quality funnel
  * drops; OOV-heavy documents surface separately (`oov_bigrams`) because
  * "unseen vocabulary" and "unlikely sequence" are different failure
  * modes.
  *
  * Model: P(w2|w1) = (c(w1 w2) + alpha) / (c(w1 ·) + alpha·V), with
  * c(w1 ·) the count of bigrams whose context is w1 and V the reference
  * vocabulary size — add-alpha smoothing, so unseen bigrams score
  * ln(alpha / (c + alpha·V)) instead of -inf.
  *
  * Scale shape: the reference reduces to two count tables (bigram,
  * context) joined onto the target's exploded bigrams — both joins are
  * key-hashed and AQE broadcasts them when the reference is small; V is
  * a 1-row broadcast. One groupBy(doc) aggregate closes it. Everything
  * is linear in corpus size; no windows, no driver loops.
  *
  * Float determinism: each bigram's log-prob is rounded to 6 dp (ln's
  * last ulp is engine-specific), the per-doc sum is decimal-exact
  * ([[graft.core.Det]]), and the final average is one double divide +
  * round — bit-identical between Spark and the DuckDB oracle.
  */
object LmScore {

  /** Per-document bigram LM score of `docs` under a model counted from
    * `refDocs`. Output: (idCol, n_bigrams, oov_bigrams, avg_logprob),
    * one row per doc with >= 2 tokens (a shorter doc has no bigram and
    * no defined score). `oov_bigrams` counts bigrams absent from the
    * reference. Higher avg_logprob = more reference-like.
    */
  def bigramScore(docs: DataFrame, refDocs: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.4): DataFrame = {
    require(alpha > 0, s"alpha must be positive (got $alpha): alpha=0 makes unseen bigrams -inf")
    val reserved = Set("g", "w1", "_t", "lp", "oov", "cb", "cu", "v")
    require(!reserved.contains(idCol) && !reserved.contains(textCol),
      s"${reserved.mkString("/")} are reserved by bigramScore; rename the input column")
    def bigrams(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]) = df
      .select(cols :+ graft.core.Cols.wsTokens(col(textCol)).as("_t"): _*)
      .select(cols :+ explode(CorpusOps.wordGrams(col("_t"), 2)).as("g"): _*)
      .withColumn("w1", substring_index(col("g"), " ", 1))
    // ONE pass over the reference: context counts derive from the bigram
    // counts (c(w1 ·) = Σ_g c(g) over grams with context w1) — grouping
    // the count table, not re-exploding the corpus. g determines w1, so
    // carrying w1 through the groupBy adds no cardinality.
    val refB = bigrams(refDocs, Seq.empty)
    val cb0 = refB.groupBy("g", "w1").agg(count(lit(1)).as("cb"))
    val cb = cb0.select("g", "cb")
    val cu = cb0.groupBy("w1").agg(sum("cb").as("cu"))
    val vocab = refDocs
      .select(explode(graft.core.Cols.wsTokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val scored = bigrams(docs, Seq(col(idCol)))
      .join(cb, Seq("g"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(log((coalesce(col("cb"), lit(0L)) + lit(alpha)) /
          (coalesce(col("cu"), lit(0L)) + lit(alpha) * col("v"))), 6).as("lp"),
        when(col("cb").isNull, 1L).otherwise(0L).as("oov"))
    scored.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("oov")).as("oov_bigrams"),
      round(graft.core.Det.dsum(col("lp")) / count(lit(1)), 6).as("avg_logprob"))
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram scoring (Kneser & Ney
    * 1995; the smoothing KenLM ships and the CCNet-style filters
    * actually run) — upgrades [[bigramScore]]'s add-alpha model with
    * absolute discounting plus the continuation distribution:
    *
    *   P(w2|w1) = max(c(w1w2) - D, 0)/c(w1·)
    *              + (D · N1+(w1·)/c(w1·)) · Pc(w2)
    *   Pc(w2)   = (N1+(·w2) + 1) / (T + V)
    *
    * with D = 0.75, N1+(w1·)/N1+(·w2) the distinct right/left
    * continuation type counts, T the distinct bigram types, and V the
    * vocabulary size. Pc carries add-one smoothing (a documented
    * deviation from textbook KN, whose Pc(unseen) = 0 would put -inf
    * on any OOV token) so scoring is total over arbitrary corpora; an
    * unseen CONTEXT backs off to Pc alone.
    *
    * Same scale shape as [[bigramScore]]: four count tables (bigram,
    * context, fwd/rev continuation types) joined key-hashed onto the
    * target's exploded bigrams, scalars broadcast, one closing per-doc
    * aggregate. Same determinism scheme: ln rounded 6 dp, per-doc
    * decimal-exact sum.
    */
  def knBigramScore(docs: DataFrame, refDocs: DataFrame, idCol: String,
      textCol: String, discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    val reserved = Set("g", "w1", "w2", "_t", "lp", "oov",
      "cb", "cu", "n1f", "n1r", "t_types", "v")
    require(!reserved.contains(idCol) && !reserved.contains(textCol),
      s"${reserved.mkString("/")} are reserved by knBigramScore; rename the input column")
    def bigrams(df: DataFrame, cols: Seq[org.apache.spark.sql.Column]) = df
      .select(cols :+ graft.core.Cols.wsTokens(col(textCol)).as("_t"): _*)
      .select(cols :+ explode(CorpusOps.wordGrams(col("_t"), 2)).as("g"): _*)
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
    // one pass over the reference: every model table derives from the
    // per-bigram count table, never from re-exploding the corpus
    val cb0 = bigrams(refDocs, Seq.empty)
      .groupBy("g", "w1", "w2").agg(count(lit(1)).as("cb"))
    val cb = cb0.select("g", "cb")
    val cu = cb0.groupBy("w1")
      .agg(sum("cb").as("cu"), count(lit(1)).as("n1f"))
    val n1r = cb0.groupBy("w2").agg(count(lit(1)).as("n1r"))
    val scal = cb0.agg(count(lit(1)).as("t_types")).crossJoin(
      refDocs.select(explode(graft.core.Cols.wsTokens(col(textCol))).as("tok"))
        .agg(countDistinct(col("tok")).as("v")))
    val d = lit(discount)
    val pc = (coalesce(col("n1r"), lit(0L)) + lit(1L)).cast("double") /
      (col("t_types") + col("v")).cast("double")
    // unseen bigram under a seen context: the discounted main term is
    // exactly 0 (coalesce before the subtraction — greatest-over-NULL
    // semantics differ between engines, so never let a NULL reach it)
    val p = when(col("cu").isNotNull,
      greatest(coalesce(col("cb"), lit(0L)) - d, lit(0.0)) / col("cu") +
        (d * col("n1f") / col("cu")) * pc)
      .otherwise(pc)
    val scored = bigrams(docs, Seq(col(idCol)))
      .join(cb, Seq("g"), "left")
      .join(cu, Seq("w1"), "left")
      .join(n1r, Seq("w2"), "left")
      .crossJoin(broadcast(scal))
      .select(col(idCol),
        round(log(p), 6).as("lp"),
        when(col("cb").isNull, 1L).otherwise(0L).as("oov"))
    scored.groupBy(idCol).agg(
      count(lit(1)).as("n_bigrams"),
      sum(col("oov")).as("oov_bigrams"),
      round(graft.core.Det.dsum(col("lp")) / count(lit(1)), 6).as("avg_kn_logprob"))
  }

  /** The matching DuckDB oracle SQL for [[knBigramScore]] over
    * `documents`: same operation tree, same rounding points.
    */
  def knBigramScoreOracleSql(refPred: String, docPred: String,
      discount: Double = 0.75): String = {
    val d = s"CAST($discount AS DOUBLE)"
    s"""
      WITH rt AS (SELECT string_split_regex(trim(text), '\\s+') AS t
                  FROM documents WHERE $refPred),
      rb AS (SELECT t[i] AS w1, t[i + 1] AS w2, t[i] || ' ' || t[i + 1] AS g
             FROM rt, unnest(range(1, len(t))) u(i) WHERE len(t) >= 2),
      cb0 AS (SELECT g, w1, w2, count(*) AS cb FROM rb GROUP BY g, w1, w2),
      cb AS (SELECT g, cb FROM cb0),
      cu AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu, count(*) AS n1f
             FROM cb0 GROUP BY w1),
      n1r AS (SELECT w2, count(*) AS n1r FROM cb0 GROUP BY w2),
      scal AS (SELECT (SELECT count(*) FROM cb0) AS t_types,
                      (SELECT count(DISTINCT tok) FROM
                        (SELECT unnest(t) AS tok FROM rt)) AS v),
      tt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
             FROM documents WHERE $docPred),
      tb AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2,
                    t[i] || ' ' || t[i + 1] AS g
             FROM tt, unnest(range(1, len(t))) u(i) WHERE len(t) >= 2),
      sc AS (SELECT doc_id,
               round(ln(CASE WHEN cu.cu IS NOT NULL THEN
                 greatest(COALESCE(cb.cb, 0) - $d, 0.0) / cu.cu +
                   ($d * cu.n1f / cu.cu) *
                   (CAST(COALESCE(n1r.n1r, 0) + 1 AS DOUBLE) /
                    CAST(t_types + v AS DOUBLE))
                 ELSE CAST(COALESCE(n1r.n1r, 0) + 1 AS DOUBLE) /
                      CAST(t_types + v AS DOUBLE) END), 6) AS lp,
               CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS oov
             FROM tb LEFT JOIN cb USING (g) LEFT JOIN cu USING (w1)
             LEFT JOIN n1r USING (w2)
             CROSS JOIN scal)
      SELECT doc_id, count(*) AS n_bigrams,
             CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
             round(${graft.core.Det.sqlSum("lp")} / count(*), 6)
               AS avg_kn_logprob
      FROM sc GROUP BY doc_id ORDER BY doc_id"""
  }

  /** The matching DuckDB oracle SQL for [[bigramScore]] over `documents`,
    * with the reference slice `refPred` and targets `docPred` (SQL
    * predicates on the table's columns). Same operation tree, same
    * rounding points, decimal-exact per-doc sums.
    */
  def bigramScoreOracleSql(refPred: String, docPred: String,
      alpha: Double = 0.4): String = {
    def d(x: Double) = s"CAST($x AS DOUBLE)"
    s"""
      WITH rt AS (SELECT string_split_regex(trim(text), '\\s+') AS t
                  FROM documents WHERE $refPred),
      rb AS (SELECT t[i] AS w1, t[i] || ' ' || t[i + 1] AS g
             FROM rt, unnest(range(1, len(t))) u(i) WHERE len(t) >= 2),
      cb AS (SELECT g, count(*) AS cb FROM rb GROUP BY g),
      cu AS (SELECT w1, count(*) AS cu FROM rb GROUP BY w1),
      vs AS (SELECT count(DISTINCT tok) AS v FROM
               (SELECT unnest(t) AS tok FROM rt)),
      tt AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
             FROM documents WHERE $docPred),
      tb AS (SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS g
             FROM tt, unnest(range(1, len(t))) u(i) WHERE len(t) >= 2),
      sc AS (SELECT doc_id,
               round(ln((COALESCE(cb.cb, 0) + ${d(alpha)}) /
                        (COALESCE(cu.cu, 0) + ${d(alpha)} * v)), 6) AS lp,
               CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS oov
             FROM tb LEFT JOIN cb USING (g) LEFT JOIN cu USING (w1)
             CROSS JOIN vs)
      SELECT doc_id, count(*) AS n_bigrams,
             CAST(SUM(oov) AS BIGINT) AS oov_bigrams,
             round(${graft.core.Det.sqlSum("lp")} / count(*), 6) AS avg_logprob
      FROM sc GROUP BY doc_id ORDER BY doc_id"""
  }
}
