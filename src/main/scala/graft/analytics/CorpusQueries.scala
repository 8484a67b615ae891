package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.CorpusOps

/** Corpus-preparation operators over `documents` (SURVEY §2.14): benchmark
  * decontamination, sequence packing, repetition quality stats, weighted
  * mixture sampling, and the compiled quality filter. All five are
  * oracle-checked — the semantics are plain enough for ANSI SQL even
  * though the Spark plans are shaped for 100 TB (broadcast eval grams,
  * per-shard packing windows, single-agg top-bigram).
  */
object CorpusQueries {

  /** The q254 oracle, generated so the per-n CTEs (top {2,3,4}-gram
    * mass, duplicate {5..10}-gram coverage) come from ONE loop — the 9
    * n-values cannot drift apart. Replays the engine's planting, the
    * line-duplicate counters, tie-to-smallest-gram top selection, and
    * coverage-union char sums. */
  /** Shared planted-page base for q252/q253/q254: documents tokenized
    * and cut into 7-token lines, token and line arrays BOUND to columns
    * so the per-query decorations (element_at, indexed transforms)
    * never re-evaluate the construction chain per access — the
    * q125/WordGramsExpr binding rule, and one copy of the planting the
    * three oracles replay. */
  private def plantedLineDocs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.core.Cols.wsTokens(col("text")).as("_t"))
      .withColumn("_lines",
        transform(expr("sequence(0, (size(_t) - 1) div 7)"),
          i => concat_ws(" ", slice(col("_t"), i * lit(7) + 1, lit(7)))))

  private def gopherRepetitionOracle: String = {
    val topPct = Map(2 -> 20, 3 -> 18, 4 -> 16)
    val dupPct = Map(5 -> 15, 6 -> 14, 7 -> 13, 8 -> 12, 9 -> 11, 10 -> 10)
    def gramCte(n: Int) =
      s"""g$n AS (SELECT doc_id, i - 1 AS pos,
             array_to_string(ws[i:i+${n - 1}], ' ') AS gram
           FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - ${n - 2})) AS i
                 FROM w WHERE len(ws) >= $n))"""
    val topCtes = (2 to 4).map { n =>
      s"""${gramCte(n)},
        t$n AS (SELECT doc_id,
             CAST(cnt * greatest(len(gram) - ${n - 1}, 0) AS BIGINT) AS chars
           FROM (SELECT doc_id, gram, count(*) AS cnt,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY count(*) DESC, gram) AS rn
                 FROM g$n GROUP BY doc_id, gram)
           WHERE rn = 1)"""
    }
    val dupCtes = (5 to 10).map { n =>
      s"""${gramCte(n)},
        d$n AS (SELECT cv.doc_id AS doc_id, CAST(SUM(len(tp.tok)) AS BIGINT) AS chars
           FROM (SELECT DISTINCT c.doc_id, c.p FROM (
                   SELECT doc_id, unnest(range(pos, pos + $n)) AS p
                   FROM (SELECT doc_id, pos FROM g$n
                         QUALIFY count(*) OVER (PARTITION BY doc_id, gram) >= 2)
                 ) c) cv
           JOIN (SELECT doc_id, unnest(ws) AS tok,
                        generate_subscripts(ws, 1) - 1 AS p FROM w) tp
             ON tp.doc_id = cv.doc_id AND tp.p = cv.p
           GROUP BY cv.doc_id)"""
    }
    val topSel = (2 to 4).map(n =>
      s"coalesce(t$n.chars, 0) AS chars_top${n}gram").mkString(",\n        ")
    val dupSel = (5 to 10).map(n =>
      s"coalesce(d$n.chars, 0) AS chars_dup${n}gram").mkString(",\n        ")
    val joins = ((2 to 4).map(n => s"LEFT JOIN t$n USING (doc_id)") ++
      (5 to 10).map(n => s"LEFT JOIN d$n USING (doc_id)")).mkString("\n        ")
    val flagExprs = (Seq(
      "CAST(CASE WHEN 100*n_dup_line_occ <= 30*n_lines THEN 1 ELSE 0 END AS BIGINT) AS f_dup_line_frac",
      "CAST(CASE WHEN 100*chars_dup_lines <= 20*chars_lines THEN 1 ELSE 0 END AS BIGINT) AS f_dup_line_char_frac",
      "CAST(CASE WHEN 100*n_dup_para_occ <= 30*n_paras THEN 1 ELSE 0 END AS BIGINT) AS f_dup_para_frac",
      "CAST(CASE WHEN 100*chars_dup_paras <= 20*chars_paras THEN 1 ELSE 0 END AS BIGINT) AS f_dup_para_char_frac") ++
      (2 to 4).map(n =>
        s"CAST(CASE WHEN 100*chars_top${n}gram <= ${topPct(n)}*chars_words THEN 1 ELSE 0 END AS BIGINT) AS f_top${n}gram_char_frac") ++
      (5 to 10).map(n =>
        s"CAST(CASE WHEN 100*chars_dup${n}gram <= ${dupPct(n)}*chars_words THEN 1 ELSE 0 END AS BIGINT) AS f_dup${n}gram_char_frac"))
      .mkString(",\n        ")
    val flagNames = (Seq("f_dup_line_frac", "f_dup_line_char_frac",
      "f_dup_para_frac", "f_dup_para_char_frac") ++
      (2 to 4).map(n => s"f_top${n}gram_char_frac") ++
      (5 to 10).map(n => s"f_dup${n}gram_char_frac"))
    raw"""
      WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                 FROM documents),
      l0 AS (SELECT doc_id,
               list_transform(range(0, ((len(t) - 1) // 7) + 1), i ->
                 array_to_string(t[i*7+1:i*7+7], ' ')) AS ls
             FROM d),
      p0 AS (SELECT doc_id, ls,
               list_transform(range(0, ((len(ls) - 1) // 3) + 1), j ->
                 array_to_string(ls[j*3+1:j*3+3], chr(10))) AS ps
             FROM l0),
      p AS (SELECT doc_id,
              array_to_string(ps, chr(10) || chr(10)) ||
              (CASE WHEN doc_id % 4 = 0
                    THEN chr(10) || ls[1] || chr(10) || ls[1] ||
                         chr(10) || ls[1] ELSE '' END) ||
              (CASE WHEN doc_id % 6 = 0
                    THEN chr(10) || chr(10) || ps[1] ELSE '' END) AS t2
            FROM p0),
      w AS (SELECT doc_id,
              list_filter(list_transform(string_split(t2, chr(10)),
                x -> regexp_replace(x, '^\s+|\s+$$', '', 'g')),
                x -> x <> '') AS lns,
              list_filter(list_transform(
                regexp_split_to_array(t2, '\r?\n[ \t]*\r?\n'),
                x -> regexp_replace(x, '^\s+|\s+$$', '', 'g')),
                x -> x <> '') AS prs,
              string_split_regex(trim(t2), '\s+') AS ws
            FROM p),
      lc AS (SELECT doc_id,
               CAST(len(lns) AS BIGINT) AS n_lines,
               CAST(list_sum(list_transform(lns, x -> len(x))) AS BIGINT)
                 AS chars_lines,
               CAST(len(lns) - len(list_distinct(lns)) AS BIGINT)
                 AS n_dup_line_occ,
               CAST(list_sum(list_transform(lns, x -> len(x))) -
                    list_sum(list_transform(list_distinct(lns), x -> len(x)))
                 AS BIGINT) AS chars_dup_lines,
               CAST(len(prs) AS BIGINT) AS n_paras,
               CAST(list_sum(list_transform(prs, x -> len(x))) AS BIGINT)
                 AS chars_paras,
               CAST(len(prs) - len(list_distinct(prs)) AS BIGINT)
                 AS n_dup_para_occ,
               CAST(list_sum(list_transform(prs, x -> len(x))) -
                    list_sum(list_transform(list_distinct(prs), x -> len(x)))
                 AS BIGINT) AS chars_dup_paras,
               CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT)
                 AS chars_words
             FROM w),
      ${(topCtes ++ dupCtes).mkString(",\n      ")},
      base AS (SELECT lc.doc_id, n_lines, chars_lines, n_dup_line_occ,
               chars_dup_lines, n_paras, chars_paras, n_dup_para_occ,
               chars_dup_paras, chars_words,
        $topSel,
        $dupSel
        FROM lc
        $joins),
      fl AS (SELECT *,
        $flagExprs
        FROM base)
      SELECT *, CAST(CASE WHEN ${flagNames.map(f => s"$f = 1").mkString(" AND ")}
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM fl ORDER BY doc_id"""
  }

  /** The full-corpus source-overlap matrix in SQL — shared VERBATIM by
    * q246 (batch) and q247 (incremental): q247's whole contract is that
    * the incremental chain reproduces this exact matrix, so the two
    * oracles must be one string (a fix applied to only one copy would
    * make them silently disagree about what "the same matrix" means). */
  private val overlapMatrixOracleSql: String = raw"""
        WITH toks AS (SELECT source, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        g AS (SELECT DISTINCT source, array_to_string(t[i:i+3], ' ') AS gram
              FROM (SELECT source, t, unnest(range(1, len(t) - 2)) AS i
                    FROM toks WHERE len(t) >= 4)),
        tot AS (SELECT source, count(*) AS n_grams FROM g GROUP BY source),
        sh AS (SELECT a.source AS src_a, b.source AS src_b,
                      count(*) AS shared
               FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
               GROUP BY 1, 2)
        SELECT ta.source AS src_a, tb.source AS src_b,
               COALESCE(sh.shared, 0) AS shared_grams,
               ta.n_grams AS grams_a, tb.n_grams AS grams_b,
               CAST(COALESCE(sh.shared, 0) AS DOUBLE) /
                 (ta.n_grams + tb.n_grams - COALESCE(sh.shared, 0)) AS jaccard
        FROM tot ta JOIN tot tb ON ta.source < tb.source
        LEFT JOIN sh ON sh.src_a = ta.source AND sh.src_b = tb.source
        ORDER BY src_a, src_b"""

  val defs: Seq[QueryDef] = Seq(
    // ---- benchmark decontamination: train docs sharing any word 4-gram
    // with the eval split (doc_id % 50 == 0 here; a real pipeline feeds
    // the benchmark suite). 4-grams suit this synthetic 31-word
    // vocabulary; natural-text pipelines use 8-13 (the operator's n is a
    // parameter). Survivors = train ANTI JOIN this result.
    QueryDef(
      "q68_decontamination",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
                     i -> array_to_string(t[i:i+3], ' '))) AS gram
              FROM toks WHERE len(t) >= 4),
        e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared_grams
        FROM g JOIN e USING (gram)
        WHERE g.doc_id % 50 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      CorpusOps.contamination(
        train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        idCol = "doc_id", textCol = "text", n = 4)
        .orderBy("doc_id")
    },

    // ---- the decontamination stage itself: the clean train split (docs
    // sharing NO 4-gram with the eval split) — what training consumes
    QueryDef(
      "q75_decontaminated_train",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
                     i -> array_to_string(t[i:i+3], ' '))) AS gram
              FROM toks WHERE len(t) >= 4),
        e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        bad AS (SELECT DISTINCT g.doc_id FROM g JOIN e USING (gram)
                WHERE g.doc_id % 50 <> 0)
        SELECT doc_id, source, lang FROM documents
        WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT doc_id FROM bad)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      CorpusOps.decontaminate(
        train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
        evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0),
        idCol = "doc_id", textCol = "text", n = 4)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    },

    // ---- concat-and-chunk sequence packing: docs laid end-to-end per
    // source shard, 128-token context windows; each doc gets its token
    // offset, first chunk, and chunk span. Window is per-source (parallel
    // across shards), arithmetic is exact long div on both engines.
    QueryDef(
      "q69_sequence_packing",
      Some(raw"""
        WITH s AS (SELECT doc_id, source,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens
                   FROM documents),
        c AS (SELECT doc_id, source, n_tokens,
                CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  - n_tokens AS BIGINT) AS tok_start
              FROM s)
        SELECT doc_id, source, n_tokens, tok_start,
               tok_start // 128 AS chunk_first,
               CASE WHEN n_tokens = 0 THEN 0
                    ELSE (tok_start + n_tokens - 1) // 128 - tok_start // 128 + 1
               END AS n_chunks
        FROM c ORDER BY doc_id"""),
    ) { (s, dir) =>
      val withTok = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(graft.core.Cols.wsTokens(col("text"))).as("n_tokens"))
      CorpusOps.packSequences(withTok, "source", "doc_id", "n_tokens", 128L)
        .orderBy("doc_id")
    },

    // ---- Gopher-style repetition stats: duplication ratio + top bigram
    // (count and overlapping coverage fraction), ties to the smallest
    // bigram. The oracle takes the row_number formulation; the Spark plan
    // is the single-aggregate min(struct(-cnt, gram)) — same semantics.
    QueryDef(
      "q70_repetition_stats",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        s AS (SELECT doc_id, len(t) AS n_tokens,
                     len(list_distinct(t)) AS n_distinct_tokens FROM toks),
        bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i+1])) AS g
               FROM toks WHERE len(t) >= 2),
        c AS (SELECT doc_id, g, COUNT(*) AS cnt FROM bg GROUP BY 1, 2),
        r AS (SELECT doc_id, g, cnt,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY cnt DESC, g) AS rk
              FROM c)
        SELECT s.doc_id, s.n_tokens, s.n_distinct_tokens,
               1.0 - CAST(s.n_distinct_tokens AS DOUBLE) / s.n_tokens
                 AS dup_token_ratio,
               r.g AS top_bigram, r.cnt AS top_bigram_cnt,
               CAST(r.cnt AS DOUBLE) * 2 / s.n_tokens AS top_bigram_frac
        FROM s LEFT JOIN (SELECT * FROM r WHERE rk = 1) r USING (doc_id)
        ORDER BY s.doc_id"""),
    ) { (s, dir) =>
      CorpusOps.repetitionStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- weighted source-mixture sampling: src0-3 full, src4-9 half,
    // rest quarter — deterministic seeded-hash membership (same
    // multiplicative-hash arithmetic as q59), so the oracle reproduces
    // the exact row set.
    QueryDef(
      "q71_mixture_sample",
      Some("""
        SELECT doc_id, source FROM documents
        WHERE ((doc_id % 100000007 + 42) * 2654435761) % 4294967296 <
              CASE WHEN source IN ('src0','src1','src2','src3')
                     THEN 4294967296
                   WHEN source IN ('src4','src5','src6','src7','src8','src9')
                     THEN 2147483648
                   ELSE 1073741824 END
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      val full = Seq("src0", "src1", "src2", "src3").map(_ -> 1.0)
      val half = Seq("src4", "src5", "src6", "src7", "src8", "src9").map(_ -> 0.5)
      CorpusOps.mixtureSample(Tables.documents(s, dir), "doc_id", "source",
        rates = (full ++ half).toMap, defaultRate = 0.25, seed = 42L)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // ---- PII/pattern scrubbing: per-rule raw match counts + the
    // redacted text's fingerprint (identity on this synthetic ASCII
    // corpus — the match/redaction semantics are contracted on crafted
    // inputs in CorpusOpsSpec; the oracle validates the full expression
    // chain end-to-end)
    QueryDef(
      "q77_pii_scrub",
      Some(raw"""
        SELECT doc_id,
               len(regexp_extract_all(text, 'https?://[^ \t\n\f\r]+')) AS n_url,
               len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+')) AS n_email,
               len(regexp_extract_all(text,
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
               len(regexp_extract_all(text, '[0-9]{9,}')) AS n_idnum,
               md5(regexp_replace(regexp_replace(regexp_replace(regexp_replace(text,
                 'https?://[^ \t\n\f\r]+', '<URL>', 'g'),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                 '[0-9]{9,}', '<NUM>', 'g')) AS redacted_fp
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      CorpusOps.scrubPii(Tables.documents(s, dir), "text")
        .select(col("doc_id"), col("n_url"), col("n_email"), col("n_ipv4"),
          col("n_idnum"), md5(col("text_redacted")).as("redacted_fp"))
        .orderBy("doc_id")
    },

    // ---- pre-tokenization text canonicalization (codegen'd Catalyst
    // kernel): NFC compose + Unicode lowercase + control-char strip, then
    // fingerprint the canonical form. The synthetic corpus is ASCII (the
    // kernel's fast path); the Unicode semantics are contracted in
    // NormalizeTextSpec with composed/decomposed and control-char cases.
    QueryDef(
      "q76_normalized_fingerprint",
      Some(raw"""
        WITH n AS (SELECT doc_id,
                     regexp_replace(lower(nfc_normalize(text)),
                       '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F-\x9F]', '', 'g') AS norm
                   FROM documents)
        SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_fp
        FROM n ORDER BY doc_id"""),
    ) { (s, dir) =>
      val norm = graft.functions.NormalizeText.normalizeText(col("text"))
      Tables.documents(s, dir)
        .select(col("doc_id"), norm.as("norm"))
        .select(col("doc_id"), length(col("norm")).as("norm_len"),
          md5(col("norm")).as("norm_fp"))
        .orderBy("doc_id")
    },

    // ---- compiled quality filter with audit trail: keep + the names of
    // the failed rules, all in one projection (same design as the §2.9
    // validator). Thresholds split this corpus 295 keep / 205 drop.
    QueryDef(
      "q72_quality_filter",
      Some(raw"""
        WITH s AS (SELECT doc_id,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                     len(list_distinct(string_split_regex(trim(text), '\s+')))
                       AS n_distinct
                   FROM documents),
        f AS (SELECT doc_id,
                n_tokens >= 30 AS ok_len_min,
                n_tokens <= 90 AS ok_len_max,
                1.0 - CAST(n_distinct AS DOUBLE) / n_tokens <= 0.65 AS ok_rep
              FROM s)
        SELECT doc_id, ok_len_min AND ok_len_max AND ok_rep AS keep,
               concat_ws(',',
                 CASE WHEN NOT ok_len_min THEN 'too_short' END,
                 CASE WHEN NOT ok_len_max THEN 'too_long' END,
                 CASE WHEN NOT ok_rep THEN 'repetitive' END) AS drop_reasons
        FROM f ORDER BY doc_id"""),
    ) { (s, dir) =>
      val toks = graft.core.Cols.wsTokens(col("text"))
      val stats = Tables.documents(s, dir)
        .select(col("doc_id"), size(toks).as("n_tokens"),
          size(array_distinct(toks)).as("n_distinct"))
      CorpusOps.qualityFilter(stats, Seq(
        "too_short" -> (col("n_tokens") >= 30),
        "too_long" -> (col("n_tokens") <= 90),
        "repetitive" ->
          (lit(1.0) - col("n_distinct").cast("double") / col("n_tokens") <= 0.65),
      ))
        .select("doc_id", "keep", "drop_reasons")
        .orderBy("doc_id")
    },

    // ---- Gopher quality-rule pack (Rae et al. 2021 Appendix A): the
    // canonical web-corpus document filter, integer-only (ratios by
    // cross-multiplication). Docs are PLANTED into multi-line pages
    // first (7-token lines; deterministic bullet '- ' / ellipsis ' ...'
    // decoration; a stop-word line every 3rd doc, a '#'-symbol line
    // every 11th) so every line- and symbol-rule is load-bearing on the
    // single-line synthetic corpus — the q223/q225/q231 planting
    // convention. The oracle replays planting AND every counter/flag.
    QueryDef(
      "q252_gopher_quality",
      Some(raw"""
        WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                   FROM documents),
        l AS (SELECT doc_id,
                list_transform(range(0, ((len(t) - 1) // 7) + 1), i ->
                  (CASE WHEN (doc_id + i) % 4 = 0 OR doc_id % 13 = 0
                        THEN '- ' ELSE '' END) ||
                  array_to_string(t[i*7+1:i*7+7], ' ') ||
                  (CASE WHEN (doc_id + i) % 5 = 0 THEN ' ...' ELSE '' END)) AS ls
              FROM d),
        p AS (SELECT doc_id,
                array_to_string(ls, chr(10)) ||
                (CASE WHEN doc_id % 3 = 0
                      THEN chr(10) || 'that have with the' ELSE '' END) ||
                (CASE WHEN doc_id % 11 = 0
                      THEN chr(10) || '# end # #' ELSE '' END) ||
                (CASE WHEN doc_id % 29 = 0
                      THEN chr(10) || repeat('a ', 19) || 'a' ELSE '' END) AS t2
              FROM l),
        c AS (SELECT doc_id,
                CAST(len(ws) AS BIGINT) AS n_words,
                CAST(len(lns) AS BIGINT) AS n_lines,
                CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT)
                  AS sum_word_len,
                CAST(len(regexp_extract_all(t2, '#')) +
                     len(regexp_extract_all(t2, '\.\.\.')) AS BIGINT)
                  AS n_symbols,
                CAST(len(list_filter(lns, x -> x LIKE '- %')) AS BIGINT)
                  AS n_bullet_lines,
                CAST(len(list_filter(lns, x -> x LIKE '%...')) AS BIGINT)
                  AS n_ellipsis_lines,
                CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]')))
                  AS BIGINT) AS n_alpha_words,
                CAST(len(list_intersect(list_distinct(ws),
                  ['the','be','to','of','and','that','have','with']))
                  AS BIGINT) AS n_stop_words
              FROM (SELECT doc_id, t2,
                      string_split_regex(trim(t2), '\s+') AS ws,
                      list_transform(string_split(t2, chr(10)),
                        x -> regexp_replace(x, '^\s+|\s+$$', '', 'g')) AS lns
                    FROM p)),
        f AS (SELECT *,
                CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
                     THEN 1 ELSE 0 END AS BIGINT) AS f_word_count,
                CAST(CASE WHEN 3*n_words <= sum_word_len
                           AND sum_word_len <= 10*n_words
                     THEN 1 ELSE 0 END AS BIGINT) AS f_mean_word_len,
                CAST(CASE WHEN 10*n_symbols <= n_words
                     THEN 1 ELSE 0 END AS BIGINT) AS f_symbol_ratio,
                CAST(CASE WHEN 10*n_bullet_lines <= 9*n_lines
                     THEN 1 ELSE 0 END AS BIGINT) AS f_bullet_lines,
                CAST(CASE WHEN 10*n_ellipsis_lines <= 3*n_lines
                     THEN 1 ELSE 0 END AS BIGINT) AS f_ellipsis_lines,
                CAST(CASE WHEN 5*n_alpha_words >= 4*n_words
                     THEN 1 ELSE 0 END AS BIGINT) AS f_alpha_words,
                CAST(CASE WHEN n_stop_words >= 2
                     THEN 1 ELSE 0 END AS BIGINT) AS f_stop_words
              FROM c)
        SELECT doc_id, n_words, n_lines, sum_word_len, n_symbols,
               n_bullet_lines, n_ellipsis_lines, n_alpha_words, n_stop_words,
               f_word_count, f_mean_word_len, f_symbol_ratio, f_bullet_lines,
               f_ellipsis_lines, f_alpha_words, f_stop_words,
               CAST(CASE WHEN f_word_count + f_mean_word_len + f_symbol_ratio
                              + f_bullet_lines + f_ellipsis_lines
                              + f_alpha_words + f_stop_words = 7
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM f ORDER BY doc_id"""),
    ) { (s, dir) =>
      val lines = transform(col("_lines"), (l, i) =>
        concat(
          when((col("doc_id") + i) % 4 === 0 || col("doc_id") % 13 === 0,
            lit("- ")).otherwise(lit("")),
          l,
          when((col("doc_id") + i) % 5 === 0, lit(" ...")).otherwise(lit(""))))
      val t2 = concat(array_join(lines, "\n"),
        when(col("doc_id") % 3 === 0, lit("\nthat have with the"))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0, lit("\n# end # #"))
          .otherwise(lit("")),
        when(col("doc_id") % 29 === 0, lit("\n" + Seq.fill(20)("a").mkString(" ")))
          .otherwise(lit("")))
      CorpusOps.gopherQuality(
          plantedLineDocs(s, dir).select(col("doc_id"), t2.as("t2")),
          "doc_id", "t2")
        .orderBy("doc_id")
    },

    // ---- Gopher REPETITION rule pack (Rae et al. 2021 Table A1): the
    // MassiveText within-doc repetition filter — duplicate line and
    // paragraph count/char fractions, top {2,3,4}-gram char mass, duplicate
    // {5..10}-gram coverage chars, duplicate-paragraph count+char
    // fractions — all 13 Table-A1 flags, integer-only. Engine side is
    // ENTIRELY row-local (sorted-gram HOFs, zero shuffles); the oracle
    // replays every counter relationally (per-n CTEs generated from one
    // loop). Pages planted as q252 lines plus a duplicated first line
    // every 4th doc so the duplicate rules are load-bearing.
    QueryDef(
      "q254_gopher_repetition",
      Some(gopherRepetitionOracle),
    ) { (s, dir) =>
      // paragraphs of up to 3 lines, blank-line separated — the
      // Table-A1 paragraph rules judge real paragraph structure; bound
      // to a column (the element_at accesses below must not re-evaluate
      // the construction per access)
      val base = plantedLineDocs(s, dir).withColumn("_paras",
        transform(expr("sequence(0, (size(_lines) - 1) div 3)"),
          j => array_join(slice(col("_lines"), j * lit(3) + 1, lit(3)), "\n")))
      val lines = col("_lines")
      val paras = col("_paras")
      val t2 = concat(array_join(paras, "\n\n"),
        // duplicate the first line THREE times every 4th doc: dup-line
        // AND dup-n-gram rules trip together (three copies make the
        // 14-token 'L1 L1' window occur twice, so even the 10-gram
        // duplicate rule is load-bearing)
        when(col("doc_id") % 4 === 0,
          concat(lit("\n"), element_at(lines, 1), lit("\n"),
            element_at(lines, 1), lit("\n"),
            element_at(lines, 1))).otherwise(lit("")),
        // a verbatim copy of the first paragraph every 6th doc: the
        // duplicate-paragraph rules trip
        when(col("doc_id") % 6 === 0,
          concat(lit("\n\n"), element_at(paras, 1))).otherwise(lit("")))
      CorpusOps.gopherRepetition(
          base.select(col("doc_id"), t2.as("t2")), "doc_id", "t2")
        .orderBy("doc_id")
    },

    // ---- C4 line-level cleaning (Raffel et al. 2020 §2.2): keep lines
    // with >= 5 words ending in terminal punctuation; drop pages with
    // '{', 'lorem ipsum', or < 3 kept lines. Planted pages add a '.'
    // terminator to ~2/3 of lines, a '{ }' code line every 17th doc and
    // a 'Lorem Ipsum dolor sit' line every 23rd — every rule
    // load-bearing. Cleaned text hash-checked end to end.
    QueryDef(
      "q253_c4_line_filter",
      Some(raw"""
        WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                   FROM documents),
        l AS (SELECT doc_id,
                list_transform(range(0, ((len(t) - 1) // 7) + 1), i ->
                  array_to_string(t[i*7+1:i*7+7], ' ') ||
                  (CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)) AS ls
              FROM d),
        p AS (SELECT doc_id,
                array_to_string(ls, chr(10)) ||
                (CASE WHEN doc_id % 17 = 0
                      THEN chr(10) || 'if (x) { return y; }' ELSE '' END) ||
                (CASE WHEN doc_id % 23 = 0
                      THEN chr(10) || 'Lorem Ipsum dolor sit.' ELSE '' END) AS t2
              FROM l),
        k AS (SELECT doc_id, t2, lns,
                list_filter(lns, x ->
                  len(string_split_regex(trim(x), '\s+')) >= 5 AND
                  (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR
                   x LIKE '%"')) AS kept
              FROM (SELECT doc_id, t2,
                      list_transform(string_split(t2, chr(10)),
                        x -> regexp_replace(x, '^\s+|\s+$$', '', 'g')) AS lns
                    FROM p))
        SELECT doc_id, CAST(len(lns) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               CAST(CASE WHEN contains(t2, '{')
                           OR contains(lower(t2), 'lorem ipsum')
                           OR len(kept) < 3
                    THEN 1 ELSE 0 END AS BIGINT) AS doc_dropped,
               array_to_string(kept, chr(10)) AS cleaned_text
        FROM k ORDER BY doc_id"""),
    ) { (s, dir) =>
      val lines = transform(col("_lines"), (l, i) =>
        concat(l,
          when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit(""))))
      val t2 = concat(array_join(lines, "\n"),
        when(col("doc_id") % 17 === 0, lit("\nif (x) { return y; }"))
          .otherwise(lit("")),
        when(col("doc_id") % 23 === 0, lit("\nLorem Ipsum dolor sit."))
          .otherwise(lit("")))
      CorpusOps.c4LineFilter(
          plantedLineDocs(s, dir).select(col("doc_id"), t2.as("t2")),
          "doc_id", "t2")
        .orderBy("doc_id")
    },

    // ---- the COMPLETE C4 §2.2 page-cleaning pack (VERDICT r15 task 4;
    // q253 remains the documented line-rule subset): javascript line
    // rule, bad-word page filter (versioned BadWords list, token
    // equality — the oracle's IN-list interpolates from the SAME Scala
    // set), and the >= 3 rule counting SENTENCES of the retained text
    // ([.!?]-delimited segments with content), not kept lines. Plants:
    // '"'-terminated lines every 11th doc (kept lines but ZERO
    // sentences — only the sentence rule drops them), a 7-word
    // '.'-terminated javascript line every 13th (only the javascript
    // rule excludes it), a '{' line every 17th, a bad-word line every
    // 19th (only the bad-word rule drops the page), lorem ipsum every
    // 23rd — every new rule load-bearing, full counter/flag replay.
    QueryDef(
      "q257_c4_page_clean",
      Some(raw"""
        WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                   FROM documents),
        l AS (SELECT doc_id,
                list_transform(range(0, ((len(t) - 1) // 7) + 1), i ->
                  array_to_string(t[i*7+1:i*7+7], ' ') ||
                  (CASE WHEN (doc_id + i) % 3 <> 0
                        THEN (CASE WHEN doc_id % 11 = 0 THEN '"'
                                   ELSE '.' END)
                        ELSE '' END)) AS ls
              FROM d),
        p AS (SELECT doc_id,
                array_to_string(ls, chr(10)) ||
                (CASE WHEN doc_id % 13 = 0 THEN chr(10) ||
                  'you must enable javascript to continue reading.'
                  ELSE '' END) ||
                (CASE WHEN doc_id % 17 = 0
                      THEN chr(10) || 'if (x) { return y; }' ELSE '' END) ||
                (CASE WHEN doc_id % 19 = 0 THEN chr(10) ||
                  'hot xxx content awaits you here tonight.' ELSE '' END) ||
                (CASE WHEN doc_id % 23 = 0
                      THEN chr(10) || 'Lorem Ipsum dolor sit.' ELSE '' END)
                  AS t2
              FROM l),
        k AS (SELECT doc_id, t2,
                list_filter(lns, x ->
                  len(string_split_regex(trim(x), '\s+')) >= 5 AND
                  (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR
                   x LIKE '%"') AND
                  NOT list_contains(
                    string_split_regex(lower(x), '[^a-z0-9]+'),
                    'javascript')) AS kept,
                lns
              FROM (SELECT doc_id, t2,
                      list_transform(string_split(t2, chr(10)),
                        x -> regexp_replace(x, '^\s+|\s+$$', '', 'g')) AS lns
                    FROM p)),
        f AS (SELECT doc_id, t2, lns, kept,
                array_to_string(kept, chr(10)) AS cleaned,
                len(list_filter(
                  string_split_regex(array_to_string(kept, chr(10)),
                    '[.!?]+'),
                  x -> regexp_matches(x, '[a-zA-Z0-9]'))) AS nsent
              FROM k)
        SELECT doc_id,
               CAST(len(lns) AS BIGINT) AS n_lines,
               CAST(len(kept) AS BIGINT) AS n_kept_lines,
               CAST(nsent AS BIGINT) AS n_sentences,
               CAST(CASE WHEN contains(t2, '{') THEN 1 ELSE 0 END
                 AS BIGINT) AS f_brace,
               CAST(CASE WHEN contains(lower(t2), 'lorem ipsum')
                 THEN 1 ELSE 0 END AS BIGINT) AS f_lorem,
               CAST(CASE WHEN ${CorpusOps.badWordHitSql("t2")}
                 THEN 1 ELSE 0 END AS BIGINT) AS f_badword,
               CAST(CASE WHEN contains(t2, '{')
                           OR contains(lower(t2), 'lorem ipsum')
                           OR ${CorpusOps.badWordHitSql("t2")}
                           OR nsent < 3
                    THEN 1 ELSE 0 END AS BIGINT) AS doc_dropped,
               cleaned AS cleaned_text
        FROM f ORDER BY doc_id"""),
    ) { (s, dir) =>
      val term = when(col("doc_id") % 11 === 0, lit("\"")).otherwise(lit("."))
      val lines = transform(col("_lines"), (l, i) =>
        concat(l,
          when((col("doc_id") + i) % 3 =!= 0, term).otherwise(lit(""))))
      val t2 = concat(array_join(lines, "\n"),
        when(col("doc_id") % 13 === 0,
          lit("\nyou must enable javascript to continue reading."))
          .otherwise(lit("")),
        when(col("doc_id") % 17 === 0, lit("\nif (x) { return y; }"))
          .otherwise(lit("")),
        when(col("doc_id") % 19 === 0,
          lit("\nhot xxx content awaits you here tonight."))
          .otherwise(lit("")),
        when(col("doc_id") % 23 === 0, lit("\nLorem Ipsum dolor sit."))
          .otherwise(lit("")))
      CorpusOps.c4PageClean(
          plantedLineDocs(s, dir).select(col("doc_id"), t2.as("t2")),
          "doc_id", "t2")
        .orderBy("doc_id")
    },

    // ---- vocabulary drift between two corpus slices: top shared terms
    // by per-term KL contribution |p_a·ln(p_a/p_b)| — the distribution-
    // shift monitor for a training mixture. Contributions rounded (ln's
    // last ulp is engine-specific) and -0.0-normalized; ranking on the
    // rounded value with term tie-break so both engines cut identically.
    QueryDef(
      "q86_vocab_drift",
      Some(CorpusOps.vocabDriftOracleSql(
        aPred = "doc_id % 5 != 0", bPred = "doc_id % 5 = 0", topN = 20)),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      CorpusOps.vocabDrift(
        a = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
        b = docs.filter(pmod(col("doc_id"), lit(5)) === 0),
        textCol = "text", topN = 20)
        .orderBy("term")
    },

    // ---- incremental decontamination vs the PERSISTED eval-gram index
    // (the decontam member of the per-ingest index family, like q79/q80):
    // eval grams are computed once at index build — this query builds the
    // index then probes a fresh ingest batch against it, one linear pass
    // over the BATCH only. Index stores 8-byte hashed grams (the scale
    // path); the oracle counts the string grams — identical up to 2^-64
    // collisions, which the batch-equivalence contracts in CorpusOpsSpec
    // pin down on both representations.
    QueryDef(
      "q90_incremental_decontam",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 2),
                     i -> array_to_string(t[i:i+3], ' '))) AS gram
              FROM toks WHERE len(t) >= 4),
        e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared_grams
        FROM g JOIN e USING (gram)
        WHERE g.doc_id % 5 = 0 AND g.doc_id % 50 <> 0
        GROUP BY g.doc_id ORDER BY g.doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val evalSet = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0 &&
        pmod(col("doc_id"), lit(50)) =!= 0)
      val idxDir = java.nio.file.Files.createTempDirectory("graft-evalgrams").toString
      CorpusOps.writeEvalGramIndex(evalSet, "text", n = 4, idxDir)
      CorpusOps.incrementalContamination(batch, "doc_id", "text", idxDir)
        .orderBy("doc_id")
    },

    // ---- token-budget mixture: greedy per-source fill in seeded-hash
    // order until each source's byte budget is reached — the exact-budget
    // sibling of q71's rate sampling (every "X tokens of web, Y of code"
    // mixture spec). Broadcast budget join + ONE per-source window
    // (packSequences' per-shard shape); integer-only, hash-checked
    // through the DuckXxh XXH64 chain.
    QueryDef(
      "q91_token_budget_mixture",
      Some(DuckXxh.budgetSampleOracle(base = 1000L, step = 200L)),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val budgets = docs.select("source").distinct()
        .withColumn("budget",
          lit(1000L) + lit(200L) * substring(col("source"), 4, 10).cast("long"))
      CorpusOps.budgetSample(docs, "doc_id", "source", "n_chars", budgets)
        .orderBy("doc_id")
    },

    // ---- CCNet-style LM quality scoring: average add-alpha bigram
    // log-probability under a model counted from a reference slice (the
    // "Wikipedia-perplexity filter" of the published corpus pipelines,
    // with the KenLM role played by an in-engine bigram model). Two
    // count-table joins + one per-doc aggregate; per-bigram ln rounded,
    // per-doc sum decimal-exact (Det), so the float compare is bit-exact.
    QueryDef(
      "q92_lm_quality_score",
      Some(graft.ops.LmScore.bigramScoreOracleSql(
        refPred = "doc_id % 7 = 0", docPred = "doc_id % 7 <> 0")),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.ops.LmScore.bigramScore(
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(7)) === 0),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- interpolated Kneser-Ney bigram scoring (the smoothing KenLM
    // ships): absolute discount D=0.75 + continuation-probability
    // backoff from fwd/rev distinct-type counts — same count-table-join
    // shape and determinism scheme (6dp ln, Det per-doc sums) as q92,
    // four broadcastable model tables instead of two.
    QueryDef(
      "q141_kn_lm_score",
      Some(graft.ops.LmScore.knBigramScoreOracleSql(
        refPred = "doc_id % 7 = 0", docPred = "doc_id % 7 <> 0")),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.ops.LmScore.knBigramScore(
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(7)) === 0),
        "doc_id", "text")
        .orderBy("doc_id")
    },

    // ---- BPE vocabulary induction + per-doc compression: train 20 merge
    // rules over the corpus's pre-token frequency table (the one raw-text
    // pass; every round is an aggregation over the small weighted
    // vocabulary), then measure each doc's token count under the trained
    // segmentation. NO SQL oracle — iterative argmax is not expressible
    // as one DuckDB query; correctness is the BpeSpec contract: EXACT
    // merge-sequence equality with an independent in-memory reference
    // implementation over the real corpus.
    QueryDef("q93_bpe_compression", None) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val freqs = graft.ops.Bpe.wordFreqs(docs, "text")
      freqs.persist()
      val rules = graft.ops.Bpe.trainBpeOnFreqs(freqs, nMerges = 20)
      val out = graft.ops.Bpe.tokenCompression(docs, "text", "doc_id", freqs, rules)
        .orderBy("doc_id")
      out.persist().count() // materialize before releasing the freqs cache
      freqs.unpersist(false)
      out
    },

    // ---- temperature-based source mixture (α = 0.5): keep-rates are
    // COMPUTED from per-source counts — r_s ∝ sqrt(n_s)/n_s scaled to a
    // 35% target — then applied through the same seeded integer
    // threshold as q71. sqrt is the one power IEEE requires correctly
    // rounded, ŝ is held as an exact 6dp decimal, and S sums in decimal
    // (order-free), so counts → rates → per-row keep decisions are
    // bit-identical across engines.
    QueryDef(
      "q100_temperature_mixture",
      Some("""
        WITH nn AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
        tot AS (SELECT CAST(sum(CAST(round(sqrt(n), 6) AS DECIMAL(38,6))) AS DOUBLE) AS s_sum,
                       CAST(sum(n) AS DOUBLE) AS n_tot FROM nn),
        r AS (SELECT source,
                least(CAST(1 AS DOUBLE),
                  ((CAST(0.35 AS DOUBLE) * n_tot) *
                     CAST(CAST(round(sqrt(n), 6) AS DECIMAL(38,6)) AS DOUBLE))
                    / (CAST(n AS DOUBLE) * s_sum)) AS rate
              FROM nn CROSS JOIN tot)
        SELECT d.doc_id, d.source FROM documents d JOIN r ON d.source = r.source
        WHERE ((d.doc_id % 100000007 + 42) * 2654435761) % 4294967296 <
              CAST(floor(rate * 4294967296) AS BIGINT)
        ORDER BY d.doc_id"""),
    ) { (s, dir) =>
      CorpusOps.temperatureSample(Tables.documents(s, dir), "doc_id", "source",
        targetFraction = 0.35, seed = 42L)
        .select("doc_id", "source")
        .orderBy("doc_id")
    },

    // ---- DSIR-style hashed n-gram importance weighting: score every doc
    // by how target-like (target = English docs) its unigram+bigram
    // hashed-bucket profile is. Hash-checked end-to-end: the oracle
    // re-runs gram extraction, the XXH64 bucket hash, the Laplace bucket
    // counts, and the integer-exact ratio score in pure DuckDB SQL.
    QueryDef(
      "q102_importance_weights",
      Some(DuckXxh.importanceWeightsOracle(numBuckets = 4096)),
    ) { (s, dir) =>
      CorpusOps.importanceWeights(Tables.documents(s, dir), "text", "doc_id",
          isTarget = col("lang") === "en", numBuckets = 4096)
        .orderBy("doc_id")
    },

    // ---- importance RESAMPLING: the top-25% most target-like raw
    // (non-English) docs under the q102 scores, deterministic total order
    // (score desc, doc_id) — the data-selection step DSIR feeds training
    // with. TakeOrderedAndProject, not a global sort.
    QueryDef(
      "q103_importance_selection",
      Some(DuckXxh.importanceSelectOracle(numBuckets = 4096, fraction = 0.25)),
    ) { (s, dir) =>
      val w = CorpusOps.importanceWeights(Tables.documents(s, dir), "text",
        "doc_id", isTarget = col("lang") === "en", numBuckets = 4096)
      CorpusOps.importanceSelect(w, "doc_id", fraction = 0.25)
        .select("doc_id", "score").orderBy("doc_id")
    },

    // ---- INDEXED importance scoring: the per-ingest shape of q102 —
    // bucket counts come from a persisted two-segment index over the
    // prior corpus (doc_id % 3 != 0); the new batch (%3 == 0) scores
    // against the summed index with one broadcast join, never touching
    // corpus text. Hash-checked end to end incl. the unseen-bucket
    // zero+smoothing rule.
    QueryDef(
      "q115_importance_indexed",
      Some(DuckXxh.importanceIndexedOracle(numBuckets = 4096,
        targetPred = "lang = 'en'", oldPred = "doc_id % 3 <> 0")),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val fresh = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      val ixDir = java.nio.file.Files.createTempDirectory("graft-imp115").toString
      Seq(0, 1).foreach { half =>
        CorpusOps.appendImportanceSegment(
          old.filter(pmod(col("doc_id"), lit(2)) === half),
          "text", isTarget = col("lang") === "en", ixDir, s"b$half")
      }
      CorpusOps.importanceWeightsIndexed(fresh, "text", "doc_id",
          CorpusOps.readImportanceIndex(s, ixDir))
        .orderBy("doc_id")
    },

    // ---- per-source data card: the release-notes aggregate every corpus
    // ships — doc/lang/token/char volumes and the exact-dup count per
    // source, one hash aggregation over doc-local exprs.
    QueryDef(
      "q122_source_data_card",
      Some(raw"""
        WITH d AS (SELECT source, lang, n_chars,
                     len(string_split_regex(trim(text), '\s+')) AS n_tokens,
                     md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                   FROM documents)
        SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT lang) AS n_langs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               COUNT(*) - COUNT(DISTINCT fp) AS n_exact_dups
        FROM d GROUP BY source ORDER BY source"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          size(graft.core.Cols.wsTokens(col("text"))).as("n_tokens"),
          graft.ops.TextDedup.fingerprint(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          (count(lit(1)) - countDistinct(col("fp"))).as("n_exact_dups"))
        .orderBy("source")
    },

    // ---- hashing-trick vectorizer: sparse (doc, bucket, tf) over
    // pmod(xxhash64(token), 64) — the model-free text→vector bridge the
    // VectorSim family consumes after densifyHashedTf. Hash-checked
    // through the full XXH64 chain.
    QueryDef(
      "q117_hashed_tf",
      Some(DuckXxh.hashedTfOracle(dim = 64)),
    ) { (s, dir) =>
      CorpusOps.hashedTf(Tables.documents(s, dir), "text", "doc_id", dim = 64)
        .orderBy("doc_id", "bucket")
    },

    // ---- RAG chunking: overlapping 200-char windows, 50-char overlap,
    // offsets ride along so retrieval spans map back to source docs.
    QueryDef(
      "q116_doc_chunks",
      Some("""
        WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        k AS (SELECT doc_id, text,
                CASE WHEN len <= 200 THEN 0
                     ELSE CAST(floor((len - 200 + 150 - 1) / 150.0) AS BIGINT) END AS kmax
              FROM d),
        c AS (SELECT doc_id, text, unnest(range(0, kmax + 1)) AS ck FROM k)
        SELECT doc_id, ck AS chunk_idx, ck * 150 + 1 AS chunk_start,
               substr(text, CAST(ck * 150 + 1 AS INT), 200) AS chunk_text,
               CAST(length(substr(text, CAST(ck * 150 + 1 AS INT), 200)) AS BIGINT)
                 AS chunk_len
        FROM c ORDER BY doc_id, chunk_idx"""),
    ) { (s, dir) =>
      CorpusOps.chunkDocs(Tables.documents(s, dir), "text", "doc_id",
          chunkLen = 200, overlap = 50)
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- corpus-wide chunk-level exact dedup (the C4/RefinedWeb
    // boilerplate scrub): 100-char non-overlapping chunks, each distinct
    // chunk survives only at its FIRST (doc_id, chunk_idx) occurrence,
    // docs reassembled from survivors. Sits between q37 (whole-doc
    // dedup) and q125 (within-doc spans) in the dedup ladder; exact-dup
    // docs collapse to empty cleaned text while unique docs reassemble
    // bit-identically. Integer/string-only — no float surface.
    QueryDef(
      "q206_chunk_dedup",
      Some("""
        WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
        k AS (SELECT doc_id, text,
                CASE WHEN len <= 100 THEN 0
                     ELSE CAST(floor((len - 100 + 100 - 1) / 100.0) AS BIGINT) END AS kmax
              FROM d),
        c AS (SELECT doc_id, unnest(range(0, kmax + 1)) AS ck, text FROM k),
        ch AS (SELECT doc_id, ck,
                      substr(text, CAST(ck * 100 + 1 AS INT), 100) AS chunk_text,
                      doc_id * 1048576 + ck AS pos
               FROM c),
        f AS (SELECT chunk_text, min(pos) AS first_pos FROM ch GROUP BY chunk_text)
        SELECT doc_id,
               count(*) AS n_chunks,
               CAST(SUM(CASE WHEN pos = first_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               COALESCE(string_agg(CASE WHEN pos = first_pos THEN ch.chunk_text END,
                                   '' ORDER BY ck), '') AS cleaned_text
        FROM ch JOIN f ON ch.chunk_text = f.chunk_text
        GROUP BY doc_id ORDER BY doc_id"""),
    ) { (s, dir) =>
      CorpusOps.chunkDedup(Tables.documents(s, dir), "text", "doc_id",
          chunkLen = 100)
        .orderBy("doc_id")
    },

    // ---- novel n-gram rate: per new doc (id % 10 <> 0), the fraction of
    // its distinct 4-grams absent from the reference slice (id % 10 = 0)
    // — the memorization/novelty diagnostic, integer-exact ppm.
    QueryDef(
      "q129_novel_gram_rate",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        g AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+3], ' ') AS gram
              FROM (SELECT doc_id, t, unnest(range(1, len(t) - 2)) AS i
                    FROM toks WHERE len(t) >= 4)),
        ref AS (SELECT DISTINCT gram FROM g WHERE doc_id % 10 = 0),
        nw AS (SELECT g.doc_id, count(*) AS n_grams,
                      CAST(sum(CASE WHEN ref.gram IS NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_novel
               FROM g LEFT JOIN ref ON g.gram = ref.gram
               WHERE g.doc_id % 10 <> 0 GROUP BY g.doc_id)
        SELECT doc_id, n_grams, n_novel,
               CAST((1000000 * n_novel) // n_grams AS BIGINT) AS novel_ppm
        FROM nw ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      CorpusOps.novelGramRate(
          newDocs = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0),
          reference = docs.filter(pmod(col("doc_id"), lit(10)) === 0),
          idCol = "doc_id", textCol = "text", n = 4)
        .orderBy("doc_id")
    },

    // ---- bigram collocation mining: top-K adjacent token pairs by an
    // integer-exact PMI surrogate (1e6 * n_xy * B div (n_x * n_y), the
    // q115 div convention) — corpus phrase discovery. Deterministic
    // tie-break (score desc, then pair asc) makes the LIMIT hashable.
    QueryDef(
      "q127_collocations",
      Some(raw"""
        WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        uc AS (SELECT w, count(*) AS n_w
               FROM (SELECT unnest(toks) AS w FROM t) GROUP BY w),
        bc0 AS (SELECT bg, count(*) AS n_xy FROM
                  (SELECT unnest(list_transform(range(1, len(toks)), i ->
                     toks[i] || ' ' || toks[i+1])) AS bg
                   FROM t WHERE len(toks) >= 2)
                GROUP BY bg),
        bc AS (SELECT split_part(bg, ' ', 1) AS w1,
                      split_part(bg, ' ', 2) AS w2, n_xy FROM bc0),
        tot AS (SELECT sum(n_xy) AS bt FROM bc)
        SELECT w1, w2, n_xy, x.n_w AS n_x, y.n_w AS n_y,
               CAST((1000000 * n_xy * (SELECT bt FROM tot))
                    // (x.n_w * y.n_w) AS BIGINT) AS score_ppm
        FROM bc JOIN uc x ON x.w = bc.w1 JOIN uc y ON y.w = bc.w2
        WHERE n_xy >= 5
        ORDER BY score_ppm DESC, w1, w2 LIMIT 50"""),
    ) { (s, dir) =>
      CorpusOps.collocations(Tables.documents(s, dir), "text",
        minCount = 5L, topK = 50)
    },

    // ---- corpus TOKENIZATION: per-doc ordered token-id sequences under
    // the trained BPE segmentation — text to model-ready ids, the step
    // feeding sequence packing. NO SQL oracle for the same reason as q93
    // (the segmentation comes from the iterative trainer); correctness is
    // BpeSpec's exact reference-encoder equality + decode round-trip over
    // the real corpus. The registry projects the id array through
    // array_join so the driver's no-oracle fingerprint path can sort and
    // hash the frame (pandas cannot lexsort an array column); the typed
    // array<int> API stays on Bpe.encodeTokenIds.
    // ---- WordPiece induction + greedy-longest-match compression: the
    // likelihood-scored merge loop (count/(cl*cr)) and the order-free
    // greedy encoder — the BERT-family counterpart of q93. no_oracle
    // (iterative argmax training); WordPieceSpec pins exact equality
    // against an in-memory reference over the real sf0.001 corpus.
    QueryDef("q143_wordpiece_compression", None) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val freqs = graft.ops.Bpe.wordFreqs(docs, "text")
      freqs.persist()
      val rules = graft.ops.WordPiece.trainWordPieceOnFreqs(freqs, nMerges = 20)
      val out = graft.ops.WordPiece
        .tokenCompression(docs, "text", "doc_id", freqs, rules)
        .orderBy("doc_id")
      out.persist().count() // materialize before releasing the freqs cache
      freqs.unpersist(false)
      out
    },

    // ---- Unigram-LM (SentencePiece) induction + Viterbi compression:
    // the third subword family — seed substrings, EM forward-backward
    // over row-local lattices, prune, max-probability encode. no_oracle
    // (iterative EM); UnigramLmSpec pins op-order-exact reference
    // equality for trainer AND encoder plus EM likelihood monotonicity.
    QueryDef("q145_unigram_compression", None) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val freqs = graft.ops.Bpe.wordFreqs(docs, "text")
      freqs.persist()
      val vocab = graft.ops.UnigramLm.trainUnigramOnFreqs(freqs,
        vocabSize = 400, seedSize = 800, emIters = 2)
      val out = graft.ops.UnigramLm
        .tokenCompression(docs, "text", "doc_id", vocab)
        .orderBy("doc_id")
      out.persist().count() // materialize before releasing the freqs cache
      freqs.unpersist(false)
      out
    },

    // ---- WEIGHTED sampling without replacement (Efraimidis–Spirakis),
    // 5 docs per source with probability ∝ n_chars: u from the q100
    // integer hash, key = round(ln(u),6)/w (the IEEE-safe spelling of
    // u^(1/w) ordering), per-source top-k. Hash-checked end to end —
    // both engines rank the identical keys.
    QueryDef(
      "q152_weighted_sample",
      Some("""
        WITH h AS (SELECT doc_id, source, n_chars,
                     ((doc_id % 100000007 + 42) * 2654435761) % 4294967296 AS hv
                   FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
        k AS (SELECT doc_id, source, n_chars,
                round(ln((hv + 0.5) / 4294967296.0), 6) /
                  CAST(n_chars AS DOUBLE) AS wkey
              FROM h),
        r AS (SELECT doc_id, source, n_chars,
                row_number() OVER (PARTITION BY source
                  ORDER BY wkey DESC, doc_id) AS rn
              FROM k)
        SELECT doc_id, source, n_chars FROM r WHERE rn <= 5
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      graft.ops.Sampling.weightedSampleExact(
        Tables.documents(s, dir), "doc_id", "n_chars",
        k = 5, seed = 42L, strataCol = Some("source"))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ---- multinomial Naive Bayes classifier: train add-one-smoothed
    // token-count models on the 80% slice (doc_id % 5 <> 0), score the
    // held-out 20% and keep the argmax class — the quality/language
    // classifier slot of published LLM pipelines, fully oracle-checked
    // (rounded ln + decimal-exact sums make the argmax bit-stable).
    QueryDef(
      "q149_nb_lang_classifier",
      Some(graft.ops.NaiveBayes.oracleSql(
        "doc_id % 5 <> 0", "doc_id % 5 = 0")),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      graft.ops.NaiveBayes.trainScore(
        docs.filter(col("doc_id") % 5 =!= 0),
        docs.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", "lang")
    },

    // ---- distributed word-embedding training (spark.ml Word2Vec,
    // skip-gram): the producer of the engine's embedding surface. Output
    // = top-3 vocabulary neighbors of the corpus' 10 most frequent
    // tokens. no_oracle (stochastic-by-parallelism, like every hogwild
    // embedding trainer); EmbeddingsSpec pins planted co-occurrence →
    // cosine-proximity structure and output shape.
    QueryDef("q159_word2vec_synonyms", None) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val top = docs
        .select(explode(graft.core.Cols.wsTokens(col("text"))).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(desc("c"), asc("tok")).limit(10)
        .collect().map(_.getString(0)).toSeq // 10 strings — stat-broadcast class
      val model = graft.ml.Embeddings.word2vec(docs, "text",
        vectorSize = 16, minCount = 2, maxIter = 1)
      graft.ml.Embeddings.topSynonyms(model, top, k = 3)
        .orderBy("token", "rank")
    },

    // ---- compression-ratio quality signal (Gopher-style): DEFLATE
    // size / raw size per document, row-local custom expression
    // (functions/DeflateSize) — boilerplate and machine-generated text
    // compress far below natural prose. no_oracle (zlib bit streams are
    // engine-build-specific); FunctionsSpec pins JVM-reference equality,
    // repetition monotonicity, and codegen agreement.
    QueryDef("q158_compressibility", None) { (s, dir) =>
      import graft.functions.DeflateSize.deflateSize
      Tables.documents(s, dir)
        .select(col("doc_id"), octet_length(col("text")).as("n_bytes"),
          deflateSize(col("text")).as("z_bytes"))
        .withColumn("ratio",
          when(col("n_bytes") > 0,
            round(col("z_bytes").cast("double") / col("n_bytes"), 6)))
        .withColumn("compressible", col("ratio") < 0.4)
        .orderBy("doc_id")
    },

    QueryDef("q104_bpe_token_ids", None) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val freqs = graft.ops.Bpe.wordFreqs(docs, "text")
      freqs.persist()
      val rules = graft.ops.Bpe.trainBpeOnFreqs(freqs, nMerges = 20)
      val out = graft.ops.Bpe.encodeTokenIds(docs, "text", "doc_id", freqs, rules)
        .select(col("doc_id"), col("n_tokens"),
          array_join(col("token_ids"), ",").as("token_ids_csv"))
        .orderBy("doc_id")
      out.persist().count() // materialize before releasing the freqs cache
      freqs.unpersist(false)
      out
    },

    // ---- HTML→text extraction (web-corpus stage 0): each document is
    // wrapped in a realistic page — head with title/style/script, a nav
    // link list, the body paragraph (entity-ESCAPED), a link-only footer
    // — and the html_to_text kernel must recover EXACTLY the original
    // text (whitespace-collapsed): boilerplate gone, content intact.
    // The oracle is independent — it never sees the HTML: it collapses
    // the raw text directly, so any extraction slip (a surviving nav
    // token, a broken entity, a dropped body block) hash-mismatches.
    QueryDef(
      "q222_html_text_extract",
      // explicit whitespace class, not RE2 '\s': the kernel's isWs
      // matches Java \s INCLUDING vertical tab \x0B, which RE2's \s
      // excludes — a document containing \x0B would hash-mismatch
      // (ADVICE r12, low; the q223/q225 RE2-identical-subset discipline)
      Some(raw"""
        SELECT doc_id,
               trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text_out
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      val esc = (c: org.apache.spark.sql.Column) =>
        regexp_replace(regexp_replace(regexp_replace(c,
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
      val html = concat(
        lit("""<html><head><title>Doc</title><meta charset="utf-8">""" +
          """<style>body{color:#000}</style>""" +
          """<script>if(1<2){var x="</div>";}</script></head><body>""" +
          """<nav><ul><li><a href="/">Home</a></li>""" +
          """<li><a href="/about">About us</a></li></ul></nav>""" +
          """<!-- boilerplate ends --><div class="content"><p>"""),
        esc(col("text")),
        lit("""</p></div><footer><a href="/tos">Terms</a> """ +
          """<a href="/privacy">Privacy</a></footer></body></html>"""))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.functions.HtmlExtract.htmlToText(html).as("text_out"))
        .orderBy("doc_id")
    },

    // ---- WARC container ingest → HTML → text (stage -1 + stage 0 of
    // the web-corpus funnel end-to-end, VERDICT r12 task 4): each batch
    // of 20 documents is packed into a REAL multi-record WARC container
    // — warcinfo preamble, one HTTP/1.1 response record per page
    // (Content-Length framed, CRLF separators, charset=utf-8), and a
    // PLANTED truncated record at the tail — then the row-local
    // container walk (ingest/WarcIngest) re-extracts the pages, the
    // non-HTTP and truncated records quarantine without touching the
    // output, and the html_to_text kernel recovers the original text.
    // The oracle never sees the WARC bytes OR the HTML: it collapses
    // the raw text and reconstructs the URL from doc_id, so any framing
    // slip (an off-by-one Content-Length, a body cut at the wrong CRLF,
    // a charset mangle) hash-mismatches. Scale shape: container build
    // is one 20-row-group shuffle (test scaffolding — production reads
    // containers straight off object storage), the walk is row-local
    // mapPartitions, the kernel is codegen — nothing corpus-quadratic.
    QueryDef(
      "q232_warc_ingest",
      Some(raw"""
        SELECT doc_id,
               'https://corpus.test/doc/' || doc_id AS url,
               trim(regexp_replace(text, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text_out
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      import graft.ingest.WarcIngest
      val esc = (c: org.apache.spark.sql.Column) =>
        regexp_replace(regexp_replace(regexp_replace(c,
          lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
      val html = concat(
        lit("""<html><head><title>Doc</title><style>p{x:1}</style>""" +
          """<script>if(1<2){var z="</p>";}</script></head><body>""" +
          """<nav><a href="/">Home</a> <a href="/a">About</a></nav><p>"""),
        esc(col("text")),
        lit("""</p><footer><a href="/t">Terms</a> <a href="/p">Priv</a>""" +
          """</footer></body></html>"""))
      val pages = Tables.documents(s, dir)
        .select((col("doc_id") - pmod(col("doc_id"), lit(20L))).as("cid"),
          col("doc_id"), html.as("html"))
      // planted truncated tail: framed length far past EOF — the walk
      // must quarantine it, never throw or emit a page
      val containers = WarcIngest.packContainers(pages,
        "2024-01-01T00:00:00Z", id => s"https://corpus.test/doc/$id",
        plantTruncatedTail = true)
      val recs = WarcIngest.readWarc(containers, "cid", "warc")
      WarcIngest.htmlResponses(recs)
        .select(
          regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("url"),
          graft.functions.HtmlExtract.htmlToText(col("html")).as("text_out"))
        .orderBy("doc_id")
    },

    // ---- WET container round-trip (q232's conversion-record sibling):
    // a WET record's payload IS the extracted text, so the contract is
    // byte-exactness — pack each doc's RAW text into a Content-Length-
    // framed conversion record (UTF-8 bytes; framing is length-based, so
    // embedded CRLFs or multi-byte runs in the text cannot break record
    // boundaries), walk the container, and emit the decoded text
    // UNTOUCHED. The oracle selects the raw text directly: any framing
    // off-by-one, charset mangle, or replacement-char leak mismatches
    // the hash on that exact document.
    QueryDef(
      "q234_wet_ingest",
      Some("""
        SELECT doc_id,
               'https://corpus.test/doc/' || doc_id AS url,
               text AS text_out
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      import graft.ingest.WarcIngest
      val pages = Tables.documents(s, dir)
        .select((col("doc_id") - pmod(col("doc_id"), lit(25L))).as("cid"),
          col("doc_id"), col("text"))
      val containers = WarcIngest.packContainers(pages,
        "2024-01-01T00:00:00Z", id => s"https://corpus.test/doc/$id",
        conversion = true)
      WarcIngest.readWarc(containers, "cid", "warc")
        .filter(col("reason").isNull && col("warc_type") === "conversion")
        .select(
          regexp_extract(col("url"), "/doc/([0-9]+)$", 1).cast("long").as("doc_id"),
          col("url"), col("body_text").as("text_out"))
        .orderBy("doc_id")
    },

    // ---- CCNet-style perplexity buckets (Wenzek et al. 2020): per-
    // LANGUAGE head/middle/tail terciles of the q92 LM quality score —
    // CCNet buckets each language's documents by LM perplexity and
    // trains on the head. Bucketing rides the NEW skew-free mechanism
    // [[StatQueries.groupedRank]]: a per-language window would funnel
    // the dominant language (English is most of a web corpus) through
    // ONE task at 100 TB; there, slices come from the GLOBAL score
    // order, so the hot language spreads over every slice and only the
    // tiny (slice × lang) offset table is broadcast. The score is
    // 6dp-rounded on both engines (q92's determinism scheme) and ties
    // break on doc_id, so the order — and every tercile boundary — is
    // bit-identical.
    QueryDef(
      "q245_ccnet_buckets",
      Some(s"""
        WITH sc AS (SELECT doc_id, avg_logprob FROM
                      (${graft.ops.LmScore.bigramScoreOracleSql(
        refPred = "doc_id % 7 = 0", docPred = "doc_id % 7 <> 0")}) q92),
        j AS (SELECT sc.doc_id, d.lang, sc.avg_logprob
              FROM sc JOIN documents d USING (doc_id)),
        b AS (SELECT doc_id, lang, avg_logprob,
                     NTILE(3) OVER (PARTITION BY lang
                                    ORDER BY avg_logprob DESC, doc_id) AS bucket
              FROM j)
        SELECT doc_id, lang, avg_logprob, bucket,
               CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                           ELSE 'tail' END AS bucket_name
        FROM b ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val scored = graft.ops.LmScore.bigramScore(
        docs.filter(pmod(col("doc_id"), lit(7)) =!= 0),
        docs.filter(pmod(col("doc_id"), lit(7)) === 0),
        "doc_id", "text")
        .select("doc_id", "avg_logprob")
      val j = scored.join(docs.select("doc_id", "lang"), "doc_id")
      val ranked = StatQueries.groupedRank(j, Seq("lang"),
        Seq(col("avg_logprob").desc, col("doc_id")), -col("avg_logprob"))
      val bucket = StatQueries.ntileFromRank(col("grn"), col("gn"), 3)
      ranked.select(col("doc_id"), col("lang"), col("avg_logprob"),
          bucket.cast("long").as("bucket"),
          when(bucket === 1, "head").when(bucket === 2, "middle")
            .otherwise("tail").as("bucket_name"))
        .orderBy("doc_id")
    },

    // ---- cross-source n-gram overlap matrix (the FineWeb/Dolma-style
    // between-slice contamination report): for every source pair, the
    // count of shared distinct word 4-grams and the Jaccard overlap.
    // Gram-blocked equi-join — per-gram fan-out is C(s_g, 2) where
    // s_g <= |sources| is how many sources contain that gram, so join
    // cost is bounded by source cardinality, never corpus size; the
    // complete pair matrix materializes from the tiny per-source totals
    // (|sources|² rows). Grams ride as strings so the oracle needs no
    // hash replay; a production corpus hashes them first (xxhash64, the
    // q236 chain) to shrink shuffle keys — identical plan shape.
    QueryDef(
      "q246_source_overlap",
      Some(overlapMatrixOracleSql),
    ) { (s, dir) =>
      import graft.analytics.StatQueries.PerfCacheOps
      // cached: three consumers (totals + both sides of the pair join)
      val g = CorpusOps.sourceGrams(Tables.documents(s, dir),
        "source", "text", 4).perfCache()
      CorpusOps.overlapMatrix(g).orderBy("src_a", "src_b")
    },

    // ---- incremental overlap-matrix maintenance (q246's growing-corpus
    // sibling, the q79/q99 incremental-index pattern): the stored state
    // is the distinct (source, gram) index plus the prior matrix; an
    // ingest batch contributes only its genuinely-new pairs, which probe
    // the index gram-keyed — the old corpus never re-joins against
    // itself. The ORACLE is the whole point: it computes the full-corpus
    // batch matrix directly, so the incremental chain must reproduce the
    // from-scratch answer bit-for-bit (totals, shared counts, jaccard).
    QueryDef(
      "q247_incremental_source_overlap",
      Some(overlapMatrixOracleSql),
    ) { (s, dir) =>
      import graft.analytics.StatQueries.PerfCacheOps
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(3)) === 0)
      // stored state stand-ins (q79's in-query convention): the index
      // and the prior matrix a deployment would read off disk
      val index = CorpusOps.sourceGrams(old, "source", "text", 4).perfCache()
      val prior = CorpusOps.overlapMatrix(index)
      CorpusOps.incrementalOverlapMatrix(index, prior, batch,
          "source", "text", 4)
        .orderBy("src_a", "src_b")
    },
  )
}
