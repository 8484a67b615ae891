package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.{Det, Tables}

/** Text-analysis operators over the `documents` table (the training-data
  * pipeline surface: token counting, quality scoring, language stats,
  * fingerprinting, exact-dup detection, corpus word frequencies). All are
  * pure Catalyst expressions — no UDFs — so they stay in whole-stage
  * codegen and scale linearly with the corpus.
  */
object TextQueries {
  import Det.{davg, sqlAvg}

  /** Whitespace tokens of trimmed text (same regex both engines). */
  private val toks = split(trim(col("text")), "\\s+")

  private val stopwords = Seq("the", "a", "of", "to", "in", "and", "is")

  val defs: Seq[QueryDef] = Seq(
    // ---- token counting (whitespace tokenizer)
    QueryDef(
      "q30_token_counts",
      Some("""
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), size(toks).as("n_tokens"))
        .orderBy("doc_id")
    },

    // ---- quality scoring: length/avg-token/stopword-ratio heuristics
    QueryDef(
      "q31_doc_quality",
      Some(s"""
        SELECT doc_id, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               length(regexp_replace(text, '\\s', '', 'g')) AS n_nonspace,
               CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len,
               CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                      x -> list_contains(['the','a','of','to','in','and','is'], x)))
                    AS DOUBLE)
                 / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      val nTokens = size(toks)
      val nNonspace = length(regexp_replace(col("text"), "\\s", ""))
      val stopArr = array(stopwords.map(lit): _*)
      val nStop = size(filter(toks, x => array_contains(stopArr, x)))
      Tables.documents(s, dir).select(
        col("doc_id"), col("n_chars"),
        nTokens.as("n_tokens"),
        nNonspace.as("n_nonspace"),
        (nNonspace.cast("double") / nTokens).as("avg_token_len"),
        (nStop.cast("double") / nTokens).as("stopword_ratio"))
        .orderBy("doc_id")
    },

    // ---- language-ID distribution stats
    QueryDef(
      "q32_lang_stats",
      Some(s"""
        SELECT lang, COUNT(*) AS n_docs,
               ${sqlAvg("n_chars")} AS avg_chars,
               MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        FROM documents GROUP BY lang ORDER BY lang"""),
    ) { (s, dir) =>
      Tables.documents(s, dir).groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        davg(col("n_chars")).as("avg_chars"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars"))
        .orderBy("lang")
    },

    // ---- document fingerprinting: md5 over whitespace-normalized lowercase
    QueryDef(
      "q33_doc_fingerprint",
      Some("""
        SELECT doc_id,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      Tables.documents(s, dir).select(
        col("doc_id"),
        md5(lower(regexp_replace(trim(col("text")), "\\s+", " "))).as("fingerprint"))
        .orderBy("doc_id")
    },

    // ---- exact dedup stats over fingerprints (hash-groupBy dedup)
    QueryDef(
      "q34_exact_dup_stats",
      Some("""
        SELECT COUNT(*) AS n_docs,
               COUNT(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS n_unique,
               COUNT(*) - COUNT(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) AS n_dups
        FROM documents"""),
    ) { (s, dir) =>
      val fp = md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
      Tables.documents(s, dir).agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fp).as("n_unique"),
        (count(lit(1)) - countDistinct(fp)).as("n_dups"))
    },

    // ---- corpus word frequency: explode + count + top-k
    QueryDef(
      "q35_word_freq",
      Some("""
        SELECT tok, COUNT(*) AS freq FROM (
          SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
          FROM documents)
        GROUP BY tok ORDER BY freq DESC, tok LIMIT 20"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(toks).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("freq"))
        .orderBy(desc("freq"), asc("tok"))
        .limit(20)
    },
  )
}
