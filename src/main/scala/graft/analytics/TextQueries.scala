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
  private val toks = graft.core.Cols.wsTokens(col("text"))

  /** BPE-ish pre-tokenization: disjoint runs of letters / digits /
    * other-non-space. RE2- and Java-compatible: no lookarounds, and the
    * whitespace class is spelled out because Java's `\s` includes
    * vertical tab (U+000B) while RE2's does not — `\s` here would make
    * the Spark and DuckDB token counts diverge on such documents.
    */
  private val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\f\\r]+"

  /** Rolling char `k`-gram hashes of a text column; docs shorter than
    * `k` hash as one whole-text gram so they still participate in dedup.
    * Step 1 of winnowing — bind the result to a real column before
    * windowing with [[winnowFromGrams]], or the lambda in step 2 would
    * re-evaluate the whole gram array once per window position.
    */
  def charGramHashes(text: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column =
    when(length(text) < k, array(xxhash64(text)))
      .otherwise(transform(sequence(lit(1), length(text) - lit(k - 1)),
        i => xxhash64(text.substr(i, lit(k)))))

  /** Winnowing step 2 (Schleimer/Wilkerson/Aiken): the de-duplicated
    * minima of each sliding window of `w` gram hashes. Two docs sharing
    * a substring of >= w+k-1 chars are guaranteed to share a fingerprint.
    * O(n·w) built-in formulation — production (q63) runs the O(n)
    * monotonic-deque kernel [[graft.functions.WinnowMins]]; this form is
    * its bit-identity oracle in TextWinnowSpec (same convention as the
    * legacy LSH formulation in VectorSim).
    */
  def winnowFromGrams(grams: org.apache.spark.sql.Column,
      w: Int): org.apache.spark.sql.Column =
    when(size(grams) < w, array(array_min(grams)))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(grams) - lit(w - 1)),
        j => array_min(slice(grams, j, lit(w))))))

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

    // ---- BPE-style subword-ish token counting: letter runs, digit runs,
    // and punctuation runs are separate tokens, whitespace is not a token
    // (the pre-tokenization split every BPE vocabulary is trained over).
    // The alternatives are disjoint character classes, so Java-regex and
    // RE2 leftmost-greedy semantics agree match-for-match — oracle-safe.
    QueryDef(
      "q62_bpe_token_counts",
      Some(s"""
        SELECT doc_id,
               len(regexp_extract_all(text, '$bpeTokenPattern')) AS n_bpe_tokens,
               len(regexp_extract_all(text, '[0-9]+')) AS n_number_runs
        FROM documents ORDER BY doc_id"""),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit(bpeTokenPattern), lit(0)))
            .as("n_bpe_tokens"),
          size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
            .as("n_number_runs"))
        .orderBy("doc_id")
    },

    // ---- winnowing fingerprints (ref fingerprint surface is exact-dup
    // only; this is the rolling-hash document fingerprint of the
    // Schleimer/Wilkerson/Aiken winnowing scheme): hash every char
    // k-gram, keep the minimum of each sliding window of w hashes.
    // Guarantee: documents sharing a substring of >= w+k-1 chars share a
    // fingerprint (asserted in TextWinnowSpec). Pure Catalyst
    // (sequence/transform/slice/array_min) — codegen'd, linear per doc,
    // no shuffle until the final aggregate. Hash-checked: the oracle
    // re-runs gram hashing, window minima, first-occurrence dedup, and
    // the digest hash in pure DuckDB SQL (DuckXxh, two hash chains).
    QueryDef("q63_winnow_fingerprints",
      Some(DuckXxh.winnowFingerprintsOracle(k = 5, w = 8)),
    ) { (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), charGramHashes(col("text"), 5).as("_g"))
        .select(col("doc_id"),
          graft.functions.WinnowExprs.winnowMins(col("_g"), 8).as("fps"))
        .select(col("doc_id"), size(col("fps")).as("n_fingerprints"),
          // a stable digest of the fingerprint set for drift visibility
          xxhash64(concat_ws(",", transform(col("fps"), h => h.cast("string"))))
            .as("fp_digest"))
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

    // ---- per-GROUP top-k (the q35 global pattern, grouped): the 5 most
    // frequent tokens per source, deterministic ties (count desc, token
    // asc). The window partitions by source — never a single global
    // partition — so the rank step parallelizes with the group count.
    QueryDef(
      "q130_top_tokens_per_source",
      Some("""
        WITH c AS (SELECT source, tok, count(*) AS n FROM
                     (SELECT source,
                             unnest(string_split_regex(trim(text), '\s+')) AS tok
                      FROM documents)
                   GROUP BY 1, 2),
        r AS (SELECT source, tok, n,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY n DESC, tok) AS rnk FROM c)
        SELECT source, tok, n, rnk FROM r WHERE rnk <= 5
        ORDER BY source, rnk"""),
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(desc("n"), asc("tok"))
      Tables.documents(s, dir)
        .select(col("source"), explode(toks).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .orderBy("source", "rnk")
    },

    // ---- multi-phrase dictionary tagging: the top-8 corpus bigrams +
    // top-4 trigrams (self-mined, deterministic tie-break) matched
    // against every document in ONE pass via rarest-token anchor joins
    // (ops/DictTag) — the blocklist/PII/taxonomy tagger at corpus
    // scale. The oracle brute-forces doc × dict with a positional
    // slice scan; the hash match proves the anchor pruning drops no
    // occurrence and overlapping matches all count.
    QueryDef(
      "q144_dict_phrase_tags",
      Some("""
        WITH tt AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                    FROM documents),
        g2 AS (SELECT t[i] || ' ' || t[i+1] AS phrase, count(*) AS c
               FROM tt, unnest(range(1, len(t))) u(i)
               WHERE len(t) >= 2 GROUP BY phrase),
        top2 AS (SELECT phrase FROM g2 ORDER BY c DESC, phrase LIMIT 8),
        g3 AS (SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS phrase,
                      count(*) AS c
               FROM tt, unnest(range(1, len(t) - 1)) u(i)
               WHERE len(t) >= 3 GROUP BY phrase),
        top3 AS (SELECT phrase FROM g3 ORDER BY c DESC, phrase LIMIT 4),
        dict AS (SELECT phrase,
                   CAST(row_number() OVER (ORDER BY phrase) AS INT)
                     AS phrase_id
                 FROM (SELECT phrase FROM top2
                       UNION ALL SELECT phrase FROM top3)),
        dt AS (SELECT phrase_id, string_split(phrase, ' ') AS ptoks,
                      len(string_split(phrase, ' ')) AS plen FROM dict),
        m AS (SELECT tt.doc_id, dt.phrase_id,
                len(list_filter(range(1, len(t) - plen + 2),
                    i -> t[i:i+plen-1] = ptoks)) AS n_matches
              FROM tt CROSS JOIN dt WHERE len(t) >= plen)
        SELECT doc_id, phrase_id, CAST(n_matches AS BIGINT) AS n_matches
        FROM m WHERE n_matches > 0 ORDER BY doc_id, phrase_id"""),
    ) { (s, dir) =>
      import graft.ops.{CorpusOps, DictTag}
      val docs = Tables.documents(s, dir)
      // ONE corpus pass mines both gram sizes; the per-size top-k cuts
      // are TakeOrdered jobs over the cached gram-count table, and the
      // 12-phrase dictionary is assembled on the driver (stat-broadcast
      // class, SURVEY §4.1) — ids follow UTF-8-binary phrase order to
      // match the oracle's row_number collation
      val gramCounts = docs
        .select(toks.as("_t")) // bind: the gram lambdas would otherwise
        // re-run the regex split per element access (the q63 lesson)
        .select(explode(concat(CorpusOps.wordGrams(col("_t"), 2),
          CorpusOps.wordGrams(col("_t"), 3))).as("phrase"))
        .groupBy("phrase").agg(count(lit(1)).as("c"))
        .withColumn("n", size(split(col("phrase"), " ")))
      gramCounts.persist()
      def top(n: Int, k: Int) = gramCounts.filter(col("n") === n)
        .orderBy(desc("c"), asc("phrase")).limit(k)
        .select("phrase").collect().map(_.getString(0))
      val phrases = (top(2, 8) ++ top(3, 4)).sortWith { (a, b) =>
        val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
        val i = x.zip(y).indexWhere(t => t._1 != t._2)
        if (i >= 0) (x(i) & 0xff) < (y(i) & 0xff) else x.length < y.length
      }
      gramCounts.unpersist(false)
      import s.implicits._
      val dict = phrases.zipWithIndex
        .map { case (p, i) => (p, i + 1) }.toSeq
        .toDF("phrase", "phrase_id")
      DictTag.tagDictionary(docs, "doc_id", "text", dict)
        .orderBy("doc_id", "phrase_id")
    },

    // ---- per-source Zipf slope: least-squares fit of ln(freq) on
    // ln(rank) over each source's top-100 token frequencies — the
    // lexical-health diagnostic (natural text sits near -1; templated or
    // scraped-boilerplate sources flatten). One exploded-token groupBy,
    // a per-source window rank (bounded top-100), and the covariance
    // sums — x/y rounded 6dp after ln, power sums decimal-exact, the
    // closing slope/intercept arithmetic mirrored term-for-term.
    QueryDef(
      "q155_zipf_slope",
      Some(s"""
        WITH tok AS (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
                     FROM documents),
        tc AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY source, tok),
        rk AS (SELECT source, c,
                 row_number() OVER (PARTITION BY source
                   ORDER BY c DESC, tok ASC) AS r
               FROM tc),
        xy AS (SELECT source,
                 round(ln(CAST(r AS DOUBLE)), 6) AS x,
                 round(ln(CAST(c AS DOUBLE)), 6) AS y
               FROM rk WHERE r <= 100),
        s AS (SELECT source, count(*) AS n,
                ${Det.sqlSum("x")} AS sx, ${Det.sqlSum("y")} AS sy,
                ${Det.sqlSum("x * y")} AS sxy, ${Det.sqlSum("x * x")} AS sxx
              FROM xy GROUP BY source)
        SELECT source, CAST(n AS INT) AS n_ranks,
               (sxy - sx * sy / n) / (sxx - sx * sx / n) AS zipf_slope,
               (sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n
                 AS intercept
        FROM s ORDER BY source"""),
    ) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("c").desc, col("tok").asc)
      val xy = Tables.documents(s, dir)
        .select(col("source"), explode(toks).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= 100)
        .select(col("source"),
          round(log(col("r").cast("double")), 6).as("x"),
          round(log(col("c").cast("double")), 6).as("y"))
      xy.groupBy("source")
        .agg(count(lit(1)).as("n"),
          Det.dsum(col("x")).as("sx"), Det.dsum(col("y")).as("sy"),
          Det.dsum(col("x") * col("y")).as("sxy"),
          Det.dsum(col("x") * col("x")).as("sxx"))
        .select(col("source"), col("n").cast("int").as("n_ranks"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n"))).as("zipf_slope"),
          ((col("sy") - (col("sxy") - col("sx") * col("sy") / col("n")) /
            (col("sxx") - col("sx") * col("sx") / col("n")) * col("sx")) /
            col("n")).as("intercept"))
        .orderBy("source")
    },

    // ---- PII detection + redaction (the compliance stage every
    // training corpus runs before release): emails, IPv4s, US-format
    // phones and 13-19-digit card runs are counted, then redacted to
    // typed placeholders in detection order (emails first — their local
    // parts contain digits/dots the later patterns could half-match).
    // PII is PLANTED deterministically per doc (ids drive the values)
    // so the gate exercises every pattern on every row; the patterns
    // use only the regex subset with identical Java/RE2 semantics
    // (character classes, bounded repetition, \b) — no lookaround, no
    // backreferences. Pure codegen regexp functions, zero shuffles.
    QueryDef(
      "q223_pii_redaction",
      Some(raw"""
        WITH t AS (
          SELECT doc_id,
                 text || ' contact user' || doc_id ||
                 '@example.com from 10.' || (doc_id % 200) ||
                 '.0.1 call (415) 555-' ||
                 lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
                 ' card 4111111111111' ||
                 lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || ' end' AS t2
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t2,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
               CAST(len(regexp_extract_all(t2,
                 '\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b')) AS BIGINT) AS n_ip,
               CAST(len(regexp_extract_all(t2,
                 '\([0-9]{3}\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
               CAST(len(regexp_extract_all(t2,
                 '\b[0-9]{13,19}\b')) AS BIGINT) AS n_card,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(t2,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                 '\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])(\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b', '<IP>', 'g'),
                 '\([0-9]{3}\) [0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
                 '\b[0-9]{13,19}\b', '<CARD>', 'g') AS redacted
        FROM t ORDER BY doc_id"""),
    ) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])" +
        "(\\.(25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\\b"
      val phone = "\\([0-9]{3}\\) [0-9]{3}-[0-9]{4}"
      val card = "\\b[0-9]{13,19}\\b"
      val t2 = concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10."), (col("doc_id") % 200).cast("string"),
        lit(".0.1 call (415) 555-"),
        lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
        lit(" card 4111111111111"),
        lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit(" end"))
      Tables.documents(s, dir)
        .select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          regexp_count(col("t2"), lit(email)).cast("long").as("n_email"),
          regexp_count(col("t2"), lit(ip)).cast("long").as("n_ip"),
          regexp_count(col("t2"), lit(phone)).cast("long").as("n_phone"),
          regexp_count(col("t2"), lit(card)).cast("long").as("n_card"),
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("t2"),
            lit(email), lit("<EMAIL>")),
            lit(ip), lit("<IP>")),
            lit(phone), lit("<PHONE>")),
            lit(card), lit("<CARD>")).as("redacted"))
        .orderBy("doc_id")
    },

    // ---- URL extraction + per-domain stats (the crawl-curation ledger:
    // which domains feed the corpus, how many docs cite them — the
    // aggregation a domain-blocklist filter runs against). URLs are
    // PLANTED deterministically (ids drive subdomain/site/path) so every
    // doc contributes two; extraction regex uses the Java/RE2-identical
    // subset, domains via one regexp_extract. One explode + one
    // domain-keyed aggregation — the 100 TB shape.
    QueryDef(
      "q225_url_domains",
      Some(raw"""
        WITH t AS (
          SELECT doc_id,
                 text || ' see https://sub' || (doc_id % 40) || '.example' ||
                 (doc_id % 7) || '.com/p/' || doc_id ||
                 ' and http://www.ref' || (doc_id % 13) || '.org/x?q=1' AS t2
          FROM documents),
        u AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(t2,
                   'https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./?=_%-]*)?', 0)) AS url
          FROM t),
        d AS (
          SELECT doc_id, url,
                 regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
          FROM u)
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM d GROUP BY domain ORDER BY domain"""),
    ) { (s, dir) =>
      val urlRe = "https?://[A-Za-z0-9.-]+(/[A-Za-z0-9./?=_%-]*)?"
      val t2 = concat(col("text"),
        lit(" see https://sub"), (col("doc_id") % 40).cast("string"),
        lit(".example"), (col("doc_id") % 7).cast("string"),
        lit(".com/p/"), col("doc_id").cast("string"),
        lit(" and http://www.ref"), (col("doc_id") % 13).cast("string"),
        lit(".org/x?q=1"))
      Tables.documents(s, dir)
        .select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          explode(expr(s"regexp_extract_all(t2, '$urlRe', 0)")).as("url"))
        .select(col("doc_id"), col("url"),
          regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1).as("domain"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_urls"),
          countDistinct("doc_id").as("n_docs"))
        .orderBy("domain")
    },

    // ---- domain blocklist filtering (the curation step the q225 ledger
    // feeds — the UT1/adult-domain-list shape, VERDICT r12 task 6):
    // normalize each cited host (lowercase, strip port, PSL-fold to the
    // registrable domain), anti-match docs against a broadcast blocklist
    // — a doc citing ANY blocked domain is dropped — and keep the
    // per-domain audit ledger: url/doc counts, blocked flag, and how
    // many citing docs SURVIVE the doc-level filter (a doc citing both
    // a good and a blocked domain is dropped, so survivors of good
    // domains shrink too — the cross-domain effect a per-URL filter
    // would miss). URLs are planted deterministically with
    // case/port/www noise PLUS a `.co.uk` site per doc, so the
    // multi-label public-suffix rules are load-bearing: under the old
    // two-label fold every co.uk site folded into ONE 'co.uk' domain
    // and a single blocklist entry would nuke them all; under the PSL
    // fold (VERDICT r14 task 1) blocking shop5.co.uk drops only
    // shop5.co.uk. Blocklist AND suffix rules are DATA (inline
    // VALUES/IN-lists on both sides, generated from the same Scala
    // sets), so the whole chain replays in SQL — full oracle hash.
    // Plan shape: explode + broadcast-joined tiny blocklist +
    // doc-keyed then domain-keyed aggregation; nothing
    // corpus-quadratic.
    QueryDef(
      "q231_domain_blocklist",
      Some(raw"""
        WITH t AS (
          SELECT doc_id,
                 text || ' https://sub' || (doc_id % 40) || '.shop' ||
                 (doc_id % 9) || '.com/p/' || doc_id ||
                 ' http://WWW.Shop' || (doc_id % 9) || '.COM:8080/cart' ||
                 ' https://cdn.ads' || (doc_id % 5) || '.net/b.js' ||
                 ' https://Buy.Shop' || (doc_id % 9) || '.co.uk/i/' || doc_id AS t2
          FROM documents),
        u AS (
          SELECT doc_id,
                 unnest(regexp_extract_all(t2,
                   'https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[A-Za-z0-9./?=_%-]*)?', 0)) AS url
          FROM t),
        ${PslSql.foldCtes("u",
            "regexp_extract(url, 'https?://([A-Za-z0-9.-]+(:[0-9]+)?)', 1)",
            Seq("doc_id"), "n", "dom")},
        b AS (SELECT * FROM (VALUES ('ads0.net'), ('ads2.net'), ('ads4.net'),
                                    ('shop3.com'), ('shop7.com'),
                                    ('shop5.co.uk')) AS v(bdom)),
        m AS (
          SELECT n.doc_id, n.dom,
                 CASE WHEN b.bdom IS NOT NULL THEN 1 ELSE 0 END AS hit
          FROM n LEFT JOIN b ON n.dom = b.bdom),
        doc AS (
          SELECT doc_id, MAX(hit) AS doc_blocked FROM m GROUP BY doc_id)
        SELECT m.dom AS domain,
               CAST(MAX(m.hit) AS BIGINT) AS blocked,
               CAST(COUNT(*) AS BIGINT) AS n_urls,
               CAST(COUNT(DISTINCT m.doc_id) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT CASE WHEN doc.doc_blocked = 0
                                        THEN m.doc_id END) AS BIGINT)
                 AS n_docs_surviving
        FROM m JOIN doc ON m.doc_id = doc.doc_id
        GROUP BY m.dom ORDER BY domain"""),
    ) { (s, dir) =>
      val urlRe = "https?://[A-Za-z0-9.-]+(:[0-9]+)?(/[A-Za-z0-9./?=_%-]*)?"
      val t2 = concat(col("text"),
        lit(" https://sub"), (col("doc_id") % 40).cast("string"),
        lit(".shop"), (col("doc_id") % 9).cast("string"),
        lit(".com/p/"), col("doc_id").cast("string"),
        lit(" http://WWW.Shop"), (col("doc_id") % 9).cast("string"),
        lit(".COM:8080/cart"),
        lit(" https://cdn.ads"), (col("doc_id") % 5).cast("string"),
        lit(".net/b.js"),
        lit(" https://Buy.Shop"), (col("doc_id") % 9).cast("string"),
        lit(".co.uk/i/"), col("doc_id").cast("string"))
      val host = graft.ops.CorpusOps.hostOf(col("url"))
      val dom = graft.ops.CorpusOps.registrableDomain(host)
      val blocklist = {
        import s.implicits._
        Seq("ads0.net", "ads2.net", "ads4.net", "shop3.com", "shop7.com",
          "shop5.co.uk").toDF("bdom")
      }
      // cached: TWO consumers (the doc-level blocked flag and the final
      // domain ledger) would otherwise each replay the documents scan +
      // explode + broadcast match; MEMORY_ONLY recompute is value-
      // identical and the harness clearCache() bounds the session
      val m = Tables.documents(s, dir)
        .select(col("doc_id"), t2.as("t2"))
        .select(col("doc_id"),
          explode(expr(s"regexp_extract_all(t2, '$urlRe', 0)")).as("url"))
        .select(col("doc_id"), dom.as("dom"))
        .join(broadcast(blocklist), col("dom") === col("bdom"), "left")
        .select(col("doc_id"), col("dom"),
          when(col("bdom").isNotNull, 1).otherwise(0).as("hit"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val doc = m.groupBy("doc_id").agg(max("hit").as("doc_blocked"))
      m.join(doc, "doc_id")
        .groupBy(col("dom").as("domain"))
        .agg(max("hit").cast("long").as("blocked"),
          count(lit(1)).as("n_urls"),
          countDistinct("doc_id").as("n_docs"),
          countDistinct(when(col("doc_blocked") === 0, col("doc_id")))
            .as("n_docs_surviving"))
        .orderBy("domain")
    },

    // ---- domain-disjoint train/val split: the standard web-corpus
    // leakage guard — a near-duplicate of a training page is far more
    // likely to live on the SAME registrable domain (mirrors, templates,
    // pagination), so eval contamination is controlled by splitting at
    // the domain grain, never the document grain. Assignment is
    // hash-of-domain (xxhash64, seed 42) into 10 buckets, 1 bucket →
    // 'val': deterministic, stateless, and stable under corpus growth
    // (a new crawl of an old domain lands on the old side — no
    // re-shuffling of past assignments). Shuffle-free except the output
    // sort: the domain fold + hash + bucket rule are one projection.
    // The oracle replays host extraction, the q231 normalization fold,
    // and the full XXH64 chain in SQL.
    QueryDef(
      "q236_domain_split",
      Some(DuckXxh.domainSplitOracle(valBuckets = 1, nBuckets = 10)),
    ) { (s, dir) =>
      val url = concat(lit("https://Sub"), (col("doc_id") % 7).cast("string"),
        lit(".Site"), (col("doc_id") % 101).cast("string"),
        lit(".ORG:8443/d/"), col("doc_id").cast("string"))
      val host = graft.ops.CorpusOps.hostOf(url)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.ops.CorpusOps.registrableDomain(host).as("domain"))
        .withColumn("split",
          graft.ops.CorpusOps.domainSplit(col("domain"),
            valBuckets = 1, nBuckets = 10))
        .orderBy("doc_id")
    },

    // ---- domain mixture reweighting: given per-domain token masses and
    // a configured target mixture, emit each domain's downsampling rate —
    // the standard rebalancing step before training-corpus assembly
    // (over-represented domains are thinned toward the target; the
    // binding domain — max target/actual ratio — keeps rate 1 so the
    // pass never upsamples). ALL ratio comparisons are integer cross
    // products: rate_d = (w_d·n_m)/(w_m·n_d) where (w_m, n_m) is the
    // binding domain's weight/mass, so the only doubles in the output
    // are SINGLE divisions of exact BIGINTs (the q215 discipline —
    // bit-identical across engines). Target weights are derived from the
    // domain string (stand-in for a configured mixture table) so the
    // oracle replays them. One keyed aggregation over the corpus, then
    // a dimension-sized (≤ #domains) aggregate + broadcast scalar — no
    // global windows over data-sized frames.
    QueryDef(
      "q237_mixture_reweight",
      Some(raw"""
        WITH dd AS (
          SELECT doc_id,
                 'site' || (doc_id % 101) || '.org' AS domain,
                 len(string_split_regex(trim(text), '\s+')) AS toks
          FROM documents),
        g AS (
          SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(toks) AS BIGINT) AS n_tokens,
                 CAST(1 + length(domain) % 3 AS BIGINT) AS w
          FROM dd GROUP BY domain),
        m AS (
          SELECT w AS wm, n_tokens AS nm FROM g
          ORDER BY CAST(w AS DOUBLE) / n_tokens DESC, domain DESC LIMIT 1)
        SELECT domain, n_docs, n_tokens, w,
               CAST(w * m.nm AS DOUBLE) / (m.wm * n_tokens) AS sample_rate,
               CAST(n_tokens AS DOUBLE) *
                 (CAST(w * m.nm AS DOUBLE) / (m.wm * n_tokens))
                 AS expected_tokens
        FROM g, m ORDER BY domain"""),
    ) { (s, dir) =>
      val g = Tables.documents(s, dir)
        .select(concat(lit("site"), (col("doc_id") % 101).cast("string"),
            lit(".org")).as("domain"),
          size(split(trim(col("text")), "\\s+")).as("toks"))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          sum("toks").cast("long").as("n_tokens"))
        .withColumn("w", (lit(1) + length(col("domain")) % 3).cast("long"))
      // binding domain: max w/n ratio, tie-broken on max domain — the
      // struct max compares (ratio, domain) fieldwise, matching the
      // oracle's ORDER BY ... DESC, domain DESC LIMIT 1
      val m = g
        .agg(max(struct((col("w").cast("double") / col("n_tokens")).as("r"),
          col("domain"), col("w"), col("n_tokens"))).as("m"))
        .select(col("m.w").as("wm"), col("m.n_tokens").as("nm"))
      // expected = n · rate as a DOUBLE product of the already-exact
      // rate — the BIGINT triple product n·w·nm overflows int64 at a
      // few e9 tokens per domain (review r13), far below the 100 TB
      // target; both engines now run the identical two-step chain
      g.crossJoin(broadcast(m)) // stat-broadcast scalar (SURVEY §4.1)
        .select(col("domain"), col("n_docs"), col("n_tokens"), col("w"),
          ((col("w") * col("nm")).cast("double") /
            (col("wm") * col("n_tokens"))).as("sample_rate"),
          (col("n_tokens").cast("double") *
            ((col("w") * col("nm")).cast("double") /
              (col("wm") * col("n_tokens")))).as("expected_tokens"))
        .orderBy("domain")
    },

    // ---- tokenizer fertility per language: subword tokens per
    // whitespace word, grouped by the q48 language-ID heuristic — the
    // metric multilingual curation uses to set per-language token
    // budgets (a high-fertility language consumes more of the training
    // budget per word, so mixtures are planned in TOKENS, not words).
    // Composes q48's stopword-argmax langid with q62's BPE-ish
    // pre-tokenization count; fertility is a SINGLE division of exact
    // BIGINTs. One projection + one 3-group aggregation — no joins.
    QueryDef(
      "q238_token_fertility",
      Some(s"""
        WITH t AS (
          SELECT CASE WHEN s_a >= s_b AND s_a >= s_c THEN 'lang_a'
                      WHEN s_b >= s_c THEN 'lang_b'
                      ELSE 'lang_c' END AS predicted,
                 n_words, n_sub
          FROM (SELECT doc_id,
                  len(list_intersect(string_split_regex(trim(text), '\\s+'),
                      ['table','row','column','scan'])) AS s_a,
                  len(list_intersect(string_split_regex(trim(text), '\\s+'),
                      ['spark','batch','query','join'])) AS s_b,
                  len(list_intersect(string_split_regex(trim(text), '\\s+'),
                      ['fast','slow','big','small'])) AS s_c,
                  len(string_split_regex(trim(text), '\\s+')) AS n_words,
                  len(regexp_extract_all(text, '$bpeTokenPattern')) AS n_sub
                FROM documents))
        SELECT predicted, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS n_words,
               CAST(SUM(n_sub) AS BIGINT) AS n_subtokens,
               CAST(SUM(n_sub) AS DOUBLE) / SUM(n_words) AS fertility
        FROM t GROUP BY predicted ORDER BY predicted"""),
    ) { (s, dir) =>
      def hits(words: Seq[String]) = size(array_intersect(
        graft.core.Cols.wsTokens(col("text")),
        array(words.map(lit): _*)))
      Tables.documents(s, dir)
        .select(
          when(hits(Seq("table", "row", "column", "scan")) >=
                 hits(Seq("spark", "batch", "query", "join")) &&
               hits(Seq("table", "row", "column", "scan")) >=
                 hits(Seq("fast", "slow", "big", "small")), "lang_a")
            .when(hits(Seq("spark", "batch", "query", "join")) >=
                    hits(Seq("fast", "slow", "big", "small")), "lang_b")
            .otherwise("lang_c").as("predicted"),
          size(graft.core.Cols.wsTokens(col("text"))).as("n_words"),
          size(regexp_extract_all(col("text"), lit(bpeTokenPattern), lit(0)))
            .as("n_sub"))
        .groupBy("predicted")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").cast("long").as("n_words"),
          sum("n_sub").cast("long").as("n_subtokens"),
          (sum("n_sub").cast("double") / sum("n_words")).as("fertility"))
        .orderBy("predicted")
    },

    // ---- token-budget corpus assembly: fill HALF the corpus' token
    // budget with the best documents — rank by vocabulary richness
    // (distinct whitespace tokens, tie doc_id), take the maximal prefix
    // whose running token total fits. The cut is the standard "assemble
    // an N-token training set from the top of the quality ordering"
    // step; the running total is the DISTRIBUTED exact prefix sum
    // (globalCumSum: slice-local windows + broadcast offsets — no
    // single-task global window at any SF), and the budget is read off
    // the cumsum output's max (the q216 single-subtree discipline, so
    // the stats chain appears once per consumer). Integer-only ordering
    // and cut; budget = floor(total/2), identical in both engines.
    QueryDef(
      "q240_budget_select",
      Some(raw"""
        WITH s AS (
          SELECT doc_id,
                 CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS n_tokens,
                 CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS nd
          FROM documents),
        c AS (
          SELECT doc_id, nd, n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY nd DESC, doc_id)
                   AS BIGINT) AS cum_n_tokens
          FROM s),
        t AS (SELECT CAST(MAX(cum_n_tokens) // 2 AS BIGINT) AS budget FROM c)
        SELECT doc_id, nd, n_tokens, cum_n_tokens
        FROM c, t WHERE cum_n_tokens <= budget
        ORDER BY nd DESC, doc_id"""),
    ) { (s, dir) =>
      val toks = graft.core.Cols.wsTokens(col("text"))
      val stats = Tables.documents(s, dir)
        .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("nd"))
      val cm = StatQueries.globalCumSum(stats,
        Seq(desc("nd"), asc("doc_id")), Seq("n_tokens"),
        bucketKey = Some(-col("nd"))) // negated: monotone in the DESC order
      val t = cm.agg(floor(max("cum_n_tokens") / 2).cast("long").as("budget"))
      cm.crossJoin(broadcast(t)) // stat-broadcast scalar (SURVEY §4.1)
        .filter(col("cum_n_tokens") <= col("budget"))
        .select(col("doc_id"), col("nd"), col("n_tokens"), col("cum_n_tokens"))
        .orderBy(desc("nd"), asc("doc_id"))
    },

    // ---- curriculum staging: assign every document to one of 4
    // quality quartiles (vocabulary richness ascending, tie doc_id) —
    // the ordering a curriculum schedule trains over (simple/repetitive
    // text first, richest last). NTILE is the DISTRIBUTED exact rank +
    // integer bucket formula (globalRank + ntileFromRank: slice-local
    // row_number + broadcast offsets — no single-task global sort at
    // any SF), bit-matching the oracle's NTILE(4) for every n, not just
    // multiples of 4. Per-doc output so the hash pins every assignment.
    QueryDef(
      "q241_curriculum_stages",
      Some(raw"""
        WITH s AS (
          SELECT doc_id,
                 CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS nd
          FROM documents)
        SELECT doc_id, nd,
               CAST(NTILE(4) OVER (ORDER BY nd, doc_id) AS INT) AS stage
        FROM s ORDER BY doc_id"""),
    ) { (s, dir) =>
      val stats = Tables.documents(s, dir)
        .select(col("doc_id"),
          size(array_distinct(graft.core.Cols.wsTokens(col("text"))))
            .cast("long").as("nd"))
      val nTot = stats.agg(count(lit(1)).as("n_total"))
      val ranked = StatQueries.globalRank(stats,
        Seq(asc("nd"), asc("doc_id")), bucketKey = Some(col("nd")))
      ranked.crossJoin(broadcast(nTot)) // stat-broadcast scalar (SURVEY §4.1)
        .select(col("doc_id"), col("nd"),
          StatQueries.ntileFromRank(col("rn"), col("n_total"), 4)
            .cast("int").as("stage"))
        .orderBy("doc_id")
    },

    // ---- per-domain contribution cap: keep each domain's top-3
    // documents by vocabulary richness (tie doc_id) — the standard
    // anti-domination guard (without it one template-heavy site can
    // contribute an unbounded share of the corpus; with it every domain
    // is bounded regardless of crawl depth). One window partitioned on
    // the domain — never a global sort — plus the kept/dropped ledger
    // columns so the cut is auditable. Integer-only ranking.
    QueryDef(
      "q242_domain_cap",
      Some(raw"""
        WITH s AS (
          SELECT doc_id, 'site' || (doc_id % 101) || '.org' AS domain,
                 CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
                   AS BIGINT) AS nd
          FROM documents),
        r AS (
          SELECT doc_id, domain, nd,
                 CAST(row_number() OVER (PARTITION BY domain
                   ORDER BY nd DESC, doc_id) AS INT) AS rk
          FROM s)
        SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN rk <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(MIN(CASE WHEN rk <= 3 THEN doc_id END) AS BIGINT)
                 AS first_kept_id,
               CAST(MAX(CASE WHEN rk <= 3 THEN nd END) AS BIGINT) AS best_nd
        FROM r GROUP BY domain ORDER BY domain"""),
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val st = Tables.documents(s, dir)
        .select(col("doc_id"),
          concat(lit("site"), (col("doc_id") % 101).cast("string"),
            lit(".org")).as("domain"),
          size(array_distinct(graft.core.Cols.wsTokens(col("text"))))
            .cast("long").as("nd"))
      val w = Window.partitionBy("domain").orderBy(desc("nd"), asc("doc_id"))
      st.withColumn("rk", row_number().over(w))
        .groupBy("domain")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("rk") <= 3, 1).otherwise(0)).cast("long").as("n_kept"),
          min(when(col("rk") <= 3, col("doc_id"))).cast("long")
            .as("first_kept_id"),
          max(when(col("rk") <= 3, col("nd"))).cast("long").as("best_nd"))
        .orderBy("domain")
    },

    // ---- URL canonicalization: the normalization every URL-keyed
    // curation step (dedup ledgers, revisit policies, frontier merges)
    // runs first — scheme/host case fold, default-port strip (443 on
    // https; non-default ports kept), trailing-slash fold (except the
    // root path), query parameters SORTED (the same resource fetched
    // with `?b=2&a=1` and `?a=1&b=2` must collapse), fragment dropped
    // (client-side only, never part of the resource). Pure codegen
    // regexp/array chain in the RE2-identical subset; the oracle replays
    // every rule. One projection, shuffle-free except the output sort.
    // The planted URLs exercise each rule: mixed-case scheme/host, a
    // :443 (stripped) vs :8443 (kept) port split, a trailing slash, and
    // deliberately unsorted parameters.
    QueryDef(
      "q244_url_canonicalize",
      Some(raw"""
        WITH u AS (
          SELECT doc_id,
                 'HTTPS://Sub' || (doc_id % 5) || '.Example' || (doc_id % 50) ||
                 '.COM' || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':8443' END) ||
                 '/Products/Item' || (doc_id % 7) || '/' ||
                 '?utm=x&b=' || (doc_id % 3) || '&a=1#sec' || (doc_id % 4) AS url
          FROM documents),
        b AS (
          SELECT doc_id, url, regexp_replace(url, '#.*', '') AS base FROM u),
        p AS (
          SELECT doc_id, url,
                 lower(regexp_extract(base, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                 lower(regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS hostport,
                 regexp_extract(base, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
                 regexp_extract(base, '\?(.*)', 1) AS query
          FROM b),
        c AS (
          SELECT doc_id, url, scheme,
                 CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
                      WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
                      ELSE hostport END AS host,
                 CASE WHEN regexp_replace(path, '/+$$', '') = '' THEN '/'
                      ELSE regexp_replace(path, '/+$$', '') END AS cpath,
                 CASE WHEN query = '' THEN ''
                      ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&')
                 END AS cquery
          FROM p)
        SELECT doc_id, url AS url_raw,
               scheme || '://' || host || cpath || cquery AS url_canon
        FROM c ORDER BY doc_id"""),
    ) { (s, dir) =>
      val url = concat(lit("HTTPS://Sub"), (col("doc_id") % 5).cast("string"),
        lit(".Example"), (col("doc_id") % 50).cast("string"), lit(".COM"),
        when(col("doc_id") % 2 === 0, ":443").otherwise(":8443"),
        lit("/Products/Item"), (col("doc_id") % 7).cast("string"), lit("/"),
        lit("?utm=x&b="), (col("doc_id") % 3).cast("string"),
        lit("&a=1#sec"), (col("doc_id") % 4).cast("string"))
      Tables.documents(s, dir)
        .select(col("doc_id"), url.as("url_raw"),
          graft.ops.CorpusOps.canonicalizeUrl(url).as("url_canon"))
        .orderBy("doc_id")
    },
  )
}
