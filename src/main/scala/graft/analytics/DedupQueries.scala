package graft.analytics

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TextDedup

/** Deduplication operator coverage over `documents` (SURVEY north-star
  * extensions): exact-Jaccard near-dup pairs (oracle-checked brute force
  * with language blocking), exact fingerprint dedup survivors
  * (oracle-checked), and the scale-path MinHash-LSH / SimHash variants
  * (not SQL-expressible in the oracle — registered rows-only).
  */
object DedupQueries {

  val defs: Seq[QueryDef] = Seq(
    // ---- exact n-gram (token-set) Jaccard near-dup pairs, lang-blocked
    QueryDef(
      "q36_jaccard_neardups",
      Some("""
        WITH t AS (SELECT doc_id, lang,
                     list_distinct(string_split_regex(trim(text), '\s+')) AS toks
                   FROM documents)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(a.toks || b.toks)) AS jaccard
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
                 / len(list_distinct(a.toks || b.toks)) >= 0.5
        ORDER BY id_a, id_b"""),
    ) { (s, dir) =>
      TextDedup.jaccardPairs(Tables.documents(s, dir), "text", "doc_id", "lang", 0.5)
        .orderBy("id_a", "id_b")
    },

    // ---- exact fingerprint dedup: lowest doc_id survives per fingerprint
    QueryDef(
      "q37_exact_dedup_survivors",
      Some("""
        SELECT min(doc_id) AS doc_id,
               md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
        FROM documents
        GROUP BY 2 ORDER BY doc_id"""),
    ) { (s, dir) =>
      TextDedup.exactDedup(Tables.documents(s, dir), "text", "doc_id")
        .select(col("doc_id"), TextDedup.fingerprint(col("text")).as("fingerprint"))
        .orderBy("doc_id")
    },

    // ---- incremental MinHash near-dups: the per-ingest-batch shape — a
    // new 20% slice probes the existing corpus's signature index instead
    // of recomputing the corpus. Hash-checked end-to-end: the oracle runs
    // the full DuckXxh signature chain over both slices and joins their
    // band buckets. The batch-equivalence and index round-trip contracts
    // are in CorpusOpsSpec.
    QueryDef("q79_incremental_minhash_neardups",
      Some(DuckXxh.incrementalNearDupsOracle(numHashes = 128, bands = 32)),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val fresh = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val index = TextDedup.minhashSignatures(old, "text", "doc_id")
      TextDedup.incrementalNearDups(fresh, index, "text", "doc_id")
        .orderBy("id_new", "id_old")
    },

    // ---- quality-aware exact dedup: the survivor per fingerprint group
    // is the BEST copy (longest raw text, tie to lowest id), not an
    // arbitrary one — whitespace variants share a fingerprint but differ
    // in n_chars, so survivor choice is observable here
    QueryDef(
      "q78_best_dup_survivors",
      Some("""
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
                 ROW_NUMBER() OVER (
                   PARTITION BY md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))
                   ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents)
        WHERE rn = 1 ORDER BY doc_id"""),
    ) { (s, dir) =>
      TextDedup.exactDedupBest(Tables.documents(s, dir), "text", "doc_id", "n_chars")
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    },

    // ---- exact word-TRIGRAM Jaccard near-dups: the n-gram variant —
    // order-sensitive shingles separate reordered-but-same-vocabulary docs
    // that token-set Jaccard (q36) conflates
    QueryDef(
      "q58_trigram_jaccard_neardups",
      Some("""
        WITH t AS (
          SELECT doc_id, lang,
                 CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
                      ELSE list_distinct(list_transform(range(1, len(toks) - 1),
                             i -> array_to_string(list_slice(toks, i, i + 2), ' ')))
                 END AS sh
          FROM (SELECT doc_id, lang,
                       string_split_regex(trim(text), '\s+') AS toks
                FROM documents))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(a.sh || b.sh)) AS jaccard
        FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / len(list_distinct(a.sh || b.sh)) >= 0.35
        ORDER BY id_a, id_b"""),
    ) { (s, dir) =>
      TextDedup.jaccardPairs(Tables.documents(s, dir), "text", "doc_id", "lang",
        threshold = 0.35, shingleLen = 3)
        .orderBy("id_a", "id_b")
    },

    // ---- MinHash+LSH near-dups (scale path). Hash-checked: the oracle
    // re-runs the whole signature chain in DuckDB (see DuckXxh) and
    // verifies candidates with exact token-set Jaccard.
    QueryDef("q38_minhash_neardups",
      Some(DuckXxh.minhashNearDupsOracle(threshold = 0.5, numHashes = 128,
        bands = 32)),
    ) { (s, dir) =>
      TextDedup.minhashNearDups(Tables.documents(s, dir), "text", "doc_id",
        threshold = 0.5).orderBy("id_a", "id_b")
    },

    // ---- SimHash near-dups. Hash-checked: per-doc bit-majority SimHash
    // over the same token hashes, pairs at Hamming ≤ 3 (pigeonhole makes
    // the engine's chunk filter exact, so the oracle needs only the ball)
    QueryDef("q39_simhash_neardups",
      Some(DuckXxh.simhashNearDupsOracle(maxHamming = 3)),
    ) { (s, dir) =>
      TextDedup.simhashNearDups(Tables.documents(s, dir), "text", "doc_id",
        maxHamming = 3).orderBy("id_a", "id_b")
    },

    // ---- MinHash dedup CLUSTERING: the linear-cost 100 TB dedup shape
    // (star edges + label propagation, no quadratic pair listing).
    // Hash-checked end-to-end: the oracle re-implements the ENTIRE chain
    // (XXH64 string hash, 128 seeded min-hashes, band chaining, LSH star
    // edges, recursive-CTE components) in pure DuckDB SQL — see DuckXxh.
    QueryDef("q55_minhash_dedup_clusters",
      Some(DuckXxh.minhashClustersOracle(numHashes = 128, bands = 32)),
    ) { (s, dir) =>
      TextDedup.minhashDedupClusters(Tables.documents(s, dir), "text", "doc_id")
        .orderBy("id")
    },

    // ---- dedup cluster-SIZE distribution: the curation ledger "how
    // much mass does near-dup dedup remove" — per cluster size, how many
    // clusters and how many documents (size 1 = unique docs; Σ n_docs =
    // corpus). q55's cluster assignment + two aggregations; the oracle
    // replays the full hash→band→star→component chain in recursive SQL
    // and folds it the same way.
    QueryDef("q230_dedup_cluster_sizes",
      Some(DuckXxh.minhashClusterSizesOracle(numHashes = 128, bands = 8)),
    ) { (s, dir) =>
      // DEDUP banding (8 bands x 16 rows, J ~ 0.88 — the CorpusPipeline
      // stage-4 setting): the q55 analysis default (32x4, J ~ 0.42)
      // transitively chains this corpus into ONE 500-doc cluster, which
      // makes a size DISTRIBUTION degenerate by construction
      val clusters = TextDedup.minhashDedupClusters(
        Tables.documents(s, dir), "text", "doc_id",
        numHashes = 128, bands = 8)
      val sz = clusters.groupBy("cluster_rep")
        .agg(count(lit(1)).as("cluster_size"))
      sz.groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          (col("cluster_size") * count(lit(1))).as("n_docs"))
        .orderBy("cluster_size")
    },

    // ---- quality-aware canonical selection: each near-dup cluster
    // keeps its HIGHEST-vocabulary member (max distinct whitespace
    // tokens, tie min doc_id) instead of the min-id convention —
    // production dedup keeps the cleanest copy, not an arbitrary one
    // (a truncated mirror of a page must lose to the full page). The
    // argmax key is integer-only, so selection is exact; the oracle
    // replays the whole hash→band→star→component chain PLUS the argmax
    // window in recursive SQL. Per-cluster windows partition on the
    // cluster rep — no global sort, scale-safe.
    QueryDef("q239_canonical_select",
      Some(DuckXxh.canonicalSelectOracle(numHashes = 128, bands = 8)),
    ) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val clusters = TextDedup.minhashDedupClusters(docs, "text", "doc_id",
        numHashes = 128, bands = 8) // the q230 dedup banding (J ~ 0.88)
      val qual = docs.select(col("doc_id"),
        size(array_distinct(graft.core.Cols.wsTokens(col("text"))))
          .cast("long").as("nd"))
      val w = Window.partitionBy("cluster_rep").orderBy(desc("nd"), asc("id"))
      val sz = Window.partitionBy("cluster_rep")
      clusters.join(qual, col("id") === col("doc_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cluster_size", count(lit(1)).over(sz))
        .filter(col("rn") === 1)
        .select(col("cluster_rep"), col("cluster_size"),
          col("id").as("canonical_id"), col("nd").as("canonical_nd"))
        .orderBy("cluster_rep")
    },

    // ---- exact-substring near-dup pairs via winnowing (the MOSS
    // blocking scheme): pairs sharing >= 2 winnow-SELECTED char 12-grams,
    // compared as strings — any pair sharing a >= w+k-1 = 21-char
    // substring is guaranteed reported. Hash-checked: the oracle re-runs
    // gram hashing, window minima, the selected-gram mapping, and the
    // pair join in pure DuckDB SQL (DuckXxh).
    QueryDef("q83_winnow_dup_pairs",
      Some(DuckXxh.winnowDupPairsOracle(k = 12, w = 10, minShared = 2)),
    ) { (s, dir) =>
      TextDedup.winnowDupPairs(Tables.documents(s, dir), "text", "doc_id",
        k = 12, w = 10, minShared = 2).orderBy("id_a", "id_b")
    },

    // ---- incremental EXACT dedup: the per-ingest batch shape — new docs
    // (keys %4==0) dedup within themselves (lowest-id survivor), then
    // anti-join their fingerprints against the prior corpus's persisted
    // fingerprint set. One window + one fp-keyed anti-join; the index
    // side is (fp, id) rows, never corpus text.
    QueryDef(
      "q99_incremental_exact_dedup",
      Some(raw"""
        WITH f AS (SELECT doc_id, source, n_chars,
                     md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                   FROM documents),
        old AS (SELECT DISTINCT fp FROM f WHERE doc_id % 4 <> 0),
        fresh AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                  FROM f WHERE doc_id % 4 = 0)
        SELECT doc_id, source, n_chars FROM fresh
        WHERE rn = 1 AND fp NOT IN (SELECT fp FROM old)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
      val fresh = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
      val fpIndex = old.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()
      TextDedup.incrementalExactDedup(fresh, fpIndex, "text", "doc_id")
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    },

    // ---- Bloom-pruned incremental exact dedup: same semantics as q99
    // (different batch split so the two queries can't mask each other)
    // but the batch probes a Bloom filter built over the corpus
    // fingerprints FIRST — provably-new rows bypass the index anti-join
    // entirely. The oracle is the EXACT path in SQL: a Bloom filter has
    // no false negatives, so pruning is result-invariant — which is
    // precisely the property worth hash-checking. Segment persistence,
    // OR-merge, and geometry gates are contract-tested in BloomDedupSpec.
    QueryDef(
      "q101_bloom_incremental_dedup",
      Some(raw"""
        WITH f AS (SELECT doc_id, source, n_chars,
                     md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
                   FROM documents),
        old AS (SELECT DISTINCT fp FROM f WHERE doc_id % 7 <> 0),
        fresh AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
                  FROM f WHERE doc_id % 7 = 0)
        SELECT doc_id, source, n_chars FROM fresh
        WHERE rn = 1 AND fp NOT IN (SELECT fp FROM old)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val fresh = docs.filter(pmod(col("doc_id"), lit(7)) === 0)
      val fpIndex = old.select(TextDedup.fingerprint(col("text")).as("fp")).distinct()
      val bloom = old.select(TextDedup.fpProbeKey(col("text")).as("k"))
        .stat.bloomFilter("k", 100000L, 0.01)
      TextDedup.bloomPrunedIncrementalExactDedup(fresh, fpIndex, bloom,
          "text", "doc_id")
        .select("doc_id", "source", "n_chars").orderBy("doc_id")
    },

    // ---- WITHIN-doc repeated-span scrub (Lee et al. 2022 intra-doc
    // dedup): token 3-gram occurrences repeating an earlier identical
    // gram in the SAME document mark their positions; scrubbed text
    // keeps the first copy of each repeated span and drops later copies.
    // Row-local (zero shuffles) in Spark; the oracle replays the
    // first-occurrence rule relationally (min-position per gram, covered
    // positions via range unnest, ordered string_agg rebuild).
    QueryDef(
      "q125_repeated_span_scrub",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        s AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
              FROM t WHERE len(toks) >= 3),
        g AS (SELECT doc_id, i, array_to_string(toks[i:i+2], ' ') AS gram FROM s),
        f AS (SELECT doc_id, gram, min(i) AS fi FROM g GROUP BY 1, 2),
        rep AS (SELECT g.doc_id, g.i FROM g JOIN f USING (doc_id, gram)
                WHERE g.i > f.fi),
        cov AS (SELECT DISTINCT doc_id, unnest(range(i, i + 3)) AS p FROM rep),
        tp AS (SELECT doc_id, unnest(toks) AS tok,
                      generate_subscripts(toks, 1) AS p FROM t),
        kept AS (SELECT tp.doc_id, tp.tok, tp.p FROM tp
                 WHERE NOT EXISTS (SELECT 1 FROM cov
                                   WHERE cov.doc_id = tp.doc_id AND cov.p = tp.p)),
        sc AS (SELECT doc_id, count(*) AS n_kept,
                      string_agg(tok, ' ' ORDER BY p) AS scrubbed_text
               FROM kept GROUP BY doc_id)
        SELECT t.doc_id, len(t.toks) AS n_tokens,
               len(t.toks) - coalesce(sc.n_kept, 0) AS n_repeat_positions,
               coalesce(sc.scrubbed_text, '') AS scrubbed_text
        FROM t LEFT JOIN sc USING (doc_id)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      TextDedup.repeatedSpanScrub(Tables.documents(s, dir), "text", "doc_id",
          k = 3)
        .orderBy("doc_id")
    },

    // ---- CROSS-doc repeated-span scrub (the inter-doc half of Lee et
    // al. 2022; q125 is the intra-doc half): disjoint 8-token tiles,
    // global keep-first on identical tile text ((doc_id, tile) order),
    // later copies removed from their documents. The oracle replays the
    // tiling, the global first-occurrence window, and the ordered
    // rebuild relationally — scrubbed text hash-checked end to end.
    QueryDef(
      "q126_crossdoc_tile_scrub",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        n AS (SELECT doc_id, toks, len(toks) AS nt,
                     CAST(len(toks) // 8 AS INT) AS nf FROM t),
        ti AS (SELECT doc_id, toks, nf, unnest(range(0, nf)) AS i FROM n),
        tt AS (SELECT doc_id, i,
                      array_to_string(toks[i*8+1:i*8+8], ' ') AS tile FROM ti),
        win AS (SELECT doc_id, i, tile,
                       ROW_NUMBER() OVER (PARTITION BY tile
                                          ORDER BY doc_id, i) AS rn FROM tt),
        kept AS (SELECT doc_id, i, tile FROM win WHERE rn = 1),
        agg AS (SELECT doc_id, count(*) AS nk,
                       string_agg(tile, ' ' ORDER BY i) AS body
                FROM kept GROUP BY doc_id),
        tl AS (SELECT doc_id, nf, nt,
                      array_to_string(toks[nf*8+1:nt], ' ') AS tail FROM n)
        SELECT tl.doc_id, CAST(nf AS BIGINT) AS n_tiles,
               CAST(nf - coalesce(nk, 0) AS BIGINT) AS n_removed_tiles,
               concat_ws(' ', body, nullif(tail, '')) AS scrubbed_text
        FROM tl LEFT JOIN agg USING (doc_id)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      TextDedup.crossDocTileScrub(Tables.documents(s, dir), "text", "doc_id",
          k = 8)
        .orderBy("doc_id")
    },

    // ---- FUZZY decontamination: train docs near-duplicating an eval doc
    // (trigram-shingle Jaccard >= 0.5) — the paraphrase-tolerant
    // complement of q68's exact gram overlap. The oracle brute-forces the
    // same Jaccard over raw shingle strings (q36 convention: hashed sets
    // and string sets agree absent xxh collisions); candidate generation
    // completeness is exactly what the hash match proves.
    QueryDef(
      "q128_fuzzy_decontam",
      Some(raw"""
        WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
                      FROM documents),
        sh AS (SELECT doc_id,
                 CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE list_distinct(list_transform(range(1, len(t) - 1),
                        i -> array_to_string(t[i:i+2], ' '))) END AS s
               FROM toks),
        tr AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 <> 0),
        ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 = 0)
        SELECT tr.doc_id AS id_t, ev.doc_id AS id_e,
               CAST(len(list_intersect(tr.s, ev.s)) AS DOUBLE)
                 / len(list_distinct(tr.s || ev.s)) AS jaccard
        FROM tr JOIN ev ON
          CAST(len(list_intersect(tr.s, ev.s)) AS DOUBLE)
            / len(list_distinct(tr.s || ev.s)) >= 0.5
        ORDER BY id_t, id_e"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      TextDedup.fuzzyDecontaminate(
          train = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0),
          evalSet = docs.filter(pmod(col("doc_id"), lit(5)) === 0),
          idCol = "doc_id", textCol = "text", threshold = 0.5, shingleLen = 3)
        .orderBy("id_t", "id_e")
    },

    // ---- image perceptual-hash near-dups: dHash-64 over REAL decoded
    // PNG pixels (graft.ops.PngCodec IDAT inflate), pairs via q39's
    // pigeonhole widened to 8×8-bit chunks (exact for Hamming ≤ 7).
    // no_oracle (binary surface — DuckDB cannot inflate PNGs); the
    // planted-transform contracts live in ImageHashSpec: a re-encode,
    // a 3/4 nearest resize, and a 2px border crop of each base image
    // must be found, distinct bases must not pair.
    QueryDef("q221_image_phash_neardups", None) { (s, dir) =>
      import graft.ops.ImageHash
      val corpus = ImageHash.plantedPngCorpus(s, nBase = 150)
      val hashes = ImageHash.pngHashes(corpus, "media_id", "png")
      ImageHash.phashNearDups(hashes, "media_id", "dhash", maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // ---- audio fingerprint near-dups: 64-bit energy-derivative hash
    // over REAL decoded PCM16 (Multimodal.parseWavPcm), gain-invariant
    // by construction (raw-sum comparisons over equal frames), pairs
    // via the same 8×8-bit pigeonhole join as q221. no_oracle (binary
    // surface); AudioHashSpec pins the planted-transform contracts:
    // half/quarter-gain and 2:1-decimated clones land at Hamming 0,
    // distinct recordings never pair.
    QueryDef("q224_audio_fingerprint_neardups", None) { (s, dir) =>
      import graft.ops.AudioHash
      val corpus = AudioHash.plantedWavCorpus(s, nBase = 150)
      val hashes = AudioHash.wavHashes(corpus, "media_id", "wav")
      AudioHash.fingerprintNearDups(hashes, "media_id", maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // ---- INCREMENTAL image dedup: a fresh crawl batch probes the
    // persisted fingerprint index (8 chunk rows per image) — old-new
    // pairs only, survivors are the probes with no match. The multimodal
    // sibling of q79/q101's incremental text dedup. no_oracle (binary
    // surface); ImageHashSpec pins survivors == planted-new and every
    // clone matched to its OWN base.
    QueryDef("q226_incremental_image_dedup", None) { (s, dir) =>
      import graft.ops.ImageHash
      val off = 1000000L
      val corpus = ImageHash.plantedPngCorpus(s, nBase = 120, cloneOffset = off)
      val hashes = ImageHash.pngHashes(corpus, "media_id", "png")
      val index = hashes.filter(col("media_id") < off) // the prior corpus
      val probe = hashes.filter(col("media_id") >= off) // the fresh batch
      val matches = ImageHash.phashMatches(probe, index,
        "media_id", "dhash", maxHamming = 6)
      // BEST match per probe (min hamming, then smallest index id): a
      // probe inside the ball of SEVERAL indexed images would otherwise
      // fan out to one row per match and break the one-row-per-probe
      // contract (round-12 review finding)
      val best = matches.groupBy(col("id_probe").as("media_id"))
        .agg(min(struct(col("hamming"), col("id_index"))).as("_b"))
        .select(col("media_id"), col("_b.id_index").as("dup_of"),
          col("_b.hamming").as("hamming"))
      // one row per probe: its matched base (or NULL = survivor)
      probe.select("media_id")
        .join(best, Seq("media_id"), "left")
        .select(col("media_id"), col("dup_of"), col("hamming"))
        .orderBy("media_id")
    },

    // ---- VIDEO near-dup dedup: the last cell of the multimodal matrix
    // (text/image/audio are q36-39/q221/q224). Real embedded-PNG
    // keyframe extraction (Multimodal.sampleFrames) composed with
    // q221's dHash + per-frame-index pigeonhole join; two videos pair
    // when >= 3 of their 4 aligned sample positions match within
    // Hamming 6. Each planted clone transforms the whole video
    // (re-encode / 3/4 resize / 2px crop) AND swaps its last frame, so
    // the >=k-of-n rule is load-bearing on every pair. no_oracle
    // (binary surface — DuckDB cannot walk MP4 containers or inflate
    // PNG frames); VideoHashSpec pins planted-clone recall, zero false
    // pairs, and the k-threshold boundary.
    QueryDef("q233_video_phash_neardups", None) { (s, dir) =>
      import graft.ops.VideoHash
      val corpus = VideoHash.plantedMp4Corpus(s, nBase = 150)
      val hashes = VideoHash.frameHashes(corpus)
      VideoHash.videoNearDups(hashes, "media_id", minFrames = 3, maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // ---- ANY-length exact-substring duplicate spans (Lee et al. 2022
    // ExactSubstr, token granularity — VERDICT r14 task 3): maximal
    // token intervals covered by a substring of >= 8 tokens occurring
    // >= 2 times anywhere in the corpus — the true any-length remover
    // the fixed granularities (q83 winnow, q126 tiles, q206 chunks)
    // approximate. The oracle is the BRUTE-FORCE replay (q108/q184
    // blocking-completeness pattern): every 8-gram materialized, global
    // counts, coverage-run merge — the hash match proves no span was
    // missed or over-extended. Integer-only surface.
    QueryDef(
      "q249_exact_substring_spans",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
              WHERE len(toks) >= 8),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
        r AS (SELECT doc_id, pos,
                CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS nw
              FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        s AS (SELECT doc_id, pos, SUM(nw) OVER
                (PARTITION BY doc_id ORDER BY pos) AS isl FROM r)
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
        FROM s GROUP BY doc_id, isl
        ORDER BY doc_id, span_start"""),
    ) { (s, dir) =>
      TextDedup.exactSubstringSpans(Tables.documents(s, dir), "text",
          "doc_id", minTokens = 8)
        .orderBy("doc_id", "span_start")
    },

    // ---- INCREMENTAL exact-substring spans — q249's per-ingest shape
    // (the q79/q90-family completion): the old corpus's L-gram counts
    // persist once, SATURATED AT 2 (only "duplicated" matters — bounded
    // state per gram no matter how hot); the 20% batch probes
    // batch∪index multiplicities. The oracle is q249's brute-force
    // replay over the WHOLE corpus with the marked set restricted to
    // batch docs — the hash proves incremental == full-over-old∪new.
    QueryDef(
      "q255_incremental_exact_substring",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
              WHERE len(toks) >= 8),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
              WHERE g.doc_id % 5 = 0),
        r AS (SELECT doc_id, pos,
                CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS nw
              FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        s AS (SELECT doc_id, pos, SUM(nw) OVER
                (PARTITION BY doc_id ORDER BY pos) AS isl FROM r)
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
        FROM s GROUP BY doc_id, isl
        ORDER BY doc_id, span_start"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // deterministic overwritten dir per sfDir (the q251 convention)
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_gramcounts_" +
        Integer.toHexString(dir.hashCode)
      TextDedup.writeGramCountIndex(
        docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text", "doc_id",
        minTokens = 8, idxDir)
      TextDedup.incrementalExactSubstringSpans(
          docs.filter(pmod(col("doc_id"), lit(5)) === 0), "text", "doc_id",
          idxDir)
        .orderBy("doc_id", "span_start")
    },

    // ---- the ExactSubstr REMOVER over q249's spans: every covered
    // token dropped from every occurrence (the released tool's default;
    // keep-one variants are q125/q126), scrubbed text hash-checked end
    // to end against the relational rebuild.
    QueryDef(
      "q250_exact_substring_scrub",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
              WHERE len(toks) >= 8),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)),
        cov AS (SELECT DISTINCT doc_id, unnest(range(pos, pos + 8)) AS p
                FROM m),
        nc AS (SELECT doc_id, count(*) AS n_cov FROM cov GROUP BY doc_id),
        tp AS (SELECT doc_id, unnest(toks) AS tok,
                      generate_subscripts(toks, 1) - 1 AS p FROM t),
        kept AS (SELECT tp.doc_id, tp.tok, tp.p FROM tp
                 WHERE NOT EXISTS (SELECT 1 FROM cov
                                   WHERE cov.doc_id = tp.doc_id
                                     AND cov.p = tp.p)),
        sc AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS scrubbed
               FROM kept GROUP BY doc_id)
        SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(nc.n_cov, 0) AS BIGINT) AS n_covered,
               coalesce(sc.scrubbed, '') AS scrubbed_text
        FROM t LEFT JOIN nc USING (doc_id) LEFT JOIN sc USING (doc_id)
        ORDER BY doc_id"""),
    ) { (s, dir) =>
      TextDedup.exactSubstringScrub(Tables.documents(s, dir), "text",
          "doc_id", minTokens = 8)
        .orderBy("doc_id")
    },

    // ---- RETRO-coverage for the incremental exact-substring index
    // (VERDICT r15 task 3): q255 flags the NEW batch's spans; this
    // emits the post-ingest span sets of the OLD docs — prior spans for
    // docs the batch didn't touch, FULL recomputation for docs holding
    // a gram the batch pushed from 1 to 2 (the index's cnt-1 holder ids
    // name them directly: no corpus re-scan). The oracle is q249's
    // brute force over old∪new restricted to OLD docs, so the hash
    // proves splice == full rerun; with q255 covering the batch side,
    // q255 ∪ q256 == q249 over everything (the TextDedupSpec union
    // contract).
    QueryDef(
      "q256_retro_exact_substring",
      Some(raw"""
        WITH t AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
                   FROM documents),
        g AS (SELECT doc_id, i - 1 AS pos,
                     array_to_string(toks[i:i+7], ' ') AS gram
              FROM t, unnest(range(1, len(toks) - 6)) AS u(i)
              WHERE len(toks) >= 8),
        d AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
        m AS (SELECT g.doc_id, g.pos FROM g JOIN d USING (gram)
              WHERE g.doc_id % 5 <> 0),
        r AS (SELECT doc_id, pos,
                CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w > 8 THEN 1 ELSE 0 END AS nw
              FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        s AS (SELECT doc_id, pos, SUM(nw) OVER
                (PARTITION BY doc_id ORDER BY pos) AS isl FROM r)
        SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
               CAST(MAX(pos) + 7 AS BIGINT) AS span_end,
               CAST(MAX(pos) + 8 - MIN(pos) AS BIGINT) AS span_len
        FROM s GROUP BY doc_id, isl
        ORDER BY doc_id, span_start"""),
    ) { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val old = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      val idxDir = s"${System.getProperty("java.io.tmpdir")}/graft_retrogrm_" +
        Integer.toHexString(dir.hashCode)
      TextDedup.writeGramCountIndex(old, "text", "doc_id",
        minTokens = 8, idxDir)
      TextDedup.appendGramCountBatchKeyed(batch, "text", "doc_id",
        idxDir, "ingest1")
      // the prior ledger (persisted in production; recomputed here so
      // the query is self-contained over sfDir)
      val prior = TextDedup.exactSubstringSpans(old, "text", "doc_id",
        minTokens = 8)
      val retro = TextDedup.retroExactSubstringSpans(old, "text", "doc_id",
        idxDir, "ingest1")
      prior.join(retro.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
        .unionByName(retro)
        .orderBy("doc_id", "span_start")
    },
  )
}
