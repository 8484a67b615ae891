package graft.analytics

/** DuckDB oracle SQL for the LSH clustering queries (q55, q73): an
  * INDEPENDENT pure-SQL re-implementation of the XXH64 hash Spark's
  * `xxhash64` uses (public algorithm: Collet's xxHash, also implemented at
  * `org.apache.spark.sql.catalyst.expressions.XXH64`), so the whole
  * MinHash chain — tokenize → hash tokens (seed 42) → 128 seeded
  * min-hashes → per-band hash chaining → LSH star edges → connected
  * components — is hash-checked against an engine that shares no code
  * with Spark.
  *
  * Mechanics worth knowing before editing:
  *  - u64 arithmetic rides on HUGEINT values kept in [0, 2^64); products
  *    detour through UHUGEINT (64×64 bit multiply needs 128 bits) and
  *    reduce mod 2^64. Signed results convert at the boundaries only,
  *    because MinHash minimizes over Java's SIGNED long ordering.
  *  - Every intermediate is its own chained CTE column (SSA style), and
  *    every CTE is AS MATERIALIZED: DuckDB otherwise inlines the chain
  *    into one expression tree that doubles at each rotate/avalanche step
  *    (planning blows up exponentially — measured minutes vs 0.3 s).
  *  - Variable-length string hashing loops over 32-byte stripes with a
  *    recursive CTE; the ≤31-byte tail (≤3 words, one 4-byte read, ≤3
  *    bytes) is unrolled with guards, matching the xxHash spec layout.
  *  - The connected-components closure is a recursive CTE over the
  *    symmetrized edge set; `min(label)` per node is the component
  *    representative — same min-id contract as
  *    [[graft.ops.Components.connectedComponents]].
  */
private[analytics] object DuckXxh {

  private val P1 = "CAST('11400714785074694791' AS HUGEINT)"
  private val P2 = "CAST('14029467366897019727' AS HUGEINT)"
  private val P3 = "CAST('1609587929392839161' AS HUGEINT)"
  private val P4 = "CAST('9650029242287828579' AS HUGEINT)"
  private val P5 = "CAST('2870177450012600261' AS HUGEINT)"
  private val M = "CAST('18446744073709551616' AS HUGEINT)" // 2^64
  private val MU = "CAST('18446744073709551616' AS UHUGEINT)"
  private val HALF = "CAST('9223372036854775808' AS HUGEINT)" // 2^63

  private def mul(a: String, b: String) =
    s"CAST((CAST(($a) AS UHUGEINT) * CAST(($b) AS UHUGEINT)) % $MU AS HUGEINT)"
  private def add(a: String, b: String) = s"((($a) + ($b)) % $M)"
  private def sub(a: String, b: String) = s"((($a) - ($b) + $M) % $M)"
  private def xor(a: String, b: String) = s"xor(($a), ($b))"
  private def shr(a: String, n: Int) = s"(($a) >> $n)"
  private def rotl(a: String, n: Int) =
    s"(((($a) << $n) % $M) + (($a) >> ${64 - n}))"
  private def u64(x: String) =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M ELSE CAST(($x) AS HUGEINT) END)"
  private def signed(x: String) =
    s"CAST(CASE WHEN ($x) >= $HALF THEN ($x) - $M ELSE ($x) END AS BIGINT)"
  // round(0, v) = rotl(v*P2, 31) * P1 — the merge/tail-word round
  private def rr(v: String) = mul(rotl(mul(v, P2), 31), P1)

  /** Little-endian 8-byte word from HUGEINT byte list `bl` at 0-based
    * byte offset `idx0` (SQL expression).
    */
  private def wordExpr(bl: String, idx0: String): String =
    (0 until 8).map(j =>
      s"($bl[($idx0) + ${j + 1}] * CAST('${1L << (8 * j)}' AS HUGEINT))")
      .mkString("(", " + ", ")")

  /** XXH64 avalanche finalizer as SSA stages. */
  private def avalancheStages(pfx: String, h: String): Seq[(String, String)] = Seq(
    s"${pfx}_f1" -> xor(h, shr(h, 33)),
    s"${pfx}_f2" -> mul(s"${pfx}_f1", P2),
    s"${pfx}_f3" -> xor(s"${pfx}_f2", shr(s"${pfx}_f2", 29)),
    s"${pfx}_f4" -> mul(s"${pfx}_f3", P3),
    s"${pfx}_out" -> xor(s"${pfx}_f4", shr(s"${pfx}_f4", 32)),
  )

  /** XXH64 of a fixed 8-byte (long) input as SSA stages: the closed form
    * every MinHash step uses (`XXH64.hashLong` in Spark).
    */
  private def hashLongStages(pfx: String, xU: String, sU: String): Seq[(String, String)] = Seq(
    s"${pfx}_h0" -> add(add(sU, P5), "8::HUGEINT"),
    s"${pfx}_a1" -> mul(xU, P2),
    s"${pfx}_a2" -> rotl(s"${pfx}_a1", 31),
    s"${pfx}_a3" -> mul(s"${pfx}_a2", P1),
    s"${pfx}_h1" -> xor(s"${pfx}_h0", s"${pfx}_a3"),
    s"${pfx}_r1" -> rotl(s"${pfx}_h1", 27),
    s"${pfx}_h2" -> add(mul(s"${pfx}_r1", P1), P4),
  ) ++ avalancheStages(pfx, s"${pfx}_h2")

  /** Materialized CTE chain for [[hashLongStages]]; returns (ctes, last
    * cte name, output column, all u64 HUGEINT).
    */
  private def hashLongChain(pfx: String, xU: String, sU: String,
      srcCte: String): (Seq[String], String, String) = {
    var prev = srcCte
    val ctes = hashLongStages(pfx, xU, sU).zipWithIndex.map {
      case ((col, expr), i) =>
        val nm = s"${pfx}_c$i"
        val c = s"$nm AS MATERIALIZED (SELECT *, $expr AS $col FROM $prev)"
        prev = nm
        c
    }
    (ctes, prev, s"${pfx}_out")
  }

  /** CTEs computing xxhash64(tok) (UTF-8 bytes, seed 42 — Spark's
    * single-argument form) for every row of `srcSql`, which must expose a
    * string column `tok` with DISTINCT values (the stripe loop's
    * closing LEFT JOIN keys on `tok`, so duplicates would fan out).
    * Final CTE `${pfx}str_final` carries srcSql's columns plus `xh_out`
    * (u64 HUGEINT). `pfx` namespaces the CTE chain so two chains can
    * coexist in one query (e.g. gram hashes + digest hashes in
    * [[winnowFingerprintsOracle]]).
    */
  private def xxhStrCtes(srcSql: String, pfx: String = "x"): Seq[String] = {
    val seed = "42::HUGEINT"
    val hexmap = "strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))*16 + " +
      "strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17"
    val stripeRounds = (0 until 4).map { i =>
      mul(rotl(add(s"v${i + 1}", mul(wordExpr("bl", s"32*k + ${8 * i}"), P2)), 31), P1)
    }.mkString(", ")
    val head = Seq(
      s"${pfx}src AS MATERIALIZED ($srcSql)",
      s"${pfx}meta0 AS MATERIALIZED (SELECT *, hex(encode(tok)) AS hx, " +
        s"octet_length(encode(tok)) AS blen FROM ${pfx}src)",
      s"${pfx}meta AS MATERIALIZED (SELECT *, CAST([CAST($hexmap AS HUGEINT) " +
        "for i in range(1, blen + 1)] AS HUGEINT[]) AS bl, " +
        s"CAST(CASE WHEN blen >= 32 THEN blen // 32 ELSE 0 END AS INT) AS nbl FROM ${pfx}meta0)",
      s"${pfx}meta2 AS MATERIALIZED (SELECT *, CAST((blen - 32*nbl) // 8 AS INT) AS nw, " +
        s"(blen - 32*nbl - 8*((blen - 32*nbl) // 8)) >= 4 AS has4 FROM ${pfx}meta)",
      s"${pfx}meta3 AS MATERIALIZED (SELECT *, CAST(blen - 32*nbl - 8*nw - " +
        s"(CASE WHEN has4 THEN 4 ELSE 0 END) AS INT) AS nbytes, 32*nbl + 8*nw AS o4 FROM ${pfx}meta2)",
      // 32-byte stripe loop (recursive): v1..v4 accumulators, one step per stripe
      s"${pfx}blk AS (SELECT tok, bl, nbl, 0 AS k, " +
        s"${add(add(seed, P1), P2)} AS v1, ${add(seed, P2)} AS v2, " +
        s"CAST($seed AS HUGEINT) AS v3, ${sub(seed, P1)} AS v4 FROM ${pfx}meta3 WHERE nbl > 0 " +
        s"UNION ALL SELECT tok, bl, nbl, k+1, $stripeRounds FROM ${pfx}blk WHERE k < nbl)",
      s"${pfx}blkd AS MATERIALIZED (SELECT tok, v1, v2, v3, v4 FROM ${pfx}blk WHERE k = nbl)",
      s"${pfx}mrg0 AS MATERIALIZED (SELECT *, ${add(add(rotl("v1", 1), rotl("v2", 7)), add(rotl("v3", 12), rotl("v4", 18)))} AS mh0 FROM ${pfx}blkd)",
      s"${pfx}mrg1 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh0", rr("v1")), P1), P4)} AS mh1 FROM ${pfx}mrg0)",
      s"${pfx}mrg2 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh1", rr("v2")), P1), P4)} AS mh2 FROM ${pfx}mrg1)",
      s"${pfx}mrg3 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh2", rr("v3")), P1), P4)} AS mh3 FROM ${pfx}mrg2)",
      s"${pfx}mrg4 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh3", rr("v4")), P1), P4)} AS mh4 FROM ${pfx}mrg3)",
      s"${pfx}h0 AS MATERIALIZED (SELECT m.*, CASE WHEN m.nbl = 0 THEN ${add(seed, P5)} " +
        s"ELSE g.mh4 END AS h0 FROM ${pfx}meta3 m LEFT JOIN ${pfx}mrg4 g USING (tok))",
    )
    val stages = scala.collection.mutable.ArrayBuffer[(String, String)]()
    stages += ("th0" -> add("h0", "CAST(blen AS HUGEINT)"))
    var prev = "th0"
    for (j <- 0 until 3) { // ≤3 tail 8-byte words ((blen % 32) / 8)
      stages += (s"tw$j" -> s"CASE WHEN nw > $j THEN ${wordExpr("bl", s"32*nbl + ${8 * j}")} ELSE 0::HUGEINT END")
      stages += (s"twr$j" -> rr(s"tw$j"))
      stages += (s"tx$j" -> xor(prev, s"twr$j"))
      stages += (s"tr$j" -> rotl(s"tx$j", 27))
      stages += (s"th${j + 1}" -> s"CASE WHEN nw > $j THEN ${add(mul(s"tr$j", P1), P4)} ELSE $prev END")
      prev = s"th${j + 1}"
    }
    val w4 = (0 until 4).map(j =>
      s"(bl[o4 + ${j + 1}] * CAST('${1L << (8 * j)}' AS HUGEINT))").mkString(" + ")
    stages += ("fw4" -> s"CASE WHEN has4 THEN ($w4) ELSE 0::HUGEINT END")
    stages += ("fx4" -> xor(prev, mul("fw4", P1)))
    stages += ("fr4" -> rotl("fx4", 23))
    stages += ("fh4" -> s"CASE WHEN has4 THEN ${add(mul("fr4", P2), P3)} ELSE $prev END")
    prev = "fh4"
    for (j <- 0 until 3) { // ≤3 trailing bytes
      val ob = s"o4 + (CASE WHEN has4 THEN 4 ELSE 0 END) + ${j + 1}"
      stages += (s"bb$j" -> s"CASE WHEN nbytes > $j THEN bl[$ob] ELSE 0::HUGEINT END")
      stages += (s"bx$j" -> xor(prev, mul(s"bb$j", P5)))
      stages += (s"br$j" -> rotl(s"bx$j", 11))
      stages += (s"bh${j + 1}" -> s"CASE WHEN nbytes > $j THEN ${mul(s"br$j", P1)} ELSE $prev END")
      prev = s"bh${j + 1}"
    }
    stages ++= avalancheStages("xh", prev)
    var prevCte = s"${pfx}h0"
    val tail = stages.zipWithIndex.map { case ((col, expr), i) =>
      val nm = s"${pfx}st$i"
      val c = s"$nm AS MATERIALIZED (SELECT *, $expr AS $col FROM $prevCte)"
      prevCte = nm
      c
    }
    head ++ tail :+ s"${pfx}str_final AS MATERIALIZED (SELECT * EXCLUDE (hx, bl) FROM $prevCte)"
  }

  /** Recursive min-label closure over `symCte` (src, dst — already
    * symmetrized) from `nodesSql` (one `id` column): the oracle twin of
    * [[graft.ops.Components.connectedComponents]]'s min-id contract.
    */
  private def reachSql(nodesSql: String, symCte: String): String =
    s"reach AS (SELECT id, id AS lab FROM ($nodesSql) " +
      s"UNION SELECT e.dst AS id, r.lab FROM reach r JOIN $symCte e ON e.src = r.id)"

  private val toksExpr = "list_distinct(string_split_regex(trim(text), '\\s+'))"

  /** CTE chain ending in `buckets(doc_id, b, bh)` — every document's LSH
    * band hashes, the shared head of the q55/q38/q79 oracles: tokenize →
    * xxhash64 each distinct token (seed 42) → `numHashes` seeded
    * min-hashes → per-band chained hashLong. Mirrors
    * [[graft.ops.TextDedup.minhashSignatures]] bit for bit.
    */
  private def bucketsCtes(numHashes: Int, bands: Int): Vector[String] = {
    val rpb = numHashes / bands
    require(numHashes % bands == 0, "numHashes must divide into bands")
    var ctes = xxhStrCtes(
      s"SELECT DISTINCT unnest($toksExpr) AS tok FROM documents").toVector
    ctes ++= Seq(
      s"doctok AS MATERIALIZED (SELECT doc_id, unnest($toksExpr) AS tok FROM documents)",
      s"seeds AS MATERIALIZED (SELECT unnest(range(0, $numHashes)) AS i)",
      "vhs AS MATERIALIZED (SELECT tok, xh_out, CAST(i AS HUGEINT) AS i_u, i " +
        "FROM xstr_final CROSS JOIN seeds)",
    )
    val (sigCtes, sigLast, sigOut) = hashLongChain("sg", "xh_out", "i_u", "vhs")
    ctes ++= sigCtes
    ctes ++= Seq(
      s"vh2 AS MATERIALIZED (SELECT tok, i, ${signed(sigOut)} AS hv FROM $sigLast)",
      "sig AS MATERIALIZED (SELECT d.doc_id, v.i, min(v.hv) AS s " +
        "FROM doctok d JOIN vh2 v USING (tok) GROUP BY d.doc_id, v.i)",
      s"bsig AS MATERIALIZED (SELECT doc_id, CAST(i // $rpb AS INT) AS b, " +
        (0 until rpb).map(j => s"max(CASE WHEN i % $rpb = $j THEN s END) AS s$j")
          .mkString(", ") + " FROM sig GROUP BY doc_id, b)",
      "acc0t AS MATERIALIZED (SELECT *, CAST(b AS HUGEINT) AS acc0 FROM bsig)",
    )
    var prevCte = "acc0t"
    var acc = "acc0"
    for (j <- 0 until rpb) { // band hash: chained hashLong over the band's signature rows
      val (cs, last, out) = hashLongChain(s"bd$j", u64(s"s$j"), acc, prevCte)
      ctes ++= cs
      prevCte = last
      acc = out
    }
    ctes :+
      s"buckets AS MATERIALIZED (SELECT doc_id, b, ${signed(acc)} AS bh FROM $prevCte)"
  }

  /** The q55 oracle: MinHash-LSH dedup clusters over `documents` with the
    * given signature shape (mirrors
    * [[graft.ops.TextDedup.minhashDedupClusters]] defaults).
    */
  def minhashClustersOracle(numHashes: Int = 128, bands: Int = 32): String = {
    val ctes = bucketsCtes(numHashes, bands) ++ Seq(
      "withrep AS MATERIALIZED (SELECT doc_id, min(doc_id) OVER (PARTITION BY b, bh) AS rep FROM buckets)",
      "star AS MATERIALIZED (SELECT DISTINCT doc_id AS src, rep AS dst FROM withrep WHERE doc_id != rep)",
      "sym AS MATERIALIZED (SELECT src, dst FROM star UNION SELECT dst, src FROM star)",
      reachSql("SELECT doc_id AS id FROM documents", "sym"),
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT id, min(lab) AS cluster_rep FROM reach GROUP BY id ORDER BY id"
  }

  /** The q230 oracle: the q55 cluster assignment folded to its SIZE
    * DISTRIBUTION — per cluster size, how many clusters and how many
    * documents. Same recursive-CTE component chain, two more
    * aggregations. */
  def minhashClusterSizesOracle(numHashes: Int = 128, bands: Int = 32): String = {
    val ctes = bucketsCtes(numHashes, bands) ++ Seq(
      "withrep AS MATERIALIZED (SELECT doc_id, min(doc_id) OVER (PARTITION BY b, bh) AS rep FROM buckets)",
      "star AS MATERIALIZED (SELECT DISTINCT doc_id AS src, rep AS dst FROM withrep WHERE doc_id != rep)",
      "sym AS MATERIALIZED (SELECT src, dst FROM star UNION SELECT dst, src FROM star)",
      reachSql("SELECT doc_id AS id FROM documents", "sym"),
      "clus AS (SELECT id, min(lab) AS rep FROM reach GROUP BY id)",
      "sz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM clus GROUP BY rep)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      """
SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM sz GROUP BY cluster_size ORDER BY cluster_size"""
  }

  /** The q239 oracle: quality-aware canonical selection per dedup
    * cluster — the q55 component chain, then each cluster keeps its
    * HIGHEST-vocabulary member (max distinct whitespace tokens, tie
    * min doc_id) instead of the min-id convention. Integer-only argmax,
    * replayed with the same recursive-CTE chain plus one window. */
  def canonicalSelectOracle(numHashes: Int = 128, bands: Int = 32): String = {
    val ctes = bucketsCtes(numHashes, bands) ++ Seq(
      "withrep AS MATERIALIZED (SELECT doc_id, min(doc_id) OVER (PARTITION BY b, bh) AS rep FROM buckets)",
      "star AS MATERIALIZED (SELECT DISTINCT doc_id AS src, rep AS dst FROM withrep WHERE doc_id != rep)",
      "sym AS MATERIALIZED (SELECT src, dst FROM star UNION SELECT dst, src FROM star)",
      reachSql("SELECT doc_id AS id FROM documents", "sym"),
      "clus AS (SELECT id, min(lab) AS rep FROM reach GROUP BY id)",
      raw"qual AS MATERIALIZED (SELECT doc_id, CAST(len(list_distinct(" +
        raw"string_split_regex(trim(text), '\s+'))) AS BIGINT) AS nd FROM documents)",
      "rk AS (SELECT c.rep, c.id, q.nd, row_number() OVER " +
        "(PARTITION BY c.rep ORDER BY q.nd DESC, c.id) AS rn " +
        "FROM clus c JOIN qual q ON q.doc_id = c.id)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT r.rep AS cluster_rep, s.cluster_size, " +
      "r.id AS canonical_id, r.nd AS canonical_nd " +
      "FROM rk r JOIN (SELECT rep, CAST(COUNT(*) AS BIGINT) AS cluster_size " +
      "FROM clus GROUP BY rep) s USING (rep) " +
      "WHERE r.rn = 1 ORDER BY cluster_rep"
  }

  /** The q38 oracle: MinHash-LSH near-dup pairs — candidates share ≥1
    * band bucket, verified by exact token-set Jaccard ≥ threshold
    * (mirrors [[graft.ops.TextDedup.minhashNearDups]]; Jaccard over the
    * string token sets equals Jaccard over the hashed sets the engine
    * intersects, xxhash64 being collision-free at this corpus size). The
    * engine's viral-bucket cap is deliberately ABSENT: it cannot fire at
    * oracle scale (a bucket holds at most all docs, and sf0.01's 500 <
    * maxBucket=1000), so modelling it would be dead SQL.
    */
  def minhashNearDupsOracle(threshold: Double, numHashes: Int = 128,
      bands: Int = 32): String = {
    val ctes = bucketsCtes(numHashes, bands) ++ Seq(
      "cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b " +
        "FROM buckets a JOIN buckets b ON a.b = b.b AND a.bh = b.bh " +
        "AND a.doc_id < b.doc_id)",
      s"dtoks AS MATERIALIZED (SELECT doc_id, $toksExpr AS toks FROM documents)",
      "verif AS MATERIALIZED (SELECT id_a, id_b, " +
        "CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE) " +
        "/ (len(ta.toks) + len(tb.toks) - len(list_intersect(ta.toks, tb.toks))) AS jaccard " +
        "FROM cand JOIN dtoks ta ON ta.doc_id = id_a JOIN dtoks tb ON tb.doc_id = id_b)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      s"\nSELECT id_a, id_b, jaccard FROM verif WHERE jaccard >= $threshold " +
      "ORDER BY id_a, id_b"
  }

  /** The q79 oracle: incremental MinHash near-dups — every (new, old)
    * doc pair sharing ≥1 band bucket, where "new" is the doc_id % 5 = 0
    * ingest slice and "old" is the indexed remainder (mirrors
    * [[graft.ops.TextDedup.incrementalNearDups]] and the q79 registration;
    * both sides hash through the same signature chain, exactly as the
    * probe requires params-matching the index). LSH-level pairs, no
    * Jaccard verify; the cap cannot fire at oracle scale (see
    * [[minhashNearDupsOracle]]).
    */
  def incrementalNearDupsOracle(numHashes: Int = 128, bands: Int = 32): String = {
    val ctes = bucketsCtes(numHashes, bands)
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old " +
      "FROM buckets n JOIN buckets o ON n.b = o.b AND n.bh = o.bh " +
      "WHERE n.doc_id % 5 = 0 AND o.doc_id % 5 != 0 " +
      "ORDER BY id_new, id_old"
  }

  /** The q39 oracle: SimHash near-dup pairs. Per-doc 64-bit SimHash (bit
    * j set iff strictly more of the doc's distinct-token xxhash64 values
    * have bit j set than clear — mirrors [[graft.functions.SimHash64]]'s
    * counts(j) > 0), then ALL pairs at Hamming distance ≤ maxHamming.
    * The engine's 16-bit-chunk candidate filter needs no modelling:
    * maxHamming < 4 chunks means any qualifying pair shares a chunk by
    * pigeonhole, so the engine's output is exactly the Hamming ball —
    * the same argument its own pigeonhole-exactness contract test makes.
    */
  def simhashNearDupsOracle(maxHamming: Int = 3): String = {
    require(maxHamming < 4,
      "pigeonhole exactness (and hence this oracle) needs maxHamming < #chunks = 4")
    // (xh_out >> j) % 2 rather than & 1: HUGEINT bit-ops are spottier
    // than arithmetic; for non-negative values they agree
    val bitSums = (0 until 64)
      .map(j => s"SUM(CAST((xh_out >> $j) % 2 AS BIGINT)) AS b$j").mkString(", ")
    // strict majority: ones − zeros > 0  ⇔  2·ones > n
    val shExpr = (0 until 64)
      .map(j => s"(CASE WHEN 2*b$j > n THEN CAST('${BigInt(1) << j}' AS HUGEINT) " +
        "ELSE 0::HUGEINT END)")
      .mkString(" + ")
    val ctes = xxhStrCtes(
      s"SELECT DISTINCT unnest($toksExpr) AS tok FROM documents").toVector ++ Seq(
      s"doctok AS MATERIALIZED (SELECT doc_id, unnest($toksExpr) AS tok FROM documents)",
      "dh AS MATERIALIZED (SELECT d.doc_id, x.xh_out FROM doctok d " +
        "JOIN xstr_final x USING (tok))",
      s"bits AS MATERIALIZED (SELECT doc_id, count(*) AS n, $bitSums FROM dh GROUP BY doc_id)",
      s"shs AS MATERIALIZED (SELECT doc_id, ${signed(s"($shExpr)")} AS sh FROM bits)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming " +
      "FROM shs a JOIN shs b ON a.doc_id < b.doc_id " +
      s"WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming " +
      "ORDER BY id_a, id_b"
  }

  /** The q63 oracle: winnowing fingerprints (Schleimer/Wilkerson/Aiken).
    * Mirrors [[graft.analytics.TextQueries]] q63 exactly: hash every char
    * k-gram (substr is character-based in both engines), take the min of
    * each sliding window of w hashes over Java's SIGNED long order,
    * de-duplicate keeping FIRST-OCCURRENCE order (the digest is
    * order-sensitive), and xxhash64 the comma-joined decimal rendering —
    * which needs a SECOND hash chain, namespaced by the `pfx` parameter,
    * over the (distinct) digest strings. Docs with fewer than w grams
    * yield the single global min, exactly like
    * [[graft.functions.WinnowMins]]'s short-input branch.
    */
  /** Shared winnow head: gram rows, the gram-hash chain, per-doc window
    * minima over full windows, and first-occurrence dedup — the common
    * prefix of the q63 fingerprint and q83 dup-pair oracles. Ends with
    * CTEs `grams(doc_id, pos, tok)`, `gh(doc_id, pos, tok, h)`,
    * `gcnt(doc_id, n)`, `firstocc(doc_id, m, fp)`.
    */
  private def winnowHeadCtes(k: Int, w: Int): Seq[String] = {
    val gramCtes = Seq(
      // one row per gram position; a doc shorter than k chars is its own
      // single gram (charGramHashes' `when(length < k)` branch)
      s"gpos AS MATERIALIZED (SELECT doc_id, text, " +
        s"CAST(unnest(range(1, greatest(length(text) - ${k - 2}, 2))) AS INT) AS pos " +
        "FROM documents)",
      s"grams AS MATERIALIZED (SELECT doc_id, pos, " +
        s"CASE WHEN length(text) < $k THEN text ELSE substr(text, pos, $k) END AS tok " +
        "FROM gpos)",
    )
    val chain1 = xxhStrCtes("SELECT DISTINCT tok FROM grams")
    gramCtes ++ chain1 ++ Seq(
      s"gh AS MATERIALIZED (SELECT g.doc_id, g.pos, g.tok, ${signed("x.xh_out")} AS h " +
        "FROM grams g JOIN xstr_final x USING (tok))",
      "gcnt AS MATERIALIZED (SELECT doc_id, count(*) AS n FROM gh GROUP BY doc_id)",
      "wmin AS MATERIALIZED (SELECT g.doc_id, g.pos, " +
        s"min(g.h) OVER (PARTITION BY g.doc_id ORDER BY g.pos " +
        s"ROWS BETWEEN ${w - 1} PRECEDING AND CURRENT ROW) AS m " +
        s"FROM gh g JOIN gcnt c USING (doc_id) WHERE c.n >= $w)",
      // full windows only; first-occurrence position per distinct min
      s"firstocc AS MATERIALIZED (SELECT doc_id, m, min(pos) AS fp " +
        s"FROM wmin WHERE pos >= $w GROUP BY doc_id, m)",
    )
  }

  def winnowFingerprintsOracle(k: Int = 5, w: Int = 8): String = {
    val winnowCtes = Seq(
      "fps AS MATERIALIZED (" +
        "SELECT doc_id, list(m ORDER BY fp) AS l FROM firstocc GROUP BY doc_id " +
        "UNION ALL " +
        "SELECT g.doc_id, [min(g.h)] AS l FROM gh g JOIN gcnt c USING (doc_id) " +
        s"WHERE c.n < $w GROUP BY g.doc_id)",
      "dstr AS MATERIALIZED (SELECT doc_id, array_to_string(l, ',') AS tok, " +
        "len(l) AS nf FROM fps)",
    )
    val chain2 = xxhStrCtes("SELECT DISTINCT tok FROM dstr", "y")
    val ctes = winnowHeadCtes(k, w) ++ winnowCtes ++ chain2
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT d.doc_id, CAST(d.nf AS INTEGER) AS n_fingerprints, " +
      s"${signed("y.xh_out")} AS fp_digest " +
      "FROM dstr d JOIN ystr_final y USING (tok) ORDER BY d.doc_id"
  }

  /** The q83 oracle: winnow-blocked exact-substring near-dup pairs.
    * Selected hashes per doc are the full-window distinct minima (plus the
    * global min for short docs — [[graft.functions.WinnowSelect]]'s short
    * branch); selected GRAMS are the gram strings carrying those hashes;
    * pairs share >= `minShared` selected gram strings. Mirrors
    * [[graft.ops.TextDedup.winnowDupPairs]] (whose `maxDf` cap cannot fire
    * at oracle scale: every df <= 500 docs < 1000, same argument as the
    * q38 cap).
    */
  def winnowDupPairsOracle(k: Int = 12, w: Int = 10,
      minShared: Int = 2): String = {
    val ctes = winnowHeadCtes(k, w) ++ Seq(
      "selh AS MATERIALIZED (SELECT doc_id, m FROM firstocc " +
        "UNION ALL SELECT g.doc_id, min(g.h) AS m FROM gh g " +
        s"JOIN gcnt c USING (doc_id) WHERE c.n < $w GROUP BY g.doc_id)",
      "selg AS MATERIALIZED (SELECT DISTINCT g.doc_id, g.tok FROM selh s " +
        "JOIN gh g ON g.doc_id = s.doc_id AND g.h = s.m)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared " +
      "FROM selg a JOIN selg b ON a.tok = b.tok AND a.doc_id < b.doc_id " +
      s"GROUP BY id_a, id_b HAVING count(*) >= $minShared " +
      "ORDER BY id_a, id_b"
  }

  /** The q84 oracle: seeded deterministic corpus shuffle/sharding —
    * h = xxhash64(doc_id) (Spark's `XXH64.hashLong`, seed 42, re-derived
    * through [[hashLongChain]]), shard = pmod(h, nShards), pos = rank of h
    * within the shard (ties to doc_id). Mirrors the q84 registration in
    * `RankQueries`.
    */
  /** The q156 oracle: seeded ±1 random projection of `embeddings` —
    * sign(i,j) = parity of xxhash64(i·dOut + j) through this module's
    * XXH64 chain, signed sums as exact DECIMAL(38,6), one double divide
    * by the same √dOut literal Spark uses (mirrors
    * [[graft.ops.VectorSim.signProject]] bit for bit).
    */
  def signProjectOracle(dIn: Int, dOut: Int): String = {
    val (ctes, last, out) = hashLongChain("sp",
      u64("CAST(pk AS HUGEINT)"), "42::HUGEINT", "pj0")
    val all = Seq(
      s"pj0 AS MATERIALIZED (SELECT CAST(t1.i AS INT) AS i, " +
        s"CAST(t2.j AS INT) AS j, t1.i * $dOut + t2.j AS pk " +
        s"FROM range($dIn) t1(i), range($dOut) t2(j))") ++ ctes ++ Seq(
      s"sgn AS MATERIALIZED (SELECT i, j, ($out) % 2 = 0 AS pos FROM $last)",
      s"ex AS MATERIALIZED (SELECT vec_id, CAST(r.i0 AS INT) AS i, " +
        "CAST(embedding[CAST(r.i0 AS INT) + 1] AS DOUBLE) AS x " +
        s"FROM embeddings, range($dIn) r(i0))",
      "pr AS (SELECT e.vec_id, s.j AS dim, " +
        "CAST(SUM(CASE WHEN s.pos THEN CAST(e.x AS DECIMAL(38,6)) " +
        "ELSE -CAST(e.x AS DECIMAL(38,6)) END) AS DOUBLE) / " +
        s"CAST(${math.sqrt(dOut.toDouble)} AS DOUBLE) AS value " +
        "FROM ex e JOIN sgn s ON e.i = s.i GROUP BY 1, 2)",
    )
    "WITH " + all.mkString(",\n") +
      "\nSELECT vec_id, dim, value FROM pr ORDER BY vec_id, dim"
  }

  def shardAssignOracle(nShards: Int): String = {
    val (ctes, last, out) = hashLongChain("sh",
      u64("CAST(doc_id AS HUGEINT)"), "42::HUGEINT", "shsrc")
    val all = Seq("shsrc AS MATERIALIZED (SELECT doc_id FROM documents)") ++
      ctes ++ Seq(
      s"hsh AS MATERIALIZED (SELECT doc_id, ${signed(out)} AS h FROM $last)",
      s"sh2 AS MATERIALIZED (SELECT doc_id, h, " +
        s"CAST(((h % $nShards) + $nShards) % $nShards AS INT) AS shard FROM hsh)",
    )
    "WITH " + all.mkString(",\n") +
      "\nSELECT doc_id, h, shard, CAST(row_number() OVER " +
      "(PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos " +
      "FROM sh2 ORDER BY doc_id"
  }

  /** The q236 oracle: domain-disjoint train/val split. Replays the whole
    * chain — planted-URL host extraction, the PSL registrable-domain
    * fold (lowercase, port strip, longest-match suffix walk over the
    * [[PslSql]]-generated inline rule lists), the FULL XXH64 of the
    * domain STRING (seed 42, mirroring Spark's `xxhash64`), and the
    * bucket rule — so any slip anywhere in the Spark path
    * hash-mismatches. `valBuckets` of `nBuckets` hash buckets go to
    * 'val'; every doc of a domain lands on one side by construction
    * (leakage-safe).
    */
  def domainSplitOracle(valBuckets: Int = 1, nBuckets: Int = 10): String = {
    val ctes = Seq(
      PslSql.foldCtes("documents",
        "regexp_extract('https://Sub' || (doc_id % 7) || '.Site' || " +
          "(doc_id % 101) || '.ORG:8443/d/' || doc_id, " +
          "'https?://([A-Za-z0-9.-]+(:[0-9]+)?)', 1)",
        Seq("doc_id"), "dd1", "dom"),
      "dd AS MATERIALIZED (SELECT doc_id, dom FROM dd1)",
    ) ++ xxhStrCtes("SELECT DISTINCT dom AS tok FROM dd") ++ Seq(
      s"sp AS MATERIALIZED (SELECT tok AS dom, ${signed("xh_out")} AS h " +
        "FROM xstr_final)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT dd.doc_id, dd.dom AS domain, " +
      s"CASE WHEN ((sp.h % $nBuckets) + $nBuckets) % $nBuckets < $valBuckets " +
      "THEN 'val' ELSE 'train' END AS split " +
      "FROM dd JOIN sp USING (dom) ORDER BY dd.doc_id"
  }

  /** The q202 oracle: a FULL SQL replay of the count-min sketch over
    * events.user_id — bucket = pmod(xxhash64(user_id·depth + d), width)
    * through the same XXH64 chain, cells aggregated over all events,
    * point estimates as min-over-depth of each key's cells. Integer-only,
    * collisions included, so the hash match proves the sketch EXACTLY
    * (not merely within the ε·n bound).
    */
  def cmSketchOracle(width: Int, depth: Int): String = {
    val ds = (0 until depth).map(d => s"($d)").mkString(", ")
    val (ctes, last, out) = hashLongChain("cm",
      u64(s"CAST(user_id * $depth + d AS HUGEINT)"), "42::HUGEINT", "cmsrc")
    val all = Seq(
      "ev AS MATERIALIZED (SELECT user_id FROM events)",
      s"cmsrc AS MATERIALIZED (SELECT DISTINCT user_id, d " +
        s"FROM ev CROSS JOIN (VALUES $ds) AS dd(d))",
    ) ++ ctes ++ Seq(
      s"hb AS MATERIALIZED (SELECT user_id, d, " +
        s"CAST(((${signed(out)} % $width) + $width) % $width AS BIGINT) " +
        s"AS bucket FROM $last)",
      "cells AS MATERIALIZED (SELECT d, bucket, count(*) AS cnt " +
        "FROM ev JOIN hb USING (user_id) GROUP BY d, bucket)",
      "est AS (SELECT user_id, CAST(min(cnt) AS BIGINT) AS cm_est " +
        "FROM hb JOIN cells USING (d, bucket) GROUP BY user_id)",
      "exact AS (SELECT user_id, count(*) AS exact_cnt FROM ev GROUP BY user_id)",
    )
    "WITH " + all.mkString(",\n") +
      "\nSELECT user_id, exact_cnt, cm_est, cm_est - exact_cnt AS overcount " +
      "FROM exact JOIN est USING (user_id) ORDER BY user_id"
  }

  /** The q91 oracle: token-budget mixture over `documents` — per source,
    * keep docs in xxhash64(doc_id) order while the cumulative n_chars
    * BEFORE the doc is under the source's budget
    * `base + step * <numeric suffix of source>`. Mirrors
    * [[graft.ops.CorpusOps.budgetSample]]'s greedy fill exactly
    * (integer-only — no float surface).
    */
  /** The q183 oracle: deterministic Poisson(1) bootstrap CI over the
    * per-customer spend metric. Replicate weights derive from
    * xxhash64(ck*B + b) mod 1e6 against the integer inverse-CDF
    * thresholds interpolated by the caller — the same draws the engine
    * makes — then replicate means and exact interpolating percentiles.
    */
  def bootstrapCiOracle(b: Int, thresholds: Seq[Long]): String = {
    val (ctes, last, out) = hashLongChain("bs",
      u64("CAST(ck * " + b + " + rb AS HUGEINT)"), "42::HUGEINT", "bssrc")
    val caseW = thresholds.zipWithIndex
      .map { case (t, k) => s"WHEN bucket < $t THEN $k" }
      .mkString(" ") + s" ELSE ${thresholds.length}"
    val all = Seq(
      "bsy AS MATERIALIZED (SELECT o_custkey AS ck, " +
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS x " +
        "FROM orders GROUP BY o_custkey)",
      s"bssrc AS MATERIALIZED (SELECT ck, x, CAST(r.b AS BIGINT) AS rb " +
        s"FROM bsy, range($b) r(b))") ++ ctes ++ Seq(
      s"hbs AS MATERIALIZED (SELECT ck, x, rb, " +
        s"CAST((((${signed(out)}) % 1000000) + 1000000) % 1000000 AS BIGINT) AS bucket FROM $last)",
      s"wbs AS (SELECT ck, x, rb, CASE $caseW END AS w FROM hbs)",
      "rep AS (SELECT rb, CAST(SUM(w) AS BIGINT) AS nw, " +
        "CAST(SUM(CAST(w * x AS DECIMAL(38,6))) AS DOUBLE) AS wx FROM wbs GROUP BY rb)",
      "rm AS (SELECT rb, wx / nw AS mean_b FROM rep)",
      "pt AS (SELECT COUNT(*) AS n, " +
        "CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS mean FROM bsy)",
    )
    "WITH " + all.mkString(",\n") +
      s"""
      SELECT (SELECT n FROM pt) AS n, (SELECT mean FROM pt) AS mean,
             quantile_cont(mean_b, 0.025) AS ci_lo,
             quantile_cont(mean_b, 0.975) AS ci_hi,
             COUNT(*) AS n_replicates
      FROM rm"""
  }

  def budgetSampleOracle(base: Long, step: Long): String = {
    val (ctes, last, out) = hashLongChain("bg",
      u64("CAST(doc_id AS HUGEINT)"), "42::HUGEINT", "bgsrc")
    val all = Seq(
      "bgsrc AS MATERIALIZED (SELECT doc_id, source, n_chars FROM documents)") ++
      ctes ++ Seq(
      s"hbg AS MATERIALIZED (SELECT doc_id, source, n_chars, ${signed(out)} AS h FROM $last)",
      s"""wbg AS (SELECT doc_id, source, n_chars, h,
             $base + $step * CAST(substring(source, 4) AS BIGINT) AS budget,
             CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS INT) AS pos,
             COALESCE(CAST(SUM(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cum_before
           FROM hbg)""",
    )
    "WITH " + all.mkString(",\n") +
      "\nSELECT doc_id, source, n_chars, h, pos, cum_before FROM wbg " +
      "WHERE cum_before < budget ORDER BY doc_id"
  }

  /** The q73 oracle: connected components over exact cosine-threshold
    * pairs of `embeddings`. The dot product folds left-to-right in double
    * over the float elements — the same accumulation order as
    * [[graft.functions.DotProductF32]], so cosines (and therefore the
    * threshold edge set) are bit-identical.
    */
  def cosineClustersOracle(threshold: Double, dim: Int = 64): String = {
    def dot(a: String, b: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> " +
        s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (acc, x) -> acc + x)"
    val ctes = Seq(
      s"base AS MATERIALIZED (SELECT vec_id, embedding, sqrt(${dot("embedding", "embedding")}) AS nrm FROM embeddings)",
      "pairs AS MATERIALIZED (SELECT a.vec_id AS src, b.vec_id AS dst " +
        "FROM base a JOIN base b ON a.vec_id < b.vec_id " +
        s"WHERE ${dot("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= $threshold)",
      "sym AS MATERIALIZED (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs)",
      reachSql("SELECT vec_id AS id FROM embeddings", "sym"),
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT id, min(lab) AS cluster_rep FROM reach GROUP BY id ORDER BY id"
  }

  /** Shared CTE chain for the q102/q103 oracles: per-doc DSIR-style
    * importance statistics over `documents` (mirrors
    * [[graft.ops.CorpusOps.importanceWeights]] — word unigrams + bigrams
    * with multiplicity, bucket = pmod(xxhash64(gram), numBuckets), Laplace
    * +1 bucket counts from `targetPred` docs vs the rest, integer-exact
    * micro-averaged ratio score). Ends in a `w` CTE with
    * (doc_id, is_target, n_grams, sum_t, sum_r, score).
    */
  private def importanceCtes(numBuckets: Int, targetPred: String): Seq[String] = {
    val uniq = xxhStrCtes("SELECT DISTINCT gram AS tok FROM grams")
    Seq(
      s"dtk AS MATERIALIZED (SELECT doc_id, ($targetPred) AS t, " +
        "string_split_regex(trim(text), '\\s+') AS tk FROM documents)",
      "uni AS (SELECT doc_id, unnest(tk) AS gram FROM dtk)",
      "bi AS (SELECT doc_id, tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS gram " +
        "FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM dtk WHERE len(tk) >= 2))",
      "grams AS MATERIALIZED (SELECT doc_id, gram FROM uni " +
        "UNION ALL SELECT doc_id, gram FROM bi)",
    ) ++ uniq ++ Seq(
      s"bkt AS MATERIALIZED (SELECT tok, ((${signed("xh_out")} % $numBuckets) " +
        s"+ $numBuckets) % $numBuckets AS b FROM xstr_final)",
      "gbt AS MATERIALIZED (SELECT g.doc_id, d.t, x.b FROM grams g " +
        "JOIN bkt x ON g.gram = x.tok JOIN dtk d ON g.doc_id = d.doc_id)",
      "bc AS MATERIALIZED (SELECT b, " +
        "CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tc, " +
        "CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS rc " +
        "FROM gbt GROUP BY b)",
      "w AS MATERIALIZED (SELECT gbt.doc_id, gbt.t AS is_target, " +
        "CAST(count(*) AS BIGINT) AS n_grams, " +
        "CAST(sum(tc + 1) AS BIGINT) AS sum_t, " +
        "CAST(sum(rc + 1) AS BIGINT) AS sum_r, " +
        "CAST((1000000 * sum(tc + 1)) // sum(rc + 1) AS BIGINT) AS score " +
        "FROM gbt JOIN bc USING (b) GROUP BY gbt.doc_id, gbt.t)",
    )
  }

  /** The q102 oracle: per-doc importance statistics, all docs. */
  def importanceWeightsOracle(numBuckets: Int,
      targetPred: String = "lang = 'en'"): String =
    "WITH RECURSIVE " + importanceCtes(numBuckets, targetPred).mkString(",\n") +
      "\nSELECT doc_id, is_target, n_grams, sum_t, sum_r, score FROM w ORDER BY doc_id"

  /** The q117 oracle: hashing-trick term frequencies — every token
    * occurrence bucketed by the XXH64 chain, counted per (doc, bucket)
    * (mirrors [[graft.ops.CorpusOps.hashedTf]]).
    */
  def hashedTfOracle(dim: Int): String = {
    val ctes = Seq(
      "dtk AS MATERIALIZED (SELECT doc_id, " +
        "string_split_regex(trim(text), '\\s+') AS tk FROM documents)",
      "occ AS MATERIALIZED (SELECT doc_id, unnest(tk) AS tok FROM dtk)",
    ) ++ xxhStrCtes("SELECT DISTINCT tok FROM occ") ++ Seq(
      s"bkt AS MATERIALIZED (SELECT tok, ((${signed("xh_out")} % $dim) " +
        s"+ $dim) % $dim AS bucket FROM xstr_final)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT o.doc_id, b.bucket, CAST(count(*) AS BIGINT) AS tf " +
      "FROM occ o JOIN bkt b USING (tok) GROUP BY 1, 2 ORDER BY doc_id, bucket"
  }

  /** The q115 oracle: indexed importance scoring — bucket counts come
    * ONLY from the `oldPred` slice (the persisted corpus), weights are
    * computed for the complement (the new ingest batch); index-unseen
    * buckets count zero before the +1 smoothing (LEFT JOIN + COALESCE,
    * mirroring [[graft.ops.CorpusOps.importanceWeightsIndexed]]).
    */
  def importanceIndexedOracle(numBuckets: Int, targetPred: String,
      oldPred: String): String = {
    val ctes = Seq(
      s"dtk AS MATERIALIZED (SELECT doc_id, ($targetPred) AS t, ($oldPred) AS old, " +
        "string_split_regex(trim(text), '\\s+') AS tk FROM documents)",
      "uni AS (SELECT doc_id, unnest(tk) AS gram FROM dtk)",
      "bi AS (SELECT doc_id, tk[CAST(i AS INT)] || ' ' || tk[CAST(i AS INT) + 1] AS gram " +
        "FROM (SELECT doc_id, tk, unnest(range(1, len(tk))) AS i FROM dtk WHERE len(tk) >= 2))",
      "grams AS MATERIALIZED (SELECT doc_id, gram FROM uni " +
        "UNION ALL SELECT doc_id, gram FROM bi)",
    ) ++ xxhStrCtes("SELECT DISTINCT gram AS tok FROM grams") ++ Seq(
      s"bkt AS MATERIALIZED (SELECT tok, ((${signed("xh_out")} % $numBuckets) " +
        s"+ $numBuckets) % $numBuckets AS b FROM xstr_final)",
      "gbt AS MATERIALIZED (SELECT g.doc_id, d.t, d.old, x.b FROM grams g " +
        "JOIN bkt x ON g.gram = x.tok JOIN dtk d ON g.doc_id = d.doc_id)",
      "bc AS MATERIALIZED (SELECT b, " +
        "CAST(sum(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) AS tc, " +
        "CAST(sum(CASE WHEN t THEN 0 ELSE 1 END) AS BIGINT) AS rc " +
        "FROM gbt WHERE old GROUP BY b)",
      "w AS (SELECT gbt.doc_id, " +
        "CAST(count(*) AS BIGINT) AS n_grams, " +
        "CAST(sum(COALESCE(tc, 0) + 1) AS BIGINT) AS sum_t, " +
        "CAST(sum(COALESCE(rc, 0) + 1) AS BIGINT) AS sum_r, " +
        "CAST((1000000 * sum(COALESCE(tc, 0) + 1)) // sum(COALESCE(rc, 0) + 1) " +
        "AS BIGINT) AS score " +
        "FROM gbt LEFT JOIN bc USING (b) WHERE NOT gbt.old GROUP BY gbt.doc_id)",
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT doc_id, n_grams, sum_t, sum_r, score FROM w ORDER BY doc_id"
  }

  /** The q103 oracle: the top ceil(fraction * n_raw) non-target docs by
    * (score DESC, doc_id) — mirrors
    * [[graft.ops.CorpusOps.importanceSelect]]'s unique total order.
    */
  def importanceSelectOracle(numBuckets: Int, fraction: Double,
      targetPred: String = "lang = 'en'"): String =
    "WITH RECURSIVE " + importanceCtes(numBuckets, targetPred).mkString(",\n") + s"""
      , raw AS (SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rk,
                       count(*) OVER () AS nr
               FROM w WHERE NOT is_target)
      SELECT doc_id, score FROM raw
      WHERE rk <= CAST(ceil($fraction * nr) AS BIGINT) ORDER BY doc_id"""
}
