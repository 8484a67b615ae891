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
    * string column `tok`. Final CTE `xstr_final` carries srcSql's columns
    * plus `xh_out` (u64 HUGEINT).
    */
  private def xxhStrCtes(srcSql: String): Seq[String] = {
    val seed = "42::HUGEINT"
    val hexmap = "strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))*16 + " +
      "strpos('0123456789ABCDEF', substr(hx, 2*i, 1)) - 17"
    val stripeRounds = (0 until 4).map { i =>
      mul(rotl(add(s"v${i + 1}", mul(wordExpr("bl", s"32*k + ${8 * i}"), P2)), 31), P1)
    }.mkString(", ")
    val head = Seq(
      s"xsrc AS MATERIALIZED ($srcSql)",
      "xmeta0 AS MATERIALIZED (SELECT *, hex(encode(tok)) AS hx, " +
        "octet_length(encode(tok)) AS blen FROM xsrc)",
      s"xmeta AS MATERIALIZED (SELECT *, CAST([CAST($hexmap AS HUGEINT) " +
        "for i in range(1, blen + 1)] AS HUGEINT[]) AS bl, " +
        "CAST(CASE WHEN blen >= 32 THEN blen // 32 ELSE 0 END AS INT) AS nbl FROM xmeta0)",
      "xmeta2 AS MATERIALIZED (SELECT *, CAST((blen - 32*nbl) // 8 AS INT) AS nw, " +
        "(blen - 32*nbl - 8*((blen - 32*nbl) // 8)) >= 4 AS has4 FROM xmeta)",
      "xmeta3 AS MATERIALIZED (SELECT *, CAST(blen - 32*nbl - 8*nw - " +
        "(CASE WHEN has4 THEN 4 ELSE 0 END) AS INT) AS nbytes, 32*nbl + 8*nw AS o4 FROM xmeta2)",
      // 32-byte stripe loop (recursive): v1..v4 accumulators, one step per stripe
      "xblk AS (SELECT tok, bl, nbl, 0 AS k, " +
        s"${add(add(seed, P1), P2)} AS v1, ${add(seed, P2)} AS v2, " +
        s"CAST($seed AS HUGEINT) AS v3, ${sub(seed, P1)} AS v4 FROM xmeta3 WHERE nbl > 0 " +
        s"UNION ALL SELECT tok, bl, nbl, k+1, $stripeRounds FROM xblk WHERE k < nbl)",
      "xblkd AS MATERIALIZED (SELECT tok, v1, v2, v3, v4 FROM xblk WHERE k = nbl)",
      s"xmrg0 AS MATERIALIZED (SELECT *, ${add(add(rotl("v1", 1), rotl("v2", 7)), add(rotl("v3", 12), rotl("v4", 18)))} AS mh0 FROM xblkd)",
      s"xmrg1 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh0", rr("v1")), P1), P4)} AS mh1 FROM xmrg0)",
      s"xmrg2 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh1", rr("v2")), P1), P4)} AS mh2 FROM xmrg1)",
      s"xmrg3 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh2", rr("v3")), P1), P4)} AS mh3 FROM xmrg2)",
      s"xmrg4 AS MATERIALIZED (SELECT *, ${add(mul(xor("mh3", rr("v4")), P1), P4)} AS mh4 FROM xmrg3)",
      s"xh0 AS MATERIALIZED (SELECT m.*, CASE WHEN m.nbl = 0 THEN ${add(seed, P5)} " +
        "ELSE g.mh4 END AS h0 FROM xmeta3 m LEFT JOIN xmrg4 g USING (tok))",
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
    var prevCte = "xh0"
    val tail = stages.zipWithIndex.map { case ((col, expr), i) =>
      val nm = s"xst$i"
      val c = s"$nm AS MATERIALIZED (SELECT *, $expr AS $col FROM $prevCte)"
      prevCte = nm
      c
    }
    head ++ tail :+ s"xstr_final AS MATERIALIZED (SELECT * EXCLUDE (hx, bl) FROM $prevCte)"
  }

  /** Recursive min-label closure over `symCte` (src, dst — already
    * symmetrized) from `nodesSql` (one `id` column): the oracle twin of
    * [[graft.ops.Components.connectedComponents]]'s min-id contract.
    */
  private def reachSql(nodesSql: String, symCte: String): String =
    s"reach AS (SELECT id, id AS lab FROM ($nodesSql) " +
      s"UNION SELECT e.dst AS id, r.lab FROM reach r JOIN $symCte e ON e.src = r.id)"

  /** The q55 oracle: MinHash-LSH dedup clusters over `documents` with the
    * given signature shape (mirrors
    * [[graft.ops.TextDedup.minhashDedupClusters]] defaults).
    */
  def minhashClustersOracle(numHashes: Int = 128, bands: Int = 32): String = {
    val rpb = numHashes / bands
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val toks = "list_distinct(string_split_regex(trim(text), '\\s+'))"
    var ctes = xxhStrCtes(
      s"SELECT DISTINCT unnest($toks) AS tok FROM documents").toVector
    ctes ++= Seq(
      s"doctok AS MATERIALIZED (SELECT doc_id, unnest($toks) AS tok FROM documents)",
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
    ctes ++= Seq(
      s"buckets AS MATERIALIZED (SELECT doc_id, b, ${signed(acc)} AS bh FROM $prevCte)",
      "withrep AS MATERIALIZED (SELECT doc_id, min(doc_id) OVER (PARTITION BY b, bh) AS rep FROM buckets)",
      "star AS MATERIALIZED (SELECT DISTINCT doc_id AS src, rep AS dst FROM withrep WHERE doc_id != rep)",
      "sym AS MATERIALIZED (SELECT src, dst FROM star UNION SELECT dst, src FROM star)",
      reachSql("SELECT doc_id AS id FROM documents", "sym"),
    )
    "WITH RECURSIVE " + ctes.mkString(",\n") +
      "\nSELECT id, min(lab) AS cluster_rep FROM reach GROUP BY id ORDER BY id"
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
}
