package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sampling operators (SURVEY §2.6 D3).
  *
  * The reference draws an exact-size seeded random sample for its
  * dashboard (`df.sample(min(5000, n), random_state=42)`, reference
  * src/dashboard/pages.py:118). pandas shuffles indices on one machine;
  * the distributed analog ranks rows by a seeded multiplicative hash of a
  * key column and takes the n smallest:
  *
  *  - exact size n, deterministic for a given (key set, seed) — same rows
  *    on every run, every partitioning, every cluster size;
  *  - `orderBy(rank).limit(n)` compiles to TakeOrderedAndProject: each
  *    partition keeps a bounded top-n heap and the driver merges — no
  *    global sort, no shuffle of the full table;
  *  - the hash is plain modular arithmetic (Knuth multiplicative), so the
  *    DuckDB oracle can compute the identical rank in ANSI SQL.
  */
object Sampling {

  /** Seeded pseudo-random rank of a non-negative integral key. The seed is
    * folded in BEFORE the multiplication (adding it after would only shift
    * every rank by a constant, leaving the order unchanged). The key is
    * first reduced mod a prime so the product stays far from Long overflow
    * (which would silently wrap in Spark but error in DuckDB).
    */
  def seededRank(key: Column, seed: Long): Column =
    pmod((pmod(key, lit(100000007L)) + lit(seed % 100000007L)) * lit(2654435761L),
      lit(4294967296L))

  /** Exact-size seeded sample: the n rows with the smallest seeded rank of
    * `keyCol` (ties broken by the key itself — pass a unique key for a
    * total order).
    */
  def sampleExact(df: DataFrame, keyCol: String, n: Int, seed: Long = 42L): DataFrame =
    df.withColumn("_srank", seededRank(col(keyCol), seed))
      .orderBy(col("_srank"), col(keyCol))
      .limit(n)
      .drop("_srank")

  /** Systematic keyed sample: every row whose key is divisible by
    * `interval` (deterministic, join-stable across tables sharing the
    * key).
    */
  def systematic(df: DataFrame, keyCol: String, interval: Int): DataFrame =
    df.filter(pmod(col(keyCol), lit(interval)) === 0)

  /** Exact-size-per-stratum seeded sample: within each stratum, the `n`
    * rows with the smallest seeded rank (ties by key). One shuffle keyed
    * by the stratum; the window sorts within each stratum only, so
    * parallelism = number of strata and no global sort exists. Strata
    * smaller than `n` are kept whole.
    */
  def stratifiedExact(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(!df.columns.contains("_srn"),
      "_srn is reserved by stratifiedExact as a temp column; rename it on the input")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(seededRank(col(keyCol), seed), col(keyCol))
    df.withColumn("_srn", row_number().over(w))
      .filter(col("_srn") <= n)
      .drop("_srn")
  }

  /** WEIGHTED sampling without replacement, k per stratum — the
    * Efraimidis–Spirakis (2006, public literature) one-pass scheme the
    * size-proportional curation steps need (e.g. "sample documents with
    * probability ∝ length"): each row draws u ~ U(0,1) and the k largest
    * keys u^(1/w) win. Rows with weight <= 0 or NULL are excluded (they
    * have zero selection mass; excluding them also keeps the key total).
    *
    * Determinism/oracle scheme: u derives from [[seededRank]]'s integer
    * hash as (h + 0.5)/2^32 — exactly representable, bit-identical
    * cross-engine — and the key is ranked as round(ln(u), 6) / w, the
    * same ordering as u^(1/w) (exp is monotone; pow itself is NOT
    * correctly rounded, ln-then-divide is the IEEE-safe spelling). Ties
    * (possible after rounding) break by the id for a total order.
    *
    * Scale shape: one shuffle keyed by the stratum, per-stratum sort
    * bounded by stratum size, no global sort; with no strataCol the
    * plan is TakeOrderedAndProject (bounded per-partition heaps), never
    * a full sort.
    */
  def weightedSampleExact(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L, strataCol: Option[String] = None): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("_wkey") && !df.columns.contains("_wrn"),
      "_wkey/_wrn are reserved by weightedSampleExact; rename them on the input")
    val u = (seededRank(col(idCol), seed) + lit(0.5)) / lit(4294967296.0)
    val key = round(log(u), 6) / col(weightCol).cast("double")
    val pos = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_wkey", key)
    strataCol match {
      case Some(s) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(s).orderBy(col("_wkey").desc, col(idCol))
        pos.withColumn("_wrn", row_number().over(w))
          .filter(col("_wrn") <= k)
          .drop("_wrn")
      case None =>
        pos.orderBy(col("_wkey").desc, col(idCol)).limit(k)
    }
  }
}
