package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MERGEABLE distinct-count sketches — incremental statistics
  * over batch-wise ingest, the stats twin of the persisted index family:
  * each ingest batch writes its own tiny HLL sketch segment
  * (idempotently, `seg=<batchKey>` overwrite), and the corpus-wide
  * distinct count is served by UNIONING the sketches — never by
  * re-scanning ingested data. Spark's Apache DataSketches HLL functions
  * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`, public API
  * since 3.5) do the math; this adds the durable segmented lifecycle.
  *
  * Why it matters at 100 TB: "distinct users per source, updated per
  * ingest" over raw data is a full-history shuffle per refresh; with
  * per-batch sketches the refresh reads kilobytes. Sketch unions are
  * associative/commutative, so ANY merge order serves the same state —
  * and a batch's sketch is sized by lgK (2^lgK registers), not by the
  * batch.
  *
  * Determinism/estimate contract: DataSketches HLL hashing is seeded and
  * deterministic, so the same data yields byte-identical sketches and
  * identical estimates across runs. A UNIONED estimate is not guaranteed
  * numerically equal to a single-pass sketch of the same data (union
  * serves the composite estimator where a directly-built sketch serves
  * HIP — a documented DataSketches property), but both carry the same
  * ~1.04/sqrt(2^lgK) relative-error bound; the contract tests pin both
  * paths against the exact count.
  *
  * lgK is a frozen index parameter (the quantizer-freeze pattern of the
  * IVF/PQ indexes): every segment must be built with the SAME lgK, and
  * serving fails loudly on a mixed-parameter index rather than silently
  * degrading through a lossy downsampling union.
  */
object SketchStats {

  private def checkKey(batchKey: String): Unit =
    require(batchKey.nonEmpty && !batchKey.exists(c => c == '/' || c == '='),
      s"batchKey must be a plain partition value, got '$batchKey'")

  /** Append one ingest batch's HLL sketch(es) of `valueCol` — one row
    * per `groupCols` value (or a single global row) holding the binary
    * sketch — as its own `seg=<batchKey>` partition. Idempotent under
    * retries: a re-delivered batch overwrites its previous attempt, and
    * because the union serves max-of-registers state, even a transient
    * double-count cannot inflate the estimate.
    */
  def appendHllBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, groupCols: Seq[String] = Nil, lgK: Int = 12): Unit = {
    checkKey(batchKey)
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    val sk = hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch")
    val out =
      if (groupCols.isEmpty) df.agg(sk)
      else df.groupBy(groupCols.map(col): _*).agg(sk)
    out.withColumn("lgk", lit(lgK))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve the distinct-count estimate from the persisted sketches: one
    * row per `groupCols` value (or one global row) with `n_distinct`.
    * Reads ONLY the sketch segments — bytes per batch, independent of
    * ingested volume. Mixed-lgK segments are rejected loudly (see class
    * doc); the union itself is the exact register-wise max, so serving
    * from N segments equals serving from any compaction of them.
    */
  def hllDistinct(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val sk = spark.read.parquet(dir)
    val lgks = sk.select("lgk").distinct().collect().map(_.getInt(0))
    require(lgks.length == 1,
      s"sketch index at $dir mixes lgK values ${lgks.sorted.mkString(",")}; " +
        "rebuild the offending segments with one lgK — a lossy " +
        "mixed-precision union would silently degrade every estimate")
    val est = hll_sketch_estimate(
      hll_union_agg(col("sketch"), lit(false))).as("n_distinct")
    if (groupCols.isEmpty) sk.agg(est)
    else sk.groupBy(groupCols.map(col): _*).agg(est)
  }

  /** Compact all sketch segments into one `base` segment — the
    * segment-merge lifecycle step of the sketch index. The union is the
    * exact register-wise max and associative, so serving from the
    * compacted segment is IDENTICAL to serving from the N inputs
    * (contract-tested) — unlike the estimate-vs-single-pass relation,
    * this equality is exact, because both paths serve the same merged
    * register state. Staged-swap protected like every index compaction
    * here: a crashed merge leaves the live index intact, a crash between
    * delete and rename promotes the stage ([[StagedSwap]]).
    */
  def compactHll(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val sk = spark.read.parquet(dir)
    val lgks = sk.select("lgk").distinct().collect().map(_.getInt(0))
    require(lgks.length == 1,
      s"sketch index at $dir mixes lgK values ${lgks.sorted.mkString(",")}; " +
        "repair before compacting — the merge would bake the precision " +
        "loss into the base segment permanently")
    val merged = hll_union_agg(col("sketch"), lit(false)).as("sketch")
    val out =
      if (groupCols.isEmpty) sk.agg(merged)
      else sk.groupBy(groupCols.map(col): _*).agg(merged)
    out.withColumn("lgk", lit(lgks.head))
      .write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  // --------------------------------------------------------------------
  // Persisted mergeable EXACT histograms — the exact-count sibling of the
  // HLL segments, for incremental quantile/drift monitoring: each ingest
  // batch appends its (bin, cnt) rows under a fixed binning width, and
  // the corpus-wide histogram is served by summing bins across segments
  // (exact, order-free, associative) — ingested data is never re-scanned.
  // A percentile estimate read off the merged histogram is exact to one
  // bin width, which for a monitoring gate is the error budget you chose
  // when you picked the width. Unlike KLL/t-digest, this sketch's merge
  // is EXACT, so the q106 oracle can hash-check segments-summed against
  // a direct single-pass binning — the mergeability property itself.
  // --------------------------------------------------------------------

  /** floor(value / width) as the bin id — the one shared binning both
    * the engine and the SQL oracle compute (double division and floor
    * are IEEE-correctly-rounded, so bin ids are bit-stable cross-engine).
    */
  def histBin(value: org.apache.spark.sql.Column, width: Double): org.apache.spark.sql.Column =
    floor(value / lit(width)).cast("long")

  /** Append one batch's (bin, cnt) histogram rows under `seg=<batchKey>`
    * (idempotent overwrite). `width` is a frozen parameter, stamped per
    * segment and enforced at read.
    */
  def appendHistBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, width: Double): Unit = {
    checkKey(batchKey)
    require(width > 0 && !width.isNaN && !width.isInfinite,
      s"width must be a positive finite number, got $width")
    df.groupBy(histBin(col(valueCol), width).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("_width", lit(width))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve the merged histogram: sum bins across all segments. Loud on a
    * mixed-width index (a different width is a different sketch, and a
    * silent mixed sum would be meaningless).
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val segs = spark.read.parquet(dir)
    val widths = segs.select("_width").distinct().collect().map(_.getDouble(0))
    require(widths.length == 1,
      s"mixed histogram widths under $dir: ${widths.sorted.mkString(", ")}")
    segs.groupBy("bin").agg(sum("cnt").as("cnt"))
  }

  /** Distribution drift between two merged histograms (same width): per
    * bin, the INTEGER cross-multiplied L1 deviation
    * `dev_num = |cnt_a * tot_b - cnt_b * tot_a|` — the numerator of
    * |p_a - p_b| over the common denominator tot_a * tot_b, so the whole
    * monitor is exact integer arithmetic (no float division, no ln ulp
    * hazard; the vocab-drift monitor needs round-to-9dp for its KL
    * terms, this needs nothing). Total L1 distance =
    * sum(dev_num) / (tot_a * tot_b), computed by the consumer at
    * whatever precision its gate wants. Bins absent on one side count
    * as zero (full outer join). Cross products ride DECIMAL(38,0) and
    * cast to long — exact while counts stay under ~3e9 squared; beyond
    * that drop the cast and keep the decimal.
    */
  def histDrift(a: DataFrame, b: DataFrame): DataFrame = {
    val fa = a.select(col("bin"), col("cnt").as("cnt_a"))
    val fb = b.select(col("bin"), col("cnt").as("cnt_b"))
    val tots = fa.agg(sum("cnt_a").as("tot_a"))
      .crossJoin(fb.agg(sum("cnt_b").as("tot_b")))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    fa.join(fb, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .crossJoin(broadcast(tots))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        abs(col("cnt_a").cast(dec) * col("tot_b").cast(dec) -
          col("cnt_b").cast(dec) * col("tot_a").cast(dec))
          .cast("long").as("dev_num"))
  }

  /** Compact all moment segments into one `base` segment. Decimal sums
    * are associative, so serving from the compacted segment is
    * BIT-IDENTICAL to serving from the N inputs. Staged-swap protected
    * like [[compactHll]]: a crashed merge leaves the live index intact.
    */
  def compactMoments(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val segs = spark.read.parquet(dir)
    val aggs = Seq(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
      sum("s3").as("s3"), sum("s4").as("s4"))
    val out =
      if (groupCols.isEmpty) segs.agg(aggs.head, aggs.tail: _*)
      else segs.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    out.write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  /** Compact all heavy-hitter segments into one `base` segment by
    * pointwise count sum — LOSSLESS: the shrink stays at serve time, so
    * serving from the compacted segment equals serving from the N
    * inputs exactly (the compacted segment may carry more than
    * `capacity` rows; it is storage, kilobytes either way). Mixed
    * capacities are rejected before anything is staged.
    */
  def compactFreq(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val segs = spark.read.parquet(dir)
    val caps = segs.select("_capacity").distinct().collect().map(_.getInt(0))
    require(caps.length == 1,
      s"freq index at $dir mixes capacities ${caps.sorted.mkString(",")}; " +
        "repair before compacting")
    val keys = groupCols.map(col) :+ col("item")
    segs.groupBy(keys: _*).agg(sum("cnt").as("cnt"))
      .withColumn("_capacity", lit(caps.head))
      .write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  /** Append one ingest batch's Misra-Gries heavy-hitter summary of
    * `valueCol` (bounded `capacity` entries regardless of batch size;
    * [[graft.functions.FreqSketch]]) as its own `seg=<batchKey>`
    * partition — the frequency member of the persisted sketch family.
    * Idempotent under retries like every segment append here.
    */
  def appendFreqBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, capacity: Int = 64,
      groupCols: Seq[String] = Nil): Unit = {
    checkKey(batchKey)
    require(capacity >= 1 && capacity <= 100000,
      s"capacity must be in [1, 100000], got $capacity")
    val sk = graft.functions.FreqSketch
      .freqSketch(col(valueCol).cast("string"), capacity).as("sk")
    val out =
      if (groupCols.isEmpty) df.agg(sk)
      else df.groupBy(groupCols.map(col): _*).agg(sk)
    out
      .select(groupCols.map(col) :+ explode(col("sk")).as("kv"): _*)
      .select(groupCols.map(col) ++ Seq(col("kv.item").as("item"),
        col("kv.cnt").as("cnt")): _*)
      .withColumn("_capacity", lit(capacity))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve the merged heavy-hitter summary from the persisted segments:
    * pointwise count sum, then ONE shrink back to capacity — subtract
    * the (capacity+1)-th largest merged count and keep positives (the
    * Agarwal et al. PODS'12 mergeable-summaries combine, expressed
    * relationally; the rank window runs over at most
    * segments x capacity rows per group, never the data). Guarantees
    * carried: counts are under-estimates by at most n/(capacity+1),
    * any item above that threshold survives, and while every partial
    * stayed under capacity no decrement ever fired — counts are then
    * EXACT, which is what lets q147 hash-match a DuckDB oracle.
    */
  def freqItems(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val segs = spark.read.parquet(dir)
    val caps = segs.select("_capacity").distinct().collect().map(_.getInt(0))
    require(caps.length == 1,
      s"freq index at $dir mixes capacities ${caps.sorted.mkString(",")}; " +
        "rebuild the offending segments with one capacity — a mixed " +
        "merge would silently weaken every bound")
    val cap = caps.head
    val keys = groupCols.map(col)
    val merged = segs.groupBy((keys :+ col("item")): _*)
      .agg(sum("cnt").as("cnt"))
    val w0 = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cnt"), asc("item"))
    val w = if (groupCols.isEmpty) w0
      else org.apache.spark.sql.expressions.Window
        .partitionBy(keys: _*).orderBy(desc("cnt"), asc("item"))
    val ranked = merged.withColumn("_rk", row_number().over(w))
    // the shrink subtrahend: the (cap+1)-th largest count, NULL (-> 0)
    // when a group already fits — an aggregate, not a filter, so the
    // under-capacity case still yields its row
    val subExpr = max(when(col("_rk") === cap + 1, col("cnt"))).as("_sub")
    val joined = if (groupCols.isEmpty)
      ranked.crossJoin(broadcast(ranked.agg(subExpr)))
    else ranked.join(broadcast(ranked.groupBy(keys: _*).agg(subExpr)),
      groupCols, "left")
    joined
      .withColumn("cnt", col("cnt") - coalesce(col("_sub"), lit(0L)))
      .filter(col("cnt") > 0)
      .select((keys ++ Seq(col("item"), col("cnt"))): _*)
  }

  /** Append one ingest batch's exact power-sum moments of `valueCol` —
    * one row per `groupCols` value holding (n, Σx, Σx², Σx³, Σx⁴) as
    * fixed-scale decimals — as its own `seg=<batchKey>` partition. The
    * moments "sketch" is the exact end of the sketch family: decimal
    * addition is associative and commutative, so serving merged segments
    * is BIT-IDENTICAL to a single pass over all the data (not just
    * estimate-equal like HLL), while a segment row is a few hundred
    * bytes regardless of batch size. Callers must feed values whose
    * 4th power is exactly representable in double (integers up to
    * ~2^13, or values with few significant bits) — the decimal cast
    * then freezes an exact product. Headroom: DECIMAL(38,6) holds
    * ~10^31; quantity-like values (≤50 ⇒ x⁴ ≤ 6.25e6) keep the sum
    * exact past 10^12 rows — the 100 TB envelope.
    */
  def appendMomentsBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, groupCols: Seq[String] = Nil): Unit = {
    checkKey(batchKey)
    val x = col(valueCol).cast("double")
    val aggs = Seq(
      count(x).as("n"),
      sum(graft.core.Det.dec(x)).as("s1"),
      sum(graft.core.Det.dec(x * x)).as("s2"),
      sum(graft.core.Det.dec(x * x * x)).as("s3"),
      sum(graft.core.Det.dec(x * x * x * x)).as("s4"))
    val out =
      if (groupCols.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    out.write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve mean / population std / skewness / excess kurtosis from the
    * persisted moment segments: merge = pointwise decimal sum (exact),
    * then one deterministic double conversion per statistic. Every
    * float op below is correctly-rounded IEEE (+ - * / sqrt; note
    * m2^1.5 is spelled m2*sqrt(m2) for that reason), so the served
    * numbers are bit-identical to any direct single-pass computation
    * using the same formula — the property the oracle hash-checks.
    */
  def momentStats(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val segs = spark.read.parquet(dir)
    val merged =
      if (groupCols.isEmpty)
        segs.agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
          sum("s3").as("s3"), sum("s4").as("s4"))
      else
        segs.groupBy(groupCols.map(col): _*)
          .agg(sum("n").as("n"), sum("s1").as("s1"), sum("s2").as("s2"),
            sum("s3").as("s3"), sum("s4").as("s4"))
    val n = col("n")
    val e1 = col("s1").cast("double") / n
    val e2 = col("s2").cast("double") / n
    val e3 = col("s3").cast("double") / n
    val e4 = col("s4").cast("double") / n
    merged
      .withColumn("_e1", e1).withColumn("_e2", e2)
      .withColumn("_e3", e3).withColumn("_e4", e4)
      .withColumn("_m2", col("_e2") - col("_e1") * col("_e1"))
      .withColumn("_m3", col("_e3") - lit(3.0) * col("_e1") * col("_e2")
        + lit(2.0) * col("_e1") * col("_e1") * col("_e1"))
      .withColumn("_m4", col("_e4") - lit(4.0) * col("_e1") * col("_e3")
        + lit(6.0) * col("_e1") * col("_e1") * col("_e2")
        - lit(3.0) * col("_e1") * col("_e1") * col("_e1") * col("_e1"))
      .select((groupCols.map(col) ++ Seq(
        n.cast("long").as("n"),
        col("_e1").as("mean"),
        sqrt(col("_m2")).as("std_pop"),
        (col("_m3") / (col("_m2") * sqrt(col("_m2")))).as("skewness"),
        (col("_m4") / (col("_m2") * col("_m2")) - lit(3.0))
          .as("kurtosis_excess"))): _*)
  }

  // --------------------------------------------------------------------
  // Persisted mergeable EXACT distinct-id bitmaps — the exact sibling of
  // the HLL segments ([[graft.functions.BitmapOps]]): each ingest batch
  // appends one compressed bitmap row per group, and serving OR-unions
  // the segments. Union is idempotent BY VALUE (a re-merged or
  // twice-delivered segment cannot inflate the set), so — like HLL and
  // unlike the additive histogram/moment/freq segments — compaction is
  // safe even while a maintenance stream is live. Beyond exact counts,
  // the persisted bitmaps answer INTERSECTION questions (cross-segment
  // retention/overlap) that cardinality sketches cannot.
  // --------------------------------------------------------------------

  /** Append one batch's bitmap(s) of `idCol` (bigint) under
    * `seg=<batchKey>` (idempotent overwrite), one row per `groupCols`
    * value or a single global row.
    */
  def appendBitmapBatch(df: DataFrame, idCol: String, dir: String,
      batchKey: String, groupCols: Seq[String] = Nil): Unit = {
    checkKey(batchKey)
    val bm = graft.functions.BitmapOps
      .bitmapBuild(col(idCol).cast("long")).as("bitmap")
    val out =
      if (groupCols.isEmpty) df.agg(bm)
      else df.groupBy(groupCols.map(col): _*).agg(bm)
    out.write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve the EXACT distinct count from the persisted bitmap segments —
    * reads only the bitmaps, never the ingested data. Because the union
    * is exact and canonical-serialized, serving from N segments equals
    * serving from any compaction of them byte-for-byte.
    */
  def bitmapDistinct(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val segs = spark.read.parquet(dir)
    val cnt = graft.functions.BitmapOps.bitmapCount(
      graft.functions.BitmapOps.bitmapMerge(col("bitmap"))).as("n_distinct")
    if (groupCols.isEmpty) segs.agg(cnt)
    else segs.groupBy(groupCols.map(col): _*).agg(cnt)
  }

  /** Compact all bitmap segments into one `base` segment (staged-swap
    * protected). Exact merge: the compacted bitmap is byte-identical to
    * the OR of the inputs, so every downstream count and intersection is
    * unchanged.
    */
  def compactBitmap(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val segs = spark.read.parquet(dir)
    val merged = graft.functions.BitmapOps.bitmapMerge(col("bitmap")).as("bitmap")
    val out =
      if (groupCols.isEmpty) segs.agg(merged)
      else segs.groupBy(groupCols.map(col): _*).agg(merged)
    out.write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  // --------------------------------------------------------------------
  // Persisted mergeable KLL quantile segments — the rank sibling of the
  // histogram segments for UNKNOWN value ranges (no bin width to choose):
  // each batch appends one bounded summary per group; serving merges
  // summaries only. Like the freq/moment segments (and unlike HLL or
  // bitmaps), merged state is NOT idempotent by value — a batch replayed
  // after compaction would re-enter the summary — so compaction runs
  // only while ingestion is stopped. k is a frozen parameter (the lgK
  // pattern): mixed-k segments are rejected loudly.
  // --------------------------------------------------------------------

  /** Append one batch's KLL summaries of `valueCol` under
    * `seg=<batchKey>` (idempotent overwrite).
    */
  def appendKllBatch(df: DataFrame, valueCol: String, dir: String,
      batchKey: String, k: Int = 1024, groupCols: Seq[String] = Nil): Unit = {
    checkKey(batchKey)
    val sk = graft.functions.KllSketch
      .kllBuild(col(valueCol).cast("double"), k).as("sketch")
    val out =
      if (groupCols.isEmpty) df.agg(sk)
      else df.groupBy(groupCols.map(col): _*).agg(sk)
    out.withColumn("kll_k", lit(k))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Serve quantile estimates from the persisted KLL segments — one row
    * per (group, q). Under capacity (group count <= k per batch and no
    * compaction depth) the estimates are EXACT.
    */
  def kllQuantiles(spark: SparkSession, dir: String, qs: Seq[Double],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val segs = spark.read.parquet(dir)
    val ks = segs.select("kll_k").distinct().collect().map(_.getInt(0))
    require(ks.length == 1,
      s"KLL index at $dir mixes k values ${ks.sorted.mkString(",")}; " +
        "rebuild the offending segments with one k")
    val merged = {
      val m = graft.functions.KllSketch.kllMerge(col("sketch")).as("sketch")
      if (groupCols.isEmpty) segs.agg(m)
      else segs.groupBy(groupCols.map(col): _*).agg(m)
    }
    qs.map { q =>
      merged.select((groupCols.map(col) :+ lit(q).as("q") :+
        graft.functions.KllSketch.kllQuantile(col("sketch"), lit(q))
          .as("est")): _*)
    }.reduce(_.unionByName(_))
  }

  /** Compact all KLL segments into one `base` segment (staged-swap
    * protected; ingestion must be stopped — see class note).
    */
  def compactKll(spark: SparkSession, dir: String,
      groupCols: Seq[String] = Nil): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val segs = spark.read.parquet(dir)
    val ks = segs.select("kll_k").distinct().collect().map(_.getInt(0))
    require(ks.length == 1,
      s"KLL index at $dir mixes k values ${ks.sorted.mkString(",")}; " +
        "repair before compacting")
    val m = graft.functions.KllSketch.kllMerge(col("sketch")).as("sketch")
    val out =
      if (groupCols.isEmpty) segs.agg(m)
      else segs.groupBy(groupCols.map(col): _*).agg(m)
    out.withColumn("kll_k", lit(ks.head))
      .write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }

  /** Percentile estimates off a merged histogram: for each q, the LOWER
    * EDGE (width * bin) of the first bin whose cumulative count reaches
    * ceil(q * n) — exact to one bin width, integer/decimal arithmetic
    * only. The window runs over the BIN table (bounded by value range /
    * width), never the data.
    */
  def histQuantiles(hist: DataFrame, width: Double,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val W = org.apache.spark.sql.expressions.Window
    val cum = hist
      .withColumn("_cum", sum("cnt").over(
        W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)))
      .withColumn("_n", sum("cnt").over(W.partitionBy()))
    qs.map { q =>
      cum.filter(col("_cum") >= ceil(lit(q) * col("_n")))
        .agg(min("bin").as("bin"))
        .select(lit(q).as("q"), (col("bin") * width).as("est"))
    }.reduce(_.unionByName(_))
  }

  // --------------------------------------------------------------------
  // Persisted mergeable COUNT-MIN sketches — bounded-memory frequency
  // estimation for key domains too large for exact per-key counters
  // (the frequency sibling of the HLL segments). Each batch appends its
  // own depth×width cell table (cnt per (d, bucket) where bucket =
  // pmod(xxhash64(key·depth + d), width)); the corpus sketch is served
  // by summing cells across segments (exact, order-free, associative —
  // CM merge IS cell addition, so segments-summed equals a single-pass
  // build bit-for-bit). A point estimate min_d cell(d, h_d(key)) only
  // ever OVER-counts (collisions add, never subtract) with the standard
  // ε=e/width, δ=e^−depth guarantee. The estimate itself — including
  // every collision — is deterministic integer arithmetic over the
  // public XXH64, so the q202 oracle replays the whole sketch in SQL
  // and hash-matches exactly, not just within the error bound.
  // Width/depth are frozen parameters (the lgK pattern): mixed-geometry
  // segments are rejected loudly — cells from different geometries are
  // not addable.
  // --------------------------------------------------------------------

  /** Cells of one batch's CM sketch of `keyCol` (a long-typed key):
    * (d, bucket, cnt) rows, at most depth·width of them regardless of
    * batch size. Written under `seg=<batchKey>` (idempotent overwrite).
    */
  def appendCmBatch(df: DataFrame, keyCol: String, dir: String,
      batchKey: String, width: Int = 256, depth: Int = 4): Unit = {
    checkKey(batchKey)
    require(width >= 2 && depth >= 1 && depth <= 16,
      s"CM geometry out of range: width=$width depth=$depth")
    val cells = df.select(col(keyCol).cast("long").as("k"))
      .withColumn("d", explode(array((0 until depth).map(lit(_)): _*)))
      .select(col("d"),
        pmod(xxhash64(col("k") * depth + col("d")), lit(width.toLong))
          .as("bucket"))
      .groupBy("d", "bucket").agg(count(lit(1)).as("cnt"))
    cells.withColumn("cm_width", lit(width)).withColumn("cm_depth", lit(depth))
      .write.mode("overwrite").parquet(s"$dir/seg=$batchKey")
  }

  /** Geometry of a CM index, validated across segments. */
  private def cmGeometry(segs: DataFrame, dir: String): (Int, Int) = {
    val geos = segs.select("cm_width", "cm_depth").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    require(geos.length == 1,
      s"CM index at $dir mixes geometries ${geos.sorted.mkString(",")}; " +
        "rebuild the offending segments with one width×depth — cells " +
        "from different geometries are not addable")
    geos.head
  }

  /** Point-estimate frequencies for every key of `keys` (a one-column
    * frame of long keys, e.g. the distinct key domain or a probe list)
    * from the persisted CM segments: merged cells = Σ segments, then
    * est(key) = min over d of the key's cell. Reads ONLY the sketch
    * segments — depth·width rows per batch, independent of ingested
    * volume; the probe join touches depth rows per key.
    */
  def cmEstimates(spark: SparkSession, dir: String, keys: DataFrame): DataFrame = {
    val keyCol = keys.columns.head
    val segs = spark.read.parquet(dir)
    val (width, depth) = cmGeometry(segs, dir)
    val merged = segs.groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
    val probes = keys.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("d", explode(array((0 until depth).map(lit(_)): _*)))
      .withColumn("bucket",
        pmod(xxhash64(col("k") * depth + col("d")), lit(width.toLong)))
    // LEFT join + zero-fill: a probe key hashing to an empty (never
    // ingested) cell must contribute that cell's count of 0 to the
    // min-over-depth — an inner join dropped the zero cell, so a
    // never-seen key either vanished from the output or took min over
    // only its COLLISION cells (ADVICE r11)
    probes.join(merged, Seq("d", "bucket"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy("k").agg(min("cnt").as("cm_est"))
      .select(col("k").as(keyCol), col("cm_est"))
  }

  /** Compact all CM segments into one `base` segment: cell-wise sum,
    * staged-swap protected. Serving from the compacted segment is
    * IDENTICAL to serving from the N inputs (cell addition is
    * associative); like freq/moments/KLL, replaying an already-merged
    * batch would double-count, so compaction runs with ingestion
    * stopped.
    */
  def compactCm(spark: SparkSession, dir: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val tmpPath = new org.apache.hadoop.fs.Path(dir + "_merging")
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    StagedSwap.recoverOrClearStage(fs, dirPath, tmpPath)
    val segs = spark.read.parquet(dir)
    val (width, depth) = cmGeometry(segs, dir)
    segs.groupBy("d", "bucket").agg(sum("cnt").as("cnt"))
      .withColumn("cm_width", lit(width)).withColumn("cm_depth", lit(depth))
      .write.mode("overwrite").parquet(s"$tmpPath/seg=base")
    StagedSwap.swap(fs, dirPath, tmpPath)
  }
}
