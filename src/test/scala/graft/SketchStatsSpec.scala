package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.SketchStats

/** Persisted mergeable HLL sketches: batch-merged serving vs single-pass
  * sketches vs exact counts, retry idempotence, and the frozen-lgK gate.
  */
class SketchStatsSpec extends SparkSpec {

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("merged per-batch estimate tracks exact count; idempotent under re-delivery") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hll").toString
    val batches = (0 until 3).map(k => docs.filter(pmod(col("doc_id"), lit(3)) === k))
    batches.zipWithIndex.foreach { case (b, k) =>
      SketchStats.appendHllBatch(b, "doc_id", dir, s"b$k")
    }
    val exact = docs.select("doc_id").distinct().count()
    def est() = SketchStats.hllDistinct(spark, dir).head.getLong(0)
    val merged = est()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged=$merged exact=$exact")
    // deterministic serving: same sketches, same estimate
    assert(est() == merged)
    // re-delivered batch overwrites its segment: estimate unchanged
    SketchStats.appendHllBatch(batches(1), "doc_id", dir, "b1")
    assert(est() == merged, "retried append must not move the estimate")
    // single-pass sketch over the whole corpus agrees within the bound
    // (union serves the composite estimator, direct build serves HIP —
    // equality is not guaranteed, closeness is)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_hll1").toString
    SketchStats.appendHllBatch(docs, "doc_id", dir2, "all")
    val single = SketchStats.hllDistinct(spark, dir2).head.getLong(0)
    assert(math.abs(merged - single).toDouble / exact < 0.05,
      s"merged=$merged single=$single")
  }

  test("grouped estimates track per-group exact counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hllg").toString
    (0 until 2).foreach { k =>
      SketchStats.appendHllBatch(
        docs.filter(pmod(col("doc_id"), lit(2)) === k),
        "doc_id", dir, s"b$k", groupCols = Seq("source"))
    }
    val got = SketchStats.hllDistinct(spark, dir, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("source").agg(countDistinct("doc_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (s, n) =>
      assert(math.abs(got(s) - n).toDouble / n.max(1L) < 0.08,
        s"source=$s got=${got(s)} exact=$n")
    }
  }

  test("compaction serves identically to the N input segments; crash-safe stage") {
    val dir0 = java.nio.file.Files.createTempDirectory("graft_hllc").toString
    val dir = s"$dir0/sk"
    (0 until 3).foreach { k =>
      SketchStats.appendHllBatch(
        docs.filter(pmod(col("doc_id"), lit(3)) === k),
        "doc_id", dir, s"b$k", groupCols = Seq("source"))
    }
    def serve() = SketchStats.hllDistinct(spark, dir, Seq("source"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = serve()
    SketchStats.compactHll(spark, dir, Seq("source"))
    val segs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs == Set("seg=base"), segs.toString)
    assert(serve() == before,
      "register-max union is associative: compacted serving must be identical")
    // appends continue after compaction; idempotent re-assertion of the
    // same values cannot move the estimate (HLL is idempotent by value)
    SketchStats.appendHllBatch(
      docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", dir, "again", groupCols = Seq("source"))
    assert(serve() == before)
  }

  test("streamed sketch maintenance with mid-stream compaction tracks exact counts") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_hlls").toString
    val raw = s"$work/raw"; val sk = s"$work/sk"; val ckpt = s"$work/ckpt"
    val waves = (0 until 3).map(k => docs.filter(pmod(col("doc_id"), lit(3)) === k))
    waves.zipWithIndex.foreach { case (w, k) =>
      w.write.mode("append").parquet(raw)
      val stream = spark.readStream.schema(docs.schema).parquet(raw)
      val q = Streaming.sketchStatsStream(stream, sk, ckpt, "doc_id",
        compactEvery = 2)
      assert(q.awaitTermination(120000), s"wave $k did not finish")
    }
    // compaction fired at batch 2: segments are base + the later batches
    val segs = new java.io.File(sk).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs.contains("seg=base") && segs.size == 2, segs.toString)
    val est = SketchStats.hllDistinct(spark, sk).head.getLong(0)
    val exact = docs.select("doc_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05, s"est=$est exact=$exact")
  }

  test("a crash inside compaction's swap is recovered at the next streamed batch") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_hllr").toString
    val raw = s"$work/raw"; val sk = s"$work/sk"; val ckpt = s"$work/ckpt"
    val w0 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
    val w1 = docs.filter(pmod(col("doc_id"), lit(2)) === 1)
    w0.write.mode("append").parquet(raw)
    val q0 = Streaming.sketchStatsStream(
      spark.readStream.schema(docs.schema).parquet(raw), sk, ckpt, "doc_id")
    assert(q0.awaitTermination(120000))
    // simulate the swap crash window: the compaction's stage holds the
    // ONLY copy (live deleted, fully-written stage not yet renamed)
    SketchStats.compactHll(spark, sk)
    assert(new java.io.File(sk).renameTo(new java.io.File(sk + "_merging")))
    // the next streamed batch must PROMOTE the stage before its
    // exists-guard — otherwise it mistakes the index for first-ever
    // ingest and the estimate collapses to the new batch alone
    w1.write.mode("append").parquet(raw)
    val q1 = Streaming.sketchStatsStream(
      spark.readStream.schema(docs.schema).parquet(raw), sk, ckpt, "doc_id")
    assert(q1.awaitTermination(120000))
    val est = SketchStats.hllDistinct(spark, sk).head.getLong(0)
    val exact = docs.select("doc_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"history lost across the crashed swap: est=$est exact=$exact")
  }

  test("mixed-lgK segments are rejected loudly, reserved chars too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hllm").toString
    SketchStats.appendHllBatch(docs.limit(50), "doc_id", dir, "b0", lgK = 12)
    SketchStats.appendHllBatch(docs.limit(50), "doc_id", dir, "b1", lgK = 14)
    intercept[IllegalArgumentException] {
      SketchStats.hllDistinct(spark, dir).collect()
    }
    intercept[IllegalArgumentException] {
      SketchStats.appendHllBatch(docs.limit(1), "doc_id", dir, "a=b")
    }
  }

  test("histogram segments sum to the single-pass binning; retries idempotent") {
    import spark.implicits._
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    (0 until 3).foreach { k =>
      SketchStats.appendHistBatch(
        events.filter(pmod(col("event_id"), lit(3)) === k),
        "value", dir, s"b$k", width = 25.0)
    }
    // retry of batch 1 must overwrite, not double its bins
    SketchStats.appendHistBatch(
      events.filter(pmod(col("event_id"), lit(3)) === 1),
      "value", dir, "b1", width = 25.0)
    val merged = SketchStats.histogram(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val direct = events
      .groupBy(SketchStats.histBin(col("value"), 25.0).as("bin"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == direct, "segments-summed histogram must be exact")

    // quantile estimates are exact to one bin width vs the true quantile
    val hist = SketchStats.histogram(spark, dir)
    val ests = SketchStats.histQuantiles(hist, 25.0, Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = events.stat.approxQuantile("value", Array(0.5, 0.9, 0.99), 0.0)
    Seq(0.5 -> exact(0), 0.9 -> exact(1), 0.99 -> exact(2)).foreach {
      case (q, ex) =>
        assert(ests(q) <= ex && ex < ests(q) + 25.0,
          s"q=$q est=${ests(q)} must bracket exact=$ex within one bin")
    }

    // mixed widths are a different sketch: reject loudly
    SketchStats.appendHistBatch(events.limit(10), "value", dir, "bx", width = 10.0)
    val e = intercept[IllegalArgumentException] {
      SketchStats.histogram(spark, dir).collect()
    }
    assert(e.getMessage.contains("mixed histogram widths"))
  }

  test("streamed histogram maintenance serves exact counts after every wave") {
    import spark.implicits._
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_histstream").toString
    val raw = s"$work/raw"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val waves = (0 until 3).map(k => events.filter(pmod(col("event_id"), lit(3)) === k))
    var fed = waves.head.limit(0)
    waves.foreach { w =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.histStream(
        spark.readStream.schema(events.schema).parquet(raw),
        s"$work/hist", s"$work/ckpt", "value", width = 50.0)
      assert(q.awaitTermination(120000), "hist wave timed out")
      val served = SketchStats.histogram(spark, s"$work/hist")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val direct = fed.groupBy(SketchStats.histBin(col("value"), 50.0).as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(served == direct, "served histogram must be exact after each wave")
    }
  }

  test("streamed domain ledger serves exact counts and stable splits after every wave") {
    import graft.streaming.Streaming
    import graft.ops.CorpusOps
    val work = java.nio.file.Files.createTempDirectory("graft_domstream").toString
    val raw = s"$work/raw"
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val host = concat(lit("Sub"), (col("doc_id") % 7).cast("string"),
      lit(".Site"), (col("doc_id") % 101).cast("string"), lit(".ORG:8443"))
    val toks = size(graft.core.Cols.wsTokens(col("text")))
    val waves = (0 until 3).map(k => docs.filter(pmod(col("doc_id"), lit(3)) === k))
    var fed = waves.head.limit(0)
    waves.foreach { w =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.domainLedgerStream(
        spark.readStream.schema(docs.schema).parquet(raw),
        s"$work/ledger", s"$work/ckpt", host, toks)
      assert(q.awaitTermination(120000), "ledger wave timed out")
      val served = CorpusOps.domainLedger(spark, s"$work/ledger")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val direct = fed
        .select(CorpusOps.registrableDomain(host).as("domain"), toks.as("t"))
        .withColumn("split", CorpusOps.domainSplit(col("domain")))
        .groupBy("domain", "split")
        .agg(count(lit(1)).as("n_docs"), sum("t").cast("long").as("n_tokens"))
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      assert(served == direct, "served ledger must be exact after each wave")
      // split stability: a domain carries ONE split across all waves
      assert(served.keys.groupBy(_._1).values.forall(_.map(_._2).toSet.size == 1),
        "a domain changed split between waves")
    }
  }

  test("streamed moments maintenance serves bit-identically to a full pass per wave") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_momstream").toString
    val raw = s"$work/raw"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_returnflag", "l_quantity")
    val waves = (0 until 3).map(k => li.filter(pmod(col("l_orderkey"), lit(3)) === k))
    var fed = waves.head.limit(0)
    waves.foreach { w =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.momentStream(
        spark.readStream.schema(li.schema).parquet(raw),
        s"$work/mom", s"$work/ckpt", "l_quantity", Seq("l_returnflag"))
      assert(q.awaitTermination(120000), "moments wave timed out")
      val served = SketchStats.momentStats(spark, s"$work/mom", Seq("l_returnflag"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      // bit-identical to a single pass over everything fed so far
      val dirRef = java.nio.file.Files.createTempDirectory("graft_momref").toString
      SketchStats.appendMomentsBatch(fed, "l_quantity", dirRef, "all",
        groupCols = Seq("l_returnflag"))
      val direct = SketchStats.momentStats(spark, dirRef, Seq("l_returnflag"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      assert(served == direct, "served moments must equal the full pass exactly")
    }
  }

  test("streamed heavy-hitter maintenance serves exact counts after every wave") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_freqstream").toString
    val raw = s"$work/raw"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val waves = (0 until 3).map(k => events.filter(pmod(col("event_id"), lit(3)) === k))
    var fed = waves.head.limit(0)
    waves.foreach { w =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.freqStream(
        spark.readStream.schema(events.schema).parquet(raw),
        s"$work/freq", s"$work/ckpt", "event_type", capacity = 64)
      assert(q.awaitTermination(120000), "freq wave timed out")
      val served = SketchStats.freqItems(spark, s"$work/freq")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = fed.groupBy("event_type").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // far under capacity: exact after every wave
      assert(served == direct, "served heavy hitters must be exact after each wave")
    }
    // stopped-stream compaction folds the wave segments losslessly
    val before = SketchStats.freqItems(spark, s"$work/freq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    SketchStats.compactFreq(spark, s"$work/freq")
    val after = SketchStats.freqItems(spark, s"$work/freq")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before)
  }

  test("histogram drift: zero on identical shapes, exact cross products on a shift") {
    import spark.implicits._
    def hist(rows: (Long, Long)*) = rows.toDF("bin", "cnt")
    // identical shape at different totals: p_a == p_b, dev_num all zero
    val a = hist(0L -> 10L, 1L -> 30L)
    val b = hist(0L -> 20L, 1L -> 60L)
    val z = SketchStats.histDrift(a, b).collect()
    assert(z.forall(_.getLong(3) == 0L), z.mkString(", "))
    // mass moved: a = (10, 10), b = (15, 5); tot 20 each ->
    // bin0 |10*20-15*20| = 100, bin1 |10*20-5*20| = 100; a one-sided bin
    val c = SketchStats.histDrift(hist(0L -> 10L, 1L -> 10L),
        hist(0L -> 15L, 1L -> 5L, 2L -> 0L))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(c == Map(0L -> 100L, 1L -> 100L, 2L -> 0L), c.toString)
    // bins absent on one side count as zero mass, not dropped
    val d = SketchStats.histDrift(hist(0L -> 4L), hist(5L -> 4L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(d == Set((0L, 4L, 0L, 16L), (5L, 0L, 4L, 16L)))
  }

  test("freq segments: exact under capacity, MG bounds over it, retries idempotent") {
    import spark.implicits._
    // under capacity across every batch and the merge: EXACT counts
    val docs = Tables.events(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_freq").toString
    (0 until 3).foreach { k =>
      SketchStats.appendFreqBatch(
        docs.filter(pmod(col("event_id"), lit(3)) === k),
        "event_type", dir, s"b$k", capacity = 64)
    }
    def served(d: String) = SketchStats.freqItems(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = docs.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(served(dir) == exact, "under capacity the serve must be exact")
    // retried append overwrites its segment
    SketchStats.appendFreqBatch(
      docs.filter(pmod(col("event_id"), lit(3)) === 1),
      "event_type", dir, "b1", capacity = 64)
    assert(served(dir) == exact, "retry must not move the counts")

    // OVER capacity: counts are under-estimates within n/(capacity+1)
    // and every item above the threshold survives. 600 'hot' + spread
    // tail, capacity 4 => threshold = n/5
    val hot = (1 to 600).map(i => (i.toLong, "hot"))
    val tail = (1 to 300).map(i => (1000L + i, s"t${i % 30}"))
    val all = hot ++ tail
    val dir2 = java.nio.file.Files.createTempDirectory("graft_freq2").toString
    SketchStats.appendFreqBatch(
      all.filter(_._1 % 2 == 0).toDF("id", "v"), "v", dir2, "b0", capacity = 4)
    SketchStats.appendFreqBatch(
      all.filter(_._1 % 2 == 1).toDF("id", "v"), "v", dir2, "b1", capacity = 4)
    val got = served(dir2)
    val n = all.size
    val trueCounts = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    got.foreach { case (item, cnt) =>
      assert(cnt <= trueCounts(item), s"$item over-counted: $cnt")
      assert(trueCounts(item) - cnt <= n / 5 + 1,
        s"$item under-counted beyond the bound: $cnt vs ${trueCounts(item)}")
    }
    trueCounts.filter(_._2 > n / 5).keys.foreach(item =>
      assert(got.contains(item), s"heavy item $item must survive the merge"))
    // mixed capacities are rejected loudly
    SketchStats.appendFreqBatch(all.take(10).toDF("id", "v"), "v", dir2, "b2",
      capacity = 8)
    intercept[IllegalArgumentException] { SketchStats.freqItems(spark, dir2) }
  }

  test("moment segments: merged serving is bit-identical to a single pass; retries idempotent") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("graft_mom").toString
    (0 until 3).foreach { k =>
      SketchStats.appendMomentsBatch(
        li.filter(pmod(col("l_orderkey"), lit(3)) === k),
        "l_quantity", dir, s"b$k", groupCols = Seq("l_returnflag"))
    }
    def rows(d: String) = SketchStats.momentStats(spark, d, Seq("l_returnflag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val merged = rows(dir)
    // single-segment pass over all the data: BIT-identical statistics
    // (decimal sums are associative — this is the sketch's core claim)
    val dir1 = java.nio.file.Files.createTempDirectory("graft_mom1").toString
    SketchStats.appendMomentsBatch(li, "l_quantity", dir1, "all",
      groupCols = Seq("l_returnflag"))
    assert(rows(dir1) == merged, "segment merge must equal single pass exactly")
    // re-delivered batch overwrites its segment: serving unchanged
    SketchStats.appendMomentsBatch(
      li.filter(pmod(col("l_orderkey"), lit(3)) === 1),
      "l_quantity", dir, "b1", groupCols = Seq("l_returnflag"))
    assert(rows(dir) == merged, "retried append must not move the stats")
    // sanity against a known closed form: uniform integers 1..50 have
    // mean 25.5 and skewness ~0 — served values must sit in range
    merged.values.foreach { case (n, mean, std, skew, _) =>
      assert(n > 0 && mean > 20 && mean < 30 && std > 10 && math.abs(skew) < 0.2)
    }
  }

  test("moment and freq compaction serve identically to the input segments") {
    import spark.implicits._
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val mDir0 = java.nio.file.Files.createTempDirectory("graft_momc").toString
    val mDir = s"$mDir0/mom"
    (0 until 3).foreach { k =>
      SketchStats.appendMomentsBatch(
        li.filter(pmod(col("l_orderkey"), lit(3)) === k),
        "l_quantity", mDir, s"b$k", groupCols = Seq("l_returnflag"))
    }
    def momRows() = SketchStats.momentStats(spark, mDir, Seq("l_returnflag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val before = momRows()
    SketchStats.compactMoments(spark, mDir, Seq("l_returnflag"))
    assert(momRows() == before, "compacted moments must serve bit-identically")
    assert(spark.read.parquet(mDir).inputFiles
      .forall(_.contains("seg=base")), "compaction must leave one segment")

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val fDir0 = java.nio.file.Files.createTempDirectory("graft_freqc").toString
    val fDir = s"$fDir0/freq"
    (0 until 3).foreach { k =>
      SketchStats.appendFreqBatch(
        ev.filter(pmod(col("event_id"), lit(3)) === k),
        "event_type", fDir, s"b$k", capacity = 4)
    }
    def freqRows() = SketchStats.freqItems(spark, fDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fBefore = freqRows()
    SketchStats.compactFreq(spark, fDir)
    assert(freqRows() == fBefore, "compacted freq must serve identically")
  }

  test("moment stats on a planted distribution match hand-computed skew/kurtosis") {
    import spark.implicits._
    // x = {1, 2, 9}: μ = 4, m2 = 38/3, m3 = 90/3 = 30, m4 = 722/3
    val dir = java.nio.file.Files.createTempDirectory("graft_mom2").toString
    SketchStats.appendMomentsBatch(Seq(1.0, 2.0).toDF("x"), "x", dir, "a")
    SketchStats.appendMomentsBatch(Seq(9.0).toDF("x"), "x", dir, "b")
    val r = SketchStats.momentStats(spark, dir).head
    val (m2, m3, m4) = (38.0 / 3, 30.0, 722.0 / 3)
    assert(r.getLong(0) == 3L && r.getDouble(1) == 4.0)
    assert(math.abs(r.getDouble(2) - math.sqrt(m2)) < 1e-12)
    assert(math.abs(r.getDouble(3) - m3 / (m2 * math.sqrt(m2))) < 1e-12)
    assert(math.abs(r.getDouble(4) - (m4 / (m2 * m2) - 3.0)) < 1e-12)
  }

  test("KLL: weight conservation, over-capacity rank-error bound, merge-order robustness") {
    import graft.functions.KllSketch
    val n = 100000
    val rnd = new scala.util.Random(3)
    val data = Array.fill(n)(rnd.nextDouble() * 1000.0)
    val sorted = data.sorted
    def rankOf(v: Double): Int = {
      // rank of the estimate in the true data (count of values <= v)
      var lo = 0; var hi = n
      while (lo < hi) { val m = (lo + hi) >>> 1; if (sorted(m) <= v) lo = m + 1 else hi = m }
      lo
    }
    val sk = new KllSketch.KllSummary(256)
    data.foreach(sk.add)
    // the compaction pairing must conserve total weight EXACTLY
    assert(sk.totalWeight == n.toLong, s"weight ${sk.totalWeight} != $n")
    assert(sk.count == n.toLong)
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val maxErr = qs.map { q =>
      math.abs(rankOf(sk.quantile(q)) - math.ceil(q * n)).toInt
    }.max
    assert(maxErr <= (0.05 * n).toInt, s"rank error $maxErr > 5% of $n")
    // merge-order robustness: 4 partials in two different merge shapes
    val parts = data.grouped(n / 4 + 1).map { chunk =>
      val p = new KllSketch.KllSummary(256); chunk.foreach(p.add); p
    }.toSeq
    def mergedErr(order: Seq[Int]): Int = {
      val m = new KllSketch.KllSummary(256)
      order.foreach(i => m.merge(KllSketch.deserialize(parts(i).serialize())))
      assert(m.totalWeight == n.toLong)
      qs.map(q => math.abs(rankOf(m.quantile(q)) - math.ceil(q * n)).toInt).max
    }
    assert(mergedErr(Seq(0, 1, 2, 3)) <= (0.05 * n).toInt)
    assert(mergedErr(Seq(3, 1, 0, 2)) <= (0.05 * n).toInt)
  }

  test("KLL segments: under-capacity exactness, lossless compaction, mixed-k gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kllseg").toString
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    (0 until 3).foreach { k =>
      SketchStats.appendKllBatch(
        li.filter(pmod(col("l_orderkey"), lit(3)) === k),
        "l_quantity", dir, s"b$k", k = 65536, groupCols = Seq("l_returnflag"))
    }
    def serve() = SketchStats
      .kllQuantiles(spark, dir, Seq(0.5, 0.9), Seq("l_returnflag"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val served = serve()
    // under capacity nothing compacts: the median is the exact
    // ceil(q*n)-th value per group
    val groups = li.select("l_returnflag").distinct().collect().map(_.getString(0))
    groups.foreach { g =>
      val vals = li.filter(col("l_returnflag") === g)
        .select(col("l_quantity").cast("double")).collect().map(_.getDouble(0)).sorted
      Seq(0.5, 0.9).foreach { q =>
        val want = vals(math.ceil(q * vals.length).toInt - 1)
        assert(served((g, q)) == want, s"group $g q$q: ${served((g, q))} != $want")
      }
    }
    SketchStats.compactKll(spark, dir, Seq("l_returnflag"))
    assert(serve() == served, "stopped-stream compaction must not move exact estimates")
    val segs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs == Set("seg=base"))
    SketchStats.appendKllBatch(li.limit(10), "l_quantity", dir, "bad", k = 128)
    intercept[IllegalArgumentException] {
      SketchStats.kllQuantiles(spark, dir, Seq(0.5))
    }
  }

  test("streamed bitmap maintenance with mid-stream compaction serves EXACT counts per wave") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_bmstream").toString
    val raw = s"$work/raw"; val bm = s"$work/bm"; val ckpt = s"$work/ckpt"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val waves = (0 until 3).map(k => events.filter(pmod(col("event_id"), lit(3)) === k))
    var fed = waves.head.limit(0)
    waves.zipWithIndex.foreach { case (w, k) =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.bitmapStream(
        spark.readStream.schema(events.schema).parquet(raw),
        bm, ckpt, "user_id", Seq("event_type"), compactEvery = 2)
      assert(q.awaitTermination(120000), s"bitmap wave $k timed out")
      val served = SketchStats.bitmapDistinct(spark, bm, Seq("event_type"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = fed.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // the bitmap path is EXACT after every wave — including the wave
      // where mid-stream compaction fired (idempotent by value)
      assert(served == direct, s"wave $k: served=$served direct=$direct")
    }
    val segs = new java.io.File(bm).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs.contains("seg=base") && segs.size == 2, segs.toString)
  }

  test("CM segments: over-count property, merge == single pass, lossless compaction, mixed-geometry gate") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cm").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    (0 until 3).foreach { k =>
      SketchStats.appendCmBatch(
        events.filter(pmod(col("event_id"), lit(3)) === k),
        "user_id", dir, s"b$k", width = 4, depth = 4)
    }
    val keys = events.select("user_id").distinct()
    def serve(d: String) = SketchStats.cmEstimates(spark, d, keys)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val served = serve(dir)
    val exact = events.groupBy("user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // CM never under-counts, and width=4 over this key domain forces
    // real collisions — the bound must do actual work here
    assert(exact.keySet == served.keySet)
    exact.foreach { case (k, c) => assert(served(k) >= c, s"under-count at $k") }
    assert(exact.exists { case (k, c) => served(k) > c },
      "width=4 should collide somewhere; widen the test domain")
    // segments-summed == one single-pass sketch of all rows (merge is
    // exact cell addition, not an approximation of it)
    val one = java.nio.file.Files.createTempDirectory("graft_cm1").toString
    SketchStats.appendCmBatch(events, "user_id", one, "all", width = 4, depth = 4)
    assert(serve(one) == served)
    // compaction preserves every estimate and leaves a single base segment
    SketchStats.compactCm(spark, dir)
    assert(serve(dir) == served)
    val segs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(segs == Set("seg=base"))
    // a NEVER-ingested probe key stays in the output and estimates from
    // ALL its depth cells including empty ones (ADVICE r11: the old
    // inner join dropped empty cells, so an unseen key vanished or took
    // min over only its collision cells). In a wide sketch the unseen
    // key's cells are all empty -> the correct CM estimate is exactly 0.
    val wide = java.nio.file.Files.createTempDirectory("graft_cmw").toString
    SketchStats.appendCmBatch(events, "user_id", wide, "all",
      width = 1 << 20, depth = 4)
    val unseen = spark.range(1).select(lit(-987654321L).as("user_id"))
    val est = SketchStats.cmEstimates(spark, wide, unseen).collect()
    assert(est.length == 1 && est.head.getLong(1) == 0L,
      s"unseen key must estimate 0 in a wide sketch, got ${est.toSeq}")
    // and in the width-4 sketch the unseen key still appears, bounded
    // above by the heaviest cell (min over REAL collision cells)
    val est4 = SketchStats.cmEstimates(spark, one, unseen).collect()
    assert(est4.length == 1 && est4.head.getLong(1) >= 0L)
    // mixed geometry is rejected loudly, not silently mis-added
    SketchStats.appendCmBatch(events.limit(10), "user_id", dir, "bad",
      width = 8, depth = 4)
    intercept[IllegalArgumentException] {
      SketchStats.cmEstimates(spark, dir, keys)
    }
  }

  test("streamed CM maintenance serves identically to a batch build per wave; rerun idempotent") {
    import graft.streaming.Streaming
    val work = java.nio.file.Files.createTempDirectory("graft_cmstream").toString
    val raw = s"$work/raw"; val cm = s"$work/cm"; val ckpt = s"$work/ckpt"
    val events = Tables.events(spark, "/root/testdata/sf0.001")
    val keys = events.select("user_id").distinct()
    def serve() = SketchStats.cmEstimates(spark, cm, keys)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val waves = (0 until 3).map(k => events.filter(pmod(col("event_id"), lit(3)) === k))
    var fed = waves.head.limit(0)
    var last = Map.empty[Long, Long]
    waves.zipWithIndex.foreach { case (w, k) =>
      w.write.mode("append").parquet(raw)
      fed = fed.unionByName(w)
      val q = Streaming.cmStream(
        spark.readStream.schema(events.schema).parquet(raw),
        cm, ckpt, "user_id", width = 4, depth = 4)
      assert(q.awaitTermination(120000), s"CM wave $k timed out")
      last = serve()
      // cell addition is exact: streamed segments == one batch build
      val one = java.nio.file.Files.createTempDirectory(s"graft_cm1s$k").toString
      SketchStats.appendCmBatch(fed, "user_id", one, "all", width = 4, depth = 4)
      val direct = SketchStats.cmEstimates(spark, one, keys)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == direct, s"wave $k diverged from batch build")
    }
    // an AvailableNow rerun with nothing new appends nothing: idempotent
    val q = Streaming.cmStream(
      spark.readStream.schema(events.schema).parquet(raw),
      cm, ckpt, "user_id", width = 4, depth = 4)
    assert(q.awaitTermination(120000))
    assert(serve() == last, "rerun with no new data must not move estimates")
  }
}
