package graft
import org.apache.spark.sql.functions._
import graft.core.{ChurnFixture, StageCache}
import graft.ingest.RestIngest
import graft.streaming.Streaming
import graft.warehouse.{Sinks, StarSchema}

class StreamingSpec extends SparkSpec {
  test("file-source ingest stream reuses batch transform exactly-once") {
    val work = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val raw = s"$work/raw"; val silver = s"$work/silver"; val ckpt = s"$work/ckpt"
    ChurnFixture.df(spark, 200).write.option("header", "true").csv(raw)
    val q = Streaming.ingestStream(spark, raw, silver, ckpt,
      transform = df => df.withColumn("flag", lit(1)))
    q.awaitTermination(60000)
    val out = spark.read.parquet(silver)
    assert(out.count() == 200)
    assert(out.columns.contains("flag") && out.columns.contains("_batch_id"))
    // restart with no new files: exactly-once means no duplicates
    val q2 = Streaming.ingestStream(spark, raw, silver, ckpt,
      transform = df => df.withColumn("flag", lit(1)))
    q2.awaitTermination(60000)
    assert(spark.read.parquet(silver).count() == 200)
  }

  test("watermarked window aggregation over an event stream") {
    import spark.implicits._
    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event](
      spark, 1)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    events.addData((0 until 100).map(i =>
      Streaming.Event(i % 5, new java.sql.Timestamp(t0.getTime + i * 1000L), "click", 1.0)))
    val agg = Streaming.windowedEventCounts(events.toDF(), "1 minute", "1 minute")
    val q = agg.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.sql("SELECT sum(n_events) FROM win_agg").collect()
    assert(rows(0).getLong(0) == 100)
  }

  test("streaming dedup suppresses fingerprint duplicates within and across batches") {
    import spark.implicits._
    val docs = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String, java.sql.Timestamp)](
      spark, 1)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // batch 1: "alpha" twice (whitespace variant = same fingerprint)
    docs.addData(Seq(
      (1L, "alpha  beta", ts(0)),
      (2L, "alpha beta", ts(1)), // dup of 1 after normalization
      (3L, "gamma", ts(2))))
    val out = Streaming.dedupDocStream(
      docs.toDF().toDF("doc_id", "text", "ts"), "text", "ts")
    // one checkpoint across both runs: offsets AND fingerprint state resume,
    // so run 2 sees only batch 2 but still remembers batch 1's fingerprints
    val work = java.nio.file.Files.createTempDirectory("graft_dedup").toString
    def run(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", s"$work/out").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      // a timed-out (still running) query would read partial output below
      // and contend on the checkpoint with the next run
      assert(q.awaitTermination(120000), "streaming batch did not finish in time")
    }
    run()
    // batch 2: another "gamma" dup (within the 1h watermark horizon) + new
    docs.addData(Seq((4L, "GAMMA", ts(3)), (5L, "delta", ts(4))))
    run()
    val all = spark.read.parquet(s"$work/out")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(all.contains(3L) && all.contains(5L))
    assert(!all.contains(4L), "cross-batch duplicate must be suppressed by state")
    assert((all & Set(1L, 2L)).size == 1, "exactly one of the in-batch dup pair survives")
  }

  test("stream-stream interval join attributes purchases to clicks, matching batch") {
    import spark.implicits._
    val clicks = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event](spark, 1)
    val buys = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event](spark, 1)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    val cRows = Seq(
      Streaming.Event(1L, ts(0), "click", 1.0),
      Streaming.Event(1L, ts(500), "click", 2.0),
      Streaming.Event(2L, ts(10), "click", 3.0))
    val bRows = Seq(
      Streaming.Event(1L, ts(100), "purchase", 10.0),  // joins click@0 only
      Streaming.Event(1L, ts(520), "purchase", 20.0),  // joins click@500 (click@0 window passed)
      Streaming.Event(2L, ts(400), "purchase", 30.0),  // outside user 2's 300s window
      Streaming.Event(3L, ts(50), "purchase", 40.0))   // no click at all
    val out = Streaming.clickAttributionJoin(clicks.toDF(), buys.toDF(),
      windowSeconds = 300L)
    val work = java.nio.file.Files.createTempDirectory("graft_ssjoin").toString
    def run(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", s"$work/out").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "interval join stream timed out")
    }
    clicks.addData(cRows); buys.addData(bRows); run()
    // push both watermarks so all joinable pairs finalize
    clicks.addData(Seq(Streaming.Event(98L, ts(5000), "click", 0.0)))
    buys.addData(Seq(Streaming.Event(98L, ts(5000), "purchase", 0.0)))
    run(); run()
    val got = spark.read.parquet(s"$work/out")
      .filter(col("user_id") < 90)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(4))).toSet
    val expect = Streaming.clickAttributionJoin(cRows.toDF(), bRows.toDF(), 300L)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getDouble(4))).toSet
    assert(got == expect, s"streamed joins != batch: $got vs $expect")
    assert(expect == Set((1L, 1.0, 10.0), (1L, 2.0, 20.0)),
      "fixture must attribute exactly the in-window pairs")
  }

  test("session_window stream closes sessions at the watermark, matching the batch twin") {
    import spark.implicits._
    val events = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.Event](
      spark, 1)
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // user 1: sessions {0s, 10s} and {4000s}; user 2: {5s} — gap 1800s
    val real = Seq(
      Streaming.Event(1L, ts(0), "click", 1.0),
      Streaming.Event(1L, ts(10), "click", 2.5),
      Streaming.Event(2L, ts(5), "view", 4.0),
      Streaming.Event(1L, ts(4000), "click", 8.0))
    val out = graft.ops.Sessionize.sessionWindowStats(
      events.toDF().withWatermark("ts", "10 seconds"),
      "user_id", "ts", "value", gapSeconds = 1800L)
    val work = java.nio.file.Files.createTempDirectory("graft_swin").toString
    def run(): Unit = {
      val q = out.writeStream.format("parquet")
        .option("path", s"$work/out").outputMode("append")
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "session stream did not finish in time")
    }
    events.addData(real)
    run()
    // sentinel waves push the watermark so earlier sessions finalize
    events.addData(Seq(Streaming.Event(98L, ts(8000), "click", 0.0)))
    run()
    events.addData(Seq(Streaming.Event(99L, ts(16000), "click", 0.0)))
    run()
    val got = spark.read.parquet(s"$work/out")
      .filter(col("user_id") < 90)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    // batch twin over the same (non-sentinel) events
    val expect = graft.ops.Sessionize.sessionWindowStats(
      real.toDF(), "user_id", "ts", "value", gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got == expect,
      s"streamed closed sessions != batch sessions: $got vs $expect")
    assert(expect.size == 3, "fixture must produce 3 sessions")
  }

  test("streaming CUSUM matches the offline fold and alarms exactly once") {
    import spark.implicits._
    // planted series: user 1 drifts upward after step 6 (values jump from
    // ~mu to mu + 3sd), user 2 stays in control
    val mu = 10.0; val sd = 2.0
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(u: Long, i: Int, v: Double) = Streaming.DriftEvent(
      u, new java.sql.Timestamp(t0.getTime + i * 1000L), i.toLong, v, mu, sd)
    val u1 = (1 to 6).map(i => ev(1, i, 10.0 + (i % 2))) ++
      (7 to 12).map(i => ev(1, i, 16.0))
    val u2 = (1 to 12).map(i => ev(2, i, 10.0 + (i % 3) - 1))
    val batches = Seq(
      (u1.take(4) ++ u2.take(4)), (u1.slice(4, 9) ++ u2.slice(4, 9)),
      (u1.drop(9) ++ u2.drop(9)))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.DriftEvent](spark, 1)
    val q = Streaming.cusumDriftStream(ms.toDS())
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val out = spark.sql("SELECT * FROM drift_out").as[Streaming.DriftUpdate]
      .collect()
    // offline fold replay (the q179 recurrence) over each full series
    def offline(vals: Seq[Double]) = {
      var s = 0.0; var smax = 0.0; var cross = 0L; var i = 0L
      vals.foreach { x =>
        s = math.max(0.0, s + (x - mu - 0.5 * sd)); i += 1
        smax = math.max(smax, s)
        if (cross == 0L && s > 4.0 * sd) cross = i
      }
      (s, smax, cross)
    }
    val fin1 = out.filter(_.user_id == 1).maxBy(_.n_seen)
    val fin2 = out.filter(_.user_id == 2).maxBy(_.n_seen)
    val (s1, m1, c1) = offline(u1.map(_.value))
    val (s2, m2, c2) = offline(u2.map(_.value))
    assert((fin1.cusum, fin1.cusum_max, fin1.first_cross_t) == ((s1, m1, c1)))
    assert((fin2.cusum, fin2.cusum_max, fin2.first_cross_t) == ((s2, m2, c2)))
    assert(c1 > 0 && c2 == 0, "planted drift must alarm; in-control must not")
    // the alarm fires in exactly ONE batch update for the drifting user
    assert(out.count(u => u.user_id == 1 && u.alarm) == 1)
    assert(out.count(u => u.user_id == 2 && u.alarm) == 0)
    // one update per (user, non-empty batch)
    assert(out.count(_.user_id == 1) == 3 && out.count(_.user_id == 2) == 3)
  }

  test("streaming funnel matches equal the batch definition across batches") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(u: Long, minutes: Int, t: String) = Streaming.FunnelEvent(
      u, new java.sql.Timestamp(t0.getTime + minutes * 60000L), minutes.toLong, t)
    val h = 60L * 60000L // 1 hour per hop
    // user 1: two full signup->click->purchase completions, one broken hop
    val u1 = Seq(ev(1, 0, "signup"), ev(1, 10, "click"), ev(1, 20, "purchase"),
      ev(1, 30, "signup"), ev(1, 100, "click"), // 70 min: hop 1 broken
      ev(1, 110, "signup"), ev(1, 115, "click"), ev(1, 130, "purchase"))
    // user 2: stages out of order never match
    val u2 = Seq(ev(2, 0, "purchase"), ev(2, 5, "click"), ev(2, 10, "signup"))
    // user 3: completion spans batch boundaries (state carries prefixes)
    val u3 = Seq(ev(3, 0, "signup"), ev(3, 50, "click"), ev(3, 95, "purchase"))
    val batches = Seq(
      u1.take(4) ++ u2 ++ u3.take(1),
      u1.slice(4, 6) ++ u3.slice(1, 2),
      u1.drop(6) ++ u3.drop(2))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.FunnelEvent](spark, 1)
    val q = Streaming.funnelMatchStream(ms.toDS(),
        Seq("signup", "click", "purchase"), h)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    batches.foreach { b => ms.addData(b); q.processAllAvailable() }
    q.stop()
    val out = spark.sql("SELECT * FROM funnel_out").as[Streaming.FunnelMatch]
      .collect()
    // batch replay of the same definition (the q184 brute force)
    def batchMatches(evsAll: Seq[Streaming.FunnelEvent]): Int = {
      val q3 = evsAll.sortBy(_.ts.getTime)
      var n = 0
      // per-completion count: every purchase with a qualifying latest
      // (signup->click) prefix — the q173/q184 latest-prefix invariant
      var lastSignup = Long.MinValue; var lastSC = Long.MinValue
      q3.foreach { e =>
        val t = e.ts.getTime
        if (e.event_type == "purchase" && lastSC != Long.MinValue &&
          t - lastSC <= h) n += 1
        if (e.event_type == "click" && lastSignup != Long.MinValue &&
          t - lastSignup <= h) lastSC = t
        if (e.event_type == "signup") lastSignup = t
      }
      n
    }
    val byUser = (u1 ++ u2 ++ u3).groupBy(_.user_id)
    byUser.foreach { case (u, evsAll) =>
      assert(out.count(_.user_id == u) == batchMatches(evsAll),
        s"user $u stream/batch mismatch")
    }
    assert(out.count(_.user_id == 1) == 2) // exactly the two planted runs
    assert(out.count(_.user_id == 2) == 0)
    assert(out.count(_.user_id == 3) == 1) // completed across 3 batches
    // n_matches is a per-user running count
    assert(out.filter(_.user_id == 1).map(_.n_matches).sorted.toSeq == Seq(1L, 2L))
  }

  test("funnel ties break on (ts, event_id) and a replayed older event never hops") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ev(u: Long, minutes: Int, id: Long, t: String) = Streaming.FunnelEvent(
      u, new java.sql.Timestamp(t0.getTime + minutes * 60000L), id, t)
    val h = 60L * 60000L
    // user 1: signup and click share ONE timestamp; event_id order says
    // signup (id 1) precedes click (id 2), so the hop is legal — the
    // batch window frame (ORDER BY us, event_id ROWS ... 1 PRECEDING)
    // sees the signup. Deterministic regardless of iterator order.
    val u1 = Seq(ev(1, 0, 1, "signup"), ev(1, 0, 2, "click"),
      ev(1, 10, 3, "purchase"))
    // user 2: same timestamps but ids REVERSED — click (id 1) precedes
    // signup (id 2) in the total order, so no prefix exists at the click
    val u2 = Seq(ev(2, 0, 2, "signup"), ev(2, 0, 1, "click"),
      ev(2, 10, 3, "purchase"))
    // user 3: batch 1 advances the prefix to t=50; batch 2 REPLAYS an
    // older click (t=10 < 50) — within horizon of the stored signup if
    // gaps were unsigned, but it must not complete stage 2 "before"
    // stage 1 was last set... then a purchase in horizon of nothing
    val u3b1 = Seq(ev(3, 50, 1, "signup"))
    val u3b2 = Seq(ev(3, 10, 2, "click"))
    val u3b3 = Seq(ev(3, 60, 3, "purchase"))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.FunnelEvent](spark, 1)
    val q = Streaming.funnelMatchStream(ms.toDS(),
        Seq("signup", "click", "purchase"), h)
      .writeStream.format("memory").queryName("funnel_tie_out")
      .outputMode("append").start()
    Seq(u1 ++ u2 ++ u3b1, u3b2, u3b3).foreach { b =>
      ms.addData(b); q.processAllAvailable()
    }
    q.stop()
    val out = spark.sql("SELECT * FROM funnel_tie_out")
      .as[Streaming.FunnelMatch].collect()
    assert(out.count(_.user_id == 1) == 1, "equal-ts hop with id order must match")
    assert(out.count(_.user_id == 2) == 0, "reversed id order must not match")
    assert(out.count(_.user_id == 3) == 0, "replayed older event must not hop")
  }

  test("CUSUM equal-ts events fold in event_id order, not iterator order") {
    import spark.implicits._
    val mu = 10.0; val sd = 2.0
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    // two equal-ts values whose fold order changes cusum_max: folding
    // +8 then -8 peaks at 7, folding -8 then +8 peaks at 7 too — use
    // asymmetric values: +9 then -20 (clamps to 0) peaks at 8; -20 then
    // +9 peaks at 8 as well after clamp... pick values where order
    // matters through the clamp: x=+9 (s=8), then x=+2 (s=9) vs
    // x=+2 (s=1), then x=+9 (s=9): same end, max differs (8+1=9 both).
    // Simplest order-sensitive observable: first_cross_t (the 1-based
    // index of the first 4sd crossing).
    def ev(id: Long, v: Double) = Streaming.DriftEvent(
      1L, t0, id, v, mu, sd) // ALL the same timestamp
    // id order: +20 (s=9 > 8 = 4sd: cross at 1), then -20 (s=0)
    // reversed iterator order would cross at index 2 instead
    val evs = Seq(ev(2, -10.0), ev(1, 30.0)) // shuffled arrival
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.DriftEvent](spark, 1)
    val q = Streaming.cusumDriftStream(ms.toDS())
      .writeStream.format("memory").queryName("drift_tie_out")
      .outputMode("append").start()
    ms.addData(evs); q.processAllAvailable(); q.stop()
    val out = spark.sql("SELECT * FROM drift_tie_out")
      .as[Streaming.DriftUpdate].collect()
    assert(out.length == 1)
    // fold in id order: x=30 -> s = 30-10-1 = 19 > 8 crosses at 1;
    // then x=-10 clamps to 0. Iterator-order folding could report 2.
    assert(out.head.first_cross_t == 1L,
      s"expected cross at id-ordered index 1, got ${out.head.first_cross_t}")
    assert(out.head.cusum == 0.0 && out.head.n_seen == 2L)
  }
}
