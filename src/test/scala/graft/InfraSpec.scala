package graft

import org.apache.spark.sql.functions._
import graft.core.{ChurnFixture, StageCache}
import graft.ingest.RestIngest
import graft.streaming.Streaming
import graft.warehouse.{Sinks, StarSchema}

class RestIngestSpec extends SparkSpec {
  test("pagination stops on short page; rows land with lineage") {
    // fake API: 250 rows, page_size 100 -> pages of 100/100/50
    val fetcher: RestIngest.Fetcher = (page, size) => {
      val start = (page - 1) * size
      (start until math.min(start + size, 250)).map(i => s"""{"id":$i,"v":"x$i"}""")
    }
    val rows = RestIngest.fetchAll(fetcher, pageSize = 100)
    assert(rows.size == 250)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val df = RestIngest.toDataFrame(spark, rows, schema, "https://api/users")
    assert(df.count() == 250)
    assert(df.columns.contains("_source_endpoint"))
  }

  test("rate limiter enforces the sliding window without wall-clock sleeps") {
    var now = 0L
    var slept = 0L
    val rl = new RestIngest.RateLimiter(maxRequests = 3, windowMillis = 1000L,
      clock = () => now, sleep = ms => { slept += ms; now += ms })
    (1 to 3).foreach(_ => rl.acquire())
    assert(slept == 0L)
    rl.acquire() // 4th within the window must wait for the 1st to expire
    assert(slept == 1000L)
  }

  test("partitioned backfill fetches every page across executors") {
    val fetcher: RestIngest.Fetcher = (page, size) =>
      (0 until size).map(i => s"""{"p":$page,"i":$i}""")
    val ds = RestIngest.fetchPartitioned(spark, totalPages = 10, pageSize = 5, fetcher)
    assert(ds.count() == 50)
  }
}

class SinksSpec extends SparkSpec {
  test("gold partitioned write + latest-partition read") {
    val base = java.nio.file.Files.createTempDirectory("graft_gold").toString
    val df = ChurnFixture.df(spark, 50)
    Sinks.writeGold(df, base, "20260810")
    Sinks.writeGold(df.limit(20), base, "20260811", org.apache.spark.sql.SaveMode.Append)
    val latest = Sinks.readLatestGold(spark, base)
    assert(latest.count() == 20)
    assert(latest.select("dt").distinct().collect()(0).getString(0) == "20260811")
  }

  test("star schema: fact joins dims; broadcast plan on the dim side") {
    val star = StarSchema.build(spark, "/root/testdata/sf0.001")
    val fact = star("fact_orders"); val dim = star("dim_customer")
    val joined = fact.join(broadcast(dim), "customer_key")
      .groupBy("region").agg(count(lit(1)).as("n"))
    assert(joined.count() == 5)
    assert(fact.columns.toSet ==
      Set("order_key", "customer_key", "date_key", "status", "priority", "total_price"))
  }

  test("jdbc round-trip on embedded Derby: overwrite, append, pushdown read") {
    // Derby ships in /opt/spark/jars; in-memory DB = no files, no server.
    // This exercises the same code path the reference drives against
    // Postgres (data_warehouse.py:64-121): bulk load, append, SQL read.
    val cfg = Sinks.JdbcConfig(
      url = "jdbc:derby:memory:graftwh;create=true",
      user = "", password = "", batchSize = 100, numPartitions = 2,
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    import spark.implicits._
    val df = (1 to 57).map(i => (i.toLong, s"name_$i", i * 1.5)).toDF("id", "name", "score")
    Sinks.writeJdbc(df, "users_gold", cfg)
    // Spark's JDBC writer creates quoted (case-exact) columns; Derby
    // uppercases unquoted identifiers, so reads quote them
    val back = Sinks.readJdbc(spark,
      """SELECT "id", "name", "score" FROM users_gold""", cfg)
    assert(back.count() == 57)
    val row = back.filter(col("id") === 7L).collect()(0)
    assert(row.getString(1) == "name_7" && row.getDouble(2) == 10.5)
    // append mode doubles the rows (reference replace/append switch)
    Sinks.writeJdbc(df, "users_gold", cfg, org.apache.spark.sql.SaveMode.Append)
    assert(Sinks.readJdbc(spark, """SELECT COUNT(*) AS "n" FROM users_gold""", cfg)
      .collect()(0).getAs[Number](0).longValue == 114L)
    // pushdown read: the filter runs inside the warehouse
    val filtered = Sinks.readJdbc(spark,
      """SELECT "id" FROM users_gold WHERE "score" > 80""", cfg)
    assert(filtered.count() == 8) // ids 54..57, written twice
  }

  test("backup table (CTAS) snapshots current contents") {
    val df = ChurnFixture.df(spark, 25)
    df.createOrReplaceTempView("users_live")
    spark.sql("DROP TABLE IF EXISTS users_backup_t")
    Sinks.backupTable(spark, "users_live", "users_backup_t")
    assert(spark.table("users_backup_t").count() == 25)
    spark.sql("DROP TABLE users_backup_t")
  }

  test("stage cache: miss computes, hit reuses, invalidate clears") {
    val base = java.nio.file.Files.createTempDirectory("graft_cache").toString
    val key = StageCache.key("features", "sig123", "v1")
    var computes = 0
    def compute = { computes += 1; ChurnFixture.df(spark, 30) }
    val a = StageCache.cached(spark, base, key)(compute)
    val b = StageCache.cached(spark, base, key)(compute)
    assert(computes == 1 && a.count() == 30 && b.count() == 30)
    assert(StageCache.invalidate(spark, base, key))
    StageCache.cached(spark, base, key)(compute)
    assert(computes == 2)
  }
}

class BucketingSpec extends SparkSpec {
  import spark.implicits._
  import graft.warehouse.Bucketing

  test("co-bucketed tables join with zero exchanges and correct rows") {
    val orders = (0L until 400L).map(i => (i, s"o$i", (i % 7).toInt)).toDF("okey", "tag", "pri")
    val items = (0L until 1200L).map(i => (i % 400, i, (i % 5) * 1.5)).toDF("okey", "item", "amt")
    Bucketing.writeBucketed(orders, "bkt_orders", "okey", 4)
    Bucketing.writeBucketed(items, "bkt_items", "okey", 4)
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_orders", "bkt_items", "okey")
      val plan = joined.queryExecution.executedPlan.toString
      // co-location contract: the sort-merge join consumes the bucketed
      // layout directly — no Exchange on either side
      assert(plan.contains("SortMergeJoin"), plan.linesIterator.take(5).mkString("\n"))
      assert(!plan.contains("Exchange"),
        "bucketed join re-shuffled:\n" + plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
      assert(joined.count() == 1200)
      val amt = joined.filter($"okey" === 3).agg(org.apache.spark.sql.functions.sum("amt"))
        .first().getDouble(0)
      val expect = (0L until 1200L).filter(_ % 400 == 3).map(i => (i % 5) * 1.5).sum
      assert(math.abs(amt - expect) < 1e-9)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_items")
    }
  }

  test("mismatched bucket counts still join correctly (co-location forfeited)") {
    val a = (0L until 100L).map(i => (i, i * 2)).toDF("k", "va")
    val b = (0L until 100L).map(i => (i, i * 3)).toDF("k", "vb")
    Bucketing.writeBucketed(a, "bkt_a", "k", 4)
    Bucketing.writeBucketed(b, "bkt_b", "k", 3)
    try {
      assert(Bucketing.bucketedJoin(spark, "bkt_a", "bkt_b", "k").count() == 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }
}

class JsonlIngestSpec extends SparkSpec {
  import graft.ingest.JsonlIngest
  import org.apache.spark.sql.types._

  test("jsonl split: schema-conformant rows pass, corrupt lines quarantine with raw text") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl")
    java.nio.file.Files.write(dir.resolve("part1.jsonl"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world"}""",
      """{"doc_id": 2, "text": "second doc"}""",
      """{broken json line""",
      """{"doc_id": 3, "text": "third"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val split = JsonlIngest.readJsonl(spark, dir.toString, schema)
    val good = split.good.collect()
    assert(good.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(split.good.columns.toSeq == Seq("doc_id", "text"))
    val bad = split.quarantined.collect()
    assert(bad.length == 1 && bad(0).getString(0).startsWith("{broken"))
    assert(bad(0).getAs[String]("_input_file").contains("part1.jsonl"))
    split.unpersist()
  }

  test("jsonl schema enforcement: wrong-typed field quarantines the row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl2")
    java.nio.file.Files.write(dir.resolve("d.jsonl"), java.util.Arrays.asList(
      """{"doc_id": "not-a-number", "text": "x"}""",
      """{"doc_id": 7, "text": "ok"}"""))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val split = JsonlIngest.readJsonl(spark, dir.toString, schema)
    assert(split.good.collect().map(_.getLong(0)).toSeq == Seq(7L))
    assert(split.quarantined.count() == 1)
  }
}

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction merges a many-file table to the size-derived file count") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (0 until 5000).map(i => (i.toLong, s"row-$i", i * 1.5)).toDF("id", "s", "v")
    df.repartition(20).write.parquet(s"$work/in")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(s"$work/in") == 20)
    val n = graft.warehouse.Bucketing.compactTo(spark, s"$work/in", s"$work/out",
      targetFileBytes = 1L << 40) // huge target -> everything in one file
    assert(n == 1 && parquetFiles(s"$work/out") == 1)
    // content preserved exactly
    val a = spark.read.parquet(s"$work/in").collect().map(_.toSeq).sortBy(_.head.toString)
    val b = spark.read.parquet(s"$work/out").collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("self-overwrite guard fires on equivalent spellings of the same directory") {
    val work = java.nio.file.Files.createTempDirectory("graft_compact_guard").toString
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$work/in")
    // file:-scheme vs bare path resolve to the same qualified location;
    // letting this through would delete the input before the lazy read runs
    val ex = intercept[IllegalArgumentException] {
      graft.warehouse.Bucketing.compactTo(spark, s"$work/in", s"file:$work/in")
    }
    assert(ex.getMessage.contains("compacting a directory onto itself"))
    // data untouched
    assert(spark.read.parquet(s"$work/in").count() == 1)
  }
}

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
}

class TransformCacheSpec extends SparkSpec {
  test("cached transform: second run reuses the feature-stage parquet") {
    val base = java.nio.file.Files.createTempDirectory("graft_tc").toString
    val df = graft.core.ChurnFixture.df(spark, 200)
    val m0 = graft.core.StageCache.stats.misses
    val a = graft.app.DailyPipeline.transformCached(spark, df, base)
    assert(a.count() == 200)
    assert(graft.core.StageCache.stats.misses == m0 + 1)
    val h0 = graft.core.StageCache.stats.hits
    val b = graft.app.DailyPipeline.transformCached(spark, df, base)
    assert(b.count() == 200)
    assert(graft.core.StageCache.stats.hits == h0 + 1)
    assert(a.columns.sorted.toSeq == b.columns.sorted.toSeq)
  }
}
