package graft

import org.apache.spark.sql.functions._
import graft.core.{ChurnFixture, StageCache}
import graft.ingest.RestIngest
import graft.streaming.Streaming
import graft.warehouse.{Sinks, StarSchema}

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
