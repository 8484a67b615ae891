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
