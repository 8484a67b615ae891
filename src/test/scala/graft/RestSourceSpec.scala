package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import graft.ingest.RestSource

/** The DataSource V2 REST source: partition planning, limit pushdown
  * reaching the fetcher (fewer pages actually requested), column pruning
  * reaching the JSON parser, and short-page termination in sequential
  * mode.
  */
object RestSourceSpec {
  // everything the fetcher lambdas touch lives HERE, not on the spec
  // instance: the lambdas serialize into the planned input partitions,
  // and module singletons resolve by name on executor-side
  // deserialization (so the counter stays shared) while a captured spec
  // instance would drag the non-serializable scalatest engine along
  val fetchCount = new AtomicInteger(0)

  private def row(i: Int): String = s"""{"id":$i,"name":"n$i","v":${i / 2.0}}"""

  // 25 full pages, then empty
  val fixed: graft.ingest.RestIngest.Fetcher = (page, pageSize) => {
    fetchCount.incrementAndGet()
    if (page > 25) Seq.empty
    else (0 until pageSize).map(j => row((page - 1) * pageSize + j))
  }
  // 12 full pages then a 5-row short page
  val short: graft.ingest.RestIngest.Fetcher = (page, pageSize) => {
    fetchCount.incrementAndGet()
    if (page < 13) (0 until pageSize).map(j => row((page - 1) * pageSize + j))
    else if (page == 13) (0 until 5).map(j => row(120 + j))
    else Seq.empty
  }
}

class RestSourceSpec extends SparkSpec {
  import RestSourceSpec.fetchCount

  private val ddl = "id BIGINT, name STRING, v DOUBLE"

  override def beforeAll(): Unit = {
    super.beforeAll()
    RestSource.registerFetcher("fixed", RestSourceSpec.fixed)
    RestSource.registerFetcher("short", RestSourceSpec.short)
  }

  private def read(fetcher: String, opts: (String, String)*) = {
    val base = spark.read.format("graft-rest")
      .option("fetcher", fetcher).option("schema", ddl)
      .option("pageSize", "10")
    opts.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("planned page ranges fan out as input partitions and parse typed rows") {
    val df = read("fixed", "pages" -> "25", "pagesPerPartition" -> "8")
    assert(df.rdd.getNumPartitions == 4, "ceil(25/8) page-range partitions")
    assert(df.count() == 250)
    val r = df.filter("id = 123").collect()
    assert(r.length == 1 && r(0).getString(1) == "n123" && r(0).getDouble(2) == 61.5)
  }

  test("pushed limit caps the pages actually fetched") {
    fetchCount.set(0)
    val got = read("fixed", "pages" -> "25").limit(7).collect()
    assert(got.length == 7)
    assert(fetchCount.get() == 1,
      s"LIMIT 7 at pageSize 10 must fetch exactly 1 of the 25 pages, fetched ${fetchCount.get()}")
  }

  test("column pruning reaches the scan's read schema") {
    val df = read("fixed", "pages" -> "2").select("name")
    val scan = df.queryExecution.executedPlan
      .collect { case b: BatchScanExec => b }.head.scan
    assert(scan.readSchema().fieldNames.toSeq == Seq("name"),
      s"parser must materialize only the required column, got ${scan.readSchema()}")
    assert(df.collect().map(_.getString(0)).take(2).forall(_.startsWith("n")))
  }

  test("sequential mode terminates on the short page in one partition") {
    val df = read("short")
    assert(df.rdd.getNumPartitions == 1,
      "unknown page count pages sequentially in a single reader")
    assert(df.count() == 125, "12 full pages + the 5-row short page")
  }

  test("an unregistered fetcher fails loudly at plan time") {
    val e = intercept[IllegalArgumentException] {
      read("nope", "pages" -> "1").collect()
    }
    assert(e.getMessage.contains("registerFetcher"))
  }
}
