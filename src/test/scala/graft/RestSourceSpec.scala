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

  // records the wall-clock instant of every request, for the global-
  // budget contract (local mode: all readers share this JVM queue)
  val stampQueue = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  val stamped: graft.ingest.RestIngest.Fetcher = (page, pageSize) => {
    stampQueue.add(System.currentTimeMillis())
    if (page > 12) Seq.empty
    else (0 until pageSize).map(j => row((page - 1) * pageSize + j))
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

  test("globalBudget: aggregate requests across all readers respect the global window") {
    RestSource.registerFetcher("stamped", RestSourceSpec.stamped)
    val budget = 3; val window = 600L
    val df = read("stamped", "pages" -> "12", "pagesPerPartition" -> "2",
      "maxRequestsPerWindow" -> budget.toString,
      "windowMillis" -> window.toString, "globalBudget" -> "true")
    // the planner caps partitions at the budget (6 two-page ranges
    // would each get floor(3/6) = 0 requests; 3 four-page ranges keep
    // one per reader per window)
    assert(df.rdd.getNumPartitions == budget,
      s"partitions must be capped at the budget, got ${df.rdd.getNumPartitions}")
    RestSourceSpec.stampQueue.clear()
    assert(df.count() == 120)
    val stamps = RestSourceSpec.stampQueue.toArray(Array.empty[java.lang.Long])
      .map(_.toLong).sorted
    assert(stamps.length == 12, s"12 pages -> 12 requests, got ${stamps.length}")
    // any budget+1 consecutive requests span >= the window: by
    // pigeonhole two of them came from the same reader, whose limiter
    // enforces the gap — i.e. no window ever holds more than `budget`
    // requests in aggregate (small slop for clock skew between the
    // limiter's reading and the fetcher's)
    val slop = 120L
    stamps.sliding(budget + 1).foreach { w =>
      if (w.length == budget + 1)
        assert(w.last - w.head >= window - slop,
          s"burst above global budget: ${w.map(_ - stamps.head).toSeq}")
    }
    // without the flag the same read spends the budget PER READER: it
    // must finish much faster (readers in parallel, no global split)
    RestSourceSpec.stampQueue.clear()
    val perReader = read("stamped", "pages" -> "12", "pagesPerPartition" -> "2",
      "maxRequestsPerWindow" -> budget.toString,
      "windowMillis" -> window.toString)
    assert(perReader.rdd.getNumPartitions == 6, "no cap without globalBudget")
    assert(perReader.count() == 120)
  }

  test("an unregistered fetcher fails loudly at plan time") {
    val e = intercept[IllegalArgumentException] {
      read("nope", "pages" -> "1").collect()
    }
    assert(e.getMessage.contains("registerFetcher"))
  }
}
