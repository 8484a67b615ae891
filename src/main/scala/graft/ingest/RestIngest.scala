package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** REST API ingestion (SURVEY §2.1 S4; reference
  * src/ingestion/api_ingestion.py:47-239): paginated GET with a sliding-
  * window rate limiter and optional `updated_since` incremental pulls.
  *
  * The fetcher is injected (`(page, pageSize) => Seq[String]` of JSON
  * rows) — the engine layer owns pagination, rate limiting, lineage and
  * schema application, not HTTP plumbing. Two execution shapes:
  *  - `fetchAll`: driver-side sequential paging (the reference's shape) —
  *    correct for rate-limited APIs where the limiter must be global;
  *  - `fetchPartitioned`: page ranges distributed across executors via
  *    mapPartitions for backfills where the API allows parallel readers.
  */
object RestIngest {

  /** Sliding-window rate limiter (reference api_ingestion.py:207-239:
    * default 100 requests / 60 s window).
    */
  final class RateLimiter(maxRequests: Int = 100, windowMillis: Long = 60000L,
      clock: () => Long = () => System.currentTimeMillis(),
      sleep: Long => Unit = Thread.sleep) {
    private val stamps = scala.collection.mutable.Queue.empty[Long]
    def acquire(): Unit = synchronized {
      val now = clock()
      while (stamps.nonEmpty && stamps.head <= now - windowMillis) stamps.dequeue()
      if (stamps.size >= maxRequests) {
        val wait = stamps.head + windowMillis - now
        if (wait > 0) sleep(wait)
        acquire()
      } else stamps.enqueue(clock())
    }
  }

  type Fetcher = (Int, Int) => Seq[String] // (page, pageSize) => JSON rows

  /** Incremental pull (reference api_ingestion.py:77-78 `updated_since`):
    * the watermark is pushed to the API as a fetcher parameter; the
    * returned fetcher pages only records updated at/after it. Callers
    * persist the max ingestion timestamp per run and pass it back on the
    * next (the streaming-free CDC pattern).
    */
  def incremental(fetcherFor: String => Fetcher, updatedSince: String): Fetcher =
    fetcherFor(updatedSince)

  /** Driver-side paginated fetch: stops on an empty or short page
    * (reference :120-140). Returns raw JSON rows.
    */
  def fetchAll(fetcher: Fetcher, pageSize: Int = 100,
      limiter: Option[RateLimiter] = None, maxPages: Int = 10000): Seq[String] = {
    val out = Seq.newBuilder[String]
    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      limiter.foreach(_.acquire())
      val rows = fetcher(page, pageSize)
      out ++= rows
      done = rows.size < pageSize
      page += 1
    }
    out.result()
  }

  /** JSON rows → typed DataFrame with ingestion lineage (the `_source_
    * endpoint` analog of api_ingestion.py:166-172).
    */
  def toDataFrame(spark: SparkSession, rows: Seq[String], schema: StructType,
      endpoint: String): DataFrame = {
    import spark.implicits._
    val ds: Dataset[String] = spark.createDataset(rows)
    spark.read.schema(schema).json(ds)
      .withColumn("_ingestion_timestamp", current_timestamp())
      .withColumn("_source_endpoint", lit(endpoint))
  }

  /** Distributed backfill: page ranges fan out over executors. The fetcher
    * must be serializable and the API parallel-safe; rate limiting becomes
    * per-executor here — for the reference's global-budget semantics use
    * `spark.read.format("graft-rest")` with `globalBudget=true`
    * ([[RestSource]]), which splits the budget across planned readers.
    */
  def fetchPartitioned(spark: SparkSession, totalPages: Int, pageSize: Int,
      fetcher: Fetcher, parallelism: Int = 8): Dataset[String] = {
    import spark.implicits._
    spark.createDataset(1 to totalPages).repartition(parallelism)
      .mapPartitions(pages => pages.flatMap(p => fetcher(p, pageSize)))
  }
}
