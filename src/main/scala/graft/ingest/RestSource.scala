package graft.ingest

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownLimit, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The REST source as a REAL DataSource V2 `TableProvider` — the at-scale
  * shape SURVEY S4 maps the reference's paginated API ingestion to
  * (src/ingestion/api_ingestion.py:47-239): `spark.read.format("graft-rest")`
  * plans page RANGES as input partitions, so a backfill fans out across
  * executors under Spark's own scheduler instead of a driver loop, and the
  * optimizer talks to the source directly:
  *
  *  - **Limit pushdown** ([[SupportsPushDownLimit]]): `df.limit(n)` caps
  *    the planned pages at ceil(n / pageSize) — a LIMIT 10 probe of a
  *    million-page API fetches ONE page, not all of them.
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the JSON
  *    parser materializes only the required fields (`ReadSchema` in
  *    explain shows the pruned struct).
  *
  * The fetcher `(page, pageSize) => Seq[String]` is injected per options
  * key from [[RestSource.registerFetcher]] and SHIPS INSIDE the input
  * partitions (it must be `Serializable`; registration is a driver-side
  * convenience so plain string options can name it). HTTP plumbing stays
  * out of the engine, same separation as [[RestIngest]]. Rate limiting is
  * per partition reader (`maxRequestsPerWindow`/`windowMillis` options) by
  * default — N partitions spend N× the stated budget. `globalBudget=true`
  * restores the reference's GLOBAL semantics (api_ingestion.py:207-239,
  * one 100 req/min budget for the whole job) without an external token
  * service: the budget is split across the planned partitions at plan
  * time — each reader gets `floor(budget / numPartitions)` requests per
  * window, and the partition count itself is CAPPED at the budget so
  * every reader keeps at least one request per window (fewer, larger
  * page ranges — trading parallelism for the guarantee, which is the
  * right trade: the API budget, not the cluster, is the bottleneck by
  * definition). Aggregate requests across all readers then stay within
  * the budget per window (pigeonhole over the per-reader limiters;
  * contract-tested).
  *
  * Options: `fetcher` (registry key, required), `schema` (DDL, required
  * unless passed via `.schema(...)`), `pages` (total page count; omit for
  * sequential short-page-terminated paging in ONE partition — the
  * rate-limited incremental-pull shape), `pageSize` (default 100),
  * `pagesPerPartition` (default 8), `maxRequestsPerWindow`/`windowMillis`
  * (optional rate limit), `globalBudget` (default false: the limit is
  * per reader).
  */
object RestSource {
  private val fetchers =
    new java.util.concurrent.ConcurrentHashMap[String, RestIngest.Fetcher]()

  /** Register a fetcher under a name usable as the `fetcher` option. The
    * function must be Serializable — it travels to executors inside the
    * planned input partitions.
    */
  def registerFetcher(name: String, f: RestIngest.Fetcher): Unit =
    fetchers.put(name, f)

  private[ingest] def fetcher(name: String): RestIngest.Fetcher = {
    val f = fetchers.get(name)
    require(f != null,
      s"no fetcher registered as '$name' — call RestSource.registerFetcher first")
    f
  }
}

class RestSourceProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "graft-rest needs a schema: pass .schema(...) or the 'schema' option (DDL)")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(schema, new CaseInsensitiveStringMap(properties))
}

private final class RestTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${options.get("fetcher")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, options)
}

private final class RestScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  private var limit: Option[Int] = None

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  // the source fetches WHOLE pages (ceil(n/pageSize) of them), so it may
  // emit up to a page more than n rows — Spark must keep its global limit
  override def isPartiallyPushed: Boolean = true
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val fetcherKey = options.get("fetcher")
    require(fetcherKey != null, "graft-rest requires the 'fetcher' option")
    new RestScan(
      fullSchema, required,
      RestSource.fetcher(fetcherKey), // resolved ON THE DRIVER at plan time
      pages = Option(options.get("pages")).map(_.toInt),
      pageSize = options.getInt("pageSize", 100),
      pagesPerPartition = options.getInt("pagesPerPartition", 8),
      maxRequests = Option(options.get("maxRequestsPerWindow")).map(_.toInt),
      windowMillis = options.getLong("windowMillis", 60000L),
      limit = limit,
      globalBudget = options.getBoolean("globalBudget", false))
  }
}

private final case class RestScan(
    fullSchema: StructType, required: StructType, fetch: RestIngest.Fetcher,
    pages: Option[Int], pageSize: Int, pagesPerPartition: Int,
    maxRequests: Option[Int], windowMillis: Long, limit: Option[Int],
    globalBudget: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-rest pages=${pages.getOrElse(-1)} pageSize=$pageSize " +
      s"pushedLimit=${limit.getOrElse(-1)} globalBudget=$globalBudget"

  private lazy val partitions: Array[InputPartition] = pages match {
    case None =>
      // unknown page count: sequential short-page-terminated paging, one
      // partition (the incremental-pull shape, where a global rate limit
      // is honored trivially by the single reader)
      Array(RestPartition(1, Int.MaxValue, sequential = true))
    case Some(total) =>
      // a pushed LIMIT n needs only ceil(n / pageSize) pages — the whole
      // point of letting the optimizer talk to the source
      val needed = limit
        .map(n => math.min(total.toLong, (n.toLong + pageSize - 1) / pageSize).toInt)
        .getOrElse(total)
      // under a global budget the partition count is capped at the
      // budget so the per-reader split below never rounds to zero: each
      // reader keeps >= 1 request per window and the aggregate stays
      // within budget (fewer, larger page ranges — the API budget is
      // the bottleneck, not the cluster)
      val ppp = maxRequests match {
        case Some(budget) if globalBudget =>
          val maxParts = math.max(1, math.min(budget,
            (needed + pagesPerPartition - 1) / pagesPerPartition))
          math.max(pagesPerPartition, (needed + maxParts - 1) / maxParts)
        case _ => pagesPerPartition
      }
      (1 to needed by ppp).map(start =>
        RestPartition(start, math.min(start + ppp - 1, needed),
          sequential = false): InputPartition).toArray
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory = {
    // the global budget splits evenly across the planned readers; the
    // partition cap above guarantees the floor is >= 1
    val perReader = maxRequests.map { budget =>
      if (globalBudget) math.max(1, budget / math.max(1, partitions.length))
      else budget
    }
    RestReaderFactory(fullSchema, required, fetch, pageSize, perReader, windowMillis)
  }
}

/** A page range; the fetcher lives in the reader factory (both serialize
  * to executors).
  */
private final case class RestPartition(startPage: Int, endPage: Int,
    sequential: Boolean) extends InputPartition

private final case class RestReaderFactory(
    fullSchema: StructType, required: StructType, fetch: RestIngest.Fetcher,
    pageSize: Int, maxRequests: Option[Int], windowMillis: Long)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPartitionReader(fullSchema, required, fetch,
      partition.asInstanceOf[RestPartition], pageSize, maxRequests, windowMillis)
}

private final class RestPartitionReader(
    fullSchema: StructType, required: StructType, fetch: RestIngest.Fetcher,
    part: RestPartition, pageSize: Int, maxRequests: Option[Int], windowMillis: Long)
    extends PartitionReader[InternalRow] {

  // Spark's own JSON parse path (JacksonParser) against the PRUNED
  // schema: unrequired fields are never materialized
  private val parser = new org.apache.spark.sql.catalyst.json.JacksonParser(
    required,
    new org.apache.spark.sql.catalyst.json.JSONOptions(
      Map.empty[String, String], "UTC"),
    allowArrayAsStructs = false,
    Seq.empty)
  private val createParser = (jf: com.fasterxml.jackson.core.JsonFactory, s: String) =>
    org.apache.spark.sql.catalyst.json.CreateJacksonParser.string(jf, s)
  private val limiter = maxRequests.map(n =>
    new RestIngest.RateLimiter(n, windowMillis))

  private var page = part.startPage
  private var exhausted = false
  private var rows: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  private def fetchNextPage(): Unit = {
    if (page > part.endPage || exhausted) { rows = Iterator.empty; exhausted = true; return }
    limiter.foreach(_.acquire())
    val batch = fetch(page, pageSize)
    page += 1
    // short page = end of the feed (only meaningful when paging
    // sequentially; planned ranges trust the planner's page count)
    if (part.sequential && batch.size < pageSize) exhausted = true
    // malformed records (an HTML error page, truncated JSON) are DROPPED
    // rather than killing the query: JacksonParser throws the internal
    // BadRecordException that Spark's own json source routes through
    // FailureSafeParser — flaky APIs are the norm, and one bad element
    // must not abort a backfill (same quarantine stance as JsonlIngest)
    rows = batch.iterator.flatMap { json =>
      try parser.parse(json, createParser,
        org.apache.spark.unsafe.types.UTF8String.fromString)
      catch {
        case _: org.apache.spark.sql.catalyst.util.BadRecordException =>
          Iterator.empty
      }
    }
  }

  override def next(): Boolean = {
    while (!rows.hasNext) {
      if (exhausted && !rows.hasNext) return false
      val before = page
      fetchNextPage()
      if (page == before && !rows.hasNext) return false
    }
    current = rows.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
