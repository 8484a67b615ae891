package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** All registered correctness-gate queries. */
  def allDefs: Seq[QueryDef] =
    RelQueries.defs ++ AggQueries.defs ++ TextQueries.defs ++
      DedupQueries.defs ++ VectorQueries.defs ++ OpsQueries.defs ++
      WindowQueries.defs ++ CorpusQueries.defs ++ RankQueries.defs ++
      StatQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.queriesMap(allDefs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryDef.oracleMap(allDefs)
}
