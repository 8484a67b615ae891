package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness-gate query: the Spark plan plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL over the same parquet tables. Names of
  * output columns MUST match between the two — the driver sorts columns by
  * name before hashing.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
)(val fn: (SparkSession, String) => DataFrame)

object QueryDef {
  /** Assemble driver-contract maps from registries. */
  def queriesMap(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap
  def oracleMap(defs: Seq[QueryDef]): Map[String, String] =
    defs.collect { case q if q.oracle.isDefined => q.name -> q.oracle.get }.toMap
}
