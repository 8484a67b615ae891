package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md): a TPC-H-ish star
  * schema plus `events`, `documents`, `embeddings`. One parquet per table
  * under the scale-factor dir passed to every query.
  *
  * At cluster scale these would be partitioned/bucketed tables; the loader
  * keeps the path-based contract of the harness while all queries remain
  * agnostic to physical layout (Catalyst sees plain parquet relations, so
  * filter/column pushdown and AQE work unchanged).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** `events.ts` arrives as either parquet TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so the legacy conf reads it as a nanos long
    * we truncate to micros (exactly the NANOS→MICROS cast DuckDB applies) —
    * or TIMESTAMP(MICROS), which reads as TIMESTAMP_NTZ and only needs the
    * cast to the session-TZ timestamp type (value-preserving: sessions run
    * UTC). Branching on the loaded type keeps both generations of the
    * driver testdata working with one loader.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType     => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _            => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
