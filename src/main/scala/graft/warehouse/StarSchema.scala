package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Star schema for BI (SURVEY §1.1/§2.3 J2; reference
  * src/storage/data_warehouse.py:421-528 declares dim_user/dim_date/
  * dim_product/dim_channel/dim_device + fact tables as DDL without ever
  * populating them). Here the schema is materialized from the testdata
  * star (orders/customer/nation/region) so the join graph is real and
  * queryable: facts carry surrogate keys, dims are broadcast-joined.
  */
object StarSchema {

  /** Build dims + fact from the TPC-H-ish tables; returns (name -> frame).
    * Dims are tiny (broadcast side); the fact keeps only keys + measures
    * so scans stay narrow.
    */
  def build(spark: SparkSession, dir: String): Map[String, DataFrame] = {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val region = spark.read.parquet(s"$dir/region.parquet")

    val dimCustomer = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey").as("customer_key"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"),
        col("n_name").as("nation"),
        col("r_name").as("region"),
        col("c_acctbal").as("account_balance"))

    val dimDate = orders
      .select(col("o_orderdate").cast("date").as("date_key"))
      .distinct()
      .withColumn("year", year(col("date_key")))
      .withColumn("month", month(col("date_key")))
      .withColumn("day", dayofmonth(col("date_key")))
      .withColumn("quarter", quarter(col("date_key")))
      .withColumn("is_weekend", dayofweek(col("date_key")).isin(1, 7))

    val factOrders = orders.select(
      col("o_orderkey").as("order_key"),
      col("o_custkey").as("customer_key"),
      col("o_orderdate").cast("date").as("date_key"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      col("o_totalprice").as("total_price"))

    Map("dim_customer" -> dimCustomer, "dim_date" -> dimDate,
      "fact_orders" -> factOrders)
  }

  /** Register the star as temp views for spark.sql access. */
  def register(spark: SparkSession, dir: String): Unit =
    build(spark, dir).foreach { case (name, df) => df.createOrReplaceTempView(name) }
}
