package graft.core

import org.apache.spark.sql.types._

/** The churn dataset contract: 33 declared columns, one row per user.
  * Mirrors the reference's JSON validation schema
  * (reference: config/schemas/churn_schema.json:4-193) and warehouse DDL
  * (reference: init.sql:12-49). The explicit StructType is the real
  * contract — inference is only a parity mode (SURVEY §1.3).
  */
object ChurnSchema {
  val schema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = true),
    StructField("age", IntegerType, nullable = true),
    StructField("country", StringType, nullable = true),
    StructField("city", StringType, nullable = true),
    StructField("reg_days", IntegerType, nullable = true),
    StructField("marketing_source", StringType, nullable = true),
    StructField("sessions_30d", IntegerType, nullable = true),
    StructField("sessions_90d", IntegerType, nullable = true),
    StructField("avg_session_duration_90d", DoubleType, nullable = true),
    StructField("median_pages_viewed_30d", DoubleType, nullable = true),
    StructField("search_queries_30d", IntegerType, nullable = true),
    StructField("device_mix_ratio", DoubleType, nullable = true),
    StructField("app_version_major", StringType, nullable = true),
    StructField("orders_30d", IntegerType, nullable = true),
    StructField("orders_90d", IntegerType, nullable = true),
    StructField("orders_2024", IntegerType, nullable = true),
    StructField("aov_2024", DoubleType, nullable = true),
    StructField("gmv_2024", DoubleType, nullable = true),
    StructField("category_diversity_2024", IntegerType, nullable = true),
    StructField("days_since_last_order", IntegerType, nullable = true),
    StructField("discount_rate_2024", DoubleType, nullable = true),
    StructField("refunds_count_2024", IntegerType, nullable = true),
    StructField("refund_rate_2024", DoubleType, nullable = true),
    StructField("support_tickets_2024", IntegerType, nullable = true),
    StructField("avg_csat_2024", DoubleType, nullable = true),
    StructField("emails_open_rate_90d", DoubleType, nullable = true),
    StructField("emails_click_rate_90d", DoubleType, nullable = true),
    StructField("review_count_2024", IntegerType, nullable = true),
    StructField("avg_review_stars_2024", DoubleType, nullable = true),
    StructField("rfm_recency", IntegerType, nullable = true),
    StructField("rfm_frequency", IntegerType, nullable = true),
    StructField("rfm_monetary", DoubleType, nullable = true),
    StructField("churn_label", IntegerType, nullable = true),
  ))

  val columns: Seq[String] = schema.fieldNames.toSeq

  val countries: Seq[String] =
    Seq("Thailand", "Indonesia", "Malaysia", "Philippines", "Vietnam")
  val marketingSources: Seq[String] =
    Seq("organic", "referral", "ads_fb", "ads_ig", "influencer", "other")

  /** Columns never normalized / clipped (reference: etl_pipeline.py:238 and
    * :195 — label and raw RFM inputs stay on their original scale).
    */
  val zscoreExclusions: Seq[String] =
    Seq("churn_label", "rfm_recency", "rfm_frequency", "rfm_monetary")
  val clipExclusions: Seq[String] =
    Seq("churn_label", "rfm_recency", "rfm_frequency")

  /** Lineage/metadata columns (SURVEY §1.3), systematically excluded from
    * features and ML.
    */
  val metadataPrefix = "_"
}
