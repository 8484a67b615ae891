package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.util.Random

/** Deterministic churn-shaped fixture (FIXTURES.md §1): valid rows by
  * construction, with knobs to inject the error classes the validator /
  * cleaner must handle (bad patterns, out-of-range, nulls, duplicates,
  * inconsistent invariants, extreme outliers).
  */
object ChurnFixture {

  /** Churn with real signal (low activity, staleness, refunds) plus noise,
    * so ML eval gates (accuracy >= 0.75, AUC >= 0.80) are meaningful.
    * Base rate lands around 10-15%.
    */
  private def churnLabel(
      rnd: Random, sessions30: Int, orders30: Int,
      daysSinceLast: Int, refundRate: Double): Int = {
    val z = -2.8 +
      (if (sessions30 == 0) 1.6 else -0.012 * sessions30) +
      (if (orders30 == 0) 0.9 else -0.08 * orders30) +
      0.009 * daysSinceLast +
      4.0 * refundRate +
      0.8 * rnd.nextGaussian()
    if (1.0 / (1.0 + math.exp(-z)) > 0.5) 1 else 0
  }

  def validRows(n: Int, seed: Long = 42L): Seq[Row] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val sessions90 = rnd.nextInt(200)
      val sessions30 = if (sessions90 == 0) 0 else rnd.nextInt(sessions90 + 1)
      val orders90 = rnd.nextInt(50)
      val orders30 = if (orders90 == 0) 0 else rnd.nextInt(orders90 + 1)
      val orders2024 = orders90 + rnd.nextInt(50)
      val aov = math.rint((10 + rnd.nextDouble() * 190) * 100) / 100
      val gmv = math.rint(aov * orders2024 * 100) / 100
      val daysSinceLast = rnd.nextInt(366)
      val refundRate = math.rint(rnd.nextDouble() * 0.3 * 100) / 100
      Row(
        f"U$i%05d", // user_id
        13 + rnd.nextInt(88), // age
        ChurnSchema.countries(rnd.nextInt(ChurnSchema.countries.size)),
        s"City${rnd.nextInt(30)}", // city
        rnd.nextInt(3651), // reg_days
        ChurnSchema.marketingSources(rnd.nextInt(ChurnSchema.marketingSources.size)),
        sessions30, sessions90,
        math.rint(rnd.nextDouble() * 3600 * 100) / 100, // avg_session_duration_90d
        math.rint(rnd.nextDouble() * 20 * 100) / 100, // median_pages_viewed_30d
        rnd.nextInt(100), // search_queries_30d
        math.rint(rnd.nextDouble() * 100) / 100, // device_mix_ratio
        s"${1 + rnd.nextInt(3)}.x", // app_version_major
        orders30, orders90, orders2024,
        aov, gmv,
        rnd.nextInt(15), // category_diversity_2024
        daysSinceLast, // days_since_last_order
        math.rint(rnd.nextDouble() * 100) / 100, // discount_rate_2024
        rnd.nextInt(5), // refunds_count_2024
        refundRate, // refund_rate_2024
        rnd.nextInt(10), // support_tickets_2024
        math.rint((1 + rnd.nextDouble() * 4) * 100) / 100, // avg_csat_2024
        math.rint(rnd.nextDouble() * 100) / 100, // emails_open_rate_90d
        math.rint(rnd.nextDouble() * 100) / 100, // emails_click_rate_90d
        rnd.nextInt(20), // review_count_2024
        math.rint((1 + rnd.nextDouble() * 4) * 100) / 100, // avg_review_stars_2024
        rnd.nextInt(366), // rfm_recency
        rnd.nextInt(100), // rfm_frequency
        math.rint(rnd.nextDouble() * 10000 * 100) / 100, // rfm_monetary
        churnLabel(rnd, sessions30, orders30, daysSinceLast, refundRate),
      )
    }
  }

  def df(spark: SparkSession, n: Int = 500, seed: Long = 42L): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(validRows(n, seed), 4), ChurnSchema.schema)

  /** Fixture with injected problems; returns the frame. */
  def dirtyDf(spark: SparkSession, n: Int = 500, seed: Long = 42L): DataFrame = {
    val base = validRows(n, seed)
    val bad = Seq(
      Row("X9999", 12, "France", "Paris", -5, "tv_ads", 10, 5, // bad id/age/country/source + sessions30>90
        100.0, 5.0, 10, 0.5, "3.x", 3, 2, 10, 50.0, 9999.0, // orders30>90, gmv != aov*orders
        3, 400, 0.5, 0, 0.05, 1, 4.5, 0.5, 0.2, 3, 4.0, 10, 5, 100.0, 2),
      Row(null, null, null, null, null, null, null, null, null, null, null, null,
        null, null, null, null, null, null, null, null, null, null, null, null,
        null, null, null, null, null, null, null, null, null),
    )
    val dupes = base.take(3) // exact duplicate rows
    spark.createDataFrame(
      spark.sparkContext.parallelize(base ++ bad ++ dupes, 4), ChurnSchema.schema)
  }
}
