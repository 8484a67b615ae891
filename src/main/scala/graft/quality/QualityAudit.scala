package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import graft.core.Cols.qcol

/** Fused data-quality audit (SURVEY §2.8).
  *
  * The reference computes completeness, uniqueness, validity, consistency,
  * outliers and distribution checks in ~6 separate full-data passes
  * (reference: src/processing/data_quality.py:31-374). Here the audit is
  * two Spark jobs regardless of column count:
  *   1. one wide `agg` emitting null counts, rule-violation counts,
  *      distinct user count, duplicate-row count and distribution stats;
  *   2. one `approx_percentile` pass for IQR outlier fences (exact
  *      percentiles don't scale past memory; approx with tight error is the
  *      documented 100 TB substitution, SURVEY §7 "what's hard").
  * Thresholds and weights mirror data_quality.py:23-28 and :360-374.
  */
object QualityAudit {

  final case class Thresholds(
      completeness: Double = 0.95,
      uniqueness: Double = 0.99,
      validity: Double = 0.98,
      consistency: Double = 0.95)

  final case class AuditReport(
      totalRows: Long,
      completenessScore: Double,
      missingRateByColumn: Map[String, Double],
      uniquenessScore: Double,
      duplicateRowRate: Double,
      keyDistinctRatio: Double,
      validityScore: Double,
      validityViolations: Map[String, Long],
      consistencyScore: Double,
      consistencyViolations: Map[String, Long],
      outlierRateByColumn: Map[String, Double],
      churnRate: Double,
      maxCountryShare: Double,
      overallScore: Double) {
    def passed: Boolean = overallScore >= 0.8
  }

  /** Validity rules: (name, violation predicate). Reference
    * data_quality.py:139-201.
    */
  val validityRules: Seq[(String, Column)] = Seq(
    "age_out_of_range" -> (col("age") < 13 || col("age") > 100),
    "churn_not_binary" -> !col("churn_label").isin(0, 1),
    "email_open_rate_out_of_range" ->
      (col("emails_open_rate_90d") < 0 || col("emails_open_rate_90d") > 1),
    "email_click_rate_out_of_range" ->
      (col("emails_click_rate_90d") < 0 || col("emails_click_rate_90d") > 1),
    "negative_gmv" -> (col("gmv_2024") < 0),
  )

  /** Consistency invariants: (name, violation predicate). Reference
    * data_quality.py:210-266.
    */
  val consistencyRules: Seq[(String, Column)] = Seq(
    "sessions_30d_gt_90d" -> (col("sessions_30d") > col("sessions_90d")),
    "orders_30d_gt_90d" -> (col("orders_30d") > col("orders_90d")),
    "gmv_aov_mismatch" ->
      (abs(col("gmv_2024") - col("aov_2024") * col("orders_2024")) > lit(0.01)),
  )

  def audit(df: DataFrame, thresholds: Thresholds = Thresholds()): AuditReport = {
    val cols = df.columns.filterNot(_.startsWith("_")).toSeq
    val numericCols = df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType] && !f.name.startsWith("_"))
      .map(_.name).toSeq

    // ---- pass 1: one wide aggregate (completeness+uniqueness+validity+
    //      consistency+distribution in a single shuffle-free scan, plus one
    //      count-distinct shuffle Catalyst plans into the same job)
    val nullAggs = cols.map(c => sum(qcol(c).isNull.cast("long")).as(s"null_$c"))
    val vioAggs = (validityRules ++ consistencyRules).map { case (n, bad) =>
      sum(coalesce(bad.cast("long"), lit(0L))).as(s"vio_$n")
    }
    val keyAgg =
      if (cols.contains("user_id")) Seq(countDistinct(col("user_id")).as("distinct_key"))
      else Seq(lit(0L).as("distinct_key"))
    val churnAgg =
      if (cols.contains("churn_label"))
        Seq(avg(col("churn_label").cast("double")).as("churn_rate"))
      else Seq(lit(0.0).as("churn_rate"))
    val base = count(lit(1)).as("total")
    val row = df.agg(base, (nullAggs ++ vioAggs ++ keyAgg ++ churnAgg): _*).collect()(0)

    val total = row.getAs[Long]("total")
    val n = math.max(total, 1L).toDouble

    // duplicate-row rate: count minus distinct-over-all-columns (A5)
    val distinctRows = df.dropDuplicates().count()
    val dupRate = (total - distinctRows) / n

    // country dominance (A2): small second agg over one column
    val maxCountryShare =
      if (cols.contains("country") && total > 0)
        df.groupBy("country").count().agg(max("count")).collect()(0).getLong(0) / n
      else 0.0

    // ---- pass 2: IQR outlier rates from one approx-quantile job
    val outlierRates: Map[String, Double] =
      if (numericCols.isEmpty || total == 0) Map.empty
      else {
        val qs = df.stat.approxQuantile(numericCols.toArray, Array(0.25, 0.75), 1e-4)
        val fences = numericCols.zip(qs).map { case (c, Array(q1, q3)) =>
          val iqr = q3 - q1
          c -> (q1 - 1.5 * iqr, q3 + 1.5 * iqr)
        }
        val outAggs = fences.map { case (c, (lo, hi)) =>
          sum(coalesce((qcol(c) < lo || qcol(c) > hi).cast("long"), lit(0L))).as(s"out_$c")
        }
        val orow = df.agg(outAggs.head, outAggs.tail: _*).collect()(0)
        numericCols.map(c => c -> orow.getAs[Long](s"out_$c") / n).toMap
      }

    val missingRates = cols.map(c => c -> row.getAs[Long](s"null_$c") / n).toMap
    val completeness = 1.0 - (if (cols.nonEmpty) missingRates.values.sum / cols.size else 0.0)

    val keyRatio =
      if (cols.contains("user_id") && total > 0) row.getAs[Long]("distinct_key") / n else 1.0
    val uniqueness = keyRatio * (1.0 - dupRate)

    val validityVios = validityRules.map { case (nm, _) => nm -> row.getAs[Long](s"vio_$nm") }
    val validity = 1.0 - math.min(1.0, validityVios.map(_._2).sum / n)
    val consistencyVios = consistencyRules.map { case (nm, _) => nm -> row.getAs[Long](s"vio_$nm") }
    val consistency = 1.0 - math.min(1.0, consistencyVios.map(_._2).sum / n)

    val avgOutlier =
      if (outlierRates.nonEmpty) outlierRates.values.sum / outlierRates.size else 0.0
    val outlierScore = 1.0 - math.min(1.0, avgOutlier)

    // weights mirror data_quality.py:360-374
    val overall = 0.25 * completeness + 0.20 * uniqueness + 0.25 * validity +
      0.20 * consistency + 0.10 * outlierScore

    AuditReport(
      totalRows = total,
      completenessScore = completeness,
      missingRateByColumn = missingRates.filter(_._2 > 0),
      uniquenessScore = uniqueness,
      duplicateRowRate = dupRate,
      keyDistinctRatio = keyRatio,
      validityScore = validity,
      validityViolations = validityVios.filter(_._2 > 0).toMap,
      consistencyScore = consistency,
      consistencyViolations = consistencyVios.filter(_._2 > 0).toMap,
      outlierRateByColumn = outlierRates.filter(_._2 > 0.05),
      churnRate = row.getAs[Double]("churn_rate"),
      maxCountryShare = maxCountryShare,
      overallScore = overall)
  }
}
