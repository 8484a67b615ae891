package graft.analytics

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.stat.Correlation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Cols.qcol

/** Dashboard/serving aggregations over the processed churn frame
  * (SURVEY §3.3; reference src/dashboard/views/pages.py:18-137 and
  * src/serving/api.py:218-306): churn rate by country, label
  * distribution, engagement correlation matrix, point lookup.
  */
object ChurnAnalytics {

  /** A1: churn rate per country (the reference's headline dashboard
    * query, pages.py:96-101). Works pre- or post-one-hot: reconstructs
    * the country from dummy columns when needed (F15).
    */
  def churnRateByCountry(df: DataFrame): DataFrame = {
    val withCountry =
      if (df.columns.contains("country")) df
      else {
        val dummies = df.columns.filter(_.startsWith("country_")).toSeq
        require(dummies.nonEmpty, "no country column or dummies present")
        val name = dummies.map(c => when(qcol(c) === 1, c.stripPrefix("country_")))
          .reduce((a, b) => coalesce(a, b))
        df.withColumn("country", name)
      }
    withCountry.groupBy("country")
      .agg(
        count(lit(1)).as("total_users"),
        sum(col("churn_label")).as("churned"),
        avg(col("churn_label").cast("double")).as("churn_rate"))
      .orderBy(desc("churn_rate"), asc("country"))
  }

  /** A2: label distribution with display mapping (F11). */
  def churnDistribution(df: DataFrame): DataFrame =
    df.groupBy("churn_label")
      .agg(count(lit(1)).as("n"))
      .withColumn("share", col("n") / sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("label_display",
        when(col("churn_label") === 0, "Loyal").otherwise("Churned"))
      .orderBy("churn_label")

  /** A12: Pearson correlation matrix of engagement columns + target via
    * ml.stat.Correlation on an assembled vector (one pass).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): Array[Array[Double]] = {
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("_corr_vec")
      .setHandleInvalid("skip")
      .transform(df.select(cols.map(qcol): _*))
    val m = Correlation.corr(assembled, "_corr_vec").head
      .getAs[org.apache.spark.ml.linalg.Matrix](0)
    Array.tabulate(m.numRows, m.numCols)((i, j) => m(i, j))
  }

  /** P4: point lookup (the /predict/{user_id} read path). On a parquet
    * gold table this prunes to matching row groups via min/max stats.
    */
  def lookupUser(df: DataFrame, userId: String): DataFrame =
    df.filter(col("user_id") === userId)

  /** J3: two-source fallback lookup (reference api.py:243-255 — query the
    * features table, fall back to users_processed when empty).
    */
  def lookupUserWithFallback(
      primary: DataFrame, fallback: DataFrame, userId: String): DataFrame = {
    val hit = lookupUser(primary, userId)
    if (hit.isEmpty) lookupUser(fallback, userId) else hit
  }
}
