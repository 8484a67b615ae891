package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.recommendation.{ALS, ALSModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collaborative-filtering recommender — ALS matrix factorization
  * (spark.ml's distributed blocked ALS; Koren/Hu et al., public
  * literature) over the customer x part purchase matrix. An extension
  * surface like the churn model: the reference pipeline scores churn
  * risk but has no "what to offer the customer" leg; the natural
  * companion on the same star schema is implicit-feedback
  * recommendations from order history.
  *
  * Scale shape: spark.ml ALS is the canonical distributed MF — factor
  * blocks co-partitioned by id, normal-equation solves per block, no
  * driver-side matrix. Ratings derive from ONE join+groupBy pass over
  * lineitem. Ids: ALS requires 32-bit ids; TPC-H keys fit directly, and
  * a corpus with 64-bit ids takes the documented zipWithIndex/id-table
  * detour first (kept out of this operator — id mapping is a join, not
  * an ML concern).
  *
  * Determinism/eval contract (RecommenderSpec): gate is METRIC-based
  * like the churn model's (M10 pattern): the fitted model must beat the
  * global-mean baseline RMSE on a held-out split, and `recommendItems`
  * must emit exactly k well-formed, score-descending rows per user.
  */
object Recommender {

  final case class Config(
      rank: Int = 10,
      maxIter: Int = 10,
      regParam: Double = 0.1,
      implicitPrefs: Boolean = false,
      seed: Long = 42L)

  /** Purchase-quantity ratings: (user = o_custkey, item = l_partkey,
    * rating = sum of quantities) from one orders⋈lineitem pass.
    */
  def purchaseRatings(orders: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"), col("o_custkey")),
        Seq("l_orderkey"))
      .groupBy(col("o_custkey").cast("int").as("user"),
        col("l_partkey").cast("int").as("item"))
      .agg(sum("l_quantity").cast("float").as("rating"))

  def fit(ratings: DataFrame, cfg: Config = Config()): ALSModel =
    new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(cfg.rank).setMaxIter(cfg.maxIter).setRegParam(cfg.regParam)
      .setImplicitPrefs(cfg.implicitPrefs).setSeed(cfg.seed)
      .setColdStartStrategy("drop")
      .fit(ratings)

  /** Held-out RMSE of `model` and of the global-mean baseline — the
    * evaluation pair the deploy gate compares.
    */
  def rmseVsBaseline(model: ALSModel, test: DataFrame): (Double, Double) = {
    val ev = new RegressionEvaluator()
      .setMetricName("rmse").setLabelCol("rating").setPredictionCol("prediction")
    val rmse = ev.evaluate(model.transform(test))
    val mean = test.agg(avg("rating")).head.getDouble(0)
    val baseline = ev.evaluate(test.withColumn("prediction", lit(mean)))
    (rmse, baseline)
  }

  /** Top-k item recommendations per user, flattened to one row per
    * (user, rank) — no array columns, so the frame is sink- and
    * driver-hashable everywhere.
    */
  def recommendItems(model: ALSModel, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    model.recommendForAllUsers(k)
      .select(col("user"), posexplode(col("recommendations")))
      .select(col("user").as("c_custkey"),
        (col("pos") + 1).as("rank"),
        col("col.item").as("p_partkey"),
        col("col.rating").cast("double").as("score"))
  }
}
