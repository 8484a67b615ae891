package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.Recommender

class RecommenderSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val ratings = Recommender.purchaseRatings(
    Tables.orders(spark, dir), Tables.lineitem(spark, dir)).cache()

  test("purchaseRatings aggregates quantities per (customer, part)") {
    val total = ratings.agg(sum("rating")).head.getDouble(0)
    val want = Tables.lineitem(spark, dir).agg(sum("l_quantity")).head
      .getDouble(0)
    assert(math.abs(total - want) < 1e-3, s"rating mass $total != qty mass $want")
    assert(ratings.groupBy("user", "item").count()
      .filter(col("count") > 1).isEmpty, "one rating row per pair")
  }

  test("ALS recovers planted low-rank structure: held-out RMSE far under baseline") {
    import spark.implicits._
    // rank-2 ground truth r(u,i) = 5 + a_u * b_i, ~30% of cells observed
    // (deterministic hash mask) — a generalization gate: the baseline
    // cannot express the interaction, ALS must
    val cells = for {
      u <- 0 until 200; i <- 0 until 100
      if ((u * 31L + i * 17L + 3L) % 10L) < 3L
    } yield (u, i, (5.0 + (u % 4 + 1) * ((i % 5) * 0.5)).toFloat)
    val df = cells.toDF("user", "item", "rating")
    val Array(train, test) = df.randomSplit(Array(0.8, 0.2), seed = 7L)
    val model = Recommender.fit(train,
      Recommender.Config(rank = 4, maxIter = 15, regParam = 0.05))
    val (rmse, baseline) = Recommender.rmseVsBaseline(model, test)
    assert(rmse < baseline * 0.5,
      s"ALS rmse $rmse must be far under the global-mean baseline $baseline")
  }

  test("on the real purchase matrix ALS fits train far better than the baseline") {
    // TPC-H purchases are random (no latent taste structure), so the
    // meaningful solver contract is on FIT: the regularized LS solution
    // must reconstruct observed cells much better than the global mean
    val model = Recommender.fit(ratings)
    val (rmse, baseline) = Recommender.rmseVsBaseline(model, ratings)
    assert(rmse < baseline * 0.7,
      s"ALS train rmse $rmse must be well under the baseline $baseline")
  }

  test("recommendItems: exactly k rows per user, ranks 1..k, scores descending") {
    val model = Recommender.fit(ratings, Recommender.Config(rank = 4, maxIter = 5))
    val recs = Recommender.recommendItems(model, k = 3).cache()
    val nUsers = ratings.select("user").distinct().count()
    assert(recs.count() == nUsers * 3)
    assert(recs.groupBy("c_custkey").count().filter(col("count") =!= 3).isEmpty)
    val bad = recs.groupBy("c_custkey").agg(
      collect_list(struct(col("rank"), col("score"))).as("rs"))
      .select(col("c_custkey"), explode(expr(
        "filter(transform(array_sort(rs), (x, i) -> " +
          "i > 0 AND x.score > array_sort(rs)[i - 1].score + 1e-9), x -> x)"))
        .as("viol"))
    assert(bad.filter(col("viol")).isEmpty, "scores must descend with rank")
  }

  test("same seed, same session: refit reproduces the recommendations") {
    val cfg = Recommender.Config(rank = 4, maxIter = 5, seed = 11L)
    def top1() = Recommender.recommendItems(Recommender.fit(ratings, cfg), 1)
      .select("c_custkey", "p_partkey")
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(top1() == top1())
  }
}
