package graft

import org.apache.spark.sql.functions._
import graft.analytics.ChurnAnalytics
import graft.core.{ChurnFixture, Config}
import graft.features.Features

class ChurnAnalyticsSpec extends SparkSpec {
  lazy val raw = ChurnFixture.df(spark, 500).cache()

  test("churn rate by country sums to the global counts") {
    val rates = ChurnAnalytics.churnRateByCountry(raw).collect()
    assert(rates.length == 5)
    assert(rates.map(_.getAs[Long]("total_users")).sum == 500)
    rates.foreach { r =>
      val rate = r.getAs[Double]("churn_rate")
      assert(rate >= 0 && rate <= 1)
    }
  }

  test("country reconstruction from one-hot dummies matches the original") {
    val encoded = Features.oneHotEncode(raw, Seq("country"))
    val fromDummies = ChurnAnalytics.churnRateByCountry(encoded)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("total_users")).toMap
    val fromRaw = ChurnAnalytics.churnRateByCountry(raw)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("total_users")).toMap
    assert(fromDummies == fromRaw)
  }

  test("churn distribution shares sum to 1 with display labels") {
    val dist = ChurnAnalytics.churnDistribution(raw).collect()
    assert(math.abs(dist.map(_.getAs[Double]("share")).sum - 1.0) < 1e-12)
    assert(dist.map(_.getAs[String]("label_display")).toSet == Set("Loyal", "Churned"))
  }

  test("correlation matrix is symmetric with unit diagonal") {
    val m = ChurnAnalytics.correlationMatrix(raw,
      Seq("sessions_30d", "sessions_90d", "gmv_2024", "churn_label"))
    assert(m.length == 4)
    (0 until 4).foreach(i => assert(math.abs(m(i)(i) - 1.0) < 1e-12))
    for (i <- 0 until 4; j <- 0 until 4)
      assert(math.abs(m(i)(j) - m(j)(i)) < 1e-12)
  }

  test("point lookup returns the single user row") {
    val row = ChurnAnalytics.lookupUser(raw, "U00042").collect()
    assert(row.length == 1 && row(0).getAs[String]("user_id") == "U00042")
  }
}

class ConfigSpec extends SparkSpec {
  test("env interpolation: set, default, missing") {
    val env = Map("DATA_ROOT" -> "/mnt/data")
    assert(Config.interpolate("${DATA_ROOT}/raw", env) == "/mnt/data/raw")
    assert(Config.interpolate("${MISSING:fallback}/x", env) == "fallback/x")
    assert(Config.interpolate("${MISSING}", env) == "")
    assert(Config.interpolate("no vars", env) == "no vars")
  }

  test("parse + typed load applies overrides and defaults") {
    val cfg = Config.fromMap(Config.parse(Seq(
      "# comment",
      "input.path = ${DATA_ROOT:/tmp}/churn.csv",
      "ml.max_iter = 10",
      "cleaning.missing_value_handling = drop",
    ), Map.empty))
    assert(cfg.inputPath == "/tmp/churn.csv")
    assert(cfg.mlMaxIter == 10)
    assert(cfg.missingValueHandling == "drop")
    assert(cfg.mlMaxDepth == 6) // default preserved
  }
}

class ExtensionsSpec extends SparkSpec {
  test("extensions-injected function resolves in SQL") {
    // apply the injection to the live session's registry via the same
    // builder the extension uses
    graft.functions.SortedIntersectSize.register(spark)
    val got = spark.sql(
      "SELECT sorted_intersect_size(array('a','b','c'), array('b','c','d'))")
      .collect()(0).getInt(0)
    assert(got == 2)
  }
}

class FallbackAndIncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("two-source fallback lookup: primary hit wins, else fallback") {
    val primary = Seq(("U00001", "from_features")).toDF("user_id", "src")
    val fallback = Seq(("U00001", "from_processed"), ("U00002", "from_processed"))
      .toDF("user_id", "src")
    val hit = graft.analytics.ChurnAnalytics
      .lookupUserWithFallback(primary, fallback, "U00001").collect()
    assert(hit(0).getString(1) == "from_features")
    val fb = graft.analytics.ChurnAnalytics
      .lookupUserWithFallback(primary, fallback, "U00002").collect()
    assert(fb(0).getString(1) == "from_processed")
  }

  test("incremental fetcher passes the watermark through to the API") {
    val fetcherFor: String => graft.ingest.RestIngest.Fetcher = since =>
      (page, size) => if (page == 1) Seq(s"""{"since":"$since"}""") else Nil
    val rows = graft.ingest.RestIngest.fetchAll(
      graft.ingest.RestIngest.incremental(fetcherFor, "2026-08-01T00:00:00"),
      pageSize = 100)
    assert(rows == Seq("""{"since":"2026-08-01T00:00:00"}"""))
  }

  test("approx stats path (exact=false) produces the same pipeline shape") {
    val df = graft.core.ChurnFixture.df(spark, 400)
    val exact = graft.app.DailyPipeline.transform(df, exact = true)
    val approx = graft.app.DailyPipeline.transform(df, exact = false)
    // one-hot rfm_segment_* dummies are data-dependent: the approx path's
    // edge-based quintiles may shift a handful of boundary rows, changing
    // which of the 125 possible segments are OBSERVED — compare the
    // structural columns exactly and the segment dummies by family
    def structural(cols: Seq[String]) = cols.filterNot(_.startsWith("rfm_segment_")).sorted
    assert(structural(exact.columns.toSeq) == structural(approx.columns.toSeq))
    assert(approx.columns.count(_.startsWith("rfm_segment_")) > 50)
    assert(approx.count() == 400)
  }
}
