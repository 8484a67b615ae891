package graft

import org.apache.spark.sql.functions._
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore
import graft.quality.QualityAudit
import graft.validate.SchemaValidator

class ZScoreSpec extends SparkSpec {
  test("population stddev parity (ddof=0) and exclusions preserved") {
    import spark.implicits._
    val df = Seq((1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1))
      .toDF("x", "churn_label")
    val out = ZScore.fitTransform(df)
    val xs = out.select("x").collect().map(_.getDouble(0))
    // mean 2.5, pop std = sqrt(1.25); first value: (1-2.5)/sqrt(1.25)
    assert(math.abs(xs(0) - (1.0 - 2.5) / math.sqrt(1.25)) < 1e-12)
    // excluded target untouched
    val labels = out.select("churn_label").collect().map(_.getInt(0)).toSet
    assert(labels == Set(0, 1))
  }

  test("fit on train applies leak-free to test") {
    import spark.implicits._
    val train = Seq(0.0, 10.0).toDF("x")
    val model = ZScore.fit(train, exclude = Nil)
    val test = Seq(5.0, 20.0).toDF("x")
    val got = model.transform(test).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 3.0)) // mean 5, pop std 5
  }
}
