package graft
import org.apache.spark.sql.functions._
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore
import graft.quality.QualityAudit
import graft.validate.SchemaValidator

class FeatureSpec extends SparkSpec {
  lazy val featured = Features.engineer(ChurnFixture.df(spark, 400)).cache()

  test("pd.cut parity: right-closed bins, left edge of first bin -> null") {
    import spark.implicits._
    val df = Seq(0, 30, 31, 3000).toDF("reg_days")
    val got = df.select(Features.cut(col("reg_days"),
      Seq(0, 30, 90, 365, 1000, Double.PositiveInfinity),
      Seq("New", "Recent", "Established", "Long-term", "Veteran")).as("c"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq(null, "New", "Recent", "Veteran"))
  }

  test("zero-guard ratio: denominator 0 treated as 1") {
    import spark.implicits._
    val df = Seq((10.0, 0.0), (10.0, 2.0)).toDF("x", "y")
    val got = df.select(Features.zeroGuardDiv(col("x"), col("y")).as("r"))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(10.0, 5.0))
  }

  test("rfm_segment is three quintile digits, buckets balanced within 1") {
    // checked pre-encoding: the encode block one-hot-expands rfm_segment
    val seg = Features.rfm(ChurnFixture.df(spark, 400))
      .select("rfm_segment").collect().map(_.getString(0))
    assert(seg.forall(_.matches("[1-5][1-5][1-5]")))
    // frequency digit: 5 buckets of 400 rows -> each 80
    val fCounts = seg.groupBy(_.charAt(1)).view.mapValues(_.size).toMap
    assert(fCounts.values.forall(c => c >= 79 && c <= 81), s"$fCounts")
  }

  test("one-hot: country dummies sum to 1 per row, original dropped") {
    val countryCols = featured.columns.filter(_.startsWith("country_"))
    assert(countryCols.nonEmpty && !featured.columns.contains("country"))
    val sums = featured
      .select(countryCols.map(c => col(c).cast("long")).reduce(_ + _).as("s"))
      .agg(min("s"), max("s")).collect()(0)
    assert(sums.getLong(0) == 1 && sums.getLong(1) == 1)
  }

  test("label encode: lexicographic codes like sklearn LabelEncoder") {
    import spark.implicits._
    val df = Seq("Medium", "Low", "High", "Very High", "Low").toDF("rfm_category")
    val enc = Features.labelEncode(df, Seq("rfm_category"))
    val got = enc.select("rfm_category_encoded").collect().map(_.getInt(0))
    // sorted classes: High=0, Low=1, Medium=2, Very High=3
    assert(got.toSeq == Seq(2, 1, 0, 3, 1))
  }

  test("degenerate quantile bucket: constant column gets constant label") {
    import spark.implicits._
    val df = Seq.fill(10)((1, "u")).toDF("rfm_frequency", "user_id")
    val c = Features.quantileBucket(df, "rfm_frequency", "user_id",
      5, Seq(1, 2, 3, 4, 5), ascending = true)
    val got = df.select(c.as("b")).collect().map(_.getInt(0)).toSet
    assert(got == Set(1))
  }

  test("edge-path quantile bucket: sizes within 1 of ntile, no window in plan") {
    import spark.implicits._
    // 1000 distinct values, shuffled insertion order
    val rnd = new scala.util.Random(7)
    val df = rnd.shuffle((1 to 1000).toList)
      .map(i => (i * 3 + 0.5, f"U$i%05d")).toDF("rfm_monetary", "user_id")
    val c = Features.quantileBucket(df, "rfm_monetary", "user_id",
      5, Seq(1, 2, 3, 4, 5), ascending = true, exact = false)
    val out = df.select(c.as("b"))
    // scale contract: assignment is a pure projection — no Window node
    assert(!out.queryExecution.optimizedPlan.toString.contains("windowspecdefinition"))
    val sizes = out.groupBy("b").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(1, 2, 3, 4, 5), s"$sizes")
    assert(sizes.values.forall(n => math.abs(n - 200L) <= 1), s"$sizes")
  }

  test("edge-path bucket agrees with exact ntile path on distinct values") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, f"U$i%03d"))
      .toDF("rfm_recency", "user_id")
    for (asc <- Seq(true, false)) {
      val labels = if (asc) Seq(1, 2, 3, 4, 5) else Seq(5, 4, 3, 2, 1)
      val ex = Features.quantileBucket(df, "rfm_recency", "user_id",
        5, labels, ascending = asc)
      val ap = Features.quantileBucket(df, "rfm_recency", "user_id",
        5, labels, ascending = asc, exact = false)
      val diff = df.select(ex.as("ex"), ap.as("ap"))
        .filter(col("ex") =!= col("ap")).count()
      assert(diff == 0, s"asc=$asc: $diff rows disagree")
    }
  }
}
