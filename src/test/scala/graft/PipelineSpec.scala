package graft

import org.apache.spark.sql.functions._
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore
import graft.quality.QualityAudit
import graft.validate.SchemaValidator

class ValidatorSpec extends SparkSpec {
  test("valid fixture passes every rule") {
    val r = SchemaValidator.validate(ChurnFixture.df(spark, 200))
    assert(r.invalid == 0 && r.total == 200 && r.perRule.isEmpty)
  }

  test("dtype conformance: mistyped and missing columns reported, clean frame passes") {
    import spark.implicits._
    // age arrives as string, score as double, ts missing entirely
    val df = Seq(("U00001", "19", 0.5)).toDF("user_id", "age", "score")
    val report = SchemaValidator.validateDataTypes(df, Seq(
      "user_id" -> "string", "age" -> "integer",
      "score" -> "number", "signup_ts" -> "datetime"))
    assert(!report.isValid && report.errorCount == 2)
    assert(report.errors == Seq(
      "Column 'age': expected integer, got string",
      "Column 'signup_ts' not found"))
    val ok = SchemaValidator.validateDataTypes(df, Seq(
      "user_id" -> "string", "age" -> "string", "score" -> "number"))
    assert(ok.isValid && ok.errors.isEmpty)
  }

  test("dirty fixture: per-rule violations counted, hard gate throws") {
    val r = SchemaValidator.validate(ChurnFixture.dirtyDf(spark, 100))
    assert(r.invalid == 2) // the bad row + the all-null row
    assert(r.perRule("user_id:pattern") == 1)
    assert(r.perRule("age:range") == 1)
    assert(r.perRule("country:enum") == 1)
    assert(r.perRule("churn_label:enum") == 1)
    assert(r.perRule("user_id:required") == 1)
    intercept[IllegalArgumentException] {
      SchemaValidator.validateOrThrow(ChurnFixture.dirtyDf(spark, 100))
    }
  }
}

class QualitySpec extends SparkSpec {
  test("clean fixture scores high and passes") {
    val rep = QualityAudit.audit(ChurnFixture.df(spark, 300))
    assert(rep.totalRows == 300)
    assert(rep.completenessScore > 0.999)
    assert(rep.uniquenessScore > 0.999)
    assert(rep.validityScore == 1.0)
    assert(rep.consistencyScore == 1.0)
    assert(rep.passed, s"overall=${rep.overallScore}")
    assert(rep.churnRate > 0.0 && rep.churnRate < 0.5)
  }

  test("dirty fixture: duplicates, violations and missing detected") {
    val rep = QualityAudit.audit(ChurnFixture.dirtyDf(spark, 100))
    assert(rep.duplicateRowRate > 0.0)
    assert(rep.validityViolations.contains("age_out_of_range"))
    assert(rep.consistencyViolations.contains("sessions_30d_gt_90d"))
    assert(rep.consistencyViolations.contains("gmv_aov_mismatch"))
    assert(rep.missingRateByColumn.nonEmpty)
  }
}

class CleaningSpec extends SparkSpec {
  test("dedup removes exact duplicate rows") {
    val (out, removed) = Cleaning.dropDuplicates(ChurnFixture.dirtyDf(spark, 100))
    assert(removed == 3)
    assert(out.count() == 102) // 100 valid + 2 bad
  }

  test("impute leaves no nulls in numeric or string columns") {
    val cleaned = Cleaning.imputeNulls(ChurnFixture.dirtyDf(spark, 100))
    val cols = Cleaning.numericCols(cleaned) ++ Cleaning.stringCols(cleaned)
    val nullCounts = cleaned.agg(
      cols.map(c => sum(col(c).isNull.cast("long")).as(c)).head,
      cols.map(c => sum(col(c).isNull.cast("long")).as(c)).tail: _*).collect()(0)
    cols.foreach(c => assert(nullCounts.getAs[Long](c) == 0, s"col $c has nulls"))
  }

  test("median imputation matches interpolating median semantics") {
    import spark.implicits._
    // values 1,2,3,100 with a null -> median of non-null = 2.5
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(100.0), None)
      .toDF("v")
    val med = Cleaning.medians(df, Seq("v"))("v")
    assert(med == 2.5)
  }

  test("IQR clip bounds values within fences and preserves dtype") {
    import spark.implicits._
    val df = (Seq.fill(96)(50.0) ++ Seq(1e9, -1e9, 49.0, 51.0)).toDF("v")
    val clipped = Cleaning.clipOutliersIqr(df, exclude = Nil)
    val r = clipped.agg(min("v"), max("v")).collect()(0)
    assert(r.getDouble(1) < 1e9 && r.getDouble(0) > -1e9)
    assert(clipped.schema("v").dataType.typeName == "double")
  }
}

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
