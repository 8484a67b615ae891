package graft
import org.apache.spark.sql.functions._
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore
import graft.quality.QualityAudit
import graft.validate.SchemaValidator

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
