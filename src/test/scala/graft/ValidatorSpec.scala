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
