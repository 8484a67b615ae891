package graft
import org.apache.spark.sql.functions._
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore
import graft.quality.QualityAudit
import graft.validate.SchemaValidator

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
