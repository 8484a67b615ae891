package graft.app

import org.apache.spark.sql.SparkSession
import graft.core.ChurnFixture

/** Runnable end-to-end demo of the churn pipeline: generates a churn-shaped
  * CSV (dirty variant: nulls, duplicates, invalid rows stripped of the
  * hard-gate blockers), runs ingest → validate → quality → clean → features
  * → normalize → Silver, prints the run report.
  *
  *   tools/run.sh graft.app.PipelineDemo [nRows] [workDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val work = args.lift(1).getOrElse("/tmp/graft_pipeline_demo")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val csvDir = s"$work/raw_csv"
    ChurnFixture.df(spark, n).write.mode("overwrite").option("header", "true").csv(csvDir)

    val t0 = System.nanoTime()
    val report = DailyPipeline.run(spark, csvDir,
      bronzePath = Some(s"$work/bronze"), silverPath = Some(s"$work/silver"))
    val secs = (System.nanoTime() - t0) / 1e9

    println(f"""
      |== graft pipeline demo ==
      |input rows:        $n
      |validation:        ${report.validation.valid}/${report.validation.total} valid
      |quality score:     ${report.quality.overallScore}%.4f (pass=${report.quality.passed})
      |  completeness=${report.quality.completenessScore}%.3f uniqueness=${report.quality.uniquenessScore}%.3f
      |  validity=${report.quality.validityScore}%.3f consistency=${report.quality.consistencyScore}%.3f
      |silver shape:      ${report.rowsOut} rows x ${report.colsOut} cols
      |wall time:         $secs%.1f s
      |silver at:         $work/silver
      |""".stripMargin)
    spark.stop()
  }
}
