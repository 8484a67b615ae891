package graft.app

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan audit: prints the formatted physical plan for selected queries and
  * greps the properties that matter at 100 TB — parquet filter pushdown,
  * column-pruned read schemas, broadcast joins on dims, whole-stage
  * codegen coverage.
  *
  *   tools/run.sh graft.app.ExplainAudit [sfDir] [query ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
    else Seq("q01_pricing_summary", "q02_revenue_by_nation", "q05_filter_project",
      "q03_top_customers", "q36_jaccard_neardups")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
        .filterNot(_.contains("[]")).toSeq
      val broadcasts = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
      val codegen = plan.linesIterator.count(_.contains("WholeStageCodegen"))
      val sorts = plan.linesIterator.count(l => l.trim.startsWith("Sort ") || l.contains("* Sort "))
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      println(s"---- audit[$name]: pushedFilterSites=${pushed.size} " +
        s"broadcastJoins=$broadcasts codegenSpans=$codegen sorts=$sorts exchanges=$exchanges")
    }
    spark.stop()
  }
}
