package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: `.explain("formatted")` + warm/cold timing for one
  * registry query. Usage:
  *   tools/run.sh graft.tools.ExplainOne <queryName> [sfDir] [reps]
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, dir).explain("formatted")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime
      val n = fn(spark, dir).collect().length
      println(s"rep $i: ${(System.nanoTime - t0) / 1e9}s ($n rows)")
    }
    spark.stop()
  }
}
