package graft.tools

import org.apache.spark.sql.SparkSession

/** The ONE parameterized diagnostic probe (VERDICT r14 task 5 — the
  * per-round one-shot probe mains kept accreting; this replaces them
  * all). Prints the formatted plan and warm/cold timings for any
  * registry query, so a bench-notes adjudication is a command line, not
  * a new main.
  *
  * Usage:
  *   tools/run.sh graft.tools.Probe <queryName> [sfDir] [reps]
  *
  * Env: SPARK_GRAFT_CPUS (default 8), SPARK_GRAFT_PROBE_NOPLAN=1 to
  * skip the explain (pure timing run).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Probe <queryName> [sfDir] [reps] — queryName from SparkEntry.queries")
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bounded plan-description strings (see core.HostAnchor)
      .config("spark.sql.maxPlanStringLength",
        graft.core.HostAnchor.maxPlanStringLength)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(
        s"unknown query '$name'; names: ${graft.SparkEntry.queries.keys.toSeq.sorted.take(8).mkString(", ")}…"))
    if (!sys.env.contains("SPARK_GRAFT_PROBE_NOPLAN"))
      fn(spark, dir).explain("formatted")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime
      val n = fn(spark, dir).collect().length
      println(f"rep $i: ${(System.nanoTime - t0) / 1e9}%.2fs ($n rows)")
    }
    spark.stop()
  }
}
