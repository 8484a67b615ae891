package graft.app

import org.apache.spark.sql.SparkSession

/** Focused benchmark: time a subset of SparkEntry queries by name.
  *
  * Usage: runMain graft.app.BenchOne q38_minhash_neardups q55_minhash_dedup_clusters
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // bounded plan-description strings (see core.HostAnchor)
      .config("spark.sql.maxPlanStringLength",
        graft.core.HostAnchor.maxPlanStringLength)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          val t0 = System.nanoTime()
          // NonFatal only: a fatal JVM error (OOM, codegen Error) must
          // propagate, not degrade into misleading timings for later queries
          val n = try fn(spark, sfDir).count() catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"$name FAILED: ${e.getMessage}"); -1L }
          spark.catalog.clearCache()
          println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
        case None => System.err.println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
