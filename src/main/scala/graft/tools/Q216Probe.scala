package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch stage decomposition for q216 (bench notes r13). */
object Q216Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.analytics.StatQueries
    def run(n: String) = StatQueries.defs.find(_.name == n).get.fn(spark, dir)
    // cold then warm-session reps, clearCache between (the Bench protocol)
    (1 to 3).foreach { i =>
      t(s"q174 rep$i") { run("q174_logreg_gd").collect() }
      spark.catalog.clearCache()
    }
    (1 to 3).foreach { i =>
      t(s"q216 rep$i") { run("q216_score_ks").collect() }
      spark.catalog.clearCache()
    }
    (1 to 3).foreach { i =>
      t(s"q193 rep$i") { run("q193_gain_lift").collect() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
