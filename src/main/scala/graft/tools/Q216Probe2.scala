package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Q216Probe2 {
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
    // warm the session + memos once
    run("q216_score_ks").collect(); spark.catalog.clearCache()
    // now time plan CONSTRUCTION vs execution
    val t0 = System.nanoTime()
    val df = run("q216_score_ks")
    println(f"build: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t("collect") { df.collect() }
    spark.catalog.clearCache()
    val t1 = System.nanoTime()
    val df2 = run("q216_score_ks")
    println(f"build2: ${(System.nanoTime() - t1) / 1e9}%.2f s")
    t("collect2") { df2.collect() }
    spark.stop()
  }
}
