package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch incremental-cost attribution for q216 (bench notes r13):
  * materialize each stage of the chain in order WITHOUT clearing the
  * cache, so each timing is that stage's own marginal cost.
  */
object Q216Probe3 {
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
    // JIT/session warm
    run("q216_score_ks").collect(); spark.catalog.clearCache()
    run("q216_score_ks").collect(); spark.catalog.clearCache()
    // incremental attribution, cache KEPT between stages
    val scored = StatQueries.logregScored(spark, dir)
    t("1 logregScored")(println("  n=" + scored.count()))
    val g = scored.groupBy("sg")
      .agg(sum("y").cast("long").as("c1"),
        sum(lit(1) - col("y")).cast("long").as("c2"))
    t("2 g groupBy")(println("  n_sg=" + g.count()))
    val cm = StatQueries.globalCumSum(g, Seq(col("sg")), Seq("c1", "c2"))
    t("3 globalCumSum")(println("  n_cm=" + cm.count()))
    t("4 full q216 (warm upstream)")(run("q216_score_ks").collect())
    spark.catalog.clearCache()
    t("5 full q216 (cold cache)")(run("q216_score_ks").collect())
    spark.stop()
  }
}
