package graft.app
// Dev profiling main: per-stage wall times of the churn ETL at a given n.
import org.apache.spark.sql.SparkSession
import graft.core.ChurnFixture
import graft.clean.Cleaning
import graft.features.Features
import graft.normalize.ZScore

object EtlProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      // bounded plan-description strings (see core.HostAnchor)
      .config("spark.sql.maxPlanStringLength",
        graft.core.HostAnchor.maxPlanStringLength)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime()-t0)/1e9}%6.1f s"); r
    }
    val raw = ChurnFixture.df(spark, n).persist()
    time("materialize input")(raw.count())
    val cleaned = time("clean (dedup+impute+clip)") {
      val c = Cleaning.clean(raw).persist(); c.count(); c
    }
    val rfm = time("features: rfm (ntile x3)") {
      val f = Features.rfm(cleaned).persist(); f.count(); f
    }
    val mid = time("features: behav..domain") {
      val f = Features.domain(Features.interaction(Features.temporal(
        Features.behavioral(rfm)))).persist(); f.count(); f
    }
    val enc = time("features: encode") {
      val f = Features.encode(mid).persist(); f.count(); f
    }
    val norm = time("zscore fit+transform") {
      val z = ZScore.fitTransform(enc); z.count(); z
    }
    time("silver write")(norm.write.mode("overwrite")
      .parquet("/tmp/etl_profile_silver"))
    spark.stop()
  }
}
