package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage decomposition for q246 (source overlap). */
object Q246Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime
      val r = f
      println(f"$label: ${(System.nanoTime - t0) / 1e9}%.2fs")
      r
    }
    val docs = graft.core.Tables.documents(spark, dir)
    time("docs count")(docs.count())
    val g0 = docs.select(col("source"),
      explode(graft.ops.CorpusOps.wordGrams(
        graft.core.Cols.wsTokens(col("text")), 4)).as("gram"))
    time("exploded grams count")(g0.count())
    val g = g0.distinct()
    time("distinct count")(g.count())
    val gc = g.persist()
    time("materialize cache")(gc.count())
    time("tot")(gc.groupBy("source").count().collect())
    val sh = gc.as("a").join(gc.as("b"),
      col("a.gram") === col("b.gram") && col("a.source") < col("b.source"))
      .groupBy(col("a.source"), col("b.source")).count()
    time("pair join")(sh.collect())
    time("pair join again")(sh.collect())
    spark.stop()
  }
}
