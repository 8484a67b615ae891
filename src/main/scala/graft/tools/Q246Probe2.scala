package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: isolate the slow expression in the gram explode. */
object Q246Probe2 {
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
    val docs = graft.core.Tables.documents(spark, dir).persist()
    time("docs count")(docs.count())
    val toks = graft.core.Cols.wsTokens(col("text"))
    time("split only")(docs.select(size(toks)).agg(sum("size(split(trim(text), \\s+, -1))")).collect())
    time("split only 2")(docs.select(size(toks).as("s")).agg(sum("s")).collect())
    val grams = graft.ops.CorpusOps.wordGrams(toks, 4)
    time("wordGrams size")(docs.select(size(grams).as("s")).agg(sum("s")).collect())
    time("wordGrams size 2")(docs.select(size(grams).as("s")).agg(sum("s")).collect())
    time("explode grams")(docs.select(explode(grams)).count())
    time("explode grams 2")(docs.select(explode(grams)).count())
    // variant: explode positions, then build the gram AFTER the explode
    val t = docs.select(col("source"), toks.as("t"))
    val pos = t.select(col("source"), col("t"),
      explode(sequence(lit(1), greatest(size(col("t")) - 3, lit(0)))).as("i"))
    val built = pos.select(col("source"),
      concat_ws(" ", (0 until 4).map(j => element_at(col("t"), col("i") + lit(j))): _*).as("gram"))
    time("posexplode-then-build")(built.count())
    time("posexplode-then-build 2")(built.count())
    spark.stop()
  }
}
