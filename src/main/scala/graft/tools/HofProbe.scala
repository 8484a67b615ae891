package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: cost of the remaining higher-order-function expressions on
  * the sf0.1 documents table (post-WordGramsExpr sweep). */
object HofProbe {
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
    // hashedTokenSet shape (minhash stage 0)
    val hts = array_sort(transform(array_distinct(toks), t => xxhash64(t)))
    time("hashedTokenSet (HOF)")(docs.select(size(hts).as("s")).agg(sum("s")).collect())
    time("hashedTokenSet (HOF) 2")(docs.select(size(hts).as("s")).agg(sum("s")).collect())
    // flat equivalent: explode, hash codegen'd, collect back
    val flat = docs.select(col("doc_id"), explode(array_distinct(toks)).as("t"))
      .select(col("doc_id"), xxhash64(col("t")).as("h"))
      .groupBy("doc_id").agg(sort_array(collect_list("h")).as("hs"))
    time("explode+hash+collect")(flat.select(size(col("hs")).as("s")).agg(sum("s")).collect())
    // full shingles path as used by trigram dedup
    val sh3 = graft.ops.TextDedup.shingles(col("text"), 3)
    time("shingles(3) HOF")(docs.select(size(sh3).as("s")).agg(sum("s")).collect())
    // minhash signature stage on hashed sets (native kernel)
    val sig = graft.functions.MinHashExprs.minhashBandHashes(hts, 128, 32)
    time("bandHashes native over HOF hts")(docs.select(size(sig).as("s")).agg(sum("s")).collect())
    spark.stop()
  }
}
