package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: why do two identical file-backed frames produce different
  * PlanKey strings? Prints a line diff. */
object PlanKeyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def build() = graft.core.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    val k1 = graft.core.PlanKey.of(build())
    spark.catalog.clearCache()
    val k2 = graft.core.PlanKey.of(build())
    println("equal=" + (k1 == k2))
    if (k1 != k2) {
      k1.linesIterator.zipAll(k2.linesIterator, "<none>", "<none>")
        .filter { case (a, b) => a != b }
        .take(10)
        .foreach { case (a, b) => println(s"A: $a\nB: $b\n--") }
    }
    spark.stop()
  }
}
