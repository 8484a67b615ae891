package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch: which slice-memo keys differ between two runs of the same
  * consumer? Prints the first line-level diffs. */
object SliceMemoProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val name = args.lift(1).getOrElse("q211_jonckheere")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", 4).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.analytics.StatQueries
    StatQueries.resetSliceMemo()
    StatQueries.defs.find(_.name == name).get.fn(spark, dir).collect()
    val first = StatQueries.sliceMemoKeys.sorted
    spark.catalog.clearCache()
    StatQueries.defs.find(_.name == name).get.fn(spark, dir).collect()
    val second = StatQueries.sliceMemoKeys.sorted
    println(s"first=${first.size} second=${second.size}")
    val fresh = second.filterNot(first.contains)
    fresh.take(2).foreach { k =>
      // closest old key by shared prefix length
      val closest = first.maxBy(o => k.zip(o).takeWhile { case (a, b) => a == b }.size)
      val kl = k.linesIterator.toSeq; val cl = closest.linesIterator.toSeq
      kl.zipAll(cl, "<none>", "<none>").filter { case (a, b) => a != b }
        .take(8).foreach { case (a, b) => println(s"NEW: $a\nOLD: $b\n--") }
      println("====")
    }
    spark.stop()
  }
}
