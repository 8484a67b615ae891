package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for q201 stage costs (bench notes r13).
  * Times: (1) edge build, (2) wedge generation alone, (3) wedge
  * aggregation to candidate pairs, (4) the full query incl. anti-join +
  * top-K window. Not part of the driver surface.
  */
object Q201Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = graft.core.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
    t("edges")(println("  n_edges=" + e.count()))
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).cast("int").as("_cdeg"))
    val adj = sym.join(deg.withColumnRenamed("u", "v"), "v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    t("adj build+cache")(println("  n_adj=" + adj.count()))
    val cold = adj.filter(col("_cdeg") <= 1024)
    val wedges = cold.as("s1").join(cold.as("s2"),
        col("s1.v") === col("s2.v") && col("s1.u") < col("s2.u"))
      .select(col("s1.u").as("a"), col("s2.u").as("b"),
        round(lit(1000000) / log(col("s1._cdeg"))).cast("long").as("_aa"))
    t("wedge count only")(println("  n_wedges=" + wedges.count()))
    val cand = wedges
      .select((shiftleft(col("a").cast("long"), 32) + col("b")).as("_pk"),
        col("_aa"))
      .groupBy("_pk")
      .agg(count(lit(1)).as("cn"), sum("_aa").cast("long").as("aa_micro"))
      .filter(col("cn") >= 2)
    t("wedges -> cand agg")(println("  n_cand=" + cand.count()))
    // variant: pre-repartition on the packed key REMOVES the partial
    // aggregate (the exchange satisfies the distribution, so one
    // complete agg runs post-shuffle) — tests whether the map-side hash
    // probe of 148M rows with ~no reduction is the cost
    val cand2 = wedges
      .select((shiftleft(col("a").cast("long"), 32) + col("b")).as("_pk"),
        col("_aa"))
      .repartition(col("_pk"))
      .groupBy("_pk")
      .agg(count(lit(1)).as("cn"), sum("_aa").cast("long").as("aa_micro"))
      .filter(col("cn") >= 2)
    t("wedges -> cand agg (pre-repartitioned, no partial)")(
      println("  n_cand=" + cand2.count()))
    // variant: two-column key for reference (the pre-pack shape)
    val cand3 = wedges.groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum("_aa").cast("long").as("aa_micro"))
      .filter(col("cn") >= 2)
    t("wedges -> cand agg (two-col key)")(println("  n_cand=" + cand3.count()))
    val full = graft.ops.LinkPredict.adamicAdarTopK(e, "u", "v",
      minCommon = 2, topK = 5)
    t("full adamicAdarTopK")(println("  n_out=" + full.count()))
    spark.stop()
  }
}
