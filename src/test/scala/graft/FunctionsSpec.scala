package graft

import org.apache.spark.sql.functions._
import graft.functions.SortedIntersectSize
import graft.functions.SortedIntersectSize.sortedIntersectSize

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val pairs = Seq(
    (Seq("a", "b", "c"), Seq("b", "c", "d")),
    (Seq("a"), Seq("a")),
    (Seq("a", "b"), Seq("c", "d")),
    (Seq[String](), Seq("a")),
    (Seq("a", "b", "c", "d", "e"), Seq("b", "d", "e", "z")),
  ).toDF("a", "b")

  test("matches array_intersect size on sorted distinct arrays") {
    val got = pairs.select(
      sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    val expected = Seq(2, 1, 0, 0, 3)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = pairs.select(sortedIntersectSize(col("a"), col("b")))
        .collect().map(_.getInt(0)).toSeq
      assert(interp == expected)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    val codegen = pairs.select(sortedIntersectSize(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    assert(codegen == expected)
  }

  test("SQL registration works") {
    SortedIntersectSize.register(spark)
    pairs.createOrReplaceTempView("pairs_sis")
    val got = spark.sql("SELECT sorted_intersect_size(a, b) FROM pairs_sis")
      .collect().map(_.getInt(0)).toSeq
    assert(got == Seq(2, 1, 0, 0, 3))
  }

  test("null array input yields null") {
    val df = Seq((Some(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
    val got = df.select(sortedIntersectSize(col("a"), col("b"))).collect()(0)
    assert(got.isNullAt(0))
  }
}
