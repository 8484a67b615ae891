package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior-event) join — an operator Spark lacks
  * natively.
  *
  * Implementation is the union-and-carry pattern, NOT a range join: tag
  * left/right rows, union them, and carry the latest right-side value
  * forward with `last(ignoreNulls) over (partition by key order by time)`.
  * One sort-shuffle on (key, time) total — linear at any scale, no
  * quadratic candidate windows, no broadcast requirement — which is why
  * this beats a custom SparkPlan here (Catalyst already executes
  * sort-based windows optimally; SURVEY §2 custom-op preference (a):
  * compose existing ops when semantics allow).
  */
object AsofJoin {

  /** For every left row, attach the latest right row with
    * rightTime <= leftTime within the same key. Right value columns come
    * back null when no prior right row exists (left outer asof).
    *
    * @param valueCols right-side columns to carry (renamed as-is onto the
    *                  left rows)
    */
  def asofBackward(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTimeCol: String, rightTimeCol: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val lTagged = left
      .withColumn("_t", col(leftTimeCol))
      .withColumn("_is_left", lit(1))
      .select((Seq(col(keyCol).as("_k"), col("_t"), col("_is_left")) ++
        leftCols.map(c => col(c).as(s"_l_$c")) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"_r_$c"))): _*)
    val rTagged = right
      .withColumn("_t", col(rightTimeCol))
      .withColumn("_is_left", lit(0))
      .select((Seq(col(keyCol).as("_k"), col("_t"), col("_is_left")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"_l_$c")) ++
        valueCols.map(c => col(c).as(s"_r_$c"))): _*)

    // right rows sort before left rows at identical timestamps, so an
    // event AT the left time is visible (<=, asof-backward semantics)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = lTagged.unionAll(rTagged)
      .select((col("*") +:
        valueCols.map(c => last(col(s"_r_$c"), ignoreNulls = true).over(w).as(s"_c_$c"))): _*)

    carried.filter(col("_is_left") === 1)
      .select((leftCols.map(c => col(s"_l_$c").as(c)) ++
        valueCols.map(c => col(s"_c_$c").as(s"asof_$c"))): _*)
  }
}
