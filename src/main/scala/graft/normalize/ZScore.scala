package graft.normalize

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType
import graft.core.{ChurnSchema, Cols}
import Cols.qcol

/** F10 z-score normalization with sklearn StandardScaler parity
  * (reference: src/processing/etl_pipeline.py:234-249): population stddev
  * (ddof=0 — NOT the SQL default stddev_samp, SURVEY §4 pitfall A10),
  * fit over all numeric columns minus the exclusion list.
  *
  * Fit = one wide agg job (2 aggregates per column); transform = one
  * projection with the fitted scalars as literals. The fitted model is a
  * plain Map so the train-time fit can be re-applied leak-free to
  * validation/test frames (reference model_trainer.py:193-228).
  */
object ZScore {

  final case class Model(stats: Map[String, (Double, Double)]) {
    /** Apply `(x - mean) / std`; zero-variance columns divide by 1.0 to
      * avoid NaN floods (sklearn scales zero-variance features to 0 via
      * its `scale_ = 1` substitution).
      */
    def transform(df: DataFrame): DataFrame = {
      val projected = df.columns.map { c =>
        stats.get(c) match {
          case Some((m, s)) =>
            val safe = if (s == 0.0 || s.isNaN) 1.0 else s
            ((qcol(c) - lit(m)) / lit(safe)).as(c)
          case None => qcol(c)
        }
      }
      df.select(projected.toSeq: _*)
    }
  }

  def normalizeCols(df: DataFrame, exclude: Seq[String]): Seq[String] =
    df.schema.fields
      .filter(f => f.dataType.isInstanceOf[NumericType])
      .map(_.name)
      .filterNot(n => n.startsWith("_") || exclude.contains(n)).toSeq

  def fit(df: DataFrame, exclude: Seq[String] = ChurnSchema.zscoreExclusions): Model = {
    val cols = normalizeCols(df, exclude)
    if (cols.isEmpty) return Model(Map.empty)
    val aggs = cols.flatMap { c =>
      Seq(avg(qcol(c)).as(s"m_$c"), stddev_pop(qcol(c)).as(s"s_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Model(cols.map { c =>
      c -> (row.getAs[Double](s"m_$c"), row.getAs[Double](s"s_$c"))
    }.toMap)
  }

  def fitTransform(df: DataFrame, exclude: Seq[String] = ChurnSchema.zscoreExclusions): DataFrame =
    fit(df, exclude).transform(df)
}
