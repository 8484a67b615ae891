package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Schema-enforced JSONL ingest with corrupt-record quarantine — the
  * document-corpus twin of the reference's CSV ingest
  * (ref: csv read surface at etl_pipeline.py:60-78; JSONL is the format
  * every large text-corpus pipeline actually lands). One pass parses
  * against the DECLARED schema (no runaway inference over 100 TB) in
  * PERMISSIVE mode; rows that fail to parse are quarantined with their
  * raw line intact for replay, never silently dropped.
  */
object JsonlIngest {

  final case class JsonlSplit(good: DataFrame, quarantined: DataFrame,
      private val parsed: DataFrame) {
    /** Drop the shared parsed-scan cache once both sides are consumed
      * (written/counted) — otherwise it lingers for the session.
      */
    def unpersist(): Unit = { parsed.unpersist(false); () }
  }

  /** Read `path` as JSONL against `schema`. Returns the clean rows (schema
    * columns only) and the quarantine (raw line + input file) — the split
    * frames share one parsed, persisted scan: Spark disallows plans that
    * reference ONLY the internal corrupt-record column of a streaming
    * json scan, and the persist also keeps the split consistent (a
    * re-read racing a writer cannot put one row in both frames).
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      corruptCol: String = "_corrupt_record"): JsonlSplit = {
    require(!schema.fieldNames.contains(corruptCol),
      s"schema must not already contain $corruptCol")
    val parsed = spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
      .withColumn("_input_file", input_file_name())
    parsed.persist()
    val good = parsed.filter(col(corruptCol).isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val quarantined = parsed.filter(col(corruptCol).isNotNull)
      .select(col(corruptCol).as("raw_line"), col("_input_file"))
    JsonlSplit(good, quarantined, parsed)
  }
}
