package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(longCol)` against a FIXED, pre-built Bloom filter
  * carried with the expression — the probe side of the persisted
  * fingerprint-Bloom index (see [[graft.ops.TextDedup.writeFpBloomSegment]]).
  *
  * This is the membership-pruning pattern Spark itself uses for runtime
  * row-level filtering (`BloomFilterMightContain` over an injected
  * `bloom_filter_agg`), re-expressed as a standalone native expression so
  * the filter can come from a PERSISTED index instead of a subquery: the
  * serialized filter ships to executors once as a task-binary reference
  * object (`ctx.addReferenceObj`), and each row pays a handful of hash
  * probes into a local bit array — no join, no shuffle, no UDF boxing.
  *
  * Guarantee (the reason the pruned dedup path stays EXACT): a Bloom
  * filter has no false negatives, so `false` here proves the value was
  * never inserted; only `true` rows need the authoritative anti-join.
  *
  * The filter bytes are `spark.util.sketch.BloomFilter` serialization
  * (version-tagged, endian-stable), so bits built by
  * `DataFrameStatFunctions.bloomFilter` round-trip through parquet
  * byte-identically.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a bigint probe column, got ${t.simpleString}")
    }

  // Deserialized once per task (the case-class instance is shared by the
  // generated code through a reference object), probed per row.
  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(bloomBytes)

  override def nullSafeEval(v: Any): Any = bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  /** Column wrapper: true iff `probe` (bigint) MAY be in `bloom`; false
    * proves absence.
    */
  def bloomMightContain(probe: Column, bloom: BloomFilter): Column = {
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    org.apache.spark.sql.GraftShim.column(
      BloomMightContain(org.apache.spark.sql.GraftShim.expression(probe),
        bytes.toByteArray))
  }
}
