package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_size(text)`: compressed byte size of a string's UTF-8 bytes
  * under DEFLATE (level 6, raw, fixed strategy) — the primitive under
  * the COMPRESSION-RATIO quality signal published LLM curation stacks
  * use (e.g. Gopher's repetition rules and "compressible boilerplate"
  * heuristics; near-duplicate and machine-generated text compresses far
  * better than natural prose). Row-local, zero-shuffle; the zlib bit
  * stream for a given input, level, and strategy is deterministic, so
  * the ratio is reproducible across runs and partitions (java.util.zip
  * wraps the same zlib everywhere this engine runs — but NOT necessarily
  * the same bytes as another engine's zlib build, hence no SQL oracle;
  * contracts pin monotone behavior and exact JVM-reference equality).
  *
  * Cost note: one Deflater per evaluation (created/ended inside the
  * call) keeps the expression thread-safe under whole-stage codegen's
  * shared-nothing row loop; the allocation is dwarfed by the deflate
  * itself on document-sized inputs.
  */
object DeflateSize {
  /** Static entry point shared by eval and codegen. */
  def deflatedSize(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def deflateSize(text: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      DeflateSizeExpr(org.apache.spark.sql.GraftShim.expression(text)))
}

case class DeflateSizeExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"
  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.deflatedSize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.DeflateSize.deflatedSize($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateSizeExpr =
    copy(child = newChild)
}
