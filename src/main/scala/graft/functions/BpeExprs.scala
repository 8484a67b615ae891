package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_merge(symbols, a, b)`: replace every adjacent, non-overlapping
  * occurrence of the symbol pair (a, b) with the fused symbol `a+b`,
  * scanning LEFT TO RIGHT — exactly the merge-application step of
  * byte-pair encoding (Sennrich et al. 2016; "aaa" under (a,a) merges
  * the FIRST two, yielding ["aa","a"]).
  *
  * The pair is bound per-expression as constant UTF8Strings: a BPE
  * training round creates one instance for its chosen pair, so the
  * per-row loop compares against constants and stays inside whole-stage
  * codegen (the HOF `aggregate`/`transform` formulation would run
  * interpreted per symbol — see PhraseExprs for the measured cost of
  * that shape).
  *
  * Null symbol elements pass through unfused.
  */
case class BpeMerge(child: Expression, a: String, b: String)
    extends UnaryExpression {

  require(a != null && b != null && a.nonEmpty && b.nonEmpty,
    "bpe_merge: pair symbols must be non-empty")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_merge requires array<string> input, got ${other.simpleString}")
  }

  @transient private lazy val ua: UTF8String = UTF8String.fromString(a)
  @transient private lazy val ub: UTF8String = UTF8String.fromString(b)
  @transient private lazy val uab: UTF8String = UTF8String.fromString(a + b)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[ArrayData]
    val n = s.numElements()
    val out = new Array[AnyRef](n)
    var cnt = 0
    var i = 0
    while (i < n) {
      val cur = if (s.isNullAt(i)) null else s.getUTF8String(i)
      if (cur != null && i + 1 < n && !s.isNullAt(i + 1) &&
          cur.equals(ua) && s.getUTF8String(i + 1).equals(ub)) {
        out(cnt) = uab; cnt += 1; i += 2
      } else {
        out(cnt) = cur; cnt += 1; i += 1
      }
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val refA = ctx.addReferenceObj("bpeA", ua,
        "org.apache.spark.unsafe.types.UTF8String")
      val refB = ctx.addReferenceObj("bpeB", ub,
        "org.apache.spark.unsafe.types.UTF8String")
      val refAB = ctx.addReferenceObj("bpeAB", uab,
        "org.apache.spark.unsafe.types.UTF8String")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt"); val out = ctx.freshName("out")
      val cur = ctx.freshName("cur")
      s"""
        final int $n = $s.numElements();
        final Object[] $out = new Object[$n];
        int $cnt = 0;
        int $i = 0;
        while ($i < $n) {
          final org.apache.spark.unsafe.types.UTF8String $cur =
            $s.isNullAt($i) ? null : $s.getUTF8String($i);
          if ($cur != null && $i + 1 < $n && !$s.isNullAt($i + 1) &&
              $cur.equals($refA) && $s.getUTF8String($i + 1).equals($refB)) {
            $out[$cnt++] = $refAB; $i += 2;
          } else {
            $out[$cnt++] = $cur; $i += 1;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          java.util.Arrays.copyOf($out, $cnt));
      """
    })

  override protected def withNewChildInternal(newChild: Expression): BpeMerge =
    copy(child = newChild)
}

object BpeMerge {
  /** Column API: fuse adjacent (a, b) into a+b, left to right. */
  def merge(symbols: Column, a: String, b: String): Column =
    org.apache.spark.sql.GraftShim.column(
      BpeMerge(org.apache.spark.sql.GraftShim.expression(symbols), a, b))
}
