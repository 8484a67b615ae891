package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `phrase_starts(tokens, phrase)`: the 1-based start positions of every
  * (possibly overlapping) occurrence of the fixed token sequence `phrase`
  * in a token array, ascending.
  *
  * Rationale (SURVEY §2 custom-op preference (b)): the declarative
  * formulation — `filter(sequence(1, n-L+1), i -> element_at(..) = w0 AND
  * ...)` — runs every candidate position through an INTERPRETED lambda
  * (Spark's higher-order array functions are CodegenFallback), boxing the
  * index and allocating per row; measured 3.1 s for a bigram over the
  * sf0.1 corpus. This kernel is one fused generated loop over the token
  * array with the phrase words bound as constant UTF8Strings — the same
  * treatment the winnow/minhash kernels got, and it keeps the scan inside
  * whole-stage codegen.
  *
  * Null token elements never match (whitespace tokenization produces
  * none, but a hand-built array must not NPE the kernel).
  */
case class PhraseStarts(child: Expression, phrase: Seq[String])
    extends UnaryExpression {

  require(phrase.nonEmpty, "phrase_starts: phrase must be non-empty")
  require(phrase.forall(_ != null), "phrase_starts: phrase tokens must be non-null")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "phrase_starts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_starts requires array<string> input, got ${other.simpleString}")
  }

  @transient private lazy val words: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any = {
    val t = input.asInstanceOf[ArrayData]
    val n = t.numElements()
    val L = words.length
    if (n < L) return new GenericArrayData(Array.empty[Int])
    val buf = new Array[Int](n - L + 1)
    var cnt = 0
    var i = 0
    while (i <= n - L) {
      var j = 0
      var ok = true
      while (ok && j < L) {
        if (t.isNullAt(i + j) || !t.getUTF8String(i + j).equals(words(j))) ok = false
        j += 1
      }
      if (ok) { buf(cnt) = i + 1; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val w = ctx.addReferenceObj("phraseWords", words,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val ok = ctx.freshName("ok")
      val buf = ctx.freshName("buf"); val cnt = ctx.freshName("cnt")
      val L = words.length
      s"""
        final int $n = $t.numElements();
        if ($n < $L) {
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[0]);
        } else {
          final int[] $buf = new int[$n - $L + 1];
          int $cnt = 0;
          for (int $i = 0; $i <= $n - $L; $i++) {
            boolean $ok = true;
            for (int $j = 0; $ok && $j < $L; $j++) {
              if ($t.isNullAt($i + $j) ||
                  !$t.getUTF8String($i + $j).equals($w[$j])) $ok = false;
            }
            if ($ok) { $buf[$cnt++] = $i + 1; }
          }
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
            java.util.Arrays.copyOf($buf, $cnt));
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PhraseStarts =
    copy(child = newChild)
}

object PhraseStarts {
  /** Column API: ascending 1-based start positions of `phrase` in `tokens`. */
  def starts(tokens: Column, phrase: Seq[String]): Column =
    org.apache.spark.sql.GraftShim.column(
      PhraseStarts(org.apache.spark.sql.GraftShim.expression(tokens), phrase))
}
