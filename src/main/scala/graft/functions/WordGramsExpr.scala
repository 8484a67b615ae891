package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `word_grams(tokens, n)`: all space-joined word n-grams of a token
  * array, as one array — `["a","b","c"]`, n=2 → `["a b", "b c"]`; fewer
  * than n tokens → empty array; null input → null.
  *
  * Rationale (SURVEY §2 custom-op preference (b)) — this kernel kills
  * two distinct costs of the composed formulation
  * (`transform(sequence(1, m-n+1), i -> concat_ws(' ',
  * element_at(t, i), ...))`):
  *
  *  1. **The inlined-child footgun, by construction.** Each
  *     `element_at(tokens, ...)` re-evaluates the `tokens` expression;
  *     when a caller inlines `split(trim(text))` instead of binding it
  *     to a column first, the REGEX TOKENIZATION re-runs n times per
  *     gram — O(len²) per document. Measured on the sf0.1 documents
  *     table (5k docs, 255k 4-grams): 8.5 s inlined vs ~0.4 s bound.
  *     Every old call site carried a "bind `_t` first" comment as the
  *     defense (CorpusOps.contamination's lesson); q246's first cut
  *     forgot and paid the 8.5 s. A native UnaryExpression evaluates its
  *     child exactly once per row, so the footgun class is gone — no
  *     call-site discipline needed.
  *  2. **Interpreted higher-order-function overhead.** `transform` does
  *     not participate in whole-stage codegen; the lambda body is
  *     interpreted per element. Worth ~0.4 s → 0.25 s on the same table
  *     (bound-column composed vs this kernel) — small next to (1), but
  *     it compounds across the dozen gram consumers (decontamination,
  *     LM scoring, DSIR weighting, collocations, novel-gram rate, vocab
  *     drift, source overlap).
  *
  * One pass over the token array, one `UTF8String.concatWs` per gram,
  * codegen'd via `doGenCode` so the loop inlines into the consuming
  * stage.
  *
  * Semantics parity with the composed form: `concat_ws` SKIPS null
  * elements (a null token shortens its grams rather than nulling them) —
  * `UTF8String.concatWs` implements exactly that rule, and the
  * whitespace tokenizer never produces null tokens anyway.
  */
case class WordGramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_grams requires array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) WordGramsExpr.emptyResult
    else {
      val sep = WordGramsExpr.sep
      val out = new Array[Any](cnt)
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < cnt) {
        var j = 0
        while (j < n) {
          // explicit null check: UnsafeArrayData.getUTF8String on a null
          // slot returns an EMPTY string (no null guard in the unsafe
          // reader), which would insert a doubled separator instead of
          // skipping the element — concatWs skips actual nulls, matching
          // concat_ws (and the composed form) on every array encoding
          parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
          j += 1
        }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val u8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sep = ctx.addReferenceObj("sep", WordGramsExpr.sep, u8)
      s"""
        final int $m = $a.numElements();
        final int $cnt = $m - $n + 1;
        if ($cnt <= 0) {
          ${ev.value} = new $gad(new Object[0]);
        } else {
          final Object[] $out = new Object[$cnt];
          final $u8[] $parts = new $u8[$n];
          for (int $i = 0; $i < $cnt; $i++) {
            for (int $j = 0; $j < $n; $j++) {
              $parts[$j] = $a.isNullAt($i + $j)
                ? null : $a.getUTF8String($i + $j);
            }
            $out[$i] = $u8.concatWs($sep, $parts);
          }
          ${ev.value} = new $gad($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpr =
    copy(child = newChild)
}

object WordGramsExpr {
  private[functions] val sep = UTF8String.fromString(" ")
  private[functions] val emptyResult = new GenericArrayData(new Array[Any](0))

  /** Column API. */
  def wordGrams(tokens: Column, n: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      WordGramsExpr(org.apache.spark.sql.GraftShim.expression(tokens), n))

  /** SQL registration: `SELECT word_grams(t, 3)`. `n` must be an integer
    * literal (any integral width) — a clear error beats the opaque
    * ClassCastException/NPE a raw `.eval(null).asInstanceOf[Int]` throws
    * on BIGINT literals, NULLs, or column references. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_grams",
      exprs => {
        require(exprs.length == 2, "word_grams(tokens, n) takes 2 arguments")
        val nExpr = exprs(1)
        require(nExpr.foldable,
          "word_grams: n must be a literal, not a column or expression")
        val n = nExpr.eval(null) match {
          case i: Int => i
          case l: Long => math.toIntExact(l)
          case s: Short => s.toInt
          case b: Byte => b.toInt
          case other => throw new IllegalArgumentException(
            s"word_grams: n must be an integer literal, got $other")
        }
        WordGramsExpr(exprs(0), n)
      }, "scala_udf")
}
