package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Shared type check: getLong on a non-long array silently reads garbage
  * bytes, so every kernel over pre-hashed `array<long>` token sets rejects
  * other element types at analysis time.
  */
private[functions] object LongArrayCheck {
  def check(name: String, types: Seq[DataType]): TypeCheckResult =
    if (types.forall {
      case ArrayType(LongType, _) => true
      case _ => false
    }) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires array<bigint> inputs, got " +
        types.map(_.simpleString).mkString("(", ", ", ")"))
}

/** Codegen'd MinHash/SimHash kernels.
  *
  * Spark's higher-order functions (`transform`, `aggregate`) are
  * `CodegenFallback` — every element of every lambda evaluates interpreted,
  * with boxing. A 128-hash MinHash signature via nested `transform` costs
  * 128 × |tokens| interpreted expression evaluations per row and dominated
  * the round-1 dedup bench. These expressions do the same math in one tight
  * generated loop over a pre-hashed `array<long>` token set, using Spark's
  * own XXH64 (the `xxhash64` function's kernel, seeded per hash index) so a
  * signature costs 128 × |tokens| JIT'd `hashLong` calls and nothing else.
  */
object MinHashExprs {

  /** `minhash_band_hashes(hs, k, bands)`: k min-hashes of the 64-bit token
    * set `hs` (h_i = min over t of XXH64(t, seed=i)), folded into
    * `bands` LSH band hashes (band b chains XXH64 over its k/bands
    * signature entries, seed b). Returns `array<long>` of length `bands`.
    * One projection, no shuffle; skips materializing the signature column.
    */
  def minhashBandHashes(hs: Column, numHashes: Int, bands: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      MinHashBandHashes(org.apache.spark.sql.GraftShim.expression(hs), numHashes, bands))

  /** `simhash64(hs)`: classic 64-bit SimHash over pre-hashed tokens — bit j
    * is set when the sum of ±1 contributions of each token's bit j is
    * positive. Semantically identical to the aggregate()-based formulation,
    * ~64× fewer interpreted evals.
    */
  def simhash64(hs: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      SimHash64(org.apache.spark.sql.GraftShim.expression(hs)))

  /** `first_equal_index(a, b)`: first position where two `array<long>`
    * (null entries allowed, treated as never-equal) agree; -1 if none.
    * Powers the dedup-free LSH candidate join: a pair colliding in many
    * bands is kept only where `first_equal_index(bhs_a, bhs_b) = band`,
    * which replaces a pairs-sized `dropDuplicates` shuffle with a per-row
    * filter that usually exits on the first comparison.
    */
  def firstEqualIndex(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      FirstEqualIndex(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b)))
}

case class MinHashBandHashes(child: Expression, numHashes: Int, bands: Int)
    extends UnaryExpression {
  require(numHashes % bands == 0, "numHashes must be divisible by bands")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_band_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check(prettyName, Seq(child.dataType))

  private val rowsPerBand = numHashes / bands

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var e = 0
    while (e < n) {
      val h = hs.getLong(e)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashLong(h, i)
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      e += 1
    }
    val bhs = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) { acc = XXH64.hashLong(sig(j), acc); j += 1 }
      bhs(b) = acc
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bhs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val xxh = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      val n = ctx.freshName("n"); val sig = ctx.freshName("sig")
      val bhs = ctx.freshName("bhs"); val e = ctx.freshName("e")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val b = ctx.freshName("b")
      val acc = ctx.freshName("acc"); val j = ctx.freshName("j")
      s"""
        final int $n = $hs.numElements();
        final long[] $sig = new long[$numHashes];
        java.util.Arrays.fill($sig, Long.MAX_VALUE);
        for (int $e = 0; $e < $n; $e++) {
          final long $h = $hs.getLong($e);
          for (int $i = 0; $i < $numHashes; $i++) {
            final long $v = $xxh.hashLong($h, (long) $i);
            if ($v < $sig[$i]) $sig[$i] = $v;
          }
        }
        final long[] $bhs = new long[$bands];
        for (int $b = 0; $b < $bands; $b++) {
          long $acc = (long) $b;
          for (int $j = $b * $rowsPerBand; $j < ($b + 1) * $rowsPerBand; $j++) {
            $acc = $xxh.hashLong($sig[$j], $acc);
          }
          $bhs[$b] = $acc;
        }
        ${ev.value} = $uad.fromPrimitiveArray($bhs);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashBandHashes =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check(prettyName, Seq(child.dataType))

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var e = 0
    while (e < n) {
      val h = hs.getLong(e)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      e += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val e = ctx.freshName("e"); val h = ctx.freshName("h")
      val j = ctx.freshName("j"); val out = ctx.freshName("out")
      s"""
        final int $n = $hs.numElements();
        final int[] $counts = new int[64];
        for (int $e = 0; $e < $n; $e++) {
          final long $h = $hs.getLong($e);
          for (int $j = 0; $j < 64; $j++) {
            if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if ($counts[$j] > 0) $out |= (1L << $j);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class FirstEqualIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_equal_index"

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check(prettyName, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) return i
      i += 1
    }
    -1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      s"""
        final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        int $idx = -1;
        for (int $i = 0; $i < $n; $i++) {
          if (!$a.isNullAt($i) && !$b.isNullAt($i) && $a.getLong($i) == $b.getLong($i)) {
            $idx = $i; break;
          }
        }
        ${ev.value} = $idx;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstEqualIndex =
    copy(left = newLeft, right = newRight)
}
