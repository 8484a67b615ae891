package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Codegen'd random-hyperplane LSH kernels for the vector-similarity
  * operators.
  *
  * The round-3 formulation unrolled `numTables × planesPerTable` separate
  * `dot_f32(vec, element_at(planesLiteral, i))` expression trees — 48
  * trees over a 3,072-element nested literal, duplicated on both join
  * inputs. [[LshSignBuckets]] collapses the whole signature into ONE
  * expression: the plane matrix rides along as a flat `float[]` reference
  * object (no literal tree, no per-row `element_at`), and the generated
  * code is a single triple loop producing every table's bucket in one
  * pass over the vector.
  */
object LshExprs {

  /** Deterministic flat plane matrix, row-major `[plane][dim]`, identical
    * value sequence to the former nested-literal generator (same seed →
    * same gaussians → same buckets).
    */
  def planeMatrix(numPlanes: Int, dim: Int, seed: Long): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numPlanes * dim)(rnd.nextGaussian().toFloat)
  }

  /** `lsh_sign_buckets(vec)`: per-table sign-pattern bucket ids as one
    * `array<long>` of length `numTables`; bit p of table t's bucket is set
    * when vec · plane(t·planesPerTable + p) > 0. Dot products accumulate
    * in double over float elements in index order — bit-identical to the
    * unrolled `dot_f32` formulation it replaces.
    */
  def lshSignBuckets(vec: Column, numTables: Int, planesPerTable: Int,
      dim: Int, seed: Long): Column =
    org.apache.spark.sql.GraftShim.column(
      LshSignBuckets(org.apache.spark.sql.GraftShim.expression(vec),
        planeMatrix(numTables * planesPerTable, dim, seed).toIndexedSeq,
        dim, numTables, planesPerTable))

  /** `first_close_index(a, b, maxBits)`: first position where the two
    * `array<long>` entries differ in at most `maxBits` bits; -1 if none.
    * `maxBits = 0` degenerates to [[MinHashExprs.firstEqualIndex]].
    * Powers the dedup-free MULTI-PROBE candidate join: a query probes its
    * bucket plus all single-bit flips, so a pair is a candidate in table t
    * iff popcount(qb[t] XOR cb[t]) <= 1 — keeping only the row where t is
    * the FIRST such table deduplicates across tables AND probes with a
    * per-row filter, no pairs-sized shuffle.
    */
  def firstCloseIndex(a: Column, b: Column, maxBits: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      FirstCloseIndex(
        org.apache.spark.sql.GraftShim.expression(a),
        org.apache.spark.sql.GraftShim.expression(b), maxBits))
}

case class LshSignBuckets(
    child: Expression, planes: IndexedSeq[Float],
    dim: Int, numTables: Int, planesPerTable: Int)
    extends UnaryExpression {
  require(planes.length == numTables * planesPerTable * dim,
    "plane matrix must be (numTables*planesPerTable) x dim, row-major")
  require(planesPerTable <= 63, "bucket bits must fit a long")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_sign_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${t.simpleString}")
  }

  @transient private lazy val flat: Array[Float] = planes.toArray

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val buckets = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val off = (t * planesPerTable + p) * dim
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += vec.getFloat(i).toDouble * flat(off + i).toDouble
          i += 1
        }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      buckets(t) = bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val uad = classOf[UnsafeArrayData].getName
      val pl = ctx.addReferenceObj("lshPlanes", flat, "float[]")
      val n = ctx.freshName("n"); val buckets = ctx.freshName("buckets")
      val t = ctx.freshName("t"); val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p"); val off = ctx.freshName("off")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
        final int $n = java.lang.Math.min($vec.numElements(), $dim);
        final long[] $buckets = new long[$numTables];
        for (int $t = 0; $t < $numTables; $t++) {
          long $bucket = 0L;
          for (int $p = 0; $p < $planesPerTable; $p++) {
            final int $off = ($t * $planesPerTable + $p) * $dim;
            double $acc = 0.0;
            for (int $i = 0; $i < $n; $i++) {
              $acc += (double) $vec.getFloat($i) * (double) $pl[$off + $i];
            }
            if ($acc > 0) $bucket |= (1L << $p);
          }
          $buckets[$t] = $bucket;
        }
        ${ev.value} = $uad.fromPrimitiveArray($buckets);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignBuckets =
    copy(child = newChild)
}

case class FirstCloseIndex(left: Expression, right: Expression, maxBits: Int)
    extends BinaryExpression {
  require(maxBits >= 0)

  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_close_index"

  override def checkInputDataTypes(): TypeCheckResult =
    LongArrayCheck.check(prettyName, Seq(left.dataType, right.dataType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) &&
        java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)) <= maxBits) return i
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
          if (!$a.isNullAt($i) && !$b.isNullAt($i) &&
              java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i)) <= $maxBits) {
            $idx = $i; break;
          }
        }
        ${ev.value} = $idx;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstCloseIndex =
    copy(left = newLeft, right = newRight)
}
