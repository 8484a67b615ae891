package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Codegen'd product-quantization kernels (PQ/ADC design per the public
  * Jégou et al. 2011 / FAISS IVFADC literature; the reference repo has no
  * PQ surface — this is a scale extension). The trained codebooks ride along as a flat
  * `float[]` reference object — same no-literal-tree design as
  * [[NearestCentroids]] and [[LshSignBuckets]].
  *
  * Layout contract shared by all three kernels: `m` subspaces of `dsub`
  * dims each (`m*dsub` = vector dim), `ksub <= 256` centroids per
  * subspace; codebook entry `(sub, c)` lives at flat offset
  * `(sub*ksub + c) * dsub`. Vectors are L2-normalized INSIDE the kernels
  * (in double; the zero vector stays zero), so the ADC score approximates
  * cosine directly and callers never pre-normalize.
  *
  * Why the 100 TB shape is (encode → lut → adc): the corpus is encoded
  * ONCE to `m` bytes per row (32x smaller than 64 floats — that is the
  * index that gets stored, shuffled, and scanned); each query builds one
  * `m*ksub` lookup table; scoring a candidate is then `m` array lookups
  * instead of a `m*dsub`-mult dot product.
  */
object PqExprs {

  private def flatten(codebooks: Array[Array[Array[Float]]]): (IndexedSeq[Float], Int, Int, Int) = {
    val m = codebooks.length
    require(m >= 1, "need at least one subspace")
    val ksub = codebooks.head.length
    val dsub = codebooks.head.head.length
    require(ksub >= 1 && ksub <= 256, s"ksub must be in [1,256], got $ksub")
    require(codebooks.forall(b => b.length == ksub && b.forall(_.length == dsub)),
      "codebook tensor must be rectangular m x ksub x dsub")
    (codebooks.flatten.flatten.toIndexedSeq, m, ksub, dsub)
  }

  /** `pq_encode(vec)`: the vector's `m`-byte PQ code — per subspace, the
    * index of the L2-nearest codebook entry to the normalized sub-vector
    * (ties to the lower index; code `c` is stored as the unsigned byte
    * `c & 0xFF`).
    */
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val (flat, m, ksub, dsub) = flatten(codebooks)
    org.apache.spark.sql.GraftShim.column(
      PqEncode(org.apache.spark.sql.GraftShim.expression(vec), flat, m, ksub, dsub))
  }

  /** `pq_lut(vec)`: the query's ADC lookup table — `lut[sub*ksub + c]` =
    * dot(normalized query sub-vector, codebook entry `(sub, c)`), one
    * `array<float>` of `m*ksub` entries computed ONCE per query row.
    */
  def pqLut(vec: Column, codebooks: Array[Array[Array[Float]]]): Column = {
    val (flat, m, ksub, dsub) = flatten(codebooks)
    org.apache.spark.sql.GraftShim.column(
      PqLut(org.apache.spark.sql.GraftShim.expression(vec), flat, m, ksub, dsub))
  }

  /** `pq_adc_dot(lut, code)`: asymmetric-distance cosine estimate —
    * `m` table lookups summed in double. EXACTLY equals the dot product
    * of the normalized query with the code's reconstruction (up to the
    * per-entry float rounding of the LUT), which is the testable contract.
    */
  def pqAdcDot(lut: Column, code: Column, ksub: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      PqAdcDot(org.apache.spark.sql.GraftShim.expression(lut),
        org.apache.spark.sql.GraftShim.expression(code), ksub))
}

/** Shared shape/normalization plumbing for the two vector-input kernels. */
sealed trait PqVectorKernel extends UnaryExpression {
  def flat: IndexedSeq[Float]
  def m: Int
  def ksub: Int
  def dsub: Int
  require(flat.length == m * ksub * dsub,
    "codebooks must be m x ksub x dsub, row-major")

  @transient protected lazy val books: Array[Float] = flat.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${t.simpleString}")
  }

  /** Normalized copy of the input (missing trailing dims read as 0). */
  protected def normalized(vec: ArrayData): Array[Double] = {
    val dim = m * dsub
    val n = math.min(vec.numElements(), dim)
    val v = new Array[Double](dim)
    var nrm = 0.0
    var i = 0
    while (i < n) {
      val x = vec.getFloat(i).toDouble
      v(i) = x; nrm += x * x; i += 1
    }
    if (nrm > 0.0) {
      val inv = 1.0 / math.sqrt(nrm)
      i = 0
      while (i < dim) { v(i) *= inv; i += 1 }
    }
    v
  }

  /** Codegen preamble computing the normalized `double[]` into `vName`. */
  protected def genNormalize(ctx: CodegenContext, vec: String, vName: String): String = {
    val dim = m * dsub
    val n = ctx.freshName("n"); val nrm = ctx.freshName("nrm")
    val i = ctx.freshName("i"); val inv = ctx.freshName("inv")
    s"""
      final int $n = java.lang.Math.min($vec.numElements(), $dim);
      final double[] $vName = new double[$dim];
      double $nrm = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        final double __x = (double) $vec.getFloat($i);
        $vName[$i] = __x; $nrm += __x * __x;
      }
      if ($nrm > 0.0) {
        final double $inv = 1.0 / java.lang.Math.sqrt($nrm);
        for (int $i = 0; $i < $dim; $i++) { $vName[$i] *= $inv; }
      }
    """
  }
}

case class PqEncode(child: Expression, flat: IndexedSeq[Float],
    m: Int, ksub: Int, dsub: Int) extends PqVectorKernel {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val v = normalized(input.asInstanceOf[ArrayData])
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var d = 0.0; var i = 0
        while (i < dsub) {
          val x = v(s * dsub + i) - books(off + i)
          d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best.toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val bk = ctx.addReferenceObj("pqBooks", books, "float[]")
      val v = ctx.freshName("v"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val off = ctx.freshName("off"); val d = ctx.freshName("d")
      val i = ctx.freshName("i"); val x = ctx.freshName("x")
      s"""
        ${genNormalize(ctx, vec, v)}
        final byte[] $out = new byte[$m];
        for (int $s = 0; $s < $m; $s++) {
          int $best = 0; double $bestD = Double.MAX_VALUE;
          for (int $c = 0; $c < $ksub; $c++) {
            final int $off = ($s * $ksub + $c) * $dsub;
            double $d = 0.0;
            for (int $i = 0; $i < $dsub; $i++) {
              final double $x = $v[$s * $dsub + $i] - (double) $bk[$off + $i];
              $d += $x * $x;
            }
            if ($d < $bestD) { $bestD = $d; $best = $c; }
          }
          $out[$s] = (byte) $best;
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

case class PqLut(child: Expression, flat: IndexedSeq[Float],
    m: Int, ksub: Int, dsub: Int) extends PqVectorKernel {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val v = normalized(input.asInstanceOf[ArrayData])
    val out = new Array[Float](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val off = (s * ksub + c) * dsub
        var acc = 0.0; var i = 0
        while (i < dsub) { acc += v(s * dsub + i) * books(off + i); i += 1 }
        out(s * ksub + c) = acc.toFloat
        c += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val uad = classOf[UnsafeArrayData].getName
      val bk = ctx.addReferenceObj("pqBooks", books, "float[]")
      val v = ctx.freshName("v"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        ${genNormalize(ctx, vec, v)}
        final float[] $out = new float[${m * ksub}];
        for (int $s = 0; $s < $m; $s++) {
          for (int $c = 0; $c < $ksub; $c++) {
            final int $off = ($s * $ksub + $c) * $dsub;
            double $acc = 0.0;
            for (int $i = 0; $i < $dsub; $i++) {
              $acc += $v[$s * $dsub + $i] * (double) $bk[$off + $i];
            }
            $out[$s * $ksub + $c] = (float) $acc;
          }
        }
        ${ev.value} = $uad.fromPrimitiveArray($out);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

case class PqAdcDot(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression {
  require(ksub >= 1 && ksub <= 256)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, binary), got (${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(lut: Any, code: Any): Any = {
    val l = lut.asInstanceOf[ArrayData]
    val cd = code.asInstanceOf[Array[Byte]]
    // A code/LUT pair built from different codebooks (mismatched m or ksub)
    // would otherwise index past the LUT and return garbage scores.
    if (cd.length.toLong * ksub != l.numElements())
      throw new IllegalArgumentException(
        s"pq_adc_dot: code has ${cd.length} subspaces but LUT has " +
          s"${l.numElements()} entries (expected ${cd.length.toLong * ksub} for ksub=$ksub)")
    var acc = 0.0; var s = 0
    while (s < cd.length) {
      acc += l.getFloat(s * ksub + (cd(s) & 0xFF)).toDouble
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      s"""
        if ((long) $code.length * $ksub != $lut.numElements()) {
          throw new IllegalArgumentException(
            "pq_adc_dot: code has " + $code.length + " subspaces but LUT has " +
            $lut.numElements() + " entries (expected " +
            ((long) $code.length * $ksub) + " for ksub=" + $ksub + ")");
        }
        double $acc = 0.0;
        for (int $s = 0; $s < $code.length; $s++) {
          $acc += (double) $lut.getFloat($s * $ksub + ($code[$s] & 0xFF));
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDot =
    copy(left = newLeft, right = newRight)
}
