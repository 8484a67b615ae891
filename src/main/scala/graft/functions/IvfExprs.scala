package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Codegen'd coarse-quantizer kernel for IVF (inverted-file) ANN
  * (IVF design per the public FAISS/SPANN literature; the reference repo
  * has no ANN surface — this is a scale extension). The centroid matrix rides along as a flat
  * `float[]` reference object — same no-literal-tree design as
  * [[LshSignBuckets]] — and one pass over the vector scores every
  * centroid and selects the `nprobe` nearest by dot product (centroids
  * are L2-normalized at build time, so dot order IS cosine order).
  */
object IvfExprs {

  /** `nearest_centroids(vec)`: indices of the `nprobe` highest-dot
    * centroids, descending; ties break toward the lower index
    * (deterministic under any partitioning). `nprobe = 1` is corpus cell
    * assignment; `nprobe > 1` is the query-side probe list.
    */
  def nearestCentroids(vec: Column, centroids: Array[Array[Float]],
      nprobe: Int): Column = {
    require(centroids.nonEmpty && centroids.forall(_.length == centroids.head.length),
      "centroid matrix must be rectangular")
    org.apache.spark.sql.GraftShim.column(
      NearestCentroids(org.apache.spark.sql.GraftShim.expression(vec),
        centroids.flatten.toIndexedSeq, centroids.head.length,
        centroids.length, nprobe))
  }
}

case class NearestCentroids(
    child: Expression, centroids: IndexedSeq[Float],
    dim: Int, numCentroids: Int, nprobe: Int)
    extends UnaryExpression {
  require(centroids.length == numCentroids * dim,
    "centroid matrix must be numCentroids x dim, row-major")
  require(nprobe >= 1 && nprobe <= numCentroids)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> input, got ${t.simpleString}")
  }

  @transient private lazy val flat: Array[Float] = centroids.toArray

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(vec.numElements(), dim)
    val bestIdx = new Array[Int](nprobe)
    val bestDot = new Array[Double](nprobe)
    java.util.Arrays.fill(bestDot, Double.NegativeInfinity)
    var c = 0
    while (c < numCentroids) {
      val off = c * dim
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += vec.getFloat(i).toDouble * flat(off + i).toDouble
        i += 1
      }
      // insertion into the descending top-nprobe; strict > keeps the
      // earlier (lower) index on ties; a NaN dot compares false and is
      // skipped outright
      if (acc > bestDot(nprobe - 1)) {
        var j = nprobe - 1
        while (j > 0 && bestDot(j - 1) < acc) {
          bestDot(j) = bestDot(j - 1); bestIdx(j) = bestIdx(j - 1); j -= 1
        }
        bestDot(j) = acc; bestIdx(j) = c
      }
      c += 1
    }
    fillUnusedTail(bestIdx, bestDot)
    UnsafeArrayData.fromPrimitiveArray(bestIdx)
  }

  /** Slots no insert ever reached (all-NaN vector, or fewer than `nprobe`
    * comparable dots) keep `-inf` and sink to the tail; fill them with the
    * lowest centroid indices not already present so the probe list is
    * ALWAYS distinct — duplicate cells would break the documented
    * no-candidate-pair-produced-twice invariant in cosineTopKIvf/Pq.
    */
  private def fillUnusedTail(bestIdx: Array[Int], bestDot: Array[Double]): Unit = {
    var k = 0
    while (k < nprobe && bestDot(k) > Double.NegativeInfinity) k += 1
    if (k < nprobe) {
      var next = 0
      var j = k
      while (j < nprobe) {
        var dup = true
        while (dup) {
          dup = false
          var t = 0
          while (t < k) { if (bestIdx(t) == next) dup = true; t += 1 }
          if (dup) next += 1
        }
        bestIdx(j) = next; next += 1; j += 1
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, vec => {
      val uad = classOf[UnsafeArrayData].getName
      val ce = ctx.addReferenceObj("ivfCentroids", flat, "float[]")
      val n = ctx.freshName("n"); val bi = ctx.freshName("bestIdx")
      val bd = ctx.freshName("bestDot"); val c = ctx.freshName("c")
      val off = ctx.freshName("off"); val acc = ctx.freshName("acc")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val nx = ctx.freshName("next")
      val dup = ctx.freshName("dup"); val t = ctx.freshName("t")
      s"""
        final int $n = java.lang.Math.min($vec.numElements(), $dim);
        final int[] $bi = new int[$nprobe];
        final double[] $bd = new double[$nprobe];
        java.util.Arrays.fill($bd, Double.NEGATIVE_INFINITY);
        for (int $c = 0; $c < $numCentroids; $c++) {
          final int $off = $c * $dim;
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += (double) $vec.getFloat($i) * (double) $ce[$off + $i];
          }
          if ($acc > $bd[$nprobe - 1]) {
            int $j = $nprobe - 1;
            while ($j > 0 && $bd[$j - 1] < $acc) {
              $bd[$j] = $bd[$j - 1]; $bi[$j] = $bi[$j - 1]; $j--;
            }
            $bd[$j] = $acc; $bi[$j] = $c;
          }
        }
        // NaN-dot slots never inserted keep -inf at the tail; refill with
        // the lowest unused indices so the probe list stays distinct
        int $k = 0;
        while ($k < $nprobe && $bd[$k] > Double.NEGATIVE_INFINITY) $k++;
        for (int $j = $k, $nx = 0; $j < $nprobe; $j++, $nx++) {
          boolean $dup = true;
          while ($dup) {
            $dup = false;
            for (int $t = 0; $t < $k; $t++) { if ($bi[$t] == $nx) $dup = true; }
            if ($dup) $nx++;
          }
          $bi[$j] = $nx;
        }
        ${ev.value} = $uad.fromPrimitiveArray($bi);
      """
    })

  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}
