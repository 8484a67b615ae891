package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Bounded-memory mergeable QUANTILE summary — the rank member of the
  * engine's sketch family (KLL/MRL lineage: Karnin-Lang-Liberty 2016,
  * Manku-Rajagopalan-Lindsay 1998, public literature). Unlike the exact
  * histogram segments (q106), which need a value range chosen up front
  * (fixed bin width), this sketch handles unknown/unbounded ranges with
  * a size budget independent of n.
  *
  * Structure: level i holds items of weight 2^i, at most `k` per level.
  * A full level sorts, keeps alternate items (offset toggles per
  * compaction — the deterministic derandomization the KLL paper
  * describes), and promotes them to level i+1. Merge = levelwise
  * concatenation + the same compaction rule, so partial aggregation and
  * segment stores compose.
  *
  * Contracts (the testable guarantees, SketchStatsSpec):
  *   - UNDER capacity (n <= k): no compaction ever fires, the summary IS
  *     the sorted data, and every quantile is EXACT — which lets q157
  *     hash-match a DuckDB oracle (the q147 under-capacity pattern).
  *   - OVER capacity: each level-i compaction perturbs any rank by at
  *     most 2^i, giving worst-case rank error <= sum_i c_i 2^i bounded
  *     by ~ (n / k) * levels / 2; the spec asserts an empirical bound
  *     far under n.
  *   - Merges preserve the bound for ANY merge order (compaction is
  *     multiset-in, multiset-out with the same guarantee).
  *
  * Quantile definition (shared with the oracle and histQuantiles): the
  * smallest summary value whose cumulative weight reaches ceil(q * W).
  *
  * 100 TB shape: the shuffle carries O(k * log(n/k)) doubles per group
  * regardless of n — versus an exact percentile's full-sort. Over-
  * capacity results depend on arrival order (like any one-pass sketch)
  * but the error bound holds for every order.
  */
object KllSketch {

  final class KllSummary(val k: Int) {
    require(k >= 8, s"k must be >= 8, got $k")
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
    /** per-level keep-offset toggle (the deterministic alternation). */
    val parity: ArrayBuffer[Boolean] = ArrayBuffer(false)
    var count: Long = 0L

    def add(x: Double): Unit = {
      levels(0) += x
      count += 1L
      if (levels(0).length >= k) compact(0)
    }

    private def ensureLevel(i: Int): Unit =
      while (levels.length <= i) { levels += ArrayBuffer.empty[Double]; parity += false }

    /** Sort level i, promote alternate items to i+1, clear level i.
      * Cascades if the promotion fills i+1.
      */
    private def compact(i: Int): Unit = {
      val buf = levels(i)
      if (buf.length < 2) return
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      ensureLevel(i + 1)
      // odd length: the smallest item stays behind at level i so the
      // paired region is even and total weight is preserved EXACTLY
      // (m items of weight w -> m/2 items of weight 2w)
      val startIdx = arr.length % 2
      val up = levels(i + 1)
      var j = startIdx + (if (parity(i)) 1 else 0)
      parity(i) = !parity(i)
      while (j < arr.length) { up += arr(j); j += 2 }
      buf.clear()
      if (startIdx == 1) buf += arr(0)
      if (levels(i + 1).length >= k) compact(i + 1)
    }

    def merge(other: KllSummary): Unit = {
      require(other.k == k,
        s"cannot merge KLL summaries with different k: $k vs ${other.k}")
      var i = 0
      while (i < other.levels.length) {
        ensureLevel(i)
        levels(i) ++= other.levels(i)
        i += 1
      }
      count += other.count
      i = 0
      while (i < levels.length) {
        if (levels(i).length >= k) compact(i)
        i += 1
      }
    }

    /** (value, weight) pairs sorted by value. */
    def weighted(): Array[(Double, Long)] = {
      val out = ArrayBuffer.empty[(Double, Long)]
      var i = 0
      while (i < levels.length) {
        val w = 1L << i
        levels(i).foreach(v => out += ((v, w)))
        i += 1
      }
      out.sortBy(_._1).toArray
    }

    def totalWeight: Long = {
      var s = 0L; var i = 0
      while (i < levels.length) { s += levels(i).length.toLong << i; i += 1 }
      s
    }

    /** Smallest value whose cumulative weight reaches ceil(q * W). */
    def quantile(q: Double): Double = {
      require(q > 0 && q <= 1, s"quantile must be in (0, 1], got $q")
      val pairs = weighted()
      require(pairs.nonEmpty, "quantile of an empty summary")
      val target = math.ceil(q * totalWeight).toLong
      var cum = 0L; var i = 0
      while (i < pairs.length) {
        cum += pairs(i)._2
        if (cum >= target) return pairs(i)._1
        i += 1
      }
      pairs.last._1
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream(64)
      val out = new DataOutputStream(bos)
      out.writeInt(k); out.writeLong(count); out.writeInt(levels.length)
      var i = 0
      while (i < levels.length) {
        out.writeBoolean(parity(i))
        out.writeInt(levels(i).length)
        levels(i).foreach(out.writeDouble)
        i += 1
      }
      out.flush()
      bos.toByteArray
    }
  }

  def deserialize(bytes: Array[Byte]): KllSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new KllSummary(in.readInt())
    s.count = in.readLong()
    val nl = in.readInt()
    s.levels.clear(); s.parity.clear()
    var i = 0
    while (i < nl) {
      s.parity += in.readBoolean()
      val n = in.readInt()
      val buf = ArrayBuffer.empty[Double]
      var j = 0
      while (j < n) { buf += in.readDouble(); j += 1 }
      s.levels += buf
      i += 1
    }
    s
  }

  /** Static entry point for the scalar expression's codegen. */
  def quantileOf(bytes: Array[Byte], q: Double): Double =
    deserialize(bytes).quantile(q)

  /** Column API. */
  def kllBuild(value: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      KllBuildAgg(org.apache.spark.sql.GraftShim.expression(value), k)
        .toAggregateExpression())
  def kllMerge(sketch: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      KllMergeAgg(org.apache.spark.sql.GraftShim.expression(sketch))
        .toAggregateExpression())
  def kllQuantile(sketch: Column, q: Column): Column =
    org.apache.spark.sql.GraftShim.column(
      KllQuantileExpr(org.apache.spark.sql.GraftShim.expression(sketch),
        org.apache.spark.sql.GraftShim.expression(q)))
}

/** `kll_build(value, k)`: quantile-summary aggregate over doubles. */
case class KllBuildAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.KllSummary] {

  require(k >= 8, s"kll_build: k must be >= 8, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_build"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_build requires a double input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): KllSketch.KllSummary =
    new KllSketch.KllSummary(k)

  override def update(buf: KllSketch.KllSummary, input: InternalRow): KllSketch.KllSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllSketch.KllSummary, other: KllSketch.KllSummary): KllSketch.KllSummary = {
    buf.merge(other); buf
  }

  override def eval(buf: KllSketch.KllSummary): Any = buf.serialize()
  override def serialize(buf: KllSketch.KllSummary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.KllSummary =
    KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllBuildAgg =
    copy(child = newChildren(0))
}

/** `kll_merge(sketch)`: merge aggregate over serialized summaries. */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllSketch.KllSummary] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge requires a binary sketch input, got ${child.dataType.simpleString}")

  // k adopted from the first merged sketch; a later mismatch fails loudly
  // in KllSummary.merge
  override def createAggregationBuffer(): KllSketch.KllSummary =
    new KllSketch.KllSummary(8)

  override def update(buf: KllSketch.KllSummary, input: InternalRow): KllSketch.KllSummary = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val other = KllSketch.deserialize(v.asInstanceOf[Array[Byte]])
      merge(buf, other)
    }
  }

  // an untouched buffer (count 0, placeholder k) ADOPTS the first real
  // summary; mixed-k summaries with data still fail loudly inside merge
  override def merge(buf: KllSketch.KllSummary, other: KllSketch.KllSummary): KllSketch.KllSummary =
    if (buf.count == 0L && buf.k != other.k) other
    else if (other.count == 0L && buf.k != other.k) buf
    else { buf.merge(other); buf }

  override def eval(buf: KllSketch.KllSummary): Any = buf.serialize()
  override def serialize(buf: KllSketch.KllSummary): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): KllSketch.KllSummary =
    KllSketch.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren(0))
}

/** `kll_quantile(sketch, q)`: read one quantile off a serialized summary. */
case class KllQuantileExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "kll_quantile requires (binary sketch, double q), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kll_quantile"
  override protected def nullSafeEval(s: Any, q: Any): Any =
    KllSketch.quantileOf(s.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (s, q) => s"graft.functions.KllSketch.quantileOf($s, $q)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantileExpr =
    copy(left = newLeft, right = newRight)
}
