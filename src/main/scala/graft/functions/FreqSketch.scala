package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-memory heavy-hitters summary — the frequency member of the
  * engine's sketch family (HLL distinct, MinHash similarity, approx
  * percentile; ref: data_quality.py's full value_counts passes, which
  * hold every distinct value in memory — a non-starter for corpus-scale
  * vocabulary). Misra-Gries with the mergeable-summaries combine rule
  * (Agarwal et al., PODS'12, public literature):
  *
  *   - update: counted item +1; new item inserted while capacity
  *     remains; otherwise ALL counters -1, zeros evicted (the classic
  *     pigeonhole step),
  *   - merge: pointwise sum, then subtract the (capacity+1)-th largest
  *     counter and keep positives.
  *
  * Guarantees (the testable contracts): any item with true count
  * > n/(capacity+1) survives in the summary; every reported count is an
  * UNDER-estimate by at most n/(capacity+1); and when the distinct
  * count never exceeds the capacity (on any partial), no decrement ever
  * fires, so counts are EXACT — which is what lets q67 hash-match a
  * DuckDB oracle.
  *
  * 100 TB shape: the partial summary is a fixed `capacity`-entry map, so
  * the shuffle carries O(partitions x groups x capacity) regardless of
  * corpus size — versus the exact group-by-term shuffle whose width is
  * the whole vocabulary.
  */
final class MgSummary(val capacity: Int) {
  val counts = new java.util.HashMap[UTF8String, Long](capacity * 2)

  def add(item: UTF8String, w: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) counts.put(item, cur + w)
    else if (counts.size < capacity) counts.put(item.clone(), w)
    else decrementAll(w)
  }

  /** The pigeonhole step: uncounted arrival of weight w cancels w from
    * every counter (and itself), evicting zeros.
    */
  private def decrementAll(w: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - w
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  /** Mergeable-summaries combine: pointwise sum, then shrink back to
    * capacity by subtracting the (capacity+1)-th largest counter.
    */
  def mergeFrom(other: MgSummary): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(if (cur == 0L && !counts.containsKey(e.getKey)) e.getKey.clone()
                 else e.getKey, cur + e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      val vit = counts.values().iterator()
      var i = 0
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-capacity-1 from the bottom
      val sub = vals(counts.size - capacity - 1)
      val eit = counts.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        val nv = e.getValue - sub
        if (nv <= 0L) eit.remove() else e.setValue(nv)
      }
    }
  }
}

/** `freq_sketch(item, capacity)`: bounded heavy-hitters aggregation
  * returning `array<struct<item string, cnt bigint>>` sorted by
  * (cnt DESC, item ASC). See [[MgSummary]] for the guarantees.
  */
case class FreqSketch(
    child: Expression, capacity: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgSummary] {

  require(capacity > 0, "freq_sketch: capacity must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = FreqSketch.resultType
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): MgSummary = new MgSummary(capacity)

  override def update(buf: MgSummary, input: InternalRow): MgSummary = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: MgSummary, other: MgSummary): MgSummary = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgSummary): Any = {
    val entries = new Array[(UTF8String, Long)](buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, cnt) => (-cnt, item) }
    new GenericArrayData(sorted.map { case (item, cnt) =>
      InternalRow(item, cnt)
    }.toArray[Any])
  }

  override def serialize(buf: MgSummary): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + 24 * buf.counts.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity); out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgSummary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new MgSummary(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      s.counts.put(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren(0))
}

object FreqSketch {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  /** Column API: heavy-hitters summary of `item`, (cnt DESC, item ASC). */
  def freqSketch(item: Column, capacity: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      FreqSketch(
        org.apache.spark.sql.GraftShim.expression(item), capacity)
        .toAggregateExpression())
}
