package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Fixed-capacity top-k accumulator over (score, id) pairs, ordered by
  * (score DESC, id ASC). Backed by a binary heap with the WORST kept
  * element at the root, so every insert against a full buffer is one
  * comparison in the common reject case and O(log k) otherwise. Arrays of
  * primitives — no boxing on the aggregation hot path.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // (s1,i1) ranks strictly worse than (s2,i2) under (score DESC, id ASC)
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def swap(i: Int, j: Int): Unit = {
    val ts = scores(i); scores(i) = scores(j); scores(j) = ts
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def insert(s: Double, id: Long): Unit = {
    if (size < k) {
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
        swap(i, (i - 1) / 2); i = (i - 1) / 2
      }
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }
  }
}

/** `topk_pairs(score, id, k)`: bounded top-k aggregation returning
  * `array<struct<score double, id bigint>>` sorted by (score DESC, id ASC).
  *
  * This is the scale-correct replacement for the
  * `row_number().over(Window.partitionBy(query).orderBy(...)) <= k`
  * ranking idiom: the window shape shuffles EVERY scored row to one task
  * per query and sorts corpus-sized partitions, collapsing parallelism to
  * the number of queries. As a TypedImperativeAggregate the partial
  * aggregate runs map-side (ObjectHashAggregate), so each input partition
  * contributes at most k pairs per query and the shuffle carries
  * O(partitions × queries × k) bytes regardless of corpus size.
  */
case class TopKPairs(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {

  require(k > 0, "topk_pairs: k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = TopKPairs.resultType
  override def prettyName: String = "topk_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"topk_pairs requires (double, bigint) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKHeap): Any = {
    val idx = (0 until buf.size).sortBy(i => (-buf.scores(i), buf.ids(i)))
    new GenericArrayData(
      idx.map(i => InternalRow(buf.scores(i), buf.ids(i))).toArray[Any])
  }

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * buf.size)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.scores(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val h = new TopKHeap(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) { h.insert(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairs {
  val resultType: ArrayType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** Column API: aggregate to the top-k (score DESC, id ASC) pairs. */
  def topK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftShim.column(
      TopKPairs(
        org.apache.spark.sql.GraftShim.expression(score),
        org.apache.spark.sql.GraftShim.expression(id), k).toAggregateExpression())
}
