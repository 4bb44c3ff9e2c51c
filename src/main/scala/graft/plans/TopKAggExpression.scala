package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-capacity binary heap holding the current top-k (score desc,
  * id asc): the root is the WORST kept element, so a new row either
  * replaces the root in O(log k) or is rejected in O(1). Primitive
  * arrays, no per-row allocation.
  */
final class TopKHeap(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** element (s1,i1) ranks strictly worse than (s2,i2) under the total
    * order (score desc, id asc). */
  private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && worse(scores(i), ids(i), scores((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2)
      i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true else { swap(i, w); i = w }
    }
  }

  def insert(s: Double, id: Long): Unit =
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown()
    }

  def mergeFrom(other: TopKHeap): TopKHeap = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
    this
  }

  /** (score, id) pairs best-first — the finished top-k. */
  def sortedPairs: Array[(Double, Long)] = {
    val out = Array.tabulate(n)(i => (scores(i), ids(i)))
    scala.util.Sorting.stableSort(out,
      (a: (Double, Long), b: (Double, Long)) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }
}

/** Native per-group top-k: a `TypedImperativeAggregate` over a k-bounded
  * primitive heap — the extension-tier twin of
  * [[graft.functions.TopKAggregator]] without the Scala-`Aggregator`
  * costs (per-row encoder decode of the input struct, kryo buffer
  * serialization, udaf wrapper setup). `update` reads the score/id
  * fields straight off the `InternalRow`; partial buffers shuffle as a
  * compact n+(8+8)·n byte blob. Map-side combinable with ≤ k entries per
  * buffer at all times — on a 1000-executor cluster each partition
  * reduces to k rows before the shuffle, where `row_number().over(...)`
  * must shuffle every row.
  *
  * Output: `array<struct<score double, id bigint>>`, best-first under
  * the deterministic total order (score desc, id asc).
  */
case class TopKAggExpr(score: Expression, id: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_top_k"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = buf.mergeFrom(other)

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.n)
    bb.putInt(buf.n)
    var i = 0
    while (i < buf.n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKHeap(k)
    var i = 0
    while (i < n) { buf.insert(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAggExpr =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** `array<struct<score,id>>` of the group's top-k rows, best-first. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAggExpr(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
