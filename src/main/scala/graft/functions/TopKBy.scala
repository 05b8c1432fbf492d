package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Bounded top-k state: the k largest (ord, id) pairs, ordered by
  * (ord desc, id asc). A plain array insertion keeps the weakest
  * element last — k is small, so O(k) insert beats heap overhead. */
final class TopKBuffer(val k: Int) {
  var n: Int = 0
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)

  /** true if (ordA, idA) ranks strictly higher than (ordB, idB). */
  @inline private def beats(ordA: Double, idA: Long, ordB: Double, idB: Long): Boolean =
    ordA > ordB || (ordA == ordB && idA < idB)

  def insert(ord: Double, id: Long): Unit = {
    if (n < k) { ords(n) = ord; ids(n) = id; n += 1; siftUp(n - 1) }
    else if (beats(ord, id, ords(n - 1), ids(n - 1))) {
      ords(n - 1) = ord; ids(n - 1) = id; siftUp(n - 1)
    }
  }

  private def siftUp(from: Int): Unit = {
    var i = from
    while (i > 0 && beats(ords(i), ids(i), ords(i - 1), ids(i - 1))) {
      val to = ords(i - 1); ords(i - 1) = ords(i); ords(i) = to
      val ti = ids(i - 1); ids(i - 1) = ids(i); ids(i) = ti
      i -= 1
    }
  }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.ords(i), other.ids(i)); i += 1 }
  }
}

/** top_k_by(id, ord, k): the k `id`s with the largest `ord`, as an
  * array of (rk, id, ord) structs ordered by (ord desc, id asc).
  *
  * A custom TypedImperativeAggregate: partial aggregation keeps O(k)
  * state per group and merges map-side, so the query never shuffles
  * more than k rows per group — unlike the window row_number()
  * pattern, which shuffles and sorts EVERY row of every group. */
case class TopKBy(
    idExpr: Expression,
    ordExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(idExpr, ordExpr)
  // a clear analysis error instead of a runtime ClassCastException on
  // int/float/decimal id/ord columns (the Column helper below casts)
  override def checkInputDataTypes(): TypeCheckResult =
    if (idExpr.dataType == LongType && ordExpr.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by requires (BIGINT id, DOUBLE ord), got " +
        s"(${idExpr.dataType.simpleString}, ${ordExpr.dataType.simpleString})")
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rk", LongType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("ord", DoubleType, nullable = false))))
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    val ord = ordExpr.eval(input)
    if (id != null && ord != null)
      buf.insert(ord.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = (0 until buf.n).map { i =>
      InternalRow((i + 1).toLong, buf.ids(i), buf.ords(i))
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 16)
    bb.putInt(buf.k).putInt(buf.n)
    (0 until buf.n).foreach { i => bb.putDouble(buf.ords(i)); bb.putLong(buf.ids(i)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    (0 until n).foreach { _ =>
      val ord = bb.getDouble; val id = bb.getLong
      buf.insert(ord, id)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKBy =
    copy(idExpr = newChildren(0), ordExpr = newChildren(1))
}

object TopKBy {
  /** DataFrame-API entry: `df.groupBy(...).agg(top_k_by(id, ord, 3))`.
    * Casts up front so any numeric id/ord column works. */
  def top_k_by(id: Column, ord: Column, k: Int): Column =
    GraftBridge.column(
      TopKBy(GraftBridge.expression(id.cast("long")),
        GraftBridge.expression(ord.cast("double")), k)
        .toAggregateExpression())
}
