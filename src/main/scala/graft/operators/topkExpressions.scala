package graft.operators

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.collection.mutable

/**
 * `topk_structs(struct, k)` — the k MINIMAL structs of a group under the
 * struct type's field-by-field total order, as a bounded
 * `TypedImperativeAggregate` (same family as the sketch aggregates, and
 * the same scale contract: each task's partial buffer forwards at most k
 * elements per group into the exchange, so per-group top-k never shuffles
 * or sorts whole groups the way `row_number() OVER (...) <= k` does).
 *
 * Callers encode the ranking in the struct's field order — descending
 * keys negated, a unique id last for deterministic ties (see
 * [[TopK.topKStructs]]). Output is UNSORTED (heap order); wrap in
 * `sort_array` for the ranked sequence.
 *
 * Buffer: a k-bounded max-heap of copied rows — the heap head is the
 * eviction candidate, so update is O(log k) and memory is k rows
 * regardless of group size. Serialization is length-framed UnsafeRow
 * bytes.
 */
case class TopKStructsAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
  with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StructType if k > 0 => TypeCheckResult.TypeCheckSuccess
    case _: StructType => TypeCheckResult.TypeCheckFailure(s"k must be positive, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"topk_structs needs a struct input, got ${other.catalogString}")
  }

  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]
  @transient private lazy val ord: Ordering[InternalRow] =
    org.apache.spark.sql.graft.GraftSqlBridge.orderingFor(child.dataType)
      .asInstanceOf[Ordering[InternalRow]]
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ord) // max-heap: head = largest kept

  private def insert(buf: mutable.PriorityQueue[InternalRow], row: InternalRow,
      copy: Boolean): Unit = {
    if (buf.size < k) {
      buf.enqueue(if (copy) row.copy() else row)
    } else if (ord.lt(row, buf.head)) {
      buf.dequeue()
      buf.enqueue(if (copy) row.copy() else row)
    }
  }

  override def update(buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    // Rows handed to eval are reused by the caller — copy on admission only.
    if (v != null) insert(buf, v.asInstanceOf[InternalRow], copy = true)
    buf
  }

  override def merge(buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(r => insert(buf, r, copy = false)) // already-owned copies
    buf
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val rows = buf.toArray.map(r => proj(r).copy().getBytes)
    val out = ByteBuffer.allocate(4 + rows.map(_.length + 4).sum)
    out.putInt(rows.length)
    rows.foreach { b => out.putInt(b.length); out.put(b) }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = ByteBuffer.wrap(bytes)
    val buf = createAggregationBuffer()
    val n = in.getInt
    var i = 0
    while (i < n) {
      val len = in.getInt
      val b = new Array[Byte](len)
      in.get(b)
      val row = new UnsafeRow(structType.size)
      row.pointTo(b, len)
      insert(buf, row, copy = false)
      i += 1
    }
    buf
  }

  override def prettyName: String = "topk_structs"
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStructsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
