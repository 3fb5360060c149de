package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** One kept entry: the ordering key row and the payload row. */
final class TopKEntry(val ord: InternalRow, val payload: InternalRow)

/** Bounded top-k per group state: a max-heap of size <= k under the ord
  * ordering, so the head is the WORST kept entry (the eviction
  * candidate).
  */
final class TopKBuffer(val heap: mutable.PriorityQueue[TopKEntry])

/** topk_by(ord, payload, k): keep the k SMALLEST rows by the `ord`
  * struct (lexicographic, ascending — encode a descending field by
  * negating it), returning their payloads in rank order.
  *
  * The scale story: the ROW_NUMBER()-over-window formulation of
  * "top k per group" ships EVERY row through the exchange and sorts
  * each group, even though all but k rows per group are discarded.
  * This aggregate partial-combines map-side with a bounded k-entry
  * heap per (group, partition): the exchange carries at most
  * groups x partitions x k rows regardless of input size — on a
  * 100 TB fact table with a handful of groups that is the difference
  * between shuffling the table and shuffling kilobytes. (Spark's own
  * planner does this rewrite for LIMIT without PARTITION BY —
  * TakeOrderedAndProject — but has no per-group analogue; this is
  * that operator as an aggregate.)
  *
  * O(n log k) updates; ties under `ord` are impossible when the caller
  * includes a unique column (the gate query orders by
  * (-price, orderkey)), which also makes the result deterministic.
  */
case class TopKBy(ordChild: Expression, payloadChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k >= 1, s"topk_by: k must be >= 1, got $k")

  override def left: Expression = ordChild
  override def right: Expression = payloadChild
  override def prettyName: String = "topk_by"
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(payloadChild.dataType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (ordChild.dataType, payloadChild.dataType) match {
      case (_: StructType, _: StructType) => TypeCheckResult.TypeCheckSuccess
      case (o, p) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects struct ord and payload, got " +
          s"${o.catalogString} / ${p.catalogString}")
    }

  @transient private lazy val ordType = ordChild.dataType.asInstanceOf[StructType]
  @transient private lazy val payloadType = payloadChild.dataType.asInstanceOf[StructType]
  @transient private lazy val rowOrd: Ordering[InternalRow] = {
    val anyOrd = TypeUtils.getInterpretedOrdering(ordType)
    (a: InternalRow, b: InternalRow) => anyOrd.compare(a, b)
  }
  // max-heap on ord: head = largest = worst of the kept k-smallest
  @transient private lazy val heapOrd: Ordering[TopKEntry] =
    (a: TopKEntry, b: TopKEntry) => rowOrd.compare(a.ord, b.ord)
  @transient private lazy val ordProj = UnsafeProjection.create(ordType)
  @transient private lazy val payloadProj = UnsafeProjection.create(payloadType)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(mutable.PriorityQueue.empty(heapOrd))

  private def offer(b: TopKBuffer, ord: InternalRow, payload: InternalRow,
                    copied: Boolean): Unit = {
    val h = b.heap
    if (h.size < k) {
      h.enqueue(if (copied) new TopKEntry(ord, payload)
        else new TopKEntry(ord.copy(), payload.copy()))
    } else if (rowOrd.compare(ord, h.head.ord) < 0) {
      h.dequeue()
      h.enqueue(if (copied) new TopKEntry(ord, payload)
        else new TopKEntry(ord.copy(), payload.copy()))
    }
  }

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordChild.eval(input)
    val p = payloadChild.eval(input)
    if (o != null && p != null) {
      offer(b, o.asInstanceOf[InternalRow], p.asInstanceOf[InternalRow],
        copied = false)
    }
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    o.heap.foreach(e => offer(b, e.ord, e.payload, copied = true))
    b
  }

  override def eval(b: TopKBuffer): Any = {
    val sorted = b.heap.toArray.sortBy[InternalRow](_.ord)(rowOrd)
    new GenericArrayData(sorted.map(_.payload.asInstanceOf[Any]))
  }

  private def writeRow(out: DataOutputStream, proj: UnsafeProjection,
                       row: InternalRow): Unit = {
    val bytes = proj(row).getBytes
    out.writeInt(bytes.length)
    out.write(bytes)
  }

  private def readRow(in: DataInputStream, nFields: Int): UnsafeRow = {
    val len = in.readInt()
    val bytes = new Array[Byte](len)
    in.readFully(bytes)
    val row = new UnsafeRow(nFields)
    row.pointTo(bytes, len)
    row
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.heap.size)
    b.heap.foreach { e =>
      writeRow(out, ordProj, e.ord)
      writeRow(out, payloadProj, e.payload)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val ord = readRow(in, ordType.length)
      val payload = readRow(in, payloadType.length)
      buf.heap.enqueue(new TopKEntry(ord, payload))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKBy =
    copy(ordChild = l, payloadChild = r)
}
