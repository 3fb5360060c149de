package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mutable Misra–Gries summary: at most `k` tracked items with their
  * decremented counters. A plain HashMap — the capacity bound is enforced
  * by the update/merge rules, not the container.
  */
final class MgBuffer(val counts: mutable.HashMap[String, Long],
                     var n: Long, var evicted: Boolean)

/** misra_gries(item, k): the Misra–Gries frequent-items sketch (Misra &
  * Gries 1982) as a Spark aggregate, string -> array<struct<item,lb>>.
  *
  * The reference exposes no frequency sketch — this is part of the
  * LLM-pipeline surface (corpus token statistics at 100 TB). The
  * exact formulation (`groupBy(token).count`) shuffles one row per
  * DISTINCT token; on web-scale text the token vocabulary is effectively
  * unbounded (typos, ids, urls), so the exact pass is the thing that
  * falls over first. This aggregate keeps a fixed k-entry buffer per
  * partition, partial-agg combines map-side, and ships k (item, counter)
  * pairs per partition TOTAL — the shuffle volume is `partitions x k`,
  * independent of corpus size or vocabulary.
  *
  * Guarantees (the mergeable-summaries results, Agarwal et al. 2012,
  * all public):
  *  - every item with true count > N/(k+1) is present in the summary
  *    (so the summary is a SUPERSET of the heavy hitters at that
  *    threshold), and this survives arbitrary merges;
  *  - each reported counter is a LOWER bound on the item's true count,
  *    undercounting by at most N/(k+1).
  *
  * The counters are therefore candidates + bounds, not exact counts —
  * [[graft.operators.HeavyHitters]] composes this with an exact recount
  * of just the candidate set to return exact top-k (the standard
  * two-pass shape).
  *
  * update: counted if tracked; inserted if room; otherwise ALL counters
  * decrement by 1 (zeros evicted) — the classic rule. Amortized O(1):
  * every decremented unit was once an increment.
  * merge: counter-wise sum, then if over capacity subtract the (k+1)-th
  * largest value from every counter and evict non-positives — the
  * Agarwal et al. merge that preserves both bounds above.
  * eval: entries ordered by (counter desc, item asc) — deterministic
  * regardless of partitioning, since the merged multiset of counters is
  * associative-commutative over partitions only in the degenerate
  * no-eviction regime; in the evicting regime callers use the SET of
  * items (the superset guarantee), not the order. The gate query runs
  * the recount pass on the item set, so its result is partition-stable
  * either way.
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(k >= 1, s"misra_gries: k must be >= 1, got $k")

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  // self-describing summary: the entries, whether any eviction/truncation
  // ever fired (if false the counters are EXACT and the items are the
  // full vocabulary), and the total item count N the bounds are over
  override def dataType: DataType = StructType(Seq(
    StructField("items", ArrayType(
      StructType(Seq(
        StructField("item", StringType, nullable = false),
        StructField("lb", LongType, nullable = false))),
      containsNull = false), nullable = false),
    StructField("evicted", BooleanType, nullable = false),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): MgBuffer =
    new MgBuffer(mutable.HashMap.empty, 0L, false)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      b.n += 1L
      val m = b.counts
      m.get(item) match {
        case Some(c) => m.update(item, c + 1L)
        case None if m.size < k => m.update(item, 1L)
        case None =>
          // decrement-all; evict zeros. Iterate over a snapshot of keys
          // because the map mutates underneath.
          b.evicted = true
          val dead = mutable.ArrayBuffer.empty[String]
          m.foreach { case (key, c) =>
            if (c == 1L) dead += key else m.update(key, c - 1L)
          }
          dead.foreach(m.remove)
      }
    }
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    val m = b.counts
    b.n += o.n
    b.evicted ||= o.evicted
    o.counts.foreach { case (key, c) =>
      m.update(key, m.getOrElse(key, 0L) + c)
    }
    if (m.size > k) {
      // subtract the (k+1)-th largest counter from everything, evict <= 0
      b.evicted = true
      val sorted = m.values.toArray
      java.util.Arrays.sort(sorted)
      val cut = sorted(sorted.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      m.foreach { case (key, c) =>
        if (c - cut <= 0L) dead += key else m.update(key, c - cut)
      }
      dead.foreach(m.remove)
    }
    b
  }

  override def eval(b: MgBuffer): Any = {
    val entries = b.counts.toArray
      .sortBy { case (item, c) => (-c, item) }
      .map { case (item, c) =>
        InternalRow(UTF8String.fromString(item), c)
      }
    InternalRow(new GenericArrayData(entries.asInstanceOf[Array[Any]]),
      b.evicted, b.n)
  }

  override def serialize(b: MgBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.n)
    out.writeBoolean(b.evicted)
    out.writeInt(b.counts.size)
    b.counts.foreach { case (key, c) =>
      val bytes = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val total = in.readLong()
    val evicted = in.readBoolean()
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      m.update(new String(arr, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    new MgBuffer(m, total, evicted)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): MisraGries =
    copy(child = c)
}
