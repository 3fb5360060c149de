package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Mutable per-group state for [[VectorCentroid]]: element-wise sums of the
  * input vectors as DECIMAL(18,9) unscaled longs, plus the row count.
  * `sums` is null until the first non-null vector fixes the dimension.
  */
final class CentroidBuffer(var count: Long, var sums: Array[Long])

/** vector_centroid(emb): per-group element-wise mean of a float/double
  * vector column, array<float|double> -> array<double>.
  *
  * Replaces the posexplode + per-component aggregate formulation of v5
  * (`queries/Vectors.scala`), whose shuffle carries rows x dim rows — at
  * 1024-dim production scale that is a 1000x row amplification. This
  * aggregate keeps one fixed-width buffer per group: partial aggregation
  * (map-side combine) ships dim+1 longs per (group, partition), and the
  * shuffle is groups x partitions regardless of dim.
  *
  * Exactness contract (the reason this is not a plain SUM of doubles):
  * each element is routed through DECIMAL(18,9) exactly as Spark's
  * `cast(v as decimal(18,9))` does — `BigDecimal.valueOf(v).setScale(9,
  * HALF_UP)` — and summed as unscaled longs (exact, associative, so the
  * result is partial-agg- and order-insensitive). The final value is
  * decimal-sum -> double -> / count, the same float path as the DuckDB
  * oracle's `CAST(SUM(CAST(x AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*)`.
  * A value — or a per-group running SUM — whose scaled magnitude exceeds
  * Long range throws (ArithmeticException, via longValueExact/addExact)
  * rather than silently degrading — embeddings are unit-scale, so the
  * bound (~9.2e9 unit-scale rows per group) is never approached in
  * practice, but a group that does cross it fails loudly.
  */
case class VectorCentroid(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CentroidBuffer] with UnaryLike[Expression] {

  override def prettyName: String = "vector_centroid"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  @transient private lazy val isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  private def scaled(v: Double): Long =
    JBigDecimal.valueOf(v).setScale(9, RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  override def createAggregationBuffer(): CentroidBuffer = new CentroidBuffer(0L, null)

  override def update(b: CentroidBuffer, input: InternalRow): CentroidBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Long](n)
      require(b.sums.length == n,
        s"$prettyName: vector dimension mismatch: ${b.sums.length} vs $n")
      var i = 0
      while (i < n) {
        // addExact: sum overflow throws like the per-value longValueExact
        // path, honoring the "throws rather than silently degrading"
        // contract for billion-row groups
        b.sums(i) = Math.addExact(b.sums(i),
          scaled(if (isDouble) arr.getDouble(i) else arr.getFloat(i).toDouble))
        i += 1
      }
      b.count += 1
    }
    b
  }

  override def merge(b: CentroidBuffer, o: CentroidBuffer): CentroidBuffer = {
    if (o.sums != null) {
      if (b.sums == null) { b.sums = o.sums; b.count = o.count }
      else {
        require(b.sums.length == o.sums.length,
          s"$prettyName: vector dimension mismatch: ${b.sums.length} vs ${o.sums.length}")
        var i = 0
        while (i < b.sums.length) {
          b.sums(i) = Math.addExact(b.sums(i), o.sums(i)); i += 1
        }
        b.count += o.count
      }
    }
    b
  }

  override def eval(b: CentroidBuffer): Any = {
    if (b.count == 0L) return null
    val out = new Array[Double](b.sums.length)
    var i = 0
    while (i < out.length) {
      out(i) = new JBigDecimal(BigInteger.valueOf(b.sums(i)), 9).doubleValue() / b.count
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: CentroidBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(b.count)
    val n = if (b.sums == null) -1 else b.sums.length
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeLong(b.sums(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): CentroidBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val count = in.readLong()
    val n = in.readInt()
    val sums = if (n < 0) null else {
      val a = new Array[Long](n)
      var i = 0
      while (i < n) { a(i) = in.readLong(); i += 1 }
      a
    }
    new CentroidBuffer(count, sums)
  }

  override def withNewMutableAggBufferOffset(offset: Int): VectorCentroid =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): VectorCentroid =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): VectorCentroid =
    copy(child = c)
}
