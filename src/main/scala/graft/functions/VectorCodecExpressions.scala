package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector storage codecs for the 100 TB embedding path:
  *
  *  - [[L2Normalize]]: unit-norm projection (the reference's corpus is
  *    stored L2-normalized — `backend/app.py:32` `normalize_embeddings=
  *    True` — which turns cosine distance into 1-dot);
  *  - [[QuantizeInt8]] / [[DequantizeInt8]]: symmetric per-vector int8
  *    quantization (scale = max|x| / 127), shrinking a float32 embedding
  *    column 4x. At 100 TB that is the difference between scanning 25 TB
  *    and 100 TB per brute-force pass; recall loss is bounded by the
  *    max quantization error scale/2 per component (tested).
  *
  * Quantized layout: struct(scale float, q binary) — binary length =
  * dimension, one signed byte per component, parquet-friendly.
  */
case class L2Normalize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "l2_normalize"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = VectorExprUtil.elemAt(child, arr, i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = VectorExprUtil.elemAt(child, arr, i)
      out(i) = if (norm == 0.0) 0.0f else (x / norm).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** quantize_int8(v) -> struct(scale: float, q: binary). */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "quantize_int8"
  override def dataType: DataType = new StructType()
    .add("scale", FloatType, nullable = false)
    .add("q", BinaryType, nullable = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(VectorExprUtil.elemAt(child, arr, i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = if (maxAbs == 0.0) 1.0f else (maxAbs / 127.0).toFloat
    val bytes = new Array[Byte](n)
    i = 0
    while (i < n) {
      // floor(x + 0.5), NOT Math.round: since Java 7 Math.round special-
      // cases the 0.49999999999999994 edge (returns 0 where floor(x+0.5)
      // crosses to 1), and the v10 oracle states floor(x/scale + 0.5) —
      // both engines must state the identical expression
      val q = math.floor(VectorExprUtil.elemAt(child, arr, i) / scale + 0.5).toLong
      bytes(i) = math.max(-127L, math.min(127L, q)).toByte
      i += 1
    }
    InternalRow(scale, bytes)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary_quantize(v) -> array<long>: the 1-bit sign quantization used by
  * binary-quantized vector search (public: Lucene/Elasticsearch BBQ
  * lineage, Jacobs et al.). Element i sets bit (i % 64) of word (i / 64)
  * iff v[i] >= 0 — 32x smaller than float32, and Hamming distance on the
  * packed words (XOR + popcount) approximates angular distance well
  * enough to nominate candidates for exact re-ranking
  * ([[graft.operators.Knn.topKBinaryRefine]]). CodegenFallback like the
  * int8 codec beside it: the kernel is a short branch-free loop, and the
  * fallback keeps the whole codec family in one posture.
  */
case class BinaryQuantize(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "binary_quantize"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val words = new Array[Long]((n + 63) / 64)
    var i = 0
    while (i < n) {
      if (VectorExprUtil.elemAt(child, arr, i) >= 0.0) {
        words(i / 64) |= 1L << (i % 64)
      }
      i += 1
    }
    new GenericArrayData(words)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hamming_distance(a, b) -> int over packed sign words (XOR+popcount). */
case class HammingDistance(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with CodegenFallback {
  override def prettyName: String = "hamming_distance"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<bigint> sign-word vectors, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    require(x.numElements() == y.numElements(),
      s"sign-word length mismatch: ${x.numElements()} vs ${y.numElements()}")
    var d = 0
    var i = 0
    while (i < x.numElements()) {
      d += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i))
      i += 1
    }
    d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** dequantize_int8(struct(scale, q)) -> array<float>. */
case class DequantizeInt8(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "dequantize_int8"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 2 &&
      s(0).dataType == FloatType && s(1).dataType == BinaryType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects struct<scale:float,q:binary>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val scale = row.getFloat(0)
    val bytes = row.getBinary(1)
    val out = new Array[Any](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) * scale; i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
