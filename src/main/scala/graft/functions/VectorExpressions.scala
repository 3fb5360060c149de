package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for dense-vector math over
  * `ArrayType(FloatType|DoubleType)` columns. These replace pgvector's
  * distance operators (reference: `backend/models.py:189` — `<=>` cosine
  * distance; `backend/load_data.py:78` — `vector(1024)` column).
  *
  * All expressions participate in whole-stage codegen (`doGenCode` emits a
  * tight primitive loop over `ArrayData` — no boxing, no UDF serialization),
  * which is what makes brute-force kNN over 100 TB of embeddings viable:
  * the scan stays in one codegen stage: parquet batch -> loop -> top-k heap.
  *
  * Semantics match pgvector: cosine_distance = 1 - dot/(|a|*|b|); zero
  * vectors yield NaN (0/0); dimension mismatch raises. Null input (either
  * side) yields null. Array elements are assumed non-null (parquet vectors).
  */
private[graft] object VectorExprUtil {
  def checkVectorTypes(exprs: Seq[Expression], name: String): TypeCheckResult = {
    val ok = exprs.forall(_.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float> or array<double> arguments, got " +
        exprs.map(_.dataType.simpleString).mkString(", "))
  }

  /** Java source fragment reading element i of `arr` as double. */
  def readElem(e: Expression, arr: String, i: String): String =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => s"$arr.getDouble($i)"
      case _          => s"(double) $arr.getFloat($i)"
    }

  def elemAt(e: Expression, arr: ArrayData, i: Int): Double =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case DoubleType => arr.getDouble(i)
      case _          => arr.getFloat(i).toDouble
    }

  def requireSameDim(n: Int, m: Int): Unit =
    if (n != m) throw new IllegalArgumentException(
      s"vector dimension mismatch: $n vs $m")
}

/** Shared shape for pairwise vector reductions (dot / cosine / l2). */
abstract class VectorPairReduction extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(left, right), prettyName)

  /** (dot, normLeftSq, normRightSq) -> result */
  protected def finish(dot: Double, nx: Double, ny: Double): Double
  /** Java expression computing the result from dot/nx/ny variables. */
  protected def finishCode(dot: String, nx: String, ny: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    VectorExprUtil.requireSameDim(n, y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = VectorExprUtil.elemAt(left, x, i)
      val yi = VectorExprUtil.elemAt(right, y, i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    finish(dot, nx, ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |graft.functions.VectorExprUtil.requireSameDim($n, $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = ${VectorExprUtil.readElem(left, x, i)};
         |  final double $yi = ${VectorExprUtil.readElem(right, y, i)};
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ${finishCode(dot, nx, ny)};
         |""".stripMargin
    })
}

/** pgvector `<=>`: 1 - cos(a,b). Zero vector -> NaN (matches 0/0). */
case class CosineDistance(left: Expression, right: Expression)
    extends VectorPairReduction {
  override def prettyName: String = "cosine_distance"
  protected def finish(dot: Double, nx: Double, ny: Double): Double =
    1.0 - dot / (math.sqrt(nx) * math.sqrt(ny))
  protected def finishCode(dot: String, nx: String, ny: String): String =
    s"1.0 - $dot / (Math.sqrt($nx) * Math.sqrt($ny))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pgvector `<#>` is -dot; we expose plain dot product. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorPairReduction {
  override def prettyName: String = "dot_product"
  protected def finish(dot: Double, nx: Double, ny: Double): Double = dot
  protected def finishCode(dot: String, nx: String, ny: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** pgvector `<->`: euclidean distance. */
case class L2Distance(left: Expression, right: Expression)
    extends VectorPairReduction {
  override def prettyName: String = "l2_distance"
  protected def finish(dot: Double, nx: Double, ny: Double): Double =
    math.sqrt(nx - 2.0 * dot + ny)
  protected def finishCode(dot: String, nx: String, ny: String): String =
    s"Math.sqrt($nx - 2.0 * $dot + $ny)"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** |a|_2 — L2 norm of one vector. */
case class L2Norm(child: Expression) extends UnaryExpression {
  override def prettyName: String = "l2_norm"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprUtil.checkVectorTypes(Seq(child), prettyName)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val xi = VectorExprUtil.elemAt(child, x, i)
      s += xi * xi
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val xi = ctx.freshName("xi")
      s"""
         |final int $n = $x.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xi = ${VectorExprUtil.readElem(child, x, i)};
         |  $s += $xi * $xi;
         |}
         |${ev.value} = Math.sqrt($s);
         |""".stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
