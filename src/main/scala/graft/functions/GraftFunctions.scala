package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-API and SQL-registry surface for graft's native expressions —
  * the Spark analogue of the reference's `CREATE EXTENSION postgis/vector`
  * (`backend/load_data.py:67-68`): one call registers every function in the
  * session's FunctionRegistry so both the fluent API and `spark.sql` can
  * use them.
  */
object GraftFunctions {

  private[graft] def toCol(e: Expression): Column = GraftColumnBridge.column(e)
  private[graft] def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)

  // --- vector --------------------------------------------------------------
  def cosine_distance(a: Column, b: Column): Column = toCol(CosineDistance(toExpr(a), toExpr(b)))
  def dot_product(a: Column, b: Column): Column = toCol(DotProduct(toExpr(a), toExpr(b)))
  def l2_distance(a: Column, b: Column): Column = toCol(L2Distance(toExpr(a), toExpr(b)))
  def l2_norm(a: Column): Column = toCol(L2Norm(toExpr(a)))

  /** A float-array literal (probe vectors etc.). */
  def vector_lit(xs: Array[Float]): Column =
    org.apache.spark.sql.functions.typedLit(xs)

  private val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_distance" -> { es => CosineDistance(es(0), es(1)) },
    "dot_product"     -> { es => DotProduct(es(0), es(1)) },
    "l2_distance"     -> { es => L2Distance(es(0), es(1)) },
    "l2_norm"         -> { es => L2Norm(es(0)) },
  )

  /** Register every graft function for SQL use in this session. Idempotent. */
  def register(spark: SparkSession): Unit = synchronized {
    val fr = spark.sessionState.functionRegistry
    registry.foreach { case (name, builder) =>
      fr.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
