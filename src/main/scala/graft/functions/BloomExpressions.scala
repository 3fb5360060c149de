package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** bloom_might_contain(key): membership probe against a pre-built
  * Bloom filter carried as a plan constant — the row-level semi-join
  * reduction primitive ([[graft.operators.BloomJoin]]).
  *
  * The filter bytes ride in the expression (broadcast with the task
  * binary, deserialized once per executor via codegen reference
  * object, NOT per row); the probe itself is a handful of hash
  * multiplies + bit tests, inside whole-stage codegen. No false
  * negatives by construction, so `fact.where(bloom_might_contain(key))
  * .join(dim)` is result-identical to the plain join — the false
  * positives the filter admits are removed by the join itself.
  *
  * Long keys only (the join-key shape of every gate fact table);
  * `BloomFilter.putLong/mightContainLong` is the exact hash pair
  * `DataFrameStatFunctions.bloomFilter` uses for integral columns, so
  * a filter built by Spark's public stat API probes correctly here.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an integral key, got ${t.catalogString}")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override protected def nullSafeEval(key: Any): Any =
    filter.mightContainLong(asLong(key))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, key => s"$ref.mightContainLong((long) $key)")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
