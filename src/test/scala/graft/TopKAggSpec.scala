package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.topk_by

class TopKAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("topk_by equals the row_number window formulation on orders") {
    val o = Tables.orders(spark, sfDir)
    val got = o.groupBy(col("o_orderpriority"))
      .agg(topk_by(
        struct((-col("o_totalprice")).as("np"), col("o_orderkey")),
        struct(col("o_orderkey"), col("o_totalprice")), 5).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")).as(Seq("rnk", "r")))
      .select(col("o_orderpriority"), col("rnk"), col("r.o_orderkey"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), (col("rn") - 1).as("rnk"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("topk_by: groups smaller than k return all rows in order") {
    import spark.implicits._
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("b", 3L, 2.0))
      .toDF("g", "id", "v").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(topk_by(struct(col("v"), col("id")), struct(col("id")), 5).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rnk", "r")))
      .select(col("g"), col("rnk"), col("r.id"))
      .orderBy(col("g"), col("rnk"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // ascending by v: a -> id2 (v=1) then id1 (v=3); b -> id3
    assert(got === Array(("a", 0, 2L), ("a", 1, 1L), ("b", 0, 3L)))
  }

  test("topk_by is partition-count invariant (merge path exercised)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1L to 2000L).map(i => ("g" + (i % 7), i, rnd.nextDouble()))
    def run(parts: Int) = rows.toDF("g", "id", "v").repartition(parts)
      .groupBy(col("g"))
      .agg(topk_by(struct(col("v"), col("id")), struct(col("id")), 4).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("rnk", "r")))
      .select(col("g"), col("rnk"), col("r.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(run(1) === run(13))
  }
}
