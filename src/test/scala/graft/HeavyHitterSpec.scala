package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.misra_gries
import graft.operators.HeavyHitters

class HeavyHitterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def itemsDf(items: Seq[String], parts: Int = 4) = {
    import spark.implicits._
    spark.createDataset(items).repartition(parts).toDF("item")
  }

  test("misra_gries: no-eviction regime returns exact counts") {
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c")
    val row = itemsDf(items)
      .agg(misra_gries(col("item"), 8).as("mg"))
      .selectExpr("explode(mg.items) as e", "mg.evicted as ev", "mg.n as n")
      .collect()
    val got = row.map(r => r.getStruct(0).getString(0) -> r.getStruct(0).getLong(1)).toMap
    assert(got === Map("a" -> 30L, "b" -> 20L, "c" -> 10L))
    assert(row.forall(!_.getBoolean(1)) && row.forall(_.getLong(2) == 60L))
  }

  test("misra_gries: evicting regime keeps the superset guarantee and lower bounds") {
    // skewed stream: two heavy items + a long tail of singletons
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(300)("hot2")
    val tail = (1 to 300).map(i => s"tail$i")
    val items = new scala.util.Random(42).shuffle(heavy ++ tail) // arbitrary order
    val n = items.length.toLong
    val k = 16
    val got = itemsDf(items, parts = 8)
      .agg(misra_gries(col("item"), k).as("mg"))
      .selectExpr("explode(mg.items) as e").select("e.item", "e.lb")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every item with count > N/(k+1) must be present
    val threshold = n.toDouble / (k + 1)
    assert(400 > threshold && 300 > threshold)
    assert(got.contains("hot1") && got.contains("hot2"))
    // counters are lower bounds, undercounting by at most N/(k+1)
    assert(got("hot1") <= 400L && got("hot1") >= 400L - threshold.toLong - 1)
    assert(got("hot2") <= 300L && got("hot2") >= 300L - threshold.toLong - 1)
    assert(got.size <= k)
  }

  test("topTokens: exact top-k on a skewed corpus, ties broken by token asc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x x y y y z z w"),
      (2L, "x x y y z q q q"),
      (3L, "X y w w q")).toDF("doc_id", "text")
    val got = HeavyHitters.topTokens(docs, "text", k = 3, sketchK = 16)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts: x=7 (incl lowercased X), y=6, q=4, z=3, w=3
    assert(got === Array(("x", 7L), ("y", 6L), ("q", 4L)))
  }

  test("topTokens: refuses when the corpus is too flat for the sketch size") {
    import spark.implicits._
    // 40 distinct singleton tokens, sketchK barely above k: the k-th
    // count (1) cannot clear N/(sketchK+1)
    val docs = (1 to 40).map(i => (i.toLong, s"tok$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      HeavyHitters.topTokens(docs, "text", k = 3, sketchK = 4)
    }
    assert(e.getMessage.contains("raise sketchK"))
  }

  test("topTokens matches the exact groupBy-count formulation on the gate corpus") {
    val docs = Tables.documents(spark, SparkTestSession.sfDir)
    val got = HeavyHitters.topTokens(docs, "text", k = 15, sketchK = 256)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = docs
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(15)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got === exact)
  }
}
