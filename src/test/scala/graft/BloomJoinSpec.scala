package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("reduceFact never drops a matching key (no false negatives)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val factKeys = Seq.fill(5000)(rnd.nextLong() % 1000)
    val dimKeys = (0L until 100L).map(_ * 7L - 300L)
    val fact = factKeys.toDF("fk").repartition(8)
    val dim = dimKeys.toDF("dk").repartition(4)
    val reduced = BloomJoin.reduceFact(fact, "fk", dim, "dk")
      .collect().map(_.getLong(0)).toSet
    val dimSet = dimKeys.toSet
    val matching = factKeys.filter(dimSet.contains).toSet
    assert(matching.subsetOf(reduced), "a matching fact key was filtered out")
  }

  test("join equals the plain join on the gate tables") {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val fact = Tables.lineitem(spark, sfDir)
    val got = BloomJoin.join(fact, "l_orderkey", dim, "o_orderkey")
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("the probe filter sits on the fact side of the plan") {
    val dim = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
    val fact = Tables.lineitem(spark, sfDir)
    val plan = BloomJoin.join(fact, "l_orderkey", dim, "o_orderkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected a bloom_might_contain filter in the plan:\n$plan")
  }

  test("empty dim yields an empty result without building a filter") {
    import spark.implicits._
    val fact = Seq(1L, 2L, 3L).toDF("fk")
    val dim = Seq.empty[Long].toDF("dk")
    assert(BloomJoin.join(fact, "fk", dim, "dk").count() === 0L)
  }
}
