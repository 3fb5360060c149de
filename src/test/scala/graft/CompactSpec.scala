package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Compact

class CompactSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("latestByKey keeps the newest version, ties broken by the id column") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 100L, "a"), // key 1: versions at ts 100, 200, 200
      (1L, 11L, 200L, "b"),
      (1L, 12L, 200L, "c"), // tie on ts -> larger id wins
      (2L, 20L, 50L, "d")
    ).toDF("key", "id", "ts", "v").repartition(4)
    val got = Compact.latestByKey(log, Seq("key"), Seq("ts", "id"))
      .orderBy("key")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    assert(got === Array((1L, 12L, "c"), (2L, 20L, "d")))
  }

  test("latestByKey preserves the input schema and column order") {
    val ev = Tables.events(spark, sfDir)
    val out = Compact.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
    assert(out.schema.fieldNames.toSeq === ev.schema.fieldNames.toSeq)
  }

  test("latestByKey equals the row_number window formulation on events") {
    val ev = Tables.events(spark, sfDir)
    val got = Compact.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val want = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id").orderBy("user_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got === want)
  }
}
