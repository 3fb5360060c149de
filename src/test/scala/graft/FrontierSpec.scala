package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrontierSpec extends AnyFunSuite {

  test("hand schedule: capacity rolls to the next cycle, delay spaces within it, priority ranks") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // one host, 10 candidates, two priority classes
    val df = (0 until 10).map(i => (i.toLong, 1L, if (i < 5) 1L else 2L))
      .toDF("url_id", "host_id", "priority")
      .withColumn("delay_s", lit(2L))
    val got = graft.operators.Frontier.schedule(df,
        host = col("host_id"), priority = col("priority"), tie = col("url_id"),
        delaySec = col("delay_s"), perCycle = 4, cycleLenSec = 60L)
      .orderBy("slot")
      .select("url_id", "slot", "fetch_offset_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // priority 2 (urls 5..9) ranks first, then priority 1 (0..4), ties by id
    assert(got.map(_._1).toSeq === Seq(5L, 6, 7, 8, 9, 0, 1, 2, 3, 4))
    // slots 0..3 in cycle 0 spaced by delay 2; 4..7 in cycle 1; 8..9 in cycle 2
    assert(got.map(_._3).toSeq === Seq(0L, 2, 4, 6, 60, 62, 64, 66, 120, 122))
  }

  test("hosts schedule independently: same slots on both, no cross-host interference") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = (0 until 6).map(i => (i.toLong, (i % 2).toLong, 0L))
      .toDF("url_id", "host_id", "priority")
      .withColumn("delay_s", lit(1L) + col("host_id"))
    val got = graft.operators.Frontier.schedule(df,
        host = col("host_id"), priority = col("priority"), tie = col("url_id"),
        delaySec = col("delay_s"), perCycle = 8, cycleLenSec = 60L)
      .select("host_id", "slot", "fetch_offset_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 0L, 0L), (0L, 1L, 1L), (0L, 2L, 2L),
      (1L, 0L, 0L), (1L, 1L, 2L), (1L, 2L, 4L)))
  }
}
