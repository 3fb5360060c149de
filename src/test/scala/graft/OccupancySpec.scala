package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Occupancy

/** Occupancy.peakDaily on hand-built intervals: [start, end) sweep
  * semantics, tie-group levels, day attribution, partition invariance.
  */
class OccupancySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val Day = 86400000000L

  test("peak daily: overlap counting, back-to-back never double-counts, first-attain instant") {
    import spark.implicits._
    // day 0: A[100, 300) B[200, 400) C[300, 500) — A ends exactly when
    // C starts, so the level at t=300 is still 2 (B+C), and the peak 2
    // is FIRST attained at t=200 (A+B). day 1: one interval -> peak 1.
    val iv = Seq(
      (100L, 300L), (200L, 400L), (300L, 500L),
      (Day + 50L, Day + 60L))
      .toDF("s", "e")
    val got = Occupancy.peakDaily(iv, col("s"), col("e"), numPartitions = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 2L, 200L), (Day, 1L, Day + 50L)))
  }

  test("simultaneous opens share the peer-group level; partition count is irrelevant") {
    import spark.implicits._
    // three intervals opening at the same instant: level jumps 0 -> 3
    val iv = Seq((10L, 20L), (10L, 30L), (10L, 40L)).toDF("s", "e")
    for (n <- Seq(1, 2, 7)) {
      val got = Occupancy.peakDaily(iv, col("s"), col("e"), numPartitions = n)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === Set((0L, 3L, 10L)), s"numPartitions=$n")
    }
  }
}
