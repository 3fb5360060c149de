package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("bucketed equals the naive theta join, inclusive bounds, any width") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 10L), (3L, 17L), (4L, 30L), (5L, -3L))
      .toDF("pid", "v")
    val intervals = Seq((10L, 5L, 10L), (11L, 9L, 20L), (12L, -5L, -1L),
      (13L, 40L, 50L)).toDF("iid", "lo", "hi")
    val expected = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // widths below, at, and above the typical span — bucketing must be
    // invisible to the result; width 7 exercises negative-domain floor
    // division (a truncating div would misbucket v = -3)
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"width $w duplicated pairs")
      assert(got.toSet === expected, s"width $w")
    }
    assert(expected.contains((5L, 12L))) // the negative-domain pair is real
  }

  test("bucketed equals the naive join on seeded random inputs (property)") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      // mixed-sign domain, spans from empty-ish to many-bucket
      val points = Seq.tabulate(60)(i => (i.toLong, rng.between(-500L, 500L)))
        .toDF("pid", "v")
      val intervals = Seq.tabulate(25) { i =>
        val lo = rng.between(-500L, 480L)
        (1000L + i, lo, lo + rng.between(0L, 120L))
      }.toDF("iid", "lo", "hi")
      val expected = points.crossJoin(intervals)
        .filter(col("v") >= col("lo") && col("v") <= col("hi"))
        .select("pid", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = rng.between(1L, 200L)
      val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"trial $trial width $w duplicated pairs")
      assert(got.toSet === expected, s"trial $trial width $w")
    }
  }

  test("exact bucketing above 2^53 (unix-nanos magnitudes)") {
    import spark.implicits._
    // at ~1.7e18 a double-valued division misbuckets (spacing 256 at
    // that magnitude); the integral `div` must keep point and interval
    // bounds in agreeing buckets for every width
    val base = 1700000000000000000L
    val points = Seq.tabulate(20)(i => (i.toLong, base + i * 7L - 3L)).toDF("pid", "v")
    val intervals = Seq.tabulate(10) { i =>
      val lo = base + i * 13L - 5L
      (1000L + i, lo, lo + 11L)
    }.toDF("iid", "lo", "hi")
    val expected = points.crossJoin(intervals)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    for (w <- Seq(3L, 5L, 64L, 1000L)) {
      val got = RangeJoin.bucketed(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"width $w duplicated pairs")
      assert(got.toSet === expected, s"width $w")
    }
  }

  test("expansion guard refuses loudly, naming the wider bucket") {
    import spark.implicits._
    val points = Seq((1L, 5L)).toDF("pid", "v")
    val intervals = Seq((10L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bucketed(points, intervals, "v", "lo", "hi",
        bucketWidth = 1L, maxExpandedRows = 100L)
    }
    assert(e.getMessage.contains("bucketWidth"))
    // same inputs at a sane width sail through
    assert(RangeJoin.bucketed(points, intervals, "v", "lo", "hi",
      bucketWidth = 1000000L).count() === 1L)
  }

  test("shared column names are rejected") {
    import spark.implicits._
    val a = Seq((1L, 2L)).toDF("v", "x")
    val b = Seq((1L, 2L, 3L)).toDF("x", "lo", "hi")
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bucketed(a, b, "v", "lo", "hi", 10L)
    }
    assert(e.getMessage.contains("x"))
  }

  test("e10 plans as an equi-join on the bucket, never a nested loop") {
    val plan = SparkEntry.queries("e10_range_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"e10 fell back to a nested loop:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"e10 fell back to a cartesian product:\n$plan")
    assert(plan.contains("__bucket"), s"e10 lost the bucket equi-key:\n$plan")
  }
}
