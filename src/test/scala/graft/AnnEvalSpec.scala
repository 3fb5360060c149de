package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AnnEval

class AnnEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("recallAtK: perfect, partial, and ZERO-overlap probes all report") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // probe 1
      (2L, 20L), (2L, 21L), (2L, 22L), // probe 2
      (3L, 30L), (3L, 31L), (3L, 32L)) // probe 3
      .toDF("probe_id", "corpus_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),  // perfect
      (2L, 20L), (2L, 99L), (2L, 98L),  // 1 of 3
      (3L, 97L), (3L, 96L), (3L, 95L))  // zero overlap — must still appear
      .toDF("probe_id", "corpus_id")
    val got = AnnEval.recallAtK(exact, approx, k = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      1L -> (3L, 1.0), 2L -> (1L, 1.0 / 3), 3L -> (0L, 0.0)))
  }

  test("recallAtK refuses k < 1; approx-only probes never inflate the report") {
    val df = Seq((1L, 10L)).toDF("probe_id", "corpus_id")
    intercept[IllegalArgumentException] { AnnEval.recallAtK(df, df, 0) }
    // a probe present only in approx (evaluation universe = exact side)
    val approx = Seq((1L, 10L), (9L, 90L)).toDF("probe_id", "corpus_id")
    val got = AnnEval.recallAtK(df, approx, k = 1)
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L))
  }
}
