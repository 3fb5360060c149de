package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Markov, Rolling}

/** Markov.transitions + Rolling.rollingDistinctDaily on hand-built
  * journeys where every expected count is derivable by eye.
  */
class SequenceAnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("transitions: per-user consecutive pairs, exact ppm, tie-broken by id") {
    import spark.implicits._
    // user 1: view -> click -> view   user 2: view -> view
    // equal timestamps for user 2 pin the event_id tie-break
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "view"),
      (2L, ts("2024-01-01 00:01:00"), 1L, "click"),
      (3L, ts("2024-01-01 00:02:00"), 1L, "view"),
      (4L, ts("2024-01-01 00:00:00"), 2L, "view"),
      (5L, ts("2024-01-01 00:00:00"), 2L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = Markov.transitions(ev, col("user_id"), col("event_type"),
      col("ts"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // from view: 2 transitions (view->click, view->view) -> 500000 ppm each
    assert(got === Map(
      ("view", "click") -> ((1L, 500000L)),
      ("view", "view") -> ((1L, 500000L)),
      ("click", "view") -> ((1L, 1000000L))))
  }

  test("rollingDistinctDaily: window union vs same-day counts; w=1 degenerates to dau1") {
    import spark.implicits._
    // u1 active day1+day3 (counted ONCE in day3's trailing window),
    // u2 active day1 only, u3 active day3 only
    val ev = Seq(
      (1L, ts("2024-03-01 10:00:00"), 1L),
      (2L, ts("2024-03-01 11:00:00"), 1L), // same day dup collapses
      (3L, ts("2024-03-01 12:00:00"), 2L),
      (4L, ts("2024-03-03 09:00:00"), 1L),
      (5L, ts("2024-03-03 10:00:00"), 3L))
      .toDF("event_id", "ts", "user_id")
    val got = Rolling.rollingDistinctDaily(ev, col("ts"), col("user_id"), 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val day1 = ts("2024-03-01 00:00:00").getTime * 1000L
    val day3 = ts("2024-03-03 00:00:00").getTime * 1000L
    // day1: dau1=2, trailing7=2; day3: dau1=2, trailing7=3 (u1 once)
    assert(got === Map(day1 -> ((2L, 2L)), day3 -> ((2L, 3L))))

    val w1 = Rolling.rollingDistinctDaily(ev, col("ts"), col("user_id"), 1)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(w1.forall { case (a, b) => a == b })
  }

  test("ewmaScaled: depth-2 weights by hand; NULL until full history; per-key isolation") {
    import spark.implicits._
    // user 1: values 10, 20, 30 -> ewma2(t2) = 10*1 + 20*2 = 50,
    // ewma2(t3) = 20*1 + 30*2 = 80; t1 warms up (NULL).
    // user 2: single event -> always NULL at depth 2.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, 10L),
      (2L, ts("2024-01-01 00:01:00"), 1L, 20L),
      (3L, ts("2024-01-01 00:02:00"), 1L, 30L),
      (4L, ts("2024-01-01 00:00:00"), 2L, 99L))
      .toDF("event_id", "ts", "user_id", "vq")
    val got = Rolling.ewmaScaled(ev, col("user_id"), col("ts"),
        col("event_id"), col("vq"), depth = 2)
      .collect().map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got === Map(1L -> None, 2L -> Some(50L), 3L -> Some(80L),
      4L -> None))
  }
}
