package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 10:$m%02d:00")

  test("hand-built journeys: order enforced, strict-after, missing stages") {
    val ev = Seq(
      // user 1: clean view -> click -> purchase
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)),
      // user 2: purchase BEFORE view — purchase must not count
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)),
      // user 3: click simultaneous with view — strict > rejects it
      (3L, "view", ts(5)), (3L, "click", ts(5)),
      // user 4: view only
      (4L, "view", ts(1)),
      // user 5: never views — excluded from the funnel entirely
      (5L, "click", ts(1)), (5L, "purchase", ts(2)),
      // user 6: t1 = :01 (first view), t2 = min click > :01 = :04,
      // t3 = min purchase > :04 = :05 -> reached 3; the second view
      // (:09) and the later click (:06) are irrelevant
      (6L, "view", ts(1)), (6L, "view", ts(9)),
      (6L, "click", ts(4)), (6L, "click", ts(6)), (6L, "purchase", ts(5)))
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.stages(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val got = out.map { case (u, r) => u -> r.getLong(1) }
    assert(got === Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 1L, 6L -> 3L))
    // user 6's stage times, exactly
    assert(out(6L).getLong(2) === ts(1).getTime * 1000)
    assert(out(6L).getLong(3) === ts(4).getTime * 1000)
    assert(out(6L).getLong(4) === ts(5).getTime * 1000)
  }

  test("refuses degenerate step lists; deterministic under repartition") {
    val ev = Seq((1L, "view", ts(1)), (1L, "click", ts(2)))
      .toDF("user_id", "event_type", "ts")
    intercept[IllegalArgumentException] {
      Funnel.stages(ev, "user_id", "event_type", "ts", Seq("view"))
    }
    intercept[IllegalArgumentException] {
      Funnel.stages(ev, "user_id", "event_type", "ts", Seq("view", "view"))
    }
    val big = (1L to 100L).flatMap(u => Seq(
      (u, "view", ts((u % 10).toInt)), (u, "click", ts((u % 10 + 1).toInt)),
      (u, "purchase", ts((u % 10 + 2).toInt))))
      .toDF("user_id", "event_type", "ts")
    val a = Funnel.stages(big, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect().map(_.toSeq).toSet
    val b = Funnel.stages(big.repartition(7), "user_id", "event_type", "ts",
      Seq("view", "click", "purchase")).collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
