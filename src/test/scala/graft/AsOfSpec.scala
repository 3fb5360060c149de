package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

class AsOfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("joinPrior: at-or-before value per key, ties right-first, null when none") {
    import spark.implicits._
    val purchases = Seq(
      (10L, ts("2024-01-01 01:00:00"), 1L, 100.0),  // after clicks a,b -> b
      (11L, ts("2024-01-01 00:30:00"), 1L, 100.0),  // after click a only
      (12L, ts("2024-01-01 00:10:00"), 1L, 100.0),  // exact tie with click a -> a
      (13L, ts("2024-01-01 00:05:00"), 1L, 100.0),  // before any click -> null
      (14L, ts("2024-01-01 02:00:00"), 2L, 100.0))  // other user, no clicks -> null
      .toDF("event_id", "ts", "user_id", "value")
    val clicks = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, 1.5),     // click a
      (2L, ts("2024-01-01 00:45:00"), 1L, 2.5))     // click b
      .toDF("event_id", "ts", "user_id", "value")

    val got = AsOf.joinPrior(purchases, clicks, "user_id", "ts", "event_id",
      "value", "prior_click")
      .select(col("event_id"), col("prior_click"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      10L -> Some(2.5), 11L -> Some(1.5), 12L -> Some(1.5),
      13L -> None, 14L -> None))
  }

  test("joinPrior output keeps all left rows exactly once") {
    import SparkTestSession.sfDir
    val ev = Tables.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val joined = AsOf.joinPrior(purchases, ev.filter(col("event_type") === "click"),
      "user_id", "ts", "event_id", "value", "v")
    assert(joined.count() === purchases.count())
    assert(joined.select("event_id").distinct().count() === purchases.count())
  }
}
