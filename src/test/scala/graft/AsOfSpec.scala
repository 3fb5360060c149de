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

  test("joinNext: at-or-after value per key, exact ties included, null when none follows") {
    import spark.implicits._
    val clicks = Seq(
      (10L, ts("2024-01-01 00:05:00"), 1L, 0.0),  // before both purchases -> a
      (11L, ts("2024-01-01 00:10:00"), 1L, 0.0),  // exact tie with purchase a -> a
      (12L, ts("2024-01-01 00:30:00"), 1L, 0.0),  // between a and b -> b
      (13L, ts("2024-01-01 01:00:00"), 1L, 0.0),  // after the last purchase -> null
      (14L, ts("2024-01-01 00:00:00"), 2L, 0.0))  // other user, none -> null
      .toDF("event_id", "ts", "user_id", "value")
    val purchases = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1L, 10.0),  // purchase a
      (2L, ts("2024-01-01 00:45:00"), 1L, 20.0))  // purchase b
      .toDF("event_id", "ts", "user_id", "value")
    val got = AsOf.joinNext(clicks, purchases, "user_id", "ts", "event_id",
      "value", "next_purchase")
      .select(col("event_id"), col("next_purchase"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got === Map(
      10L -> Some(10.0), 11L -> Some(10.0), 12L -> Some(20.0),
      13L -> None, 14L -> None))
  }

  test("joinNext equals the naive join-filter-argmin formulation on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    def randTs() = ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00")
    val left = (1L to 300L).map(i => (i, randTs(), (i % 7) + 1, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    val right = (1000L to 1200L).map(i => (i, randTs(), (i % 7) + 1, rng.nextDouble()))
      .toDF("event_id", "ts", "user_id", "value")
    val got = AsOf.joinNext(left, right, "user_id", "ts", "event_id", "value", "v")
      .select(col("event_id"), col("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    val lrows = left.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val rrows = right.collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    val want = lrows.map { case (lid, lts, lu) =>
      val after = rrows.filter(r => r._3 == lu && !r._2.before(lts))
      lid -> (if (after.isEmpty) None
              else Some(after.minBy(r => (r._2.getTime, r._1))._4))
    }.toMap
    assert(got === want)
  }

  test("joinPrior equals the naive join-filter-argmax formulation on random data") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    def randTs() = ts(f"2024-01-01 ${rng.nextInt(24)}%02d:${rng.nextInt(60)}%02d:00")
    val left = (1L to 300L).map(i => (i, randTs(), (i % 7) + 1, 0.0)).toDF("event_id", "ts", "user_id", "value")
    val right = (1000L to 1200L).map(i => (i, randTs(), (i % 7) + 1, rng.nextDouble())).toDF("event_id", "ts", "user_id", "value")

    val got = AsOf.joinPrior(left, right, "user_id", "ts", "event_id", "value", "v")
      .select(col("event_id"), col("v"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    // naive reference: join all right rows at-or-before, keep the one with
    // max (ts, event_id)
    val l = left.select(col("event_id").as("lid"), col("ts").as("lts"), col("user_id"))
    val r = right.select(col("event_id").as("rid"), col("ts").as("rts"),
      col("user_id"), col("value").as("rv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lid")).orderBy(col("rts").desc, col("rid").desc)
    val naive = l.join(r, Seq("user_id"), "left")
      .filter(col("rts").isNull || col("rts") <= col("lts"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("lid"), col("rv"))
      .collect().map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    // naive drops left rows whose every right match is later -> align
    val expected = got.keys.map(k => k -> naive.getOrElse(k, None)).toMap
    assert(got === expected)
    assert(got.values.exists(_.isDefined) && got.values.exists(_.isEmpty))
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
