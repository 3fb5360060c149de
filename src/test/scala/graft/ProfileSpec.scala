package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Anomaly, Profile}

class ProfileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("profile: typed slots, null/distinct counts, single-scan plan") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(2.5), Some("b")),
      (2L, None, Some("a")),
      (3L, Some(7.5), None),
      (3L, Some(2.5), Some("a"))
    ).toDF("id", "x", "s")
    val rows = Profile.table(df, Seq("id", "x", "s"))
      .orderBy("column").collect()
    val byCol = rows.map(r => r.getString(0) -> r).toMap
    val id = byCol("id")
    assert(id.getLong(1) === 4L && id.getLong(2) === 0L && id.getLong(4) === 3L)
    assert(id.getDouble(5) === 1.0 && id.getDouble(6) === 3.0)
    assert(id.isNullAt(7) && id.isNullAt(8))
    val x = byCol("x")
    assert(x.getLong(2) === 1L && x.getLong(4) === 2L)
    assert(x.getDouble(5) === 2.5 && x.getDouble(6) === 7.5)
    val s = byCol("s")
    assert(s.getLong(2) === 1L && s.getLong(4) === 2L)
    assert(s.getString(7) === "a" && s.getString(8) === "b")
    assert(s.isNullAt(5) && s.isNullAt(6))
    // two branches (distinct counts / min-max folds), never per-column
    // passes: exactly two leaves regardless of column count
    val leaves = Profile.table(df, Seq("id", "x", "s"))
      .queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size === 2)
    // and the expensive branch never sorts: no Sort below the aggregates
    val plan = Profile.table(df, Seq("id", "x", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Sort ["), s"unexpected Sort in profile plan:\n$plan")
    intercept[IllegalArgumentException] { Profile.table(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Profile.table(df, Seq.empty) }
  }

  test("anomaly: spike flags after sufficient history, quiet hours and short history never flag") {
    import spark.implicits._
    def hour(h: Int) = new Timestamp(1700000000000L / 3600000L * 3600000L + h * 3600000L)
    // key "a": hours 0-9 at 10 events each, hour 10 spikes to 30, hour 11 quiet
    val evs = (0 to 9).flatMap(h => (1 to 10).map(i => (hour(h), "a"))) ++
      (1 to 30).map(_ => (hour(10), "a")) ++
      (1 to 10).map(_ => (hour(11), "a")) ++
      // key "b": a spike at hour 3 — only 3 history hours, below minBaseline
      (0 to 2).flatMap(h => (1 to 5).map(_ => (hour(h), "b"))) ++
      (1 to 50).map(_ => (hour(3), "b"))
    val df = evs.toDF("ts", "event_type")
    val out = Anomaly.trailingCountAnomalies(df, "ts", "event_type")
      .collect().map(r => ((r.getString(1), r.getLong(2)), r.getAs[Boolean]("flag"))).toMap
    assert(out(("a", 30L)) === true)   // the spike, 10 baseline hours
    assert(out(("a", 10L)) === false)  // every quiet hour
    assert(out(("b", 50L)) === false)  // insufficient history
    // non-constant baseline: variance term really gates the flag
    val evs2 = Seq(8, 12, 9, 11, 10, 10, 8, 12, 10, 10).zipWithIndex.flatMap {
      case (n, h) => (1 to n).map(_ => (hour(h), "c"))
    } ++ (1 to 13).map(_ => (hour(10), "c"))
    val out2 = Anomaly.trailingCountAnomalies(evs2.toDF("ts", "event_type"),
      "ts", "event_type")
      .filter(col("n") === 13).collect()
    // mean 10, sigma ~1.4: 13 is barely over 2 sigma -> must flag exactly
    // per the integer inequality (dev^2 = 900 > 4*(10*1018-10000) = 720)
    assert(out2.head.getAs[Boolean]("flag") === true)
  }
}
