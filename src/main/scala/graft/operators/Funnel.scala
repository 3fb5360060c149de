package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis — the product-analytics staple the e-family's
  * sessions/cohorts/attribution still lacked: for an ordered step list
  * (e.g. view -> click -> purchase), each user's earliest time of step
  * k STRICTLY AFTER their earliest qualifying time of step k-1. A user
  * who purchases before ever viewing has not completed the funnel; a
  * simultaneous event does not advance it (strict >, so the semantics
  * are unambiguous under equal timestamps).
  *
  * Built as an aggregate CHAIN, not a per-user event sort: each stage
  * is one combinable min aggregate over that step's events joined to
  * the previous stage's per-user time — k-1 user-keyed equi-joins on
  * ONE partitioning (AQE reuses it), no windows, no per-user sequence
  * materialization. That is the shape that survives 100 TB of events:
  * the state per stage is one row per user who reached it, and the
  * event table is scanned once per step WITH the step filter pushed
  * into the scan.
  *
  * Output: (user, reached, t1..tn as epoch micros, nulls past the
  * furthest stage), one row per user who completed stage 1.
  */
object Funnel {

  /** `maxGapSeconds`: when set, each step must also land WITHIN the gap
    * of the previous stage's time (the attribution-window form —
    * "purchase within 2 h of the click"); None = unbounded.
    */
  def stages(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String],
             maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.size >= 2, s"funnel: need >= 2 steps, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"funnel: steps must be distinct, got $steps")
    require(maxGapSeconds.forall(_ > 0),
      s"funnel: maxGapSeconds must be positive, got $maxGapSeconds")
    val base = events.select(col(userCol).cast("long").as("user"),
      col(typeCol).as("et"), col(tsCol).as("ts"))
    var acc = base.filter(col("et") === steps.head)
      .groupBy(col("user")).agg(min(col("ts")).as("t1"))
    var i = 2
    steps.tail.foreach { step =>
      val prev = s"t${i - 1}"
      val within = maxGapSeconds
        .map(g => col("ts") <= col(prev) + expr(s"INTERVAL $g SECOND"))
        .getOrElse(lit(true))
      val nxt = base.filter(col("et") === step)
        .join(acc.select(col("user"), col(prev)), "user")
        .filter(col("ts") > col(prev) && within)
        .groupBy(col("user")).agg(min(col("ts")).as(s"t$i"))
      acc = acc.join(nxt, Seq("user"), "left")
      i += 1
    }
    val reached = (1 to steps.size).map(j =>
      when(col(s"t$j").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    acc.select(
      Seq(col("user"), reached.as("reached")) ++
        (1 to steps.size).map(j => unix_micros(col(s"t$j")).as(s"t${j}_us")): _*)
  }
}
