package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment join WITHOUT an equi-key — the case Catalyst
  * plans as a BroadcastNestedLoopJoin (or, unbroadcastable, a cartesian
  * product): every point row against every interval row. Fine at demo
  * scale, catastrophic at 100 TB.
  *
  * The standard public rewrite (the technique behind every "range join
  * optimization": bin both sides, equi-join on the bin): quantize the
  * value domain into fixed-width buckets, map each point to its one
  * bucket, explode each interval over the buckets it overlaps, and
  * equi-join on the bucket id — a plain shuffled hash/sort-merge join
  * whose key carries the co-location — then apply the exact containment
  * predicate. A (point, interval) pair meets in EXACTLY one bucket (the
  * point's), so no post-join distinct is needed.
  *
  * Scale posture:
  *  - the shuffle key is the bucket id: both sides partition by it, no
  *    replication of the points side at all;
  *  - the intervals side expands by ceil(span/width)+1 rows — the ONE
  *    tunable cost. A width near the typical span keeps expansion ~2x.
  *    The expansion is COUNTED before the join (one narrow aggregate
  *    over the intervals side) and refused loudly past
  *    `maxExpandedRows`, naming the wider bucket that would fit — the
  *    same fail-loud posture as Dedup.nearDupPairs' pair-volume guard;
  *  - bucket floor uses pmod-adjusted integer arithmetic (exact on
  *    longs, no double rounding at epoch-microsecond magnitudes).
  */
object RangeJoin {

  private def floorDiv(c: Column, w: Long): Column =
    // `div` is integral division — Spark's `/` (Divide) casts to double,
    // which is exact only below 2^53 and would misbucket unix-nanos longs.
    call_function("div", c - pmod(c, lit(w)), lit(w)).cast("long")

  /** Join `points` to every row of `intervals` whose [loCol, hiCol]
    * (inclusive both ends) contains pointCol. All three columns must be
    * integral (callers join on timestamps via unix_micros); the two
    * inputs must not share column names. Output carries every column of
    * both inputs.
    */
  def bucketed(points: DataFrame, intervals: DataFrame,
               pointCol: String, loCol: String, hiCol: String,
               bucketWidth: Long,
               maxExpandedRows: Long = 100000000L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val dup = points.columns.toSet.intersect(intervals.columns.toSet)
    require(dup.isEmpty, s"inputs share column names: ${dup.mkString(", ")}")

    val bLo = floorDiv(col(loCol), bucketWidth)
    val bHi = floorDiv(col(hiCol), bucketWidth)

    // expansion guard: one narrow aggregate over the intervals side,
    // priced before any shuffle of the (typically far larger) points side
    val g = intervals
      .agg(sum(bHi - bLo + 1).as("expanded"), count(lit(1)).as("n"))
      .head()
    val expanded = if (g.isNullAt(0)) 0L else g.getLong(0)
    if (expanded > maxExpandedRows)
      throw new IllegalArgumentException(
        f"rangeJoin bucket expansion $expanded%,d rows exceeds " +
          f"$maxExpandedRows%,d (${g.getLong(1)}%,d intervals at width " +
          f"$bucketWidth%,d). Raise bucketWidth toward the typical span " +
          "(expansion ~ n_intervals * (span/width + 2)) or raise " +
          "maxExpandedRows deliberately.")

    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals.withColumn("__bucket", explode(sequence(bLo, bHi)))
    p.join(iv, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
