package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-overlap occupancy (peak concurrency): how many intervals are
  * open at once, per calendar day — the capacity-planning sweep line
  * (max concurrent sessions / connections / jobs).
  *
  * Sweep semantics: intervals are half-open [start, end) in epoch
  * micros; at one instant, closing deltas apply before opening ones
  * (delta ascending), so back-to-back intervals never double-count. The
  * running level uses the default RANGE frame DELIBERATELY: all rows
  * tied on (t, delta) read the level AFTER their whole peer group —
  * the instantaneous level under [start, end) semantics — which is also
  * what makes the value per row deterministic when engines order tied
  * rows differently (contrast Sampling.systematicSample, where ROWS is
  * the correct frame for the opposite reason).
  *
  * Scale shape: the global running sum is the t20/t21 two-pass
  * distributed prefix sum — range-repartition the delta stream on
  * (t, delta) (equal keys co-locate, so RANGE peer groups never split),
  * per-partition totals (<= numPartitions rows) come back once, bases
  * ride a literal map, and the window runs WITHIN partitions. No
  * single-partition window, no corpus-wide sort on one executor.
  *
  * Output: (day_us, peak, at_us) — the day boundary, its maximum level,
  * and the FIRST instant attaining it. Days are attributed at event
  * instants: a level carried across midnight with no events that day
  * registers at its next event (an occupancy AUDIT over the event
  * stream, not a gap-filled calendar — compose with e8's gap fill for
  * that).
  */
object Occupancy {

  private val DayMicros = 86400000000L

  def peakDaily(intervals: DataFrame, startUs: Column, endUs: Column,
                numPartitions: Int = 0): DataFrame = {
    val spark = intervals.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val deltas = intervals.select(startUs.cast("long").as("t"), lit(1L).as("delta"))
      .unionAll(intervals.select(endUs.cast("long").as("t"), lit(-1L).as("delta")))
      .repartitionByRange(n, col("t"), col("delta"))
      .sortWithinPartitions(col("t"), col("delta"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val totals = deltas.groupBy(col("pid")).agg(sum(col("delta")).as("s"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // <= n rows
      val bases = {
        val ids = totals.keys.toSeq.sorted
        ids.zip(ids.scanLeft(0L)((acc, p) => acc + totals(p))).toMap
      }
      val baseOf = coalesce(element_at(typedLit(bases), col("pid")), lit(0L))
      val w = Window.partitionBy(col("pid")).orderBy(col("t"), col("delta"))
      val run = deltas
        .withColumn("run", sum(col("delta")).over(w) + baseOf)
        .select((col("t") - col("t") % lit(DayMicros)).as("day_us"),
          col("t"), col("run"))
      val peaks = run.groupBy(col("day_us")).agg(max(col("run")).as("peak"))
      val out = run.join(peaks, "day_us")
        .filter(col("run") === col("peak"))
        .groupBy(col("day_us"), col("peak"))
        .agg(min(col("t")).as("at_us"))
      out.localCheckpoint(true) // realize before unpersist releases pids
    } finally deltas.unpersist()
  }
}
