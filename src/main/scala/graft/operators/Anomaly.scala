package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trailing-window count-anomaly detection — the pipeline-monitoring stage
  * that flags hours whose event volume deviates from the recent baseline
  * (ingest spikes, upstream outages, bot bursts). The z-test is computed
  * in EXACT integer arithmetic: with c = baseline size, s = Σn, q = Σn²,
  *   |n − s/c| > z·σ   ⇔   (n·c − s)² > z²·(c·q − s²)
  * (both sides multiplied by c²; σ² = (c·q − s²)/c²) — no division, no
  * sqrt, no float anywhere, so the flag is bit-reproducible and
  * oracle-checkable. Safe while per-window count sums stay below ~3e9
  * (the long² bound); swap the squares to DECIMAL beyond that.
  *
  * Scale design: events pre-aggregate to one row per (hour, key) — the
  * q25 posture: the window function runs over |hours| rows per key,
  * partitioned by key (no single-partition window). The baseline is the
  * previous `window` OBSERVED hours (ROWS frame — robust to gaps;
  * compose with e8's gap-fill upstream when true wall-clock frames are
  * required). Hours with fewer than `minBaseline` observed predecessors
  * never flag (insufficient history), reported via `base_cnt`.
  */
object Anomaly {

  def trailingCountAnomalies(events: DataFrame, tsCol: String, keyCol: String,
                             window: Int = 24, z: Int = 2,
                             minBaseline: Int = 8): DataFrame = {
    require(window > 0 && z > 0 && minBaseline > 0,
      s"window/z/minBaseline must be positive, got $window/$z/$minBaseline")
    val hourly = events
      .groupBy(date_trunc("hour", col(tsCol)).cast("timestamp_ntz").as("hour"),
        col(keyCol))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("hour"))
      .rowsBetween(-window, -1)
    val c: Column = count(col("n")).over(w)
    val s: Column = sum(col("n")).over(w)
    val q: Column = sum(col("n") * col("n")).over(w)
    val dev = col("n") * col("base_cnt") - col("base_sum")
    val varc = col("base_cnt") * col("base_sq") - col("base_sum") * col("base_sum")
    hourly
      .withColumn("base_cnt", c)
      .withColumn("base_sum", coalesce(s, lit(0L)))
      .withColumn("base_sq", coalesce(q, lit(0L)))
      .withColumn("flag",
        col("base_cnt") >= minBaseline && dev * dev > lit(z.toLong * z) * varc)
      .select(col("hour"), col(keyCol), col("n"), col("base_cnt"), col("flag"))
  }
}
