package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier politeness scheduling — the decision a fetch fleet
  * runs after [[graft.functions.RobotsAllowed]] admits a URL: order
  * each host's queue by priority and assign every candidate a concrete
  * fetch offset that honors the host's crawl delay and the fleet's
  * per-cycle host capacity (no host gets hammered, no cycle overfills).
  *
  * Semantics: within a host, candidates rank by (priority DESC, tie);
  * slot k fetches at `(k / perCycle) * cycleLen + (k % perCycle) *
  * delay(host)` — the first `perCycle` URLs spread across one cycle at
  * the host's own delay, the rest roll to later cycles. All integer
  * arithmetic, so the schedule is exact and oracle-checkable.
  *
  * Scale posture: ONE shuffle, keyed by host. The per-host sequential
  * rank is inherent to politeness (a host's queue IS serial — you
  * cannot fetch politely in parallel), and per-host frontier size is
  * bounded by the same politeness (a host at delay d admits at most
  * cycleLen/d fetches per cycle, so rank depth that matters is small);
  * a hot host therefore costs sort time proportional to its queue, not
  * coordination. No driver collects, no window over the whole corpus.
  */
object Frontier {

  def schedule(candidates: DataFrame, host: Column, priority: Column,
               tie: Column, delaySec: Column,
               perCycle: Int, cycleLenSec: Long): DataFrame = {
    require(perCycle >= 1 && cycleLenSec >= 1, "frontier: positive capacity and cycle")
    val w = Window.partitionBy(host).orderBy(priority.desc, tie.asc)
    candidates
      .withColumn("slot", row_number().over(w).cast("bigint") - 1)
      .withColumn("fetch_offset_s",
        expr(s"slot div $perCycle") * cycleLenSec +
          pmod(col("slot"), lit(perCycle.toLong)) * delaySec)
  }
}
