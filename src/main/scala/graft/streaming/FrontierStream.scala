package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The crawl frontier as CONTINUOUS admission — the 18th batch==stream
  * twin: URLs admitted by the robots gate arrive as a stream and each
  * host's queue hands out politeness slots as they come. The state per
  * host is ONE long (the next slot number) — the frontier never holds
  * URLs, text, or schedules, so state is bounded by the host universe
  * regardless of crawl size, and the slot arithmetic is the SAME
  * integer formula as [[graft.operators.Frontier.schedule]].
  *
  * Equivalence contract (what the twin spec pins): slots assign FIFO
  * per host — ascending url_id within a micro-batch (the batch-local
  * tiebreak below), arrival order across micro-batches. Under the
  * per-key in-order contract ([[CurateStream]]'s: a host's smaller
  * url_ids arrive in earlier batches), N micro-batches ≡ the batch
  * `Frontier.schedule` with constant priority and url_id as the tie.
  * Priority CLASSES are a batch concept (ranking needs the whole
  * cycle's candidates); the streaming frontier is the arrival-order
  * arm a continuous crawler actually runs.
  */
object FrontierStream {

  final case class Scheduled(url_id: Long, host_id: Long, slot: Long,
                             fetch_offset_s: Long)

  /** candidates: (url_id, host_id, delay_s) rows on a streaming frame. */
  def scheduleStream(candidates: DataFrame, perCycle: Int,
                     cycleLenSec: Long): Dataset[Scheduled] = {
    require(perCycle >= 1 && cycleLenSec >= 1, "frontier: positive capacity and cycle")
    import candidates.sparkSession.implicits._
    candidates.select(col("url_id"), col("host_id"), col("delay_s"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (host: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[Long]) =>
          var next = state.getOption.getOrElse(0L)
          val out = rows.toIndexedSeq.sortBy(_._1).map { case (id, _, delay) =>
            val slot = next; next += 1
            Scheduled(id, host, slot,
              (slot / perCycle) * cycleLenSec + (slot % perCycle) * delay)
          }
          state.update(next)
          out.iterator
      }
  }
}
