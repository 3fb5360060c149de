package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key event sequences —
  * the "what does a user do next" model behind session analytics and
  * behavioral anomaly scoring (reference scope: the events table's
  * sequence analytics family, next to e2 sessionization and e25
  * funnels).
  *
  * Scale posture: ONE key-partitioned window (the same user hash
  * partitioning e2/e16/e25 reuse) emits consecutive-pair edges, then a
  * combinable count per (from, to). The state-space side — per-from
  * totals and the probability denominator — is |types|^2 at most, so it
  * aggregates in one tiny job and BROADCASTS back onto the pair counts;
  * nothing after the window shuffles the event volume again. At 100 TB
  * the cost is exactly one shuffle of (user, ts, type) triples.
  *
  * Probabilities are exact integer parts-per-million (n * 1e6 div
  * total), not IEEE quotients, so results are bit-stable across engines
  * and partitionings.
  */
object Markov {

  /** (from_type, to_type, n, p_ppm) for every observed transition.
    *
    * @param tieCol total-order tie-break within equal timestamps (an
    *               event id); the sequence must be deterministic or the
    *               transition counts are not.
    */
  def transitions(df: DataFrame, userCol: Column, typeCol: Column,
                  tsCol: Column, tieCol: Column): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val pairs = df
      .select(typeCol.as("from_type"),
        lead(typeCol, 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("n")).as("t"))
    pairs.join(broadcast(totals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("cast((n * 1000000) div t as bigint)").as("p_ppm"))
  }
}
