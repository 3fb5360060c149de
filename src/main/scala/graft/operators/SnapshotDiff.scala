package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a keyed table — the audit /
  * CDC-extraction primitive (what changed between yesterday's lake state
  * and today's?): every key classified as insert / delete / update /
  * unchanged by ONE full outer join on the key, null-safe column
  * comparison deciding update vs unchanged.
  *
  * Scale posture: one key-partitioned shuffle join of the two snapshots
  * (co-located for free when both sides share a bucketed layout, the q39
  * design); the comparison is per-row codegen arithmetic, no second
  * pass, no driver state. Output is key + change_type — payload columns
  * stay prunable behind the projection. NULL is a value: a column going
  * NULL→non-NULL (or back) is an update, via null-safe equality.
  */
object SnapshotDiff {

  /** Classify every key present in either snapshot. `compare` columns
    * decide update-vs-unchanged; key columns must be unique per side
    * (a keyed snapshot, not an event log).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           keys: Seq[String], compare: Seq[String]): DataFrame = {
    // presence markers, not key-null checks: a legitimately-NULL key
    // component must not read as "absent" (the join itself is null-safe)
    val o = oldDf.select((keys ++ compare).map(c => col(c).as(s"o_$c"))
      :+ lit(true).as("o_present"): _*)
    val n = newDf.select((keys ++ compare).map(c => col(c).as(s"n_$c"))
      :+ lit(true).as("n_present"): _*)
    val joinCond = keys.map(k => col(s"o_$k") <=> col(s"n_$k")).reduce(_ && _)
    val inOld = col("o_present").isNotNull
    val inNew = col("n_present").isNotNull
    val changed = compare.map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, joinCond, "full_outer")
      .select(
        keys.map(k => coalesce(col(s"o_$k"), col(s"n_$k")).as(k)) :+
          when(!inOld, lit("insert"))
            .when(!inNew, lit("delete"))
            .when(changed, lit("update"))
            .otherwise(lit("unchanged")).as("change_type"): _*)
  }
}
