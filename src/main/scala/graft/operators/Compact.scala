package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Latest-version-per-key compaction — the CDC/upsert-log collapse every
  * incremental pipeline needs: given an append-only log of row versions,
  * keep exactly the newest version of each key.
  *
  * Shape: `groupBy(key).agg(max_by(payload, orderKey))`, NOT the
  * row_number()-over-window formulation. Both are one shuffle, but the
  * window form ships EVERY version across the exchange and then sorts
  * each key group by the full (key, ts, id) order; max_by partial-agg
  * combines map-side — each map task forwards ONE candidate row per
  * key it saw, so on a log with many versions per key (the whole point
  * of compaction) the exchange carries keys x partitions rows instead
  * of the full log. (Spark plans the struct-ordered max_by as a
  * SortAggregate — a per-partition LOCAL sort by group key feeds the
  * partial aggregate, CPU-local with nothing extra crossing the
  * exchange; the win is the shuffle volume, not sort elimination.)
  *
  * Determinism: callers must make `orderCols` a total order per key
  * (e.g. append a unique id after the timestamp — the gate query
  * orders by (ts, event_id)). With ties possible and no tiebreaker,
  * max_by keeps an arbitrary winner; a unique final column removes the
  * ambiguity exactly like every ROW_NUMBER tie-break in the oracle
  * suite.
  */
object Compact {

  /** Keep the newest row per key, "newest" = lexicographic max of
    * `orderCols`. Output columns = input columns (original order).
    */
  def latestByKey(df: DataFrame, keyCols: Seq[String],
                  orderCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && orderCols.nonEmpty,
      "latestByKey: need at least one key and one order column")
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    val ord = struct(orderCols.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(max_by(payload, ord).as("__latest"))
      .select(col("__latest.*"))
  }
}
