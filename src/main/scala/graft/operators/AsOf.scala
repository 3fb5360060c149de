package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join — the classic time-series operator
  * Spark SQL lacks natively. Implemented by composition (the brief's
  * preference (a)): union both sides tagged, one window pass carrying the
  * last right-side value forward per key, filter back to left rows. One
  * shuffle on (key), no range cross-product, fully SQL-expressible — so
  * it stays under the DuckDB oracle (query e5) instead of needing a
  * custom SparkPlan.
  *
  * Scale: the window partitions by key; per-key state during the pass is
  * one carried value. Skewed keys behave like any windowed aggregate
  * (AQE/salting apply).
  */
object AsOf {

  /** For each left row, attach the latest right-side `valueCol` whose
    * timestamp is at-or-before the left row's timestamp (pandas
    * merge_asof backward semantics, exact matches allowed), per `keyCol`.
    * Left rows keep their columns; the attached column is named
    * `asofCol` (null when no prior right row exists).
    */
  def joinPrior(left: DataFrame, right: DataFrame, keyCol: String,
                tsCol: String, tieCol: String, valueCol: String,
                asofCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      leftCols.map(col) :+ lit(1).as("__is_left") :+
        lit(null).cast(right.schema(valueCol).dataType).as("__rv"): _*)
    val r = right.select(
      leftCols.map(c =>
        (if (right.columns.contains(c)) col(c) else lit(null)).as(c)) :+
        lit(0).as("__is_left") :+ col(valueCol).as("__rv"): _*)
    // right rows sort before left rows at the same timestamp, so a left
    // row's carried value reflects every right row with ts' <= ts
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__is_left").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(asofCol, last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__rv")
  }

  /** Forward sibling of [[joinPrior]]: attach the EARLIEST right-side
    * `valueCol` at-or-after each left row's timestamp (merge_asof
    * forward semantics) — "the next click after this impression".
    * Same one-window composition with the frame reversed: left rows
    * sort before right rows at equal timestamps (so an exact-time right
    * row still counts as "after"), and the first non-null right value
    * is carried BACKWARD over [current, unbounded following].
    */
  def joinNext(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, tieCol: String, valueCol: String,
               asofCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left.select(
      leftCols.map(col) :+ lit(1).as("__is_left") :+
        lit(null).cast(right.schema(valueCol).dataType).as("__rv"): _*)
    val r = right.select(
      leftCols.map(c =>
        (if (right.columns.contains(c)) col(c) else lit(null)).as(c)) :+
        lit(0).as("__is_left") :+ col(valueCol).as("__rv"): _*)
    // left rows sort BEFORE right rows at the same timestamp, so the
    // first carried value reflects every right row with ts' >= ts
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__is_left").desc, col(tieCol).asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r)
      .withColumn(asofCol, first(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .drop("__is_left", "__rv")
  }
}
