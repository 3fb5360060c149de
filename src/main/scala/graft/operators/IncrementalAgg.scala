package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Algebraic aggregate-state maintenance — the materialized-view pattern
  * that keeps a 100 TB rollup fresh without re-reading the 100 TB: keep
  * the COMBINABLE state (count, sum, min, max) per group, fold each
  * insert-only delta batch into it with the same merge the map-side
  * combiner uses, and derive presentation values (avg) only at read
  * time. Correctness is exactly Spark's own partial-aggregation
  * contract: state(a ++ b) == merge(state(a), state(b)) for commutative
  * monoids, so an incrementally-maintained view is bit-identical to a
  * full recompute (q50 gates that equality through the DuckDB oracle).
  *
  * Scale posture: `state` is one combinable groupBy over the batch;
  * `merge` shuffles only GROUP-sized state tables, never rows. Deletes/
  * updates are out of contract by design (min/max are not groups under
  * deletion) — retract-capable state needs the t22/e19-style sketches
  * or a full group recompute, and callers are told so here rather than
  * by silent wrong answers.
  */
object IncrementalAgg {

  val StateCols: Seq[String] = Seq("n", "s", "mn", "mx")

  /** Aggregate state of one batch: count/sum/min/max of `value` per
    * `keys`. Sum rides DECIMAL(18,2) so the merge is exact (double sums
    * would drift between fold orders and engines).
    */
  def state(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val v = value.cast(org.apache.spark.sql.types.DecimalType(18, 2))
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n"), sum(v).as("s"), min(v).as("mn"), max(v).as("mx"))
  }

  /** Fold two state tables: the monoid merge (count/sum add, min/max
    * lattice). Union + one group-sized re-aggregation.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).groupBy(keys.map(col): _*).agg(
      sum(col("n")).as("n"), sum(col("s")).as("s"),
      min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  /** Read-time presentation: derive avg from the state (never stored —
    * averages don't merge; sums and counts do).
    */
  def present(state: DataFrame, keys: Seq[String]): DataFrame =
    // avg as IEEE double division of the exact state (decimal/decimal
    // division would pick an engine-specific result scale)
    state.select(keys.map(col) ++ Seq(col("n"), col("s").cast("double").as("s"),
      (col("s").cast("double") / col("n")).as("avg"),
      col("mn").cast("double").as("mn"), col("mx").cast("double").as("mx")): _*)
}
