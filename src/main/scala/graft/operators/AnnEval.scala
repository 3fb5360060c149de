package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN index QUALITY measurement: recall@k of an approximate kNN result
  * against the exact one — the number every index deployment decision
  * (nlist/nprobe, PQ bits, refine pool size) is actually made on. An
  * index without a recall harness is a guess; this closes the evaluation
  * loop for the whole compressor/index family (IVF v9/v22, PQ v12-v17,
  * SQ8 v26-v28, BQ v19, JL v29, Matryoshka v18).
  *
  * Determinism: both inputs are deterministic top-k relations (ties
  * broken by corpus id on both sides across this codebase), intersection
  * and counting are exact, and recall = n_hit / k is one IEEE division
  * of small exact integers — identical on any engine.
  *
  * Scale shape: one (probe_id, corpus_id) equi-join between two k-sized-
  * per-probe relations (|probes| x k rows each — index-evaluation data,
  * never corpus-sized) and a combinable count; the right-side probe
  * universe keeps zero-overlap probes visible as recall 0 instead of
  * silently dropping them — an evaluation harness that hides its worst
  * cases is worse than none.
  */
object AnnEval {

  /** Per-probe recall@k. Inputs carry (probe_id, corpus_id) rows of the
    * exact and approximate top-k; output (probe_id, n_hit, recall).
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"recallAtK: k must be >= 1, got $k")
    val hits = exact.select(col("probe_id"), col("corpus_id"))
      .join(approx.select(col("probe_id"), col("corpus_id")),
        Seq("probe_id", "corpus_id"))
      .groupBy(col("probe_id"))
      .agg(count(lit(1)).as("n_hit"))
    exact.select(col("probe_id")).distinct()
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      .withColumn("recall", col("n_hit").cast("double") / k)
  }
}
