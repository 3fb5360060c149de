package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.shingle_set

/** Benchmark-contamination measurement — the training-data pipeline step
  * that checks how much of each candidate training document overlaps an
  * evaluation/benchmark corpus (the standard n-gram-overlap decontamination
  * method, e.g. the 13-gram check described in public LLM training
  * reports). No analogue exists in the reference (it serves search, not
  * training prep); this extends the SURVEY §2.9 dedup family.
  *
  * Scale design (100 TB train / small benchmark): the benchmark's distinct
  * shingle universe is tiny relative to the corpus, so it is broadcast —
  * the train side streams through a broadcast hash join and the only
  * shuffle is the per-document aggregation (map-side combinable counts).
  * Nothing pairwise ever materializes.
  */
object Contamination {

  /** Per-document contamination scores: for each `train` document with at
    * least one word n-gram shingle, the fraction of its DISTINCT shingles
    * that appear anywhere in `eval`. Documents shorter than n tokens have
    * no shingles and are absent from the output (nothing to measure).
    * Output: (id, n_shingles, n_contaminated, contamination), one row per
    * measurable train document.
    */
  def scores(train: DataFrame, idCol: String, textCol: String,
             eval: DataFrame, evalTextCol: String, n: Int = 3): DataFrame = {
    val evalShingles = eval
      .select(explode(shingle_set(col(evalTextCol), n)).as("s"))
      .distinct()
      .withColumn("hit", lit(1))
    // shingling + the broadcast probe are per-row kernel work: spread a
    // train scan narrower than the cluster (no-op on real multi-partition
    // inputs — see Tables.spread)
    val trainShingles = graft.Tables.spread(train)
      .select(col(idCol).as("id"), explode(shingle_set(col(textCol), n)).as("s"))
    trainShingles
      .join(broadcast(evalShingles), Seq("s"), "left")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"), count(col("hit")).as("n_contaminated"))
      .withColumn("contamination",
        col("n_contaminated") * lit(1.0) / col("n_shingles"))
  }
}
