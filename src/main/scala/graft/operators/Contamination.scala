package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{shingle_set, word_shingles}

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

  /** Contiguous-span contamination — the decontamination test the
    * published training reports actually apply (e.g. GPT-3's 13-gram
    * overlap check, public): [[scores]]' FRACTION dilutes a verbatim
    * benchmark quote inside a long document, so this variant measures the
    * longest run of CONSECUTIVE contaminated positional n-gram windows.
    * A run of length r means r+n-1 verbatim shared tokens; `flagged` docs
    * contain a span of at least minRun+n-1 tokens that appears somewhere
    * in `eval`.
    *
    * Scale design: same broadcast posture as [[scores]] (eval's window
    * universe is tiny; the train side streams through a broadcast probe),
    * plus ONE shuffle keyed by doc id for the gaps-and-islands run
    * detection (`pos - row_number()` per doc — the standard islands
    * trick; state per doc is its hit positions only). Output: one row per
    * measurable train document (>= n tokens):
    * (id, n_windows, n_hit, max_run, flagged).
    */
  def spanFlags(train: DataFrame, idCol: String, textCol: String,
                eval: DataFrame, evalTextCol: String,
                n: Int = 8, minRun: Int = 8): DataFrame = {
    val evalWindows = eval
      .select(explode(shingle_set(col(evalTextCol), n)).as("s"))
      .distinct()
      .withColumn("hit", lit(1))
    val tw = graft.Tables.spread(train)
      .select(col(idCol).as("id"), posexplode(word_shingles(col(textCol), n)))
      .toDF("id", "pos0", "s")
      .select(col("id"), (col("pos0") + 1).as("pos"), col("s"))
    val marked = tw.join(broadcast(evalWindows), Seq("s"), "left")
    val runs = marked.filter(col("hit").isNotNull)
      .withColumn("grp",
        col("pos") - row_number().over(Window.partitionBy(col("id")).orderBy(col("pos"))))
      .groupBy(col("id"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id"))
      .agg(max(col("run")).as("max_run"))
    marked
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_windows"), count(col("hit")).as("n_hit"))
      .join(runs, Seq("id"), "left")
      .withColumn("max_run", coalesce(col("max_run"), lit(0L)))
      .withColumn("flagged", col("max_run") >= minRun)
  }
}
