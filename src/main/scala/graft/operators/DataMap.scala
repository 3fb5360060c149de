package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus DATA MAP — the "what is in this training set" curation view
  * (the public corpus-cartography pattern: cluster the embedding space,
  * then label each cluster with its most distinctive terms, cf.
  * Swayamdipta et al. 2020 "Dataset Cartography" and the cluster-label
  * practice of corpus exploration tools): k-means buckets from the
  * deterministic [[Ivf]] trainer, then per-CLUSTER TF-IDF — term
  * frequency at cluster granularity against cluster-level document
  * frequency, the t49 integer-quantized idf so every score is an exact
  * BIGINT both engines agree on.
  *
  * Scale shape: the only corpus-sized work is the token explode (one
  * pass, combinable counts); everything after aggregates at
  * (clusters × vocabulary) size. The cluster count rides a broadcast
  * one-row aggregate; the per-cluster top-k exits through the q28
  * bounded heap — no vocabulary-wide window sort.
  */
object DataMap {

  /** Label clusters: `assigned` carries (id, bucket) — [[Ivf.build]]'s
    * assignment (or any clustering); `docs` carries the texts. Output:
    * (bucket, n_docs, rnk, term, score_q), `topTerms` rows per
    * non-empty cluster, rnk 1-based by (score_q desc, term asc).
    */
  def clusterLabels(assigned: DataFrame, docs: DataFrame,
                    idCol: String, textCol: String,
                    topTerms: Int): DataFrame = {
    require(topTerms >= 1, s"topTerms must be >= 1, got $topTerms")
    val a = assigned.select(col("id").cast("long").as("id"),
      col("bucket").cast("long").as("bucket"))
    val toks = docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .join(a, "id")
    val tf = toks.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // document frequency at CLUSTER granularity: in how many clusters
    // does the term appear — the idf that makes a label DISTINCTIVE
    // (corpus-wide stopwords appear in every cluster and score low)
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = a.agg(countDistinct(col("bucket")).as("n_cl"))
    val sizes = a.groupBy(col("bucket")).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfc, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("bucket"), col("term"),
        (col("tf") * expr("(n_cl * 1000000L) div df")).as("score_q"))
    scored
      .groupBy(col("bucket"))
      .agg(graft.functions.GraftFunctions.topk_by(
        struct((-col("score_q")).as("neg"), col("term")),
        struct(col("term"), col("score_q")), topTerms).as("top"))
      .join(sizes, "bucket")
      .select(col("bucket"), col("n_docs"),
        posexplode(col("top")).as(Seq("rnk0", "r")))
      .select(col("bucket"), col("n_docs"),
        (col("rnk0") + 1).cast("long").as("rnk"),
        col("r.term").as("term"), col("r.score_q").as("score_q"))
  }
}
