package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction (Sparck Jones 1972) — the baseline term
  * weighting next to t47's RAKE (phrase-level) and t18's BM25 (query-
  * time): per document, the k terms with the highest tf * idf, where
  * idf is the QUANTIZED integer `(N * 1e6) div df` — a monotone
  * transform of every classical idf variant, so the ranking it induces
  * is the classical ranking while every comparison stays exact BIGINT
  * (the t47/v31 posture: no cross-engine float in any ordering).
  *
  * Scale posture: tokenize once (one projection), tf is one combinable
  * (doc, term) count, df reuses tf's output (already distinct per doc)
  * with a second combinable count, and N rides a broadcast one-row
  * cross join. The per-doc top-k goes through the q28 bounded-heap
  * aggregate — state k rows per doc, never a corpus-wide window. The
  * df-join is vocabulary-sized and left unhinted (AQE decides, the t47
  * lesson).
  */
object TfIdf {

  /** Top-`k` terms per doc: (id, rnk, term, score_q) with
    * score_q = tf * ((N * 1000000) div df).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame = {
    require(k >= 1, s"tfidf: k must be >= 1, got $k")
    val n = docs.select(count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(df, Seq("term")) // vocabulary-sized, unhinted
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"),
        (col("tf") * expr("(n_docs * 1000000L) div df")).as("score_q"))
    scored
      .groupBy(col("id"))
      .agg(graft.functions.GraftFunctions.topk_by(
        struct((-col("score_q")).as("neg"), col("term")),
        struct(col("term"), col("score_q")), k).as("top"))
      .select(col("id"), posexplode(col("top")).as(Seq("rnk0", "r")))
      .select(col("id"), (col("rnk0") + 1).cast("long").as("rnk"),
        col("r.term").as("term"), col("r.score_q").as("score_q"))
  }
}
