package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion — Reciprocal Rank Fusion (Cormack,
  * Clarke & Buettcher, SIGIR 2009; the standard production combiner
  * for lexical + vector retrieval):
  *
  *   rrf(d) = Σ over lists L of 1 / (k0 + rank_L(d))
  *
  * RRF fuses RANKS, not scores, so it needs no score normalization
  * across retrieval systems whose scores live on incomparable scales
  * (BM25 sums vs cosine distances) — exactly why it became the default
  * fusion in hybrid search engines.
  *
  * Scale shape: each input list is a top-n retrieval result (n ~ tens
  * to thousands — ALREADY bounded by its retrieval operator, e.g.
  * [[Bm25.topK]] / [[Knn.topK]]), so the single-partition rank windows
  * and the fusion aggregate run on k-sized data, never on the corpus;
  * the heavy lifting stays inside the retrieval operators' own
  * scale-safe plans. Documents absent from a list simply contribute
  * nothing for it (union semantics).
  */
object Hybrid {

  /** Fuse ranked lists. Each input must carry columns `(id, score)`
    * where HIGHER score = better; ranks are assigned by
    * (score desc, id asc) so ties are deterministic. Returns the top-k
    * `(id, rrf, lists)` by fused score (ties broken by id), `lists` =
    * how many inputs contained the id.
    */
  def rrf(lists: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf needs at least one ranked list")
    require(k0 >= 0, s"k0 must be non-negative, got $k0")
    val contribs = lists.map { df =>
      // the input is a bounded top-n result; the unpartitioned window
      // runs on k-sized data by construction (the q25 note applies)
      val w = Window.orderBy(col("score").desc, col("id").asc)
      df.select(col("id"), row_number().over(w).as("rnk"))
        .select(col("id"), (lit(1.0) / (col("rnk") + lit(k0))).as("contrib"))
    }
    contribs.reduce(_ union _)
      .groupBy(col("id"))
      .agg(sum(col("contrib")).as("rrf"), count(lit(1)).as("lists"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(k)
  }
}
