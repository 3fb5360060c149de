package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance ranking (Robertson/Sparck Jones probabilistic
  * framework; the Okapi BM25 formula is public in every IR textbook) —
  * the lexical-retrieval sibling of the engine's vector search: given
  * query terms, rank documents by
  *
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Scale shape — ONE conditional-aggregation pass, fully lazy:
  * tokenize+explode feeds a single `groupBy(id)` computing the document
  * length AND one `sum(when(term = t, 1))` column per query term
  * (|terms| ≤ a few dozen → a fixed-width row per doc, partial-agg
  * combinable map-side). N / avgdl / per-term dfs reduce that per-doc
  * table to ONE row, kept as a broadcast DataFrame and cross-joined
  * back — no driver collect, no action before the final top-k, and the
  * per-doc aggregation exchange is shared between the stats branch and
  * the scoring branch (ReusedExchange), so the token stream is scanned
  * once with nothing materialized. This replaces the earlier design
  * that localCheckpoint'ed the full (id, term) token stream — the
  * corpus-sized materialization a 100 TB run cannot afford.
  *
  * Tokenization is the engine's canonical whitespace split of the
  * lowercased text (empty tokens dropped) — the same token stream the
  * t1 token counts and t5 shingles are built on. N counts documents
  * with ≥ 1 token (a token-free document can never match and would
  * only shift avgdl). Documents matching no query term are filtered
  * out, as in the posting-list formulation; an all-miss query yields an
  * empty result whose schema (id of the corpus' id type, double score)
  * comes from the same plan as the non-empty case.
  */
object Bm25 {

  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val qTerms = terms.map(_.toLowerCase).distinct

    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")

    // the single pass: per-doc length + one tf column per query term
    val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1L).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col("id"))
      .agg(count(lit(1)).as("__dl"), tfCols: _*)

    // global stats: one row — corpus size, mean length, per-term dfs
    val dfCols = qTerms.indices.map { i =>
      sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i")
    }
    val stats = perDoc.agg(count(lit(1)).as("__n"),
      (avg(col("__dl")).as("__avgdl") +: dfCols): _*)

    // association mirrors the oracle's SQL text exactly:
    // (idf * tf) * (k1+1) / (tf + k1 * ((1-b) + (b * dl) / avgdl));
    // a term with tf = 0 contributes an exact 0.0 (the product's tf
    // factor), so the per-doc Σ over the fixed term list equals the
    // posting-list sum over matched terms.
    val termScore: Int => Column = { i =>
      val tf = col(s"__tf_$i").cast("double")
      val dft = col(s"__df_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - dft + lit(0.5)) / (dft + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }
    val anyMatch = qTerms.indices.map(i => col(s"__tf_$i") > 0).reduce(_ || _)

    perDoc.crossJoin(broadcast(stats))
      .filter(anyMatch)
      .withColumn("score", qTerms.indices.map(termScore).reduce(_ + _))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
