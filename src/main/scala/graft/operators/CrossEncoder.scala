package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SketchHash
import graft.operators.NeuralEmbed.NeuralModel

/** Cross-encoder reranking — stage 2 of the retrieve-then-rerank
  * pattern (Nogueira & Cho 2019, "Passage Re-ranking with BERT",
  * public): a cheap retriever nominates N candidates, then a model that
  * sees the QUERY AND DOCUMENT TOGETHER scores each pair — interaction
  * signals (which query term co-occurs with which document term) that
  * no bi-encoder dot product can express, bought at per-pair cost,
  * which is why it runs on a candidate pool and never the corpus.
  *
  * The pair model here is the [[NeuralEmbed]] integer-quantized MLP
  * (dOut = 1: a scalar relevance score) over HASHED CROSS FEATURES —
  * every (query-token, doc-token) occurrence pair hashes into a signed
  * d0-bucket count (the feature-hashing cross-term construction,
  * Weinberger et al. 2009, public). Same artifact contract as the
  * embedding seam: weights are a parquet table a production deployment
  * fills with a trained, quantized cross-encoder export; [[NeuralEmbed
  * .generate]] stands in deterministically so the x8 oracle can
  * re-derive the whole forward pass in SQL. Every activation is an
  * exact integer, so the score — and therefore the rerank order — is
  * bit-reproducible across engines.
  *
  * Scale shape: stage 1 is [[Bm25]] (one corpus pass, combinable
  * aggregates); the pool is N rows, broadcast back onto the corpus for
  * text recovery; stage 2 scores N pairs partition-parallel with the
  * model in the task closure (~5 KB here; a real quantized
  * cross-encoder is MBs — broadcast territory); the final top-k is a
  * TakeOrdered over N rows. Nothing downstream of stage 1 is
  * corpus-sized.
  */
object CrossEncoder {

  /** Tokenization shared with the BM25 stage and its oracle: lowercase,
    * whitespace split, empties dropped.
    */
  def tokens(text: String): Array[String] =
    if (text == null) Array.empty
    else text.toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** Signed hashed cross features: one increment per (query-token,
    * doc-token) OCCURRENCE pair, bucket/sign from the engine-wide
    * splitmix(fnv1a) stream of `qt + ":" + dt` (the Embed convention
    * applied to the pair string).
    */
  def interactionFeatures(queryToks: Array[String], docToks: Array[String],
                          d0: Int): Array[Long] = {
    val x = new Array[Long](d0)
    var i = 0
    while (i < queryToks.length) {
      var j = 0
      while (j < docToks.length) {
        val u = SketchHash.mix(SketchHash.fnv1a64(
          (queryToks(i) + ":" + docToks(j)).getBytes("UTF-8")))
        x(((u >>> 1) % d0).toInt) += (if ((u & 1L) == 0L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    x
  }

  /** Exact-integer forward pass to the scalar head (dOut must be 1):
    * score = W2 ReLU(W1 x + b1) + b2. Bounds: |x_j| <= |Q|·|D|, so with
    * weights in [-7, 7] the score magnitude stays far inside Long.
    */
  def score(m: NeuralModel, x: Array[Long]): Long = {
    require(m.dOut == 1, s"cross-encoder head must be scalar, got dOut=${m.dOut}")
    require(x.length == m.d0, s"feature width ${x.length} != model d0 ${m.d0}")
    var out = m.b2(0).toLong
    var i = 0
    while (i < m.d1) {
      var s = m.b1(i).toLong
      var j = 0
      while (j < m.d0) { s += m.w1(i * m.d0 + j).toLong * x(j); j += 1 }
      if (s > 0L) out += m.w2(i).toLong * s
      i += 1
    }
    out
  }

  /** Retrieve-then-rerank: BM25 top-`nCandidates` for `query`'s distinct
    * terms, then the pair model orders the pool; top-`k` as
    * (doc_id, ce_score), ce_score exact BIGINT.
    */
  def rerank(docs: DataFrame, idCol: String, textCol: String,
             query: String, model: NeuralModel,
             nCandidates: Int, k: Int): DataFrame = {
    require(nCandidates >= k && k >= 1,
      s"need nCandidates >= k >= 1, got ($nCandidates, $k)")
    val qToks = tokens(query)
    require(qToks.nonEmpty, "cross-encoder rerank: empty query")
    val cand = Bm25.topK(docs, idCol, textCol,
      terms = qToks.distinct.toSeq, k = nCandidates).select(col("id"))
    rerankCandidates(docs, idCol, textCol, cand, query, model, k)
  }

  /** Stage 2 alone: score an EXTERNAL candidate pool (any retriever's
    * top-N — BM25, ANN, or an RRF fusion of several) and emit the
    * top-`k` by exact pair score. `candidateIds` must carry an `id`
    * column; it is broadcast (a candidate pool is k-sized by contract).
    */
  def rerankCandidates(docs: DataFrame, idCol: String, textCol: String,
                       candidateIds: DataFrame, query: String,
                       model: NeuralModel, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val qToks = tokens(query)
    require(qToks.nonEmpty, "cross-encoder rerank: empty query")
    val pool = docs.select(col(idCol).cast("long").as("id"),
        col(textCol).as("t"))
      .join(broadcast(candidateIds.select(col("id"))), "id")
    import docs.sparkSession.implicits._
    // the pair scorer runs where an ONNX cross-encoder session would —
    // once per partition, rows streamed through
    val scored = pool.as[(Long, String)].mapPartitions { it =>
      it.map { case (id, t) =>
        (id, score(model, interactionFeatures(qToks, tokens(t), model.d0)))
      }
    }.toDF("doc_id", "ce_score")
    scored.orderBy(col("ce_score").desc, col("doc_id").asc).limit(k)
  }
}
