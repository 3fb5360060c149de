package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BM25 relevance ranking (Robertson/Sparck Jones probabilistic
  * framework; the Okapi BM25 formula is public in every IR textbook) —
  * the lexical-retrieval sibling of the engine's vector search: given
  * query terms, rank documents by
  *
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
  *   idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
  *
  * Scale shape: one tokenize+explode pass computes document lengths and
  * the query-term postings; df/N/avgdl reduce to a handful of scalars
  * (collected — bounded by |terms| + 2, never by corpus size); the
  * per-(doc, term) score is a map-side expression over the postings and
  * the final per-doc sum is one hash aggregate + top-k heap. Nothing
  * shuffles more than the query-term postings (|terms| ≤ a few dozen →
  * a tiny fraction of the corpus), and the idf table broadcasts.
  *
  * Tokenization is the engine's canonical whitespace split of the
  * lowercased text (empty tokens dropped) — the same token stream the
  * t1 token counts and t5 shingles are built on. N counts documents
  * with ≥ 1 token (a token-free document can never match and would
  * only shift avgdl).
  */
object Bm25 {

  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    // evaluated three times below (dl, df, tf) — materialize the one
    // tokenize pass; blocks release with the DataFrame (docVectors
    // precedent: localCheckpoint over cache for automatic lifecycle)
    val cached = toks.localCheckpoint(false)

    val dl = cached.groupBy(col("id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    require(n > 0, "empty corpus")

    val qTerms = terms.map(_.toLowerCase)
    val dfRows = cached
      .filter(col("term").isin(qTerms: _*))
      .select(col("term"), col("id")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect() // bounded by |terms|
    val idf = dfRows.map { r =>
      val df = r.getLong(1)
      r.getString(0) -> math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    if (idf.isEmpty) return spark.emptyDataset[(Long, Double)].toDF("id", "score")
    val idfDf = idf.toSeq.toDF("term", "idf")

    val tf = cached
      .filter(col("term").isin(qTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))

    // association mirrors the oracle's SQL text exactly:
    // (idf * tf) * (k1+1) / (tf + k1 * ((1-b) + (b * dl) / avgdl))
    tf.join(broadcast(idfDf), "term")
      .join(dl, "id")
      .withColumn("ts",
        col("idf") * col("tf") * lit(k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl))))
      .groupBy(col("id")).agg(sum(col("ts")).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
