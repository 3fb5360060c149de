package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.word_shingles

/** Corpus-level bigram language-model scoring — the distributed form of
  * LM-based quality filtering (the CCNet/Wenzek et al. 2020 recipe,
  * public: score each document by how plausible its token transitions
  * are under a corpus-level n-gram model; outliers on either end are
  * noise or boilerplate). Self-supervised: the model IS the corpus'
  * own bigram statistics, so no external artifact ships.
  *
  * Model: p(w2|w1) = C(w1 w2) / C(w1 ·) over bigram OCCURRENCES (all
  * counts from one explode of the in-order bigram stream; the
  * denominator is the occurrence count of w1 as a non-final token, so
  * probabilities per prefix sum to exactly 1). Every bigram in scope
  * was observed at least once, so no smoothing term is needed.
  *
  * Two scores:
  *  - [[bigramProbScore]] (the GATE query): per-doc arithmetic mean of
  *    p(w2|w1), each probability quantized to nano-units
  *    (floor(p·1e9+0.5) — integer-exact association, the t14/q21
  *    pattern). Chosen for the oracle because every step (integer
  *    counts, one IEEE division, one multiply, floor, long sum) is
  *    bit-identical across engines.
  *  - [[bigramLogLikelihood]]: the textbook mean-log form (what CCNet
  *    actually thresholds). `ln` is correctly-rounded on neither JVM
  *    fdlibm nor the oracle's libm in general, so cross-engine
  *    hash-equality cannot be promised — it is spec-verified against a
  *    local recomputation with tolerance instead of DuckDB-oracled.
  *
  * Scale shape: one explode of the token stream; bigram counts and
  * prefix counts are hash aggregates on (bigram) / (prefix) keys; the
  * probability table joins back on the bigram key. Nothing shuffles
  * more than (distinct bigrams + the doc stream keyed by bigram);
  * vocabulary never collects anywhere.
  */
object TextLm {

  private def bigrams(docs: DataFrame, idCol: String, textCol: String) =
    docs.select(col(idCol).as("id"),
      explode(word_shingles(col(textCol), 2)).as("bg"))

  /** (bg, prob) with prob = C(bg) / C(prefix ·) as double. */
  private def probTable(bg: DataFrame): DataFrame = {
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = c2
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    c2.withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(c1, "w1")
      .select(col("bg"),
        (col("c2").cast("double") / col("c1").cast("double")).as("prob"))
  }

  /** Per-doc mean corpus-conditional bigram probability, nano-quantized:
    * (id, n_bigrams, score). Docs with < 2 tokens are absent (no
    * bigrams — unscorable, as in the published recipe).
    */
  def bigramProbScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val probs = probTable(bg)
      .select(col("bg"),
        floor(col("prob") * lit(1000000000.0) + lit(0.5)).cast("long").as("qn"))
    bg.join(probs, "bg")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("qn")).cast("double") / count(lit(1)) / lit(1000000000.0))
          .as("score"))
  }

  /** Per-doc mean log-likelihood ln p(w2|w1) — the CCNet threshold
    * quantity. Plain double arithmetic (see class doc for why this form
    * is not DuckDB-oracled).
    */
  def bigramLogLikelihood(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val probs = probTable(bg).select(col("bg"), log(col("prob")).as("lp"))
    bg.join(probs, "bg")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(col("lp")) / count(lit(1))).as("mean_ll"))
  }

  /** word2phrase collocation mining (Mikolov et al. 2013, "Distributed
    * Representations of Words and Phrases", public): adjacent pairs
    * whose co-occurrence beats chance —
    * `score(a,b) = (C(ab) - delta) * N / (C(a) * C(b))` with
    * delta = minCount (the published discount), quantized to 1e-6 units
    * in EXACT integer arithmetic: every product is FORMED in
    * DECIMAL(38,0) (the t33 rule — a long multiply of corpus-scale
    * counts would wrap) and the division is integral, so the ranking is
    * bit-reproducible and oracle-checkable.
    *
    * Scale shape: unigram and bigram counts are combinable hash
    * aggregates (vocab-keyed exchanges, never the corpus); the score
    * join keys candidate bigrams to the two unigram rows; N rides a
    * broadcast 1-row cross join; top-k is a bounded TakeOrdered.
    * Output: top-k (a, b, c_ab, score_q).
    */
  def collocations(docs: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5, k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.TextFunctions.tokens
    val toks = graft.Tables.spread(docs)
      .select(explode(tokens(col(textCol))).as("w"))
    val totals = toks.agg(count(lit(1)).as("n"))
    val cw = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val cab = bigrams(docs, idCol, textCol)
      .groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .select(substring_index(col("bg"), " ", 1).as("a"),
        substring_index(col("bg"), " ", -1).as("b"), col("c_ab"))
    cab
      .join(cw.toDF("a", "ca"), "a")
      .join(cw.toDF("b", "cb"), "b")
      .crossJoin(broadcast(totals))
      .select(col("a"), col("b"), col("c_ab"),
        expr(s"(CAST(c_ab - $minCount AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))" +
          " * 1000000) div (CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0)))")
          .as("score_q"))
      .orderBy(col("score_q").desc, col("a").asc, col("b").asc)
      .limit(k)
  }

  /** CCNet-style perplexity-bucket sharding (Wenzek et al. 2020: each
    * language splits into head/middle/tail thirds by LM score before
    * mixing). Thresholds come from an EXACT score histogram — per-lang
    * (mean_q, count) aggregate, cumulative cut over the DISTINCT score
    * values, assignment by VALUE comparison — so no corpus-wide sort or
    * rank window ever runs, and boundary ties land deterministically on
    * the head side of their threshold regardless of partitioning (a
    * ROW_NUMBER split would tie-break arbitrarily or by id; CCNet
    * thresholds on the score value, as here). mean_q is the integer-div
    * quantized t23 score, so every comparison is integer-exact.
    *
    * Scale shape: two combinable aggregates (per-doc score, per-(lang,
    * score) histogram) + a histogram-sized window + a broadcast cut
    * join. Docs with fewer than two tokens carry no bigrams and are out
    * of scope, as in t23. Output: (lang, bucket, n_docs, min_q, max_q).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = bigrams(docs, idCol, textCol)
    val probs = probTable(bg).select(col("bg"),
      floor(col("prob") * lit(1000000000.0) + lit(0.5)).cast("long").as("qn"))
    val scored = bg.join(probs, "bg")
      .groupBy(col("id"))
      .agg(sum(col("qn")).as("s"), count(lit(1)).as("cnt"))
      .select(col("id"), expr("s div cnt").as("mean_q"))
    val withLang = scored.join(
      docs.select(col(idCol).as("id"), col(langCol).as("lang")), "id")
    val hist = withLang.groupBy(col("lang"), col("mean_q"))
      .agg(count(lit(1)).as("c"))
    val tot = hist.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    val cum = hist.withColumn("cum",
      sum(col("c")).over(Window.partitionBy(col("lang"))
        .orderBy(col("mean_q").desc)))
    val cuts = cum.join(tot, "lang")
      .groupBy(col("lang"))
      .agg(max(when(col("cum") >= expr("(n + 2) div 3"), col("mean_q"))).as("s1"),
        max(when(col("cum") >= expr("(2 * n + 2) div 3"), col("mean_q"))).as("s2"))
    withLang.join(broadcast(cuts), "lang")
      .withColumn("bucket", when(col("mean_q") >= col("s1"), "head")
        .when(col("mean_q") >= col("s2"), "middle").otherwise("tail"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("mean_q")).as("min_q"), max(col("mean_q")).as("max_q"))
  }
}
