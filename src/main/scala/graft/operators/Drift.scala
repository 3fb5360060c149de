package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Per-source distribution-drift report — the monitoring stage that
  * detects when one ingestion source's token distribution diverges from
  * the corpus (crawler drift, a source gone spammy, template leakage).
  * Computes the chi-square divergence of each source's unigram
  * distribution P_s against the corpus distribution Q:
  *
  *   chi2(s) = Σ_{w: P_s(w) > 0} (P_s(w) − Q(w))² / Q(w)
  *
  * The sum is deliberately ONE-SIDED — over the source's own vocabulary.
  * Tokens the source lacks would each contribute exactly Q(w) (since
  * (0−Q)²/Q = Q), i.e. the source's uncovered corpus mass — so that mass
  * is reported as its own `coverage` column (Σ Q(w) over the source's
  * vocabulary; full-support chi-square = chi2 + (1 − coverage)) instead
  * of being folded into the drift score. A source that IS the corpus
  * scores an exact 0.0 with coverage ~1.
  *
  * Chi-square rather than KL by design: every arithmetic step is an
  * IEEE correctly-rounded op (divisions, subtraction, multiplication) on
  * exact integer counts — no transcendental whose last ulp varies by
  * libm (the t23 lesson; its ln form lives in spec-land for the same
  * reason). Each term is nano-quantized (floor(x·1e9 + 0.5), identical
  * on both engines because the doubles are bit-identical) and summed as
  * longs, so the per-source score is hash-exact and order-independent.
  *
  * Scale shape: one tokenize+explode pass → a (source, token) count
  * table (combinable); corpus token counts derive from it by a second
  * combinable aggregate (never re-touching the text); the join back is
  * vocabulary-sized on the token key, source totals broadcast. Nothing
  * corpus-sized shuffles twice.
  */
object Drift {

  /** Output: (source, n_tokens, chi2, coverage), one row per source. */
  def bySource(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val pair = graft.Tables.spread(docs)
      .select(col(sourceCol).as("src"), explode(tokens(col(textCol))).as("w"))
      .groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as("c_sw"))
    val srcTotals = pair.groupBy(col("src")).agg(sum(col("c_sw")).as("n_s"))
    val corpusCounts = pair.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val nRow = srcTotals.agg(sum(col("n_s"))).head()
    val n = if (nRow.isNullAt(0)) 0L else nRow.getLong(0)
    require(n > 0, "drift: empty corpus")
    val p = col("c_sw").cast("double") / col("n_s").cast("double")
    val q = col("c_w").cast("double") / lit(n.toDouble)
    val term = (p - q) * (p - q) / q
    pair
      .join(broadcast(srcTotals), Seq("src"))
      .join(corpusCounts, Seq("w"))
      .withColumn("qn", floor(term * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("cq", floor(q * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("src"))
      .agg(max(col("n_s")).as("n_tokens"),
        (sum(col("qn")).cast("double") / lit(1e9)).as("chi2"),
        (sum(col("cq")).cast("double") / lit(1e9)).as("coverage"))
      .select(col("src").as("source"), col("n_tokens"), col("chi2"), col("coverage"))
  }
}
