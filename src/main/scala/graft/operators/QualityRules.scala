package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", table of repetition/quality filters —
  * public). Where t2's `quality_score` blends signals into one number,
  * this operator reports each published RULE as its own boolean flag plus
  * the metric it tested, and a conjunctive `keep` — the shape a curation
  * pipeline audits ("which rule dropped this document?") and ablates
  * (re-weight one rule without recomputing the rest).
  *
  * No analogue exists in the reference (it serves search, not training
  * prep); this extends the SURVEY §2.9 quality-scoring family alongside
  * t2/t12/t23.
  *
  * Scale design: pure per-row arithmetic over one token split — no
  * shuffle, no UDF, every rule a codegen'd built-in composition; the whole
  * operator fuses into the scan's WholeStageCodegen span. Rules that need
  * corpus context (t22 heavy hitters, t23 LM score) stay separate
  * operators by design: mixing a shuffle into a row-local gate would
  * serialize the cheap path behind the expensive one.
  *
  * Rules (document kept iff ALL hold):
  *  - word count in [minWords, maxWords]
  *  - mean word length in [3, 10] characters
  *  - symbol-to-word ratio (`#` or `...`) <= 0.1
  *  - >= 80% of words contain at least one alphabetic character
  *  - >= `minStopwords` distinct words from the 8-word stop list
  *    {the, be, to, of, and, that, have, with}
  *  - duplicate-unigram fraction (1 - distinct/total) <= 0.3
  *
  * Each ratio is ONE IEEE double division of exactly-represented integers
  * (both engines agree bit-for-bit — the t23 precedent), so the full
  * output is hash-exact under the DuckDB oracle.
  */
object QualityRules {

  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule flags + metrics + conjunctive keep decision.
    * Output: (id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * n_stop, dup_frac, r_words, r_mean_len, r_symbol, r_alpha, r_stop,
    * r_dup, keep).
    */
  def gopherFlags(docs: DataFrame, idCol: String, textCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L,
                  minStopwords: Int = 2): DataFrame = {
    val c = col(textCol)
    val t = tokens(c)
    val nWords = size(t).cast("long")
    val nSafe = greatest(nWords, lit(1L)).cast("double")
    val meanLen = aggregate(t, lit(0L), (acc, w) => acc + length(w).cast("long"))
      .cast("double") / nSafe
    val symRatio = (regexp_count(c, lit("#")) +
      regexp_count(c, lit("\\.\\.\\."))).cast("double") / nSafe
    val alphaFrac = size(filter(t, w => w.rlike("[A-Za-z]"))).cast("double") / nSafe
    val nStop = size(array_intersect(array_distinct(t),
      array(Stopwords.map(lit): _*))).cast("long")
    val dupFrac = (nWords - size(array_distinct(t)).cast("long")).cast("double") / nSafe

    val rWords = nWords >= minWords && nWords <= maxWords
    val rMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val rSymbol = symRatio <= 0.1
    val rAlpha = alphaFrac >= 0.8
    val rStop = nStop >= minStopwords
    val rDup = dupFrac <= 0.3

    docs.select(col(idCol).as("id"),
      nWords.as("n_words"), meanLen.as("mean_word_len"),
      symRatio.as("symbol_ratio"), alphaFrac.as("alpha_frac"),
      nStop.as("n_stop"), dupFrac.as("dup_frac"),
      rWords.as("r_words"), rMeanLen.as("r_mean_len"),
      rSymbol.as("r_symbol"), rAlpha.as("r_alpha"),
      rStop.as("r_stop"), rDup.as("r_dup"),
      (rWords && rMeanLen && rSymbol && rAlpha && rStop && rDup).as("keep"))
  }
}
