package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{tokens, word_shingles}

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

  /** Gopher repetition-section signals (Rae et al. 2021 Table A1 — the
    * line-level half `gopherFlags` leaves out): duplicate-line fraction,
    * duplicate-line CHARACTER fraction (chars removed if each distinct
    * line kept once), and the top word-2-gram / word-3-gram character
    * fractions (chars covered by the single most frequent n-gram).
    *
    * Lines are `\n`-separated, trimmed, blank lines dropped. Top-gram
    * tie-break: highest count, then lexicographically LARGEST gram — the
    * oracle states the same pick as `ORDER BY c DESC, g DESC LIMIT 1`.
    *
    * Scale design: pure per-row array arithmetic — no shuffle, no UDF.
    * The top-gram count is O(G log G) per row, not O(G^2): shingles are
    * `array_sort`ed and the longest equal-run is folded in ONE
    * `aggregate()` pass (run-length encoding of the sorted array), so a
    * 10k-token web page costs a sort + one linear scan, not 10^8 string
    * compares. Every ratio is one IEEE division of exactly-represented
    * integers (t25 precedent), so the output is hash-exact cross-engine.
    * The struct-valued fold is materialized ONCE per n in its own
    * projection (CollapseProject keeps non-cheap multi-referenced
    * expressions un-inlined), never re-evaluated per referencing column.
    */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String,
                        maxDupLineFrac: Double = 0.30,
                        maxDupLineCharFrac: Double = 0.20,
                        maxTop2CharFrac: Double = 0.20,
                        maxTop3CharFrac: Double = 0.18): DataFrame = {
    val c = col(textCol)
    val lines = filter(transform(split(c, "\n"), l => trim(l)),
      l => length(l) > 0)

    // (bestc, bestg) of the most frequent n-gram: sort, then fold the
    // longest run; ascending scan means later runs carry larger grams,
    // so `run >= bestc` alone implements the (c DESC, g DESC) tie-break.
    def topGram(n: Int): Column = {
      val sorted = array_sort(word_shingles(c, n))
      aggregate(
        sorted,
        struct(lit("").as("prev"), lit(0L).as("run"),
          lit(0L).as("bestc"), lit("").as("bestg")),
        (acc, g) => {
          val same = acc("prev") === g
          val closedBetter = !same && acc("run") >= acc("bestc") && acc("run") > 0
          struct(
            g.as("prev"),
            when(same, acc("run") + 1).otherwise(lit(1L)).as("run"),
            when(closedBetter, acc("run")).otherwise(acc("bestc")).as("bestc"),
            when(closedBetter, acc("prev")).otherwise(acc("bestg")).as("bestg"))
        },
        acc => {
          val finalBetter = acc("run") >= acc("bestc") && acc("run") > 0
          struct(
            when(finalBetter, acc("run")).otherwise(acc("bestc")).as("bestc"),
            when(finalBetter, acc("prev")).otherwise(acc("bestg")).as("bestg"))
        })
    }

    val base = docs.select(col(idCol).as("id"),
      size(lines).cast("long").as("n_lines"),
      size(array_distinct(lines)).cast("long").as("n_distinct_lines"),
      length(array_join(lines, "")).cast("long").as("line_chars"),
      length(array_join(array_distinct(lines), "")).cast("long")
        .as("distinct_line_chars"),
      length(array_join(tokens(c), " ")).cast("long").as("text_chars"),
      topGram(2).as("t2"), topGram(3).as("t3"))

    val dlf = (col("n_lines") - col("n_distinct_lines")).cast("double") /
      greatest(col("n_lines"), lit(1L)).cast("double")
    val dlcf = (col("line_chars") - col("distinct_line_chars")).cast("double") /
      greatest(col("line_chars"), lit(1L)).cast("double")
    def tf(s: String): Column =
      when(col(s)("bestc") === 0L, lit(0.0)).otherwise(
        (col(s)("bestc") * length(col(s)("bestg")).cast("long")).cast("double") /
          col("text_chars").cast("double"))
    val rDupLine = dlf <= maxDupLineFrac
    val rDupChar = dlcf <= maxDupLineCharFrac
    val rTop2 = tf("t2") <= maxTop2CharFrac
    val rTop3 = tf("t3") <= maxTop3CharFrac
    base.select(col("id"), col("n_lines"),
      dlf.as("dup_line_frac"), dlcf.as("dup_line_char_frac"),
      tf("t2").as("top2_char_frac"), tf("t3").as("top3_char_frac"),
      rDupLine.as("r_dup_line"), rDupChar.as("r_dup_line_char"),
      rTop2.as("r_top2"), rTop3.as("r_top3"),
      (rDupLine && rDupChar && rTop2 && rTop3).as("keep"))
  }
}
