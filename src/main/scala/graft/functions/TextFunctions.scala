package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline work (BASELINE.json
  * north star: token counting, quality scoring, language ID, document
  * fingerprinting). Everything here composes Spark built-ins, so it stays
  * inside whole-stage codegen — no UDFs, no fallback — and every function
  * has an exactly-equivalent DuckDB SQL form for the oracle harness.
  *
  * Tokenization convention (shared with the oracle SQL): trim, split on
  * `\s+`; empty/whitespace-only text yields an empty token array.
  */
object TextFunctions {

  /** Lookaround-free PII patterns, valid in both Java regex (Spark) and
    * RE2 (the DuckDB oracle) with identical semantics.
    */
  object TextPatterns {
    val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val Url = "https?://[^\\s]+"
  }

  /** Whitespace tokens; empty array for empty/blank input. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  def token_count(c: Column): Column = size(tokens(c))

  def distinct_token_count(c: Column): Column = size(array_distinct(tokens(c)))

  /** Word n-gram shingles (the unit of near-dup detection). Native
    * single-pass expression — see [[WordShingles]] for why the composed
    * transform/slice form is quadratic on long documents.
    */
  def word_shingles(c: Column, n: Int): Column =
    GraftFunctions.toCol(WordShingles(GraftFunctions.toExpr(c), n, distinct = false))

  /** Distinct word n-gram shingle set (first-occurrence order). */
  def shingle_set(c: Column, n: Int): Column =
    GraftFunctions.toCol(WordShingles(GraftFunctions.toExpr(c), n, distinct = true))

  /** Canonical-form fingerprint: md5 of lowercased, whitespace-collapsed
    * text. Exact-dup detection key (SURVEY.md §2.9).
    */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(trim(c)), "\\s+", " "))

  /** n-gram-marker language heuristic. Checks CJK characters first, then
    * competes small stopword inventories; deterministic tie order
    * en > fr > es > de. Returns one of en/fr/es/de/zh/unknown.
    */
  def lang_guess(c: Column): Column = {
    val zh = regexp_count(c, lit("[\\u4e00-\\u9fff]"))
    val en = regexp_count(c, lit("\\b(the|and|of|is|to)\\b"))
    val fr = regexp_count(c, lit("\\b(le|la|et|les|des)\\b"))
    val es = regexp_count(c, lit("\\b(el|los|las|y|es)\\b"))
    val de = regexp_count(c, lit("\\b(der|die|und|das|ist)\\b"))
    when(zh > 0, "zh")
      .when(en >= fr && en >= es && en >= de && en > 0, "en")
      .when(fr >= es && fr >= de && fr > 0, "fr")
      .when(es >= de && es > 0, "es")
      .when(de > 0, "de")
      .otherwise("unknown")
  }

  /** GPT-2-style pre-tokenizer segment count ("BPE-ish"): letter runs,
    * digit runs, punctuation runs (each with optional leading space), and
    * whitespace runs. Lookahead-free so the same pattern runs on Java
    * regex (Spark) and RE2 (DuckDB oracle).
    */
  val BpePattern: String = " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"
  def bpe_token_count(c: Column): Column = regexp_count(c, lit(BpePattern))

  /** HTML -> plain-text-markdown-ish transform (reference F10: the MCP
    * layer markdownifies every response string, `backend/mcp.py:12-20`):
    * strip tags, decode the common entities (amp last so &amp;lt; does
    * not double-decode), collapse whitespace.
    */
  def strip_html(c: Column): Column = {
    val noTags = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (from, to)) => replace(col0, lit(from), lit(to)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** HTML -> markdown conversion for the tag set the reference's
    * markdownify pass renders in its responses (reference F10,
    * `backend/mcp.py:12-20`). Native single-pass kernel — see
    * [[HtmlToMarkdown]] for the staged rules: unlike the old depth-3
    * unroll, inline nesting converts to arbitrary depth (true fixpoint)
    * and nested `<ol>` scopes number innermost-first, each scope
    * restarting at 1, matching markdownify's recursive conversion. The
    * oracle states the identical staged pipeline in SQL with recursive
    * CTEs for the two fixpoint loops (see Text.mdSql).
    */
  def html_to_markdown(c: Column): Column =
    GraftFunctions.toCol(HtmlToMarkdown(GraftFunctions.toExpr(c)))

  /** Block-layout variant: markdownify's newline block separation and
    * nested-list indentation (see [[HtmlToMarkdownBlocks]]); the
    * space-collapsed [[html_to_markdown]] stays the engine canonical.
    */
  def html_to_markdown_blocks(c: Column): Column =
    GraftFunctions.toCol(HtmlToMarkdownBlocks(GraftFunctions.toExpr(c)))

  /** The old composed-Column form (depth-3 inline unroll, non-nested
    * `<ol>` segment split). Retained only to pin native/composed
    * equivalence on depth<=3 non-nested corpora in tests.
    */
  private[graft] def html_to_markdown_composed(c: Column): Column = {
    var x = regexp_replace(c, "(?i)<br\\s*/?>", " ")
    // inline rules, iterated so inner tags convert before their parents
    for (_ <- 1 to 3) {
      x = regexp_replace(x, "(?i)<(?:b|strong)\\b[^>]*>([^<]*)</(?:b|strong)>", "**$1**")
      x = regexp_replace(x, "(?i)<(?:i|em)\\b[^>]*>([^<]*)</(?:i|em)>", "*$1*")
      x = regexp_replace(x, "(?i)<a\\b[^>]*href=\"([^\"]*)\"[^>]*>([^<]*)</a>", "[$2]($1)")
      x = regexp_replace(x, "(?i)<code\\b[^>]*>([^<]*)</code>", "`$1`")
    }
    // img (self-closing; both attribute orders) and hr
    x = regexp_replace(x,
      "(?i)<img\\b[^>]*alt=\"([^\"]*)\"[^>]*src=\"([^\"]*)\"[^>]*/?>", "![$1]($2)")
    x = regexp_replace(x,
      "(?i)<img\\b[^>]*src=\"([^\"]*)\"[^>]*alt=\"([^\"]*)\"[^>]*/?>", "![$2]($1)")
    x = regexp_replace(x, "(?i)<hr\\s*/?>", " --- ")
    // block rules after inline, so their content groups see no inner
    // tags; surrounding spaces keep adjacent blocks apart (markdownify
    // separates blocks with newlines — collapsed to one space here)
    for (h <- 1 to 6)
      x = regexp_replace(x, s"(?i)<h$h\\b[^>]*>([^<]*)</h$h>", " " + ("#" * h) + " $1 ")
    x = regexp_replace(x, "(?i)<blockquote\\b[^>]*>([^<]*)</blockquote>", " > $1 ")
    // ordered lists: segments between <ol>/</ol> tags alternate
    // outside/inside (non-nested scopes); inside segments number their
    // <li>s 1..n, everything else falls through to the "- " rule below
    x = array_join(
      transform(split(x, "(?i)</?ol\\b[^>]*>", -1), (seg, i) =>
        when(i % 2 === 1,
          array_join(
            transform(split(seg, "(?i)<li\\b[^>]*>", -1), (item, j) =>
              when(j === 0, item)
                .otherwise(concat(lit(" "), j.cast("string"), lit(". "), item))),
            "")).otherwise(seg)),
      " ")
    x = regexp_replace(x, "(?i)<li\\b[^>]*>", "- ")
    strip_html(x)
  }

  /** Polynomial rolling-hash fingerprint (north-star "document
    * fingerprinting (rolling hash)") — see [[RollingHash64]].
    */
  def rolling_fingerprint(c: Column): Column =
    GraftFunctions.toCol(RollingHash64(GraftFunctions.toExpr(c)))

  /** Composite quality score in [0, 1]: length, lexical diversity,
    * stopword presence, alphabetic ratio — equal weights. Native
    * single-pass expression ([[QualityScore]]); the identical composed
    * formula lives in the oracle SQL and in [[quality_score_composed]]
    * (kept for the equivalence test).
    */
  def quality_score(c: Column): Column =
    GraftFunctions.toCol(QualityScore(GraftFunctions.toExpr(c)))

  /** The built-in-composed form of the same formula (4x re-splits the
    * text; retained only to pin native/composed equivalence in tests).
    */
  private[graft] def quality_score_composed(c: Column): Column = {
    val t = when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))
    val nTok = size(t).cast("double")
    val nTokSafe = greatest(nTok, lit(1.0))
    val lengthScore = least(lit(1.0), nTok / 20.0)
    val diversity = size(array_distinct(t)).cast("double") / nTokSafe
    val stopRatio = regexp_count(c, lit("\\b(the|a|of|to|and)\\b")).cast("double") / nTokSafe
    val stopScore = least(lit(1.0), stopRatio * 5.0)
    val alphaRatio = length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") /
      greatest(length(c).cast("double"), lit(1.0))
    (lengthScore + diversity + stopScore + alphaRatio) / 4.0
  }
}
