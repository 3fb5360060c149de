package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Main-content extraction (boilerplate removal) — the jusText-family
  * heuristic (Pomikálek 2011, the published method trafilatura-class
  * extractors build on) a crawl pipeline runs between HTML arrival and
  * tokenization: navigation, ads, and footers are link-dense and
  * stopword-poor; readable prose is the opposite; SHORT blocks take
  * their neighbors' class (a one-line block between two paragraphs is
  * content, the same block after the footer is chrome).
  *
  * The whole pass is higher-order ARRAY code fused into the scan (the
  * t55 posture): split at block-level tags → per-block metrics (link
  * density from anchor-text chars BEFORE tag stripping, stopword
  * density after) → context-free class → ONE neighbor-smoothing pass →
  * kept text. Zero explode, zero shuffle; per-doc arrays bound the
  * state, so the operator is flat in cluster terms at any corpus size.
  *
  * Classification (documented exactly, so gates can state outcomes):
  *   1. link_density > linkDensityMax        -> bad   (terminal)
  *   2. stripped length < minLen             -> short (defer to 4)
  *   3. stopword_density >= stopwordMin      -> good, else bad
  *   4. smoothing: a short block is good iff its immediate previous or
  *      next block's CONTEXT-FREE class is good (one pass; jusText's
  *      full iterative variant differs only on runs of shorts, which
  *      the gate avoids and real pages rarely produce).
  * Leniency: malformed HTML is text like any other — a heuristic
  * classifier has no refusal class (unlike binary containers whose
  * framing can lie); tag soup just yields conservative blocks.
  */
object Boilerplate {

  /** The ten most frequent English function words — enough signal for
    * the density rule; callers pass their own per-language lists.
    */
  val DefaultStopwords: Seq[String] =
    Seq("the", "of", "and", "to", "a", "in", "is", "it", "on", "for")

  private val BlockSplit =
    "(?i)</?(?:p|div|h[1-6]|li|td|th|blockquote|pre|article|section|ul|ol|table|tr)(?:\\s[^>]*)?>"

  /** Adds n_blocks, n_kept, classes, kept_text to `df`.
    *
    * Higher-order functions are interpreted (CodegenFallback) and —
    * crucially — re-evaluate any NON-STAGED subtree they reference at
    * every element: the smoothing lambda reads its neighbors via
    * `get(scored, i±1)`, which without staging re-runs the whole
    * regexp-scoring pass per block (quadratic in blocks, measured
    * 13.8 s at sf0.1). Each stage therefore lands in its OWN projection
    * (`withColumn`): multi-referenced non-cheap columns stay staged
    * (CollapseProject's own rule, the t56/t55 discipline), so every
    * regexp runs exactly once per block — 1.6 s on the same data, 8.6x.
    */
  def extract(df: org.apache.spark.sql.DataFrame, html: Column,
              stopwords: Seq[String] = DefaultStopwords,
              linkDensityMax: Double = 0.2,
              minLen: Int = 15,
              stopwordMin: Double = 0.25): org.apache.spark.sql.DataFrame = {
    val sw = array(stopwords.map(s => lit(s.toLowerCase)): _*)
    def strippedOf(s: Column): Column =
      trim(regexp_replace(regexp_replace(s, lit("<[^>]*>"), lit(" ")),
        lit("\\s+"), lit(" ")))
    // stage 1: per-block text (one regexp pass) + anchor-char count
    val staged = df
      .withColumn("__segs", filter(split(html, BlockSplit),
        s => length(strippedOf(s)) > 0))
      .withColumn("__scored0", transform(col("__segs"), { s =>
        val linkChars = aggregate(
          regexp_extract_all(s, lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
          lit(0), (acc, x) => acc + length(x))
        struct(strippedOf(s).as("text"), linkChars.as("lc"))
      }))
      // stage 2: tokens once per block
      .withColumn("__scored1", transform(col("__scored0"), b =>
        struct(b.getField("text").as("text"), b.getField("lc").as("lc"),
          split(b.getField("text"), " ").as("toks"))))
      // stage 3: context-free class from staged fields only
      .withColumn("__scored", transform(col("__scored1"), { b =>
        val stripped = b.getField("text")
        val ld = b.getField("lc").cast("double") /
          greatest(length(stripped), lit(1)).cast("double")
        val toks = b.getField("toks")
        val swc = size(filter(toks, t => array_contains(sw, lower(t))))
        val swd = swc.cast("double") / greatest(size(toks), lit(1)).cast("double")
        val base = when(ld > linkDensityMax, lit("bad"))
          .when(length(stripped) < minLen, lit("short"))
          .when(swd >= stopwordMin, lit("good"))
          .otherwise(lit("bad"))
        struct(stripped.as("text"), base.as("base"))
      }))
      // stage 4: neighbor smoothing over the STAGED array (get() is
      // 0-based and NULL-safe at the edges, unlike element_at)
      .withColumn("__final", transform(col("__scored"), (b, i) => {
        val prevGood = coalesce(
          get(col("__scored"), i - 1).getField("base") === "good", lit(false))
        val nextGood = coalesce(
          get(col("__scored"), i + 1).getField("base") === "good", lit(false))
        val fin = when(b.getField("base") === "short",
            when(prevGood || nextGood, lit("good")).otherwise(lit("bad")))
          .otherwise(b.getField("base"))
        struct(b.getField("text").as("text"), fin.as("cls"))
      }))
      .withColumn("__kept", filter(col("__final"), b => b.getField("cls") === "good"))
    staged
      .withColumn("n_blocks", size(col("__scored")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("classes",
        array_join(transform(col("__final"), _.getField("cls")), " "))
      .withColumn("kept_text",
        array_join(transform(col("__kept"), _.getField("text")), " "))
      .drop("__segs", "__scored0", "__scored1", "__scored", "__final", "__kept")
  }

  /** The ITERATED smoothing variant (round 16 — closes the documented
    * one-pass deviation): jusText's propagation through RUNS of short
    * blocks, as `passes` synchronous rounds of "a short block becomes
    * good when an immediate neighbor is good", then unpromoted shorts
    * finalize bad. Promotion is monotone, so round k marks exactly the
    * shorts within chain-distance k of a good block; `passes` bounds
    * the propagation distance (real pages' short runs are tiny — the
    * default covers runs of 8). Every round is its OWN staged
    * projection reading the PREVIOUS round's array (the measured
    * staged-HOF discipline — cost is linear in passes, never
    * quadratic in blocks).
    */
  def extractIterated(df: org.apache.spark.sql.DataFrame, html: Column,
                      passes: Int = 4,
                      stopwords: Seq[String] = DefaultStopwords,
                      linkDensityMax: Double = 0.2,
                      minLen: Int = 15,
                      stopwordMin: Double = 0.25): org.apache.spark.sql.DataFrame = {
    require(passes >= 1, "boilerplate: at least one smoothing pass")
    val sw = array(stopwords.map(s0 => lit(s0.toLowerCase)): _*)
    def strippedOf(c: Column): Column =
      trim(regexp_replace(regexp_replace(c, lit("<[^>]*>"), lit(" ")),
        lit("\\s+"), lit(" ")))
    var cur = df
      .withColumn("__segs", filter(split(html, BlockSplit),
        c => length(strippedOf(c)) > 0))
      .withColumn("__scored0", transform(col("__segs"), { c =>
        val linkChars = aggregate(
          regexp_extract_all(c, lit("(?i)<a[^>]*>([^<]*)</a>"), lit(1)),
          lit(0), (acc, x) => acc + length(x))
        struct(strippedOf(c).as("text"), linkChars.as("lc"))
      }))
      .withColumn("__scored1", transform(col("__scored0"), b =>
        struct(b.getField("text").as("text"), b.getField("lc").as("lc"),
          split(b.getField("text"), " ").as("toks"))))
      .withColumn("__it0", transform(col("__scored1"), { b =>
        val stripped = b.getField("text")
        val ld = b.getField("lc").cast("double") /
          greatest(length(stripped), lit(1)).cast("double")
        val toks = b.getField("toks")
        val swc = size(filter(toks, t => array_contains(sw, lower(t))))
        val swd = swc.cast("double") / greatest(size(toks), lit(1)).cast("double")
        val cls = when(ld > linkDensityMax, lit("bad"))
          .when(length(stripped) < minLen, lit("short"))
          .when(swd >= stopwordMin, lit("good"))
          .otherwise(lit("bad"))
        struct(stripped.as("text"), cls.as("base"))
      }))
    var k = 0
    while (k < passes) {
      val prev = s"__it$k"
      cur = cur.withColumn(s"__it${k + 1}", transform(col(prev), (b, i) => {
        val prevGood = coalesce(
          get(col(prev), i - 1).getField("base") === "good", lit(false))
        val nextGood = coalesce(
          get(col(prev), i + 1).getField("base") === "good", lit(false))
        val cls = when(b.getField("base") === "short" && (prevGood || nextGood),
          lit("good")).otherwise(b.getField("base"))
        struct(b.getField("text").as("text"), cls.as("base"))
      }))
      k += 1
    }
    val out = cur
      .withColumn("__final", transform(col(s"__it$passes"), b =>
        struct(b.getField("text").as("text"),
          when(b.getField("base") === "short", lit("bad"))
            .otherwise(b.getField("base")).as("cls"))))
      .withColumn("__kept", filter(col("__final"), b => b.getField("cls") === "good"))
      .withColumn("n_blocks", size(col("__it0")))
      .withColumn("n_kept", size(col("__kept")))
      .withColumn("classes",
        array_join(transform(col("__final"), _.getField("cls")), " "))
      .withColumn("kept_text",
        array_join(transform(col("__kept"), _.getField("text")), " "))
    (0 to passes).foldLeft(
      out.drop("__segs", "__scored0", "__scored1", "__final", "__kept")) {
      (d2, i) => d2.drop(s"__it$i")
    }
  }
}
