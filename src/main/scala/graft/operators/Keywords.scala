package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010, "Automatic
  * keyword extraction from individual documents" — the classic
  * stopword-delimited method): candidate phrases are the maximal token
  * runs between stopwords; each word scores deg(w)/freq(w) over the
  * CORPUS co-occurrence statistics (freq = w's occurrences in
  * candidates, deg = freq + words co-occurring with w in its phrases);
  * a phrase scores the sum of its distinct-candidate words. High-degree
  * words (ones that live inside long multi-word phrases) outrank
  * merely-frequent ones — the property that separates keywords from
  * filler.
  *
  * Exactness contract (the t23/t38 posture): freq and deg are exact
  * corpus counts, each word's ratio is one multiply + one divide on
  * exactly-representable doubles then `floor(x * 1e9)` to a long, and
  * phrase scores are exact long sums of those quanta —
  * order-independent, hash-stable cross-engine. Ranking ties break on
  * (score desc, phrase asc).
  *
  * Scale shape: phrase extraction is a per-row regex split (no
  * shuffle); word statistics are one combinable aggregate keyed by word
  * (vocabulary-sized, the t18/t23 class); scoring is a word-keyed
  * equi-join of candidates against that table — deliberately UNHINTED:
  * candidate vocabulary is unbounded at corpus scale, so a broadcast
  * hint would be a driver OOM in waiting, while AQE broadcasts it
  * anyway whenever it measures small; the per-doc top-k uses the q28
  * bounded-heap aggregate, never a corpus-wide rank window.
  */
object Keywords {

  /** The RAKE stopword inventory used by the gate — deliberately small
    * and fixed so the oracle states the same list.
    */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "of", "to", "and", "in", "on", "for", "with",
    "is", "are", "was", "be", "by", "at", "as", "it", "this", "that")

  private val StopPattern = s"\\b(?:${Stopwords.mkString("|")})\\b"

  /** Candidate phrases per document occurrence: lowercase text split at
    * stopword boundaries, chunks whitespace-normalized; runs longer
    * than `maxWords` are dropped (not truncated), per the paper.
    * Output (id, phrase) — one row per candidate OCCURRENCE.
    */
  def phrases(docs: DataFrame, idCol: String, textCol: String,
              maxWords: Int = 3): DataFrame = {
    require(maxWords >= 1, s"rake: maxWords must be >= 1, got $maxWords")
    docs
      .select(col(idCol).cast("long").as("id"),
        explode(split(lower(trim(col(textCol))), StopPattern)).as("c"))
      .select(col("id"),
        trim(regexp_replace(col("c"), "\\s+", " ")).as("phrase"))
      .filter(col("phrase") =!= "" &&
        size(split(col("phrase"), " ")) <= maxWords)
  }

  /** Top-k phrases per doc with quantized RAKE scores:
    * (id, rnk, phrase, score_q).
    */
  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
                  k: Int, maxWords: Int = 3): DataFrame = {
    require(k >= 1, s"rake: k must be >= 1, got $k")
    val ph = phrases(docs, idCol, textCol, maxWords).persist()
    try {
      // corpus word statistics over candidate OCCURRENCES (RAKE's
      // co-occurrence graph); score_q = floor(1e9 * deg/freq)
      val stats = ph
        .select(explode(split(col("phrase"), " ")).as("w"),
          (size(split(col("phrase"), " ")) - 1).cast("long").as("others"))
        .groupBy(col("w"))
        .agg(count(lit(1)).as("freq"), sum(col("others")).as("codeg"))
        .select(col("w"),
          floor(lit(1e9) * (col("freq") + col("codeg")).cast("double") /
            col("freq").cast("double")).cast("long").as("wq"))
      // each DISTINCT candidate scores once (the paper's phrase score)
      val scored = ph.select(col("id"), col("phrase")).distinct()
        .select(col("id"), col("phrase"),
          explode(split(col("phrase"), " ")).as("w"))
        .join(stats, Seq("w")) // unhinted: vocabulary-sized, AQE decides
        .groupBy(col("id"), col("phrase"))
        .agg(sum(col("wq")).as("score_q"))
      scored
        .groupBy(col("id"))
        .agg(graft.functions.GraftFunctions.topk_by(
          struct((-col("score_q")).as("neg"), col("phrase")),
          struct(col("phrase"), col("score_q")), k).as("top"))
        .select(col("id"), posexplode(col("top")).as(Seq("rnk0", "r")))
        .select(col("id"), (col("rnk0") + 1).cast("long").as("rnk"),
          col("r.phrase").as("phrase"), col("r.score_q").as("score_q"))
    } finally ph.unpersist()
  }
}
