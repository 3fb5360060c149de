package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding merge-step statistics — the inner loop of BPE
  * tokenizer training (Sennrich et al. 2016, public): count every
  * adjacent character pair across the corpus; the highest-count pair is
  * the next merge. The reference has no tokenizer-training surface; this
  * extends the SURVEY §2.9 text family beside t1/t6's token counters.
  *
  * Scale design — the classic BPE-training trick, distributed: pair
  * counting runs over the DISTINCT VOCABULARY weighted by word frequency,
  * never over the corpus. Stage 1 is a map-side-combinable word-count
  * aggregate (the only corpus-sized pass); stage 2 explodes character
  * pairs of each distinct word — a vocabulary-sized table, orders of
  * magnitude smaller than the text — and sums `count x multiplicity` per
  * pair (combinable again). A 100 TB corpus with a 10 M-word vocabulary
  * does its pair arithmetic on 10 M rows. Further merge iterations
  * re-run stage 2 only (the word-count table is the reusable artifact),
  * the standard driver-side training loop.
  */
object BpePairs {

  /** Per-word corpus frequencies: the reusable stage-1 artifact. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    graft.Tables.spread(docs)
      .select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("c"))

  /** Adjacent-character-pair counts over the weighted vocabulary.
    * Output: (pair, n), one row per distinct 2-char pair, n = total
    * corpus occurrences (in-word multiplicity times word frequency).
    */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .filter(length(col("w")) >= 2)
      .select(col("c"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("c")).as("n"))

  /** The k most frequent pairs (the next k merge candidates),
    * deterministic via (count desc, pair asc) — TakeOrderedAndProject
    * over the pair aggregate.
    */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(docs, textCol)
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)

  /** Symbol-sequence word table: each distinct word as its space-joined
    * character sequence (padded with sentinel spaces so merges match on
    * symbol boundaries), with its corpus frequency — the working
    * representation the BPE training loop rewrites.
    */
  def symbolWords(docs: DataFrame, textCol: String): DataFrame =
    wordCounts(docs, textCol)
      .select(concat(lit(" "),
        array_join(split(col("w"), ""), " "), lit(" ")).as("sym"), col("c"))

  /** Apply ONE merge to the symbol table: every adjacent (x, y) becomes
    * the joined symbol xy, greedily left-to-right (a merged occurrence
    * consumes both symbols, so "x x x" under (x,x) yields "xx x" — the
    * published BPE merge rule). Implemented as a codegen'd left fold
    * over the symbol sequence (`aggregate`): a string `replace` on the
    * delimited form would mis-handle overlapping runs by consuming the
    * shared delimiter. Vocabulary-sized work; the corpus is never
    * touched again after the initial count.
    */
  def applyMerge(symWords: DataFrame, x: String, y: String): DataFrame = {
    val xy = x + y
    symWords.withColumn("sym", concat(lit(" "), array_join(
      aggregate(
        split(trim(col("sym")), " "),
        array().cast("array<string>"),
        (acc, s) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(x) && s === lit(y),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(xy))))
            .otherwise(concat(acc, array(s)))),
      " "), lit(" ")))
  }

  /** Pair counts over the merged symbol table (the loop's re-count):
    * same vocabulary-weighted shape as [[pairCounts]], on symbol
    * sequences instead of raw characters.
    */
  def symbolPairCounts(symWords: DataFrame): DataFrame =
    symWords
      .select(col("c"), split(trim(col("sym")), " ").as("ss"))
      .filter(size(col("ss")) >= 2)
      .select(col("c"), explode(transform(
        sequence(lit(0), size(col("ss")) - 2),
        i => concat(element_at(col("ss"), i + 1), lit(" "),
          element_at(col("ss"), i + 2)))).as("pair"))
      .groupBy(col("pair"))
      .agg(sum(col("c")).as("n"))

  /** Corpus tokenization with a trained merge list — the ENCODE step the
    * t26/t29/t30 training statistics feed: each DISTINCT word is
    * segmented ONCE (the merge list folded left-to-right in training
    * order over its character sequence, exactly [[applyMerge]]'s rule),
    * and the corpus re-joins the segmentation table BROADCAST on the
    * word. A 100 TB corpus never re-runs merge arithmetic per
    * occurrence: segmentation cost is vocabulary-sized, the corpus pass
    * is one broadcast-join + one combinable aggregate, and the join
    * carries only (id, pos, word) — no text bytes move through the
    * shuffle. Output per document: word count, BPE piece count, and the
    * md5 of the space-joined piece stream in token order (what a
    * tokenized-shard writer would fingerprint for the packing manifest).
    */
  def encodeCorpus(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    var seg = wordCounts(docs, textCol).select(col("w"),
      concat(lit(" "), array_join(split(col("w"), ""), " "), lit(" ")).as("sym"))
    merges.foreach { case (x, y) => seg = applyMerge(seg, x, y) }
    val segTable = seg.select(col("w"), trim(col("sym")).as("piece_str"),
      size(split(trim(col("sym")), " ")).cast("long").as("n_pc"))
    val toks = docs.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    toks.join(broadcast(segTable), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_pc")).as("n_pieces"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("piece_str")))),
          s => s("piece_str")), " ")).as("stream_fp"))
  }

  /** Frequency-filtered vocabulary with deterministic id assignment:
    * tokens with corpus count >= minCount, ids 0.. in (count desc, token
    * asc) order — the id layout every frequency-sorted tokenizer vocab
    * uses (frequent tokens get small ids). The ranking window runs over
    * the VOCABULARY (corpus-independent size, orders of magnitude below
    * the text), so its single-partition sort is the same deliberate
    * small-data trade as q25's time frame — the corpus-sized work is the
    * one combinable word-count aggregate.
    */
  def vocab(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    import org.apache.spark.sql.expressions.Window
    wordCounts(docs, textCol)
      .filter(col("c") >= minCount)
      .withColumn("token_id",
        (row_number().over(Window.orderBy(col("c").desc, col("w").asc)) - 1).cast("long"))
      .select(col("token_id"), col("w").as("token"), col("c").as("n"))
  }
}
