package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer training — ONE hard-EM round of the
  * SentencePiece unigram model (Kudo 2018, "Subword Regularization",
  * public; sentencepiece's trainer alternates an E-step that segments
  * the word table under current piece probabilities with an M-step that
  * re-estimates them, then prunes). This is the OTHER tokenizer a data
  * pipeline trains beside BPE (t26/t29/t30/t36): where BPE grows pieces
  * bottom-up by merging, unigram starts from a large seed vocabulary and
  * lets segmentation likelihood select the survivors.
  *
  * The round implemented, exactly:
  *  1. SEED: candidate pieces = every substring (length 1..[[MaxPiece]])
  *     of the distinct training words, weighted by word frequency;
  *     pruned to count >= minCount, single chars always kept (coverage).
  *  2. E-STEP (Viterbi, hard EM — the sentencepiece E-step's MAP
  *     variant): segment each distinct word into vocabulary pieces
  *     maximizing sum(logp(piece)), i.e. the unigram likelihood.
  *  3. M-STEP: re-count pieces over the Viterbi segmentations weighted
  *     by word frequency — the new piece statistics (the next round's
  *     probabilities, and the prune criterion).
  *
  * EXACT-INTEGER log-likelihood: piece log-probabilities use the
  * piecewise-linear integer log2 [[ilog2]] — (bitlength-1) << 16 plus
  * the top 16 mantissa bits below the leading one, the QuantileSketch
  * binning idea turned into a monotone fixed-point logarithm. It is
  * within 0.086 bits of log2 everywhere (max |pwl - log2| at x=1.44),
  * strictly monotone, and pure bit arithmetic BOTH engines state
  * identically — so Viterbi scores are exact BIGINTs, ties are broken
  * by a stated rule (max score, then the SHORTEST last piece), and the
  * whole round is hash-reproducible. No float enters the training loop;
  * this is the x3/x4 integer-quantization discipline applied to EM.
  *
  * Scale shape: stage 1 (word counts) is the only corpus-sized pass —
  * the BpePairs argument. Everything after runs on the distinct-word
  * table: substring seeding is <= len*MaxPiece rows per distinct word,
  * the pruned vocabulary broadcasts (sentencepiece vocabularies are
  * ~1M pieces; the minCount prune bounds the collect by construction —
  * the d21/codebook posture), and the Viterbi DP is a per-row linear
  * pass in a mapPartitions (the CrossEncoder seam rule: imperative code
  * only where a per-row DP genuinely has no relational form; the DuckDB
  * oracle unrolls the SAME DP relationally to check it).
  *
  * Training words are capped at [[MaxWordLen]] chars (sentencepiece's
  * max-sentencepiece-length posture): longer "words" in a whitespace
  * corpus are URLs/ids the tokenizer should not spend vocabulary on.
  */
object UnigramLm {

  val MaxPiece = 4
  val MaxWordLen = 12

  /** Driver-side vocabulary cap for the EM broadcast (the codebook-
    * collect posture made LOUD): the piece map is bounded by the
    * minCount prune in practice, but a pathological corpus + tiny
    * minCount could push the collect toward driver memory — count
    * first and refuse, never OOM silently. 2M pieces ≈ a few hundred
    * MB broadcast, the practical ceiling for a driver-shipped model.
    */
  val MaxVocab = 2000000L

  /** Piecewise-linear integer log2, scale 2^16: monotone, exact, and
    * portable as pure bit arithmetic (see object doc). x >= 1.
    */
  def ilog2(x: Long): Long = {
    require(x >= 1L, s"ilog2 domain: $x")
    val len = 64 - java.lang.Long.numberOfLeadingZeros(x)
    val frac =
      if (len <= 17) (x << (17 - len)) & 0xFFFFL
      else (x >>> (len - 17)) & 0xFFFFL
    ((len - 1).toLong << 16) | frac
  }

  /** Length-capped distinct training words with corpus frequencies. */
  def trainingWords(docs: DataFrame, textCol: String): DataFrame =
    BpePairs.wordCounts(docs, textCol)
      .filter(length(col("w")) <= MaxWordLen)

  /** Seed candidate pieces: substrings (1..MaxPiece) of the training
    * words, frequency-weighted occurrence counts, pruned to
    * n >= minCount with single chars unconditionally kept.
    */
  def seedVocab(words: DataFrame, minCount: Long): DataFrame =
    words
      .select(col("c"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        s => transform(
          sequence(lit(1), least(lit(MaxPiece), length(col("w")) - s + 1)),
          l => col("w").substr(s, l))))).as("piece"))
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("n"))
      .filter(col("n") >= minCount || length(col("piece")) === 1)

  /** One Viterbi hard-EM round: returns (piece, seed_n, viterbi_n) for
    * every vocabulary piece the E-step used at least once.
    */
  def emRound(spark: SparkSession, words: DataFrame, vocab: DataFrame): DataFrame = {
    import spark.implicits._
    // bounded by the minCount prune — the codebook-collect posture,
    // counted BEFORE the collect so an unpruned vocabulary refuses
    // loudly instead of OOMing the driver
    val vocabCount = vocab.count()
    require(vocabCount <= MaxVocab,
      s"unigram emRound: vocabulary $vocabCount exceeds MaxVocab=$MaxVocab — " +
        "raise minCount (the piece map must fit a driver broadcast)")
    val pieces: Map[String, Long] = vocab.select(col("piece"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val logT = ilog2(pieces.valuesIterator.sum)
    val lp: Map[String, Long] = pieces.map { case (p, n) => p -> (ilog2(n) - logT) }
    val bc = spark.sparkContext.broadcast(lp)
    val segmented = words.select(col("w"), col("c")).as[(String, Long)]
      .mapPartitions { it =>
        val m = bc.value
        it.flatMap { case (w, c) =>
          val n = w.length
          val best = new Array[Long](n + 1)
          val back = new Array[Int](n + 1)
          java.util.Arrays.fill(back, -1)
          back(0) = 0
          var j = 1
          while (j <= n) {
            best(j) = Long.MinValue; back(j) = -1
            // i ascending with >= acceptance: the LARGEST feasible i wins
            // ties — the shortest last piece, the rule the oracle states
            var i = math.max(0, j - MaxPiece)
            while (i < j) {
              if (back(i) >= 0) {
                m.get(w.substring(i, j)) match {
                  case Some(s) if back(j) < 0 || best(i) + s >= best(j) =>
                    best(j) = best(i) + s; back(j) = i
                  case _ => ()
                }
              }
              i += 1
            }
            j += 1
          }
          if (back(n) < 0) Iterator.empty // unreachable: single chars kept
          else {
            var out = List.empty[(String, Long)]
            var k = n
            while (k > 0) { val i = back(k); out = (w.substring(i, k), c) :: out; k = i }
            out.iterator
          }
        }
      }
      .toDF("piece", "c")
      .groupBy(col("piece"))
      .agg(sum(col("c")).as("viterbi_n"))
    vocab.select(col("piece"), col("n").as("seed_n"))
      .join(segmented, "piece")
  }

  /** The full round over a text column — the gate surface. */
  def trainRound(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val words = trainingWords(docs, textCol).localCheckpoint(true)
    val vocab = seedVocab(words, minCount)
    emRound(docs.sparkSession, words, vocab)
  }
}
