package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.misra_gries

/** Exact top-k frequent tokens via the two-pass sketch-then-recount shape
  * (Misra–Gries candidates -> exact recount of candidates only), the
  * standard way to get EXACT heavy hitters without ever shuffling the
  * full vocabulary.
  *
  * Why not `groupBy(token).count().orderBy(...).limit(k)`: that shuffles
  * one row per distinct token. Web-scale corpora have effectively
  * unbounded vocabularies (typos, ids, urls — the long tail is most of
  * the distinct mass), so at 100 TB the exact single-pass aggregation is
  * itself the bottleneck. Here:
  *
  *  pass 1: misra_gries(token, sketchK) — a fixed sketchK-entry buffer
  *    per partition, map-side combined; the shuffle is `partitions x
  *    sketchK` rows total, vocabulary-independent. Candidates are a
  *    guaranteed SUPERSET of every token with count > N/(sketchK+1)
  *    (Misra & Gries 1982; merge bounds Agarwal et al. 2012).
  *  pass 2: recount ONLY the candidates exactly (an isin filter pushed
  *    into the scan side), take top-k with (count desc, token asc)
  *    tie-break. The aggregation now has <= sketchK groups.
  *
  * Exactness gate: the returned k-th count must clear the sketch's
  * blind spot — any token OUTSIDE the candidate set has true count
  * <= N/(sketchK+1), so `kth count > N/(sketchK+1)` proves no missed
  * token could displace the returned top-k (ties at the boundary
  * excepted, which the strict inequality excludes). If the corpus is too
  * flat for the configured sketchK, the operator REFUSES loudly naming
  * the bound and the sketchK that would cover it — the same
  * guard-don't-guess posture as the d2 pair-volume cap.
  *
  * Tokenization is the engine's canonical whitespace split of lowercased
  * text with empties dropped (the BM25/t1 convention).
  */
object HeavyHitters {

  def topTokens(docs: DataFrame, textCol: String, k: Int,
                sketchK: Int = 256): DataFrame = {
    require(k >= 1 && sketchK > k,
      s"heavy_hitters: need sketchK > k >= 1, got k=$k sketchK=$sketchK")

    val toks = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "")

    // pass 1: the sketch (one scan; the summary carries N and whether
    // any eviction ever fired — if none did, the counters are exact and
    // the items are the complete vocabulary)
    val sk = toks
      .agg(misra_gries(col("token"), sketchK).as("mg"))
      .head().getStruct(0)
    val n = sk.getLong(2)
    if (n == 0L) return emptyResult(toks)
    val evicted = sk.getBoolean(1)
    val candidates: Seq[String] =
      sk.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val blind = n.toDouble / (sketchK + 1)
    require(candidates.nonEmpty,
      f"heavy_hitters: the sketch evicted every candidate (corpus too flat: " +
        f"no token exceeds N/(sketchK+1) = $blind%.1f of N=$n); raise sketchK")

    // pass 2: exact recount of candidates only (<= sketchK literals —
    // an In filter the scan prunes on), exact top-k
    val top = toks
      .filter(col("token").isInCollection(candidates))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
      .collect()

    // exactness gate (only needed if the sketch ever evicted — otherwise
    // the candidate set IS the vocabulary): the smallest returned count
    // must beat the largest count a non-candidate token could carry,
    // whether it would displace the k-th entry or fill an empty slot
    if (evicted) {
      val kth = top.last.getLong(1)
      require(top.length == k && kth > blind,
        f"heavy_hitters: tail count $kth (of ${top.length} returned) is not " +
          f"above the sketch blind spot N/(sketchK+1) = $blind%.1f — a missed " +
          f"token could tie or displace the tail; raise sketchK above " +
          f"${n / math.max(kth, 1L)} (corpus too flat for exact " +
          "top-k at this sketch size)")
    }

    val spark = docs.sparkSession
    import spark.implicits._
    spark.createDataset(top.map(r => (r.getString(0), r.getLong(1))).toSeq)
      .toDF("token", "cnt")
      .orderBy(col("cnt").desc, col("token").asc)
  }

  private def emptyResult(toks: DataFrame): DataFrame =
    toks.groupBy(col("token")).agg(count(lit(1)).as("cnt")).limit(0)
}
