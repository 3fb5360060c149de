package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpePairs, Contamination}

class BpePairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("pair counts hand-computed on a fixture: vocab-weighted, in-word multiplicity") {
    import spark.implicits._
    // "low" x2, "lower" x1, "aaa" x1: lo=3, ow=3, we=1, er=1, aa=2 ("aaa"
    // has two overlapping adjacent pairs), single-char "a" contributes none
    val docs = Seq((1L, "low lower aaa"), (2L, "low a")).toDF("doc_id", "text")
    val got = BpePairs.pairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === Map("lo" -> 3L, "ow" -> 3L, "we" -> 1L, "er" -> 1L, "aa" -> 2L))
  }

  test("vocabulary-weighted counting equals the naive corpus-level pair explode") {
    val docs = Tables.documents(spark, sfDir)
    val got = BpePairs.pairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // naive: every token occurrence explodes its own pairs
    val naive = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === naive)
  }

  test("topPairs is the (count desc, pair asc) prefix of pairCounts") {
    val docs = Tables.documents(spark, sfDir)
    val top = BpePairs.topPairs(docs, "text", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val all = BpePairs.pairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, n) => (-n, p) }.take(5).toSeq
    assert(top === all)
  }

  test("vocab: frequency-sorted ids, minCount filter, ties break lexicographically") {
    import spark.implicits._
    val docs = Seq((1L, "b b b a a c a"), (2L, "d b a")).toDF("doc_id", "text")
    // counts: a=4, b=4, c=1, d=1; minCount=2 keeps a,b; tie -> a first
    val got = graft.operators.BpePairs.vocab(docs, "text", minCount = 2L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === Seq((0L, "a", 4L), (1L, "b", 4L)))
    intercept[IllegalArgumentException] {
      graft.operators.BpePairs.vocab(docs, "text", minCount = 0L)
    }
  }

  test("applyMerge: greedy left-to-right, runs consume pairwise, loop iterates") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaa low lower")).toDF("doc_id", "text")
    val sym = graft.operators.BpePairs.symbolWords(docs, "text")
    // initial symbol pairs equal the char-pair counts (different format)
    val init = graft.operators.BpePairs.symbolPairCounts(sym)
      .collect().map(r => (r.getString(0).replace(" ", ""), r.getLong(1))).toMap
    val chars = graft.operators.BpePairs.pairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(init === chars)
    // merge (a,a): "aaaa" -> "aa aa", "aaa" -> "aa a" (greedy, no overlap)
    val m1 = graft.operators.BpePairs.applyMerge(sym, "a", "a")
      .collect().map(r => r.getString(0).trim).toSet
    assert(m1.contains("aa aa") && m1.contains("aa a"))
    assert(m1.contains("l o w") && m1.contains("l o w e r"))
    // second iteration on the merged table: top pair of m1 counts
    val after = graft.operators.BpePairs.symbolPairCounts(
      graft.operators.BpePairs.applyMerge(sym, "a", "a"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(after("aa aa") === 1L && after("aa a") === 1L)
    assert(after("l o") === 2L) // untouched words keep their pairs
    // merging (l,o) next leaves "lo w ..." sequences
    val m2 = graft.operators.BpePairs.applyMerge(
      graft.operators.BpePairs.applyMerge(sym, "a", "a"), "l", "o")
      .collect().map(r => r.getString(0).trim).toSet
    assert(m2.contains("lo w") && m2.contains("lo w e r"))
  }

  test("encodeCorpus: distinct-word segmentation joins back in token order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower low"),
      (2L, "aaaa low"),
      (3L, "   ")).toDF("doc_id", "text")
    // merges (l,o) then (lo,w): low -> [low], lower -> [low, e, r]
    val out = graft.operators.BpePairs.encodeCorpus(
      docs, "doc_id", "text", Seq(("l", "o"), ("lo", "w")))
      .orderBy("id").collect()
    assert(out.length === 2) // blank doc drops with its empty token set
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") === 3L)
    assert(r1.getAs[Long]("n_pieces") === 1L + 3L + 1L)
    // stream = "low low e r low"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("low low e r low".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r1.getAs[String]("stream_fp") === md)
    val r2 = out(1)
    // aaaa: merges don't touch it -> 4 pieces; low -> 1
    assert(r2.getAs[Long]("n_words") === 2L)
    assert(r2.getAs[Long]("n_pieces") === 5L)
  }

  test("encodeCorpus: empty merge list degenerates to per-char counts") {
    import spark.implicits._
    val docs = Seq((7L, "ab cde")).toDF("doc_id", "text")
    val r = graft.operators.BpePairs.encodeCorpus(docs, "doc_id", "text", Nil)
      .collect().head
    assert(r.getAs[Long]("n_words") === 2L && r.getAs[Long]("n_pieces") === 5L)
  }

  test("spanFlags: islands of consecutive hits, flag threshold, clean docs report zero runs") {
    import spark.implicits._
    val eval = Seq((100L, "x1 x2 x3 x4 x5 x6 y7 y8 y9")).toDF("doc_id", "text")
    val train = Seq(
      // contains the verbatim 6-token eval span x1..x6 -> windows of n=3
      // at 4 consecutive positions (runs: 4)
      (1L, "a b c x1 x2 x3 x4 x5 x6 d e"),
      // shares only a single 3-token window (x1 x2 x3) -> run 1
      (2L, "x1 x2 x3 q r s t u v"),
      // no overlap at all
      (3L, "m n o p q r")
    ).toDF("doc_id", "text")
    val got = Contamination.spanFlags(train, "doc_id", "text", eval, "text",
      n = 3, minRun = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_hit"),
        r.getAs[Long]("max_run"), r.getAs[Boolean]("flagged")))
    assert(got === Array((1L, 4L, 4L, true), (2L, 1L, 1L, false), (3L, 0L, 0L, false)))
  }

  test("spanFlags finds the planted near-copies on the corpus; max_run implies the span length") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val out = Contamination.spanFlags(
      docs.filter(col("doc_id") % 20 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 20 === 0), "text", n = 8, minRun = 8)
    val flagged = out.filter(col("flagged")).count()
    assert(flagged >= 1, "the sf0.01 corpus plants at least one near-copy across the split")
    // a run can never exceed the doc's window count, and hits bound runs
    val bad = out.filter(col("max_run") > col("n_windows") ||
      col("max_run") > col("n_hit"))
    assert(bad.isEmpty)
  }
}
