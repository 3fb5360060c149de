package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("ilog2: exact anchors, monotone, 16-bit fraction") {
    assert(UnigramLm.ilog2(1L) === 0L)
    assert(UnigramLm.ilog2(2L) === 65536L)
    assert(UnigramLm.ilog2(3L) === 65536L + 32768L) // 1.5 in 16-bit fixed point
    assert(UnigramLm.ilog2(4L) === 2L * 65536L)
    assert(UnigramLm.ilog2(1L << 17) === 17L * 65536L)
    assert(UnigramLm.ilog2((1L << 20) + (1L << 19)) === 20L * 65536L + 32768L)
    assert(UnigramLm.ilog2(Long.MaxValue) === 62L * 65536L + 65535L) // 63-bit value
    // strictly monotone where the 16-bit grid resolves, never decreasing
    var prev = -1L
    for (x <- 1L to 5000L) {
      val v = UnigramLm.ilog2(x)
      assert(v >= prev, s"ilog2 decreased at $x")
      prev = v
    }
    assert(UnigramLm.ilog2(100L) < UnigramLm.ilog2(200L))
  }

  test("Viterbi round: hand-computed segmentation on a 3-word corpus") {
    import spark.implicits._
    // corpus: "abab" x4, "ab" x6, "cd" x2 (as documents)
    val docs = (Seq.fill(4)("abab") ++ Seq.fill(6)("ab") ++ Seq.fill(2)("cd"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val words = UnigramLm.trainingWords(docs, "text")
    // seed with minCount 1: vocab = all substrings
    val vocab = UnigramLm.seedVocab(words, 1L)
    val v = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // counts: a: abab has 2 a's *4 + ab has 1 *6 = 14; ab: 2*4+6=14;
    // aba: 1*4=4; abab: 4; b: 14; ba: 4; bab: 4; c: 2; cd: 2; d: 2
    assert(v === Map("a" -> 14L, "ab" -> 14L, "aba" -> 4L, "abab" -> 4L,
      "b" -> 14L, "ba" -> 4L, "bab" -> 4L, "c" -> 2L, "cd" -> 2L, "d" -> 2L))
    val out = UnigramLm.emRound(spark, words, vocab)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "abab": 1 piece (lp(abab)) beats any 2-piece split (each lp < 0,
    // two of them sum lower); "ab" -> "ab" (lp(ab) > lp(a)+lp(b));
    // "cd" -> "cd" likewise. Viterbi counts: abab:4, ab:6, cd:2.
    assert(out === Map("abab" -> ((4L, 4L)), "ab" -> ((14L, 6L)), "cd" -> ((2L, 2L))))
  }

  test("tie rule: equal scores resolve to the shortest last piece") {
    import spark.implicits._
    // exact tie for word "xx": score("xx") == score("x","x") iff
    // ilog2(n_xx) - ilog2(T) == 2*(ilog2(n_x) - ilog2(T)) with
    // T = n_x + n_xx. Find such counts numerically from ilog2 itself
    // (the tie condition is about the fixed-point log grid, so a
    // searched witness is sturdier than hand-juggled bit arithmetic).
    val grid = for {
      nx <- 1L to 64L; nxx <- 1L to 64L
      t = nx + nxx
      if UnigramLm.ilog2(nxx) - UnigramLm.ilog2(t) ==
        2L * (UnigramLm.ilog2(nx) - UnigramLm.ilog2(t))
    } yield (nx, nxx)
    assert(grid.nonEmpty, "no exact tie in the grid — widen the search")
    val (nx, nxx) = grid.head
    val words = Seq(("xx", 1L)).toDF("w", "c")
    val tieVocab = Seq(("x", nx), ("xx", nxx)).toDF("piece", "n")
    val out = UnigramLm.emRound(spark, words, tieVocab)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // shortest LAST piece on a tie: "x","x" (last piece "x") beats "xx"
    assert(out === Map("x" -> 2L), s"tie at (nx=$nx, nxx=$nxx) broke the wrong way: $out")
  }

  test("coverage property: segmented piece lengths reassemble every training word") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val words = UnigramLm.trainingWords(docs, "text").localCheckpoint(true)
    val vocab = UnigramLm.seedVocab(words, 50L)
    val seg = UnigramLm.emRound(spark, words, vocab)
    val segChars = seg.select(sum(length(col("piece")) * col("viterbi_n")))
      .head().getLong(0)
    val wordChars = words.select(sum(length(col("w")) * col("c"))).head().getLong(0)
    assert(segChars === wordChars,
      "Viterbi segmentations must cover every character exactly once")
  }
}
