package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CrossEncoder, NeuralEmbed}
import graft.operators.NeuralEmbed.NeuralModel

class CrossEncoderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("score: exact integer forward pass with ReLU clamp, hand-computed") {
    // d0=2, d1=2, dOut=1, hand weights:
    //   h0 = ReLU(1*x0 + -2*x1 + 3);  h1 = ReLU(2*x0 + 0*x1 + -1)
    //   y  = 5*h0 + -4*h1 + 7
    val m = NeuralModel(2, 2, 1,
      w1 = Array(1, -2, 2, 0), b1 = Array(3, -1),
      w2 = Array(5, -4), b2 = Array(7))
    // x = (2, 4): h0 = ReLU(2 - 8 + 3) = 0; h1 = ReLU(4 - 1) = 3
    // y = 0 - 12 + 7 = -5
    assert(CrossEncoder.score(m, Array(2L, 4L)) === -5L)
    // x = (0, 0): bias-only path — h0 = 3, h1 = 0 -> y = 15 + 0 + 7 = 22
    assert(CrossEncoder.score(m, Array(0L, 0L)) === 22L)
  }

  test("interaction features: bag semantics, additivity over doc tokens, pair sensitivity") {
    val q = Array("alpha", "beta")
    val d = Array("x", "y", "z")
    val f = CrossEncoder.interactionFeatures(q, d, 16)
    // 2 x 3 = 6 signed increments in total
    assert(f.map(math.abs).sum <= 6L && f.map(math.abs).sum >= 1L)
    // token ORDER is irrelevant on both sides (a bag of pairs)
    assert(CrossEncoder.interactionFeatures(q.reverse, d.reverse, 16).toSeq === f.toSeq)
    // additive over doc-token multisets (occurrence pairs, not distinct)
    val f1 = CrossEncoder.interactionFeatures(q, Array("x"), 16)
    val f2 = CrossEncoder.interactionFeatures(q, Array("y", "z"), 16)
    assert(f1.zip(f2).map { case (a, b) => a + b }.toSeq === f.toSeq)
    // CROSS sensitivity: the pair hash sees the query side, so changing
    // the query changes features even for the same doc
    assert(CrossEncoder.interactionFeatures(Array("gamma"), d, 16).toSeq !==
      CrossEncoder.interactionFeatures(Array("alpha"), d, 16).toSeq)
  }

  test("rerank: BM25 pool gates membership; scores equal the direct forward pass") {
    import spark.implicits._
    val model = NeuralEmbed.generate(64, 16, 1)
    val docs = Seq(
      (1L, "spark joins the batch window fast"),
      (2L, "spark spark spark window window merge"),
      (3L, "the quick brown fox has no relevant terms"), // no query term
      (4L, "query merge batch spark join window"),
      (5L, "window"),
      (6L, "merge batch")).toDF("doc_id", "text")
    val query = "spark window merge"
    val got = CrossEncoder.rerank(docs, "doc_id", "text", query, model,
      nCandidates = 5, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length === 3)
    // doc 3 matches no query term: BM25 never nominates it
    assert(!got.map(_._1).contains(3L))
    // every returned score equals the direct integer forward pass
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val qt = CrossEncoder.tokens(query)
    got.foreach { case (id, s) =>
      val expect = CrossEncoder.score(model,
        CrossEncoder.interactionFeatures(qt, CrossEncoder.tokens(texts(id)), 64))
      assert(s === expect, s"doc $id")
    }
    // ordered by score desc then id
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq)
  }
}
