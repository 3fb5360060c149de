package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Keywords

class KeywordsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("hand-computed RAKE: degrees, quantized scores, tie order") {
    val df = Seq((1L, "red apples and green apples in the basket of red fruit"))
      .toDF("doc_id", "text")
    // chunks: "red apples", "green apples", "basket", "red fruit"
    // red: freq 2, deg 4 -> 2.0; apples: 2/4 -> 2.0; green: 1/2 -> 2.0;
    // fruit: 1/2 -> 2.0; basket: 1/1 -> 1.0
    // phrase scores: the three 2-word phrases 4e9 each, basket 1e9;
    // ties break on phrase asc
    val got = Keywords.topKeywords(df, "doc_id", "text", k = 3)
      .orderBy($"rnk")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      (1L, "green apples", 4000000000L),
      (2L, "red apples", 4000000000L),
      (3L, "red fruit", 4000000000L)))
  }

  test("phrase extraction: stopword runs, boundaries, maxWords drop, substrings") {
    val df = Seq(
      (1L, "the quick brown fox of the lazy dog"),
      (2L, "theory is a word with the inside it"), // 'the' inside 'theory' survives
      (3L, "a an of to and"),                      // all stopwords -> nothing
      (4L, "one two three four exceeds at limit")) // 4-word run dropped
      .toDF("doc_id", "text")
    val got = Keywords.phrases(df, "doc_id", "text", maxWords = 3)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.contains((1L, "quick brown fox")))
    assert(got.contains((1L, "lazy dog")))
    assert(got.contains((2L, "theory")))
    assert(got.contains((2L, "word")))
    assert(got.contains((2L, "inside")))
    assert(!got.exists(_._1 == 3L))
    assert(got.contains((4L, "limit")))
    assert(!got.exists { case (id, p) => id == 4L && p.contains("one") })
  }

  test("deterministic under repartitioning; refuses degenerate k") {
    val docs = (1L to 50L)
      .map(i => (i, s"alpha beta w$i and gamma delta of w${i % 7} epsilon"))
      .toDF("doc_id", "text")
    val a = Keywords.topKeywords(docs, "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    val b = Keywords.topKeywords(docs.repartition(7), "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    assert(a === b)
    intercept[IllegalArgumentException] {
      Keywords.topKeywords(docs, "doc_id", "text", 0)
    }
  }

  test("tfidf: quantized idf, tf weighting, tie-break on term asc") {
    import spark.implicits._
    // N=3; df: a=2, b=2, c=2, z=1 -> idf_q: 1500000 for df=2, 3000000 for z
    // d1 scores: a = 2*1.5e6 = 3e6, z = 1*3e6 = 3e6 (tie -> 'a' first), b = 1.5e6
    val docs = Seq((1L, "a a b z"), (2L, "a c"), (3L, "b c c"))
      .toDF("doc_id", "text")
    val got = graft.operators.TfIdf.topTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.filter(_._1 == 1L).toSeq === Seq(
      (1L, 1L, "a", 3000000L), (1L, 2L, "z", 3000000L)))
    // d3: c = 2*1.5e6 = 3e6 over b = 1.5e6
    assert(got.filter(_._1 == 3L).toSeq === Seq(
      (3L, 1L, "c", 3000000L), (3L, 2L, "b", 1500000L)))
  }
}
