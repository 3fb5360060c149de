package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextLm

class TextLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private def textDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bigramProbScore: hand-computed corpus-conditional probabilities") {
    // bigram occurrences: "a b" x3, "b a" x1, "b c" x1
    // prefixes: a -> 3, b -> 2; p(a b)=1, p(b a)=0.5, p(b c)=0.5
    val docs = textDf((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
    val got = TextLm.bigramProbScore(docs, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.length === 2) // doc 3 has no bigrams -> unscorable
    assert(got(0)._1 === 1L && got(0)._2 === 3L)
    assert(math.abs(got(0)._3 - (1.0 + 0.5 + 1.0) / 3) < 1e-9)
    assert(got(1)._1 === 2L && got(1)._2 === 2L)
    assert(math.abs(got(1)._3 - 0.75) < 1e-9)
  }

  test("per-prefix probabilities sum to exactly 1 on the gate corpus") {
    val docs = Tables.documents(spark, sfDir)
    val bg = docs.select(
      explode(graft.functions.TextFunctions.word_shingles(col("text"), 2)).as("bg"))
    val c2 = bg.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val sums = c2
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("c1", sum(col("c2")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .groupBy(col("w1"))
      .agg(sum(col("c2").cast("double") / col("c1")).as("psum"))
      .collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"prefix ${r.getString(0)} probabilities sum to ${r.getDouble(1)}"))
  }

  test("bigramLogLikelihood matches a local recomputation within tolerance") {
    val docs = textDf((1L, "x y x y z"), (2L, "x y"), (3L, "y z x"))
    val got = TextLm.bigramLogLikelihood(docs, "doc_id", "text")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // local model over all bigram occurrences
    val all = Seq("x y", "y x", "x y", "y z", "x y", "y z", "z x")
    val c2 = all.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    val c1 = all.map(_.split(" ")(0)).groupBy(identity).view
      .mapValues(_.size.toDouble).toMap
    def ll(bgs: Seq[String]) =
      bgs.map(b => math.log(c2(b) / c1(b.split(" ")(0)))).sum / bgs.size
    assert(math.abs(got(1L) - ll(Seq("x y", "y x", "x y", "y z"))) < 1e-12)
    assert(math.abs(got(2L) - ll(Seq("x y"))) < 1e-12)
    assert(math.abs(got(3L) - ll(Seq("y z", "z x"))) < 1e-12)
  }

  test("perplexityBuckets: thirds per lang, value-thresholded, partition-invariant") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.operators.TextLm.perplexityBuckets(docs, "doc_id", "text", "lang")
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // score ordering between buckets: head.min >= middle.max boundary can
    // touch only via the shared threshold value; strict ordering on maxes
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val m = rs.map(r => r._2 -> r).toMap
      for (h <- m.get("head"); mid <- m.get("middle")) {
        assert(h._4 >= mid._5, s"$lang head.min >= middle.max")
      }
      for (mid <- m.get("middle"); t <- m.get("tail")) {
        assert(mid._4 > t._5, s"$lang middle.min > tail.max")
      }
      // bucket sizes are near-thirds of the lang's scored docs
      val n = rs.map(_._3).sum
      rs.foreach(r => assert(r._3 <= n, s"$lang sane sizes"))
      if (rs.size == 3) {
        val head = m("head")._3
        assert(head >= n / 3 && head <= n, s"$lang head >= third")
      }
    }
    // deterministic under repartitioning
    val b = graft.operators.TextLm.perplexityBuckets(
      docs.repartition(9), "doc_id", "text", "lang")
      .orderBy("lang", "bucket").collect().toSeq
    assert(out.orderBy("lang", "bucket").collect().toSeq === b)
  }
}
