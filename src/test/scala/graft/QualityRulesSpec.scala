package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityRules

class QualityRulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private def flagsOf(text: String) = {
    import spark.implicits._
    QualityRules.gopherFlags(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 3, maxWords = 10)
      .collect().head
  }

  test("hand-computed metrics on a fixture document") {
    val r = flagsOf("the cat sat on the mat")
    assert(r.getAs[Long]("n_words") === 6L)
    // chars: 3+3+3+2+3+3 = 17 over 6 words
    assert(r.getAs[Double]("mean_word_len") === 17.0 / 6.0)
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(r.getAs[Double]("alpha_frac") === 1.0)
    assert(r.getAs[Long]("n_stop") === 1L) // only "the" (deduped)
    assert(r.getAs[Double]("dup_frac") === 1.0 / 6.0)
    assert(r.getAs[Boolean]("r_words"))
    assert(!r.getAs[Boolean]("r_mean_len")) // 2.83 < 3
    assert(!r.getAs[Boolean]("r_stop"))     // 1 < 2
    assert(!r.getAs[Boolean]("keep"))
  }

  test("each rule fires on a document violating exactly it") {
    // too few words
    assert(!flagsOf("one two").getAs[Boolean]("r_words"))
    // symbol-heavy: 2 markers over 4 words = 0.5 > 0.1
    val sym = flagsOf("see docs# for more... details and the that")
    assert(sym.getAs[Double]("symbol_ratio") > 0.1 && !sym.getAs[Boolean]("r_symbol"))
    // numeric words: 3 of 5 words lack an alphabetic char
    val num = flagsOf("12 34 56 the and")
    assert(num.getAs[Double]("alpha_frac") === 0.4)
    assert(!num.getAs[Boolean]("r_alpha"))
    // repeated token spam
    val dup = flagsOf("buy buy buy buy buy now the of")
    assert(dup.getAs[Double]("dup_frac") > 0.3 && !dup.getAs[Boolean]("r_dup"))
  }

  test("empty text yields zero counts, no division blow-up") {
    val r = flagsOf("   ")
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Double]("mean_word_len") === 0.0)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("keep is exactly the conjunction of the six rule flags on the corpus") {
    val out = QualityRules.gopherFlags(Tables.documents(spark, sfDir), "doc_id", "text")
    val bad = out.filter(col("keep") =!= (col("r_words") && col("r_mean_len") &&
      col("r_symbol") && col("r_alpha") && col("r_stop") && col("r_dup")))
    assert(bad.isEmpty)
    // the gate corpus exercises both outcomes of the word-count rule
    val keeps = out.agg(sum(when(col("r_words"), 1).otherwise(0)),
      sum(when(col("r_words"), 0).otherwise(1))).collect().head
    assert(keeps.getLong(0) > 0 && keeps.getLong(1) > 0)
  }
}
