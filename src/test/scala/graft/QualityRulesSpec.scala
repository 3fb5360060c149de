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

  private def repOf(text: String) = {
    import spark.implicits._
    QualityRules.repetitionSignals(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
  }

  test("repetition: hand-computed line + top-gram fractions") {
    // 4 lines, "a b" twice: dup_line_frac = 1/4; chars: lines are
    // "a b"(3)x2, "c d"(3), "e f g"(5) -> all=14, distinct=11, dup char 3/14
    val r = repOf("a b\nc d\na b\ne f g")
    assert(r.getAs[Long]("n_lines") === 4L)
    assert(r.getAs[Double]("dup_line_frac") === 0.25)
    assert(r.getAs[Double]("dup_line_char_frac") === 3.0 / 14.0)
    // tokens: a b c d a b e f g (17 chars joined); top bigram "a b" (len 3)
    // occurs 2x -> 6/17; top trigram count 1, tie-break largest gram
    // "e f g" (len 5) -> 5/17
    assert(r.getAs[Double]("top2_char_frac") === 6.0 / 17.0)
    assert(r.getAs[Double]("top3_char_frac") === 5.0 / 17.0)
    assert(!r.getAs[Boolean]("r_top2") && r.getAs[Boolean]("r_dup_line"))
    assert(!r.getAs[Boolean]("keep"))
  }

  test("repetition: blank lines dropped; single line is duplicate-free") {
    val r = repOf("  \n\nonly one line here\n   \n")
    assert(r.getAs[Long]("n_lines") === 1L)
    assert(r.getAs[Double]("dup_line_frac") === 0.0)
    assert(r.getAs[Double]("dup_line_char_frac") === 0.0)
  }

  test("repetition: empty text yields zeros, keep=true (nothing repeats)") {
    val r = repOf("   ")
    assert(r.getAs[Long]("n_lines") === 0L)
    assert(r.getAs[Double]("top2_char_frac") === 0.0)
    assert(r.getAs[Boolean]("keep"))
  }

  test("repetition: top-gram tie-break picks the lexicographically largest gram") {
    // bigrams: "z z", "z a", "a b" each once -> pick "z z" (c desc, g desc)
    val r = repOf("z z a b")
    // "z z" len 3, 7 chars total
    assert(r.getAs[Double]("top2_char_frac") === 3.0 / 7.0)
  }

  test("repetition: a dominant repeated gram pushes top2 past its threshold") {
    val r = repOf("spam ham spam ham spam ham spam ham unique tail")
    assert(r.getAs[Double]("top2_char_frac") > 0.2)
    assert(!r.getAs[Boolean]("r_top2"))
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
