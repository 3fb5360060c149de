package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.C4Filters

class C4FiltersSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private def pageOf(text: String) =
    C4Filters.page(Seq((1L, text)).toDF("id", "text"), "id", "text")
      .select("n_lines", "n_kept", "has_brace", "has_lorem", "keep_page", "cleaned")
      .head()

  test("line rules: terminal punctuation, 5 words, no javascript") {
    val page = Seq(
      "this line ends with a period.",      // keep
      "this one has a bang and words!",     // keep
      "no terminal punctuation here",       // drop: punctuation
      "too short.",                         // drop: < 5 words
      "a line mentioning JavaScript sadly ends well.", // drop: javascript
      "the final line is quoted speech.\""  // keep (quote terminal)
    ).mkString("\n")
    val r = pageOf(page)
    assert((r.getLong(0), r.getLong(1)) === ((6L, 3L)))
    assert(r.getBoolean(4), "3 kept lines should keep the page")
    assert(r.getString(5) ===
      "this line ends with a period.\nthis one has a bang and words!\nthe final line is quoted speech.\"")
  }

  test("page rules: brace, lorem ipsum, and the 3-line floor each drop the page") {
    val three = "one good line right here.\nanother good line right here.\na third good line right here."
    assert(pageOf(three).getBoolean(4))
    assert(!pageOf(three + "\ncode { inside }").getBoolean(4))
    assert(!pageOf(three + "\nLorem Ipsum filler text.").getBoolean(4))
    val two = "one good line right here.\nanother good line right here."
    val r = pageOf(two)
    assert(!r.getBoolean(4) && r.isNullAt(5), "dropped page has no cleaned form")
  }

  test("whole pass is per-row: no exchange in the plan") {
    val df = C4Filters.page(Seq((1L, "x.")).toDF("id", "text"), "id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"C4 pass grew a shuffle:\n$plan")
    assert(!plan.contains("Generate"), s"C4 pass should not explode:\n$plan")
  }
}
