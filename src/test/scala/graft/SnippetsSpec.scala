package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Snippets

class SnippetsSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  import spark.implicits._

  private val terms = Seq("spark", "join")

  private def one(text: String, w: Int = 5): Option[(Long, Long, Long, String)] = {
    val rows = Snippets.bestWindow(Seq((1L, text)).toDF("id", "text"),
      "id", "text", terms, w)
      .select("n_hits", "best_hits", "best_pos", "snippet").collect()
    rows.headOption.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
  }

  test("hand cases: leftmost max window, end clipping, zero hits dropped") {
    // hits at 1, 3, 7: window w=5 anchored at 1 holds {1,3}; at 3 holds
    // {3,7}; tie at 2 hits -> LEFTMOST anchor 1
    assert(one("spark a join b c d spark x") ===
      Some((3L, 2L, 1L, "spark a join b c")))
    // all hits at the tail: snippet clips at the text end
    assert(one("a b c d e f spark join") ===
      Some((2L, 2L, 7L, "spark join")))
    // a later DENSER window must win over the earlier sparse one
    assert(one("spark a b c d e f join spark join x") ===
      Some((4L, 3L, 8L, "join spark join x")))
    assert(one("no terms here at all") === None)
  }

  test("kernel == HOF formulation on corpus text (the differential)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val q = Seq("spark", "join", "merge", "window")
    val kernel = Snippets.bestWindow(docs, "doc_id", "text", q, w = 12)
      .select("doc_id", "n_hits", "best_hits", "best_pos", "snippet")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
    val hof = Snippets.bestWindowHof(docs, "doc_id", "text", q, w = 12)
      .select("doc_id", "n_hits", "best_hits", "best_pos", "snippet")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4))).sortBy(_._1).toSeq
    assert(kernel.nonEmpty && kernel === hof)
  }
}
