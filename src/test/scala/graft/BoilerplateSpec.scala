package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoilerplateSpec extends AnyFunSuite {

  private def run(html: String): (Int, Int, String, String) = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val r = graft.operators.Boilerplate.extract(Seq(html).toDF("html"), col("html"))
      .select("n_blocks", "n_kept", "classes", "kept_text")
      .head()
    (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))
  }

  test("hand page: nav is link-dense bad, prose is good, shorts inherit neighbors") {
    val html =
      """<html><body>
        |<div><a href="/">Home</a> <a href="/about">About</a></div>
        |<p>Readable prose goes here with the usual glue of a sentence and it flows on.</p>
        |<p>Aside.</p>
        |<p>More prose for the reader with the same glue of a sentence in it again.</p>
        |<div>promo1 promo2 promo3 promo4 promo5 promo6 promo7 promo8 promo9</div>
        |<p>Tail.</p>
        |</body></html>""".stripMargin
    val (nb, nk, classes, kept) = run(html)
    assert(nb === 6)
    assert(classes === "bad good good good bad bad")
    assert(nk === 3)
    assert(kept.startsWith("Readable prose"))
    assert(kept.contains("Aside."))
    assert(!kept.contains("Home"))
    assert(!kept.contains("promo1"))
    assert(!kept.contains("Tail."))
  }

  test("link density is measured on anchor text before stripping; attributes never count") {
    // long block, good stopword density, but half its chars are anchor text
    val linky = "<p>" + ("<a href=\"/x\">" + "click here now " * 3 + "</a>") +
      "the of and to a</p>"
    val (_, nk, classes, _) = run("<div>pad pad pad</div>" + linky)
    assert(classes.endsWith("bad"), s"linky block survived: $classes")
    assert(nk === 0)
  }

  test("stopword density separates prose from keyword stuffing at equal length") {
    val prose = "<p>the cat sat on the mat and it was glad of the sun</p>"
    val stuffing = "<p>keyword another keyword cluster spam listing catalog item entry</p>"
    assert(run(prose)._3 === "good")
    assert(run(stuffing)._3 === "bad")
  }

  test("smoothing is positional: the same short block flips with its neighbors") {
    val good = "<p>the cat sat on the mat and it was glad of the sun</p>"
    val bad = "<p>k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12</p>"
    val short1 = "<p>Note.</p>"
    assert(run(good + short1 + good)._3 === "good good good")
    assert(run(bad + short1 + bad)._3 === "bad bad bad")
    assert(run(bad + short1 + good)._3 === "bad good good")
    // edges: a leading/trailing short sees only its one neighbor
    assert(run(short1 + good)._3 === "good good")
    assert(run(short1 + bad)._3 === "bad bad")
  }

  test("tag soup is lenient: unclosed tags and empty blocks never crash, empties vanish") {
    val (nb, nk, _, kept) = run("<div><p>the of and to a in it on for is good text<div><p></p>")
    assert(nb === 1 && nk === 1)
    assert(kept.contains("good text"))
    val (nb2, nk2, _, _) = run("")
    assert(nb2 === 0 && nk2 === 0)
  }
}
