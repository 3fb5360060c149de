package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Drift

class DriftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("single source equals the corpus: drift exactly zero") {
    import spark.implicits._
    val docs = Seq((1L, "s1", "a b c"), (2L, "s1", "a a b")).toDF("doc_id", "source", "text")
    val r = Drift.bySource(docs, "source", "text").collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_tokens") === 6L)
    assert(r.head.getAs[Double]("chi2") === 0.0)
  }

  test("the skewed source scores higher than the corpus-like one; hand arithmetic") {
    import spark.implicits._
    // corpus: s1 = "a b", s2 = "a a" -> corpus counts a=3, b=1, n=4
    // s1: P=(1/2,1/2) vs Q=(3/4,1/4): chi2 = (1/4)^2/(3/4) + (1/4)^2/(1/4)
    //    = 1/12 + 1/4 = 1/3
    // s2: P=(1,0):     chi2 = (1/4)^2/(3/4) + (0-1/4)^2/(1/4)... b absent
    //    from s2's pair table -> only the a term: (1-3/4)^2/(3/4) = 1/12
    val docs = Seq((1L, "s1", "a b"), (2L, "s2", "a a")).toDF("doc_id", "source", "text")
    val r = Drift.bySource(docs, "source", "text")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("chi2")).toMap
    assert(math.abs(r("s1") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(r("s2") - 1.0 / 12.0) < 1e-6)
    // the one-sided truncation is visible through `coverage`: a source
    // missing corpus tokens reports the covered mass, and full-support
    // chi-square = chi2 + (1 - coverage)
    val docs2 = Seq((1L, "even", "x y x y"), (2L, "skew", "x x x x"))
      .toDF("doc_id", "source", "text")
    val r2 = Drift.bySource(docs2, "source", "text")
      .collect().map(x => x.getString(0) ->
        (x.getAs[Double]("chi2"), x.getAs[Double]("coverage"))).toMap
    // corpus: x=6/8, y=2/8. even covers both (1.0); skew only x (0.75)
    assert(math.abs(r2("even")._2 - 1.0) < 1e-6)
    assert(math.abs(r2("skew")._2 - 0.75) < 1e-6)
    // full-support drift: even = 1/3 + 0, skew = 1/12 + 1/4 — equal here
    val fullEven = r2("even")._1 + (1.0 - r2("even")._2)
    val fullSkew = r2("skew")._1 + (1.0 - r2("skew")._2)
    assert(math.abs(fullEven - fullSkew) < 1e-6 && math.abs(fullEven - 1.0 / 3.0) < 1e-6)
  }

  test("empty corpus refuses") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "source", "text")
    intercept[IllegalArgumentException] {
      Drift.bySource(empty, "source", "text")
    }
  }
}
