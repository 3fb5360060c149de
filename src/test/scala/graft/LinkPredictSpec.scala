package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LinkPredict

class LinkPredictSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("commonNeighbors: non-adjacent pair scored, adjacent pairs excluded, exact jaccard ppm") {
    import spark.implicits._
    // diamond: 1-2, 1-3, 2-3, 2-4, 3-4. The only non-adjacent pair is
    // (1,4) with common neighbors {2,3}: cn=2, deg=2 and 2,
    // jaccard = 2/(2+2-2) = 1 -> 1000000 ppm
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val got = LinkPredict.commonNeighbors(edges, "a", "b", k = 10).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((1L, 4L, 2L, 2L, 2L, 1000000L)))
  }

  test("commonNeighbors: refuses the hub-quadratic regime loudly") {
    import spark.implicits._
    // a 60-leaf star: 60*59/2 = 1770 wedges through the hub
    val star = (1L to 60L).map(i => (0L, i)).toDF("a", "b")
    val ex = intercept[IllegalArgumentException] {
      LinkPredict.commonNeighbors(star, "a", "b", k = 5,
        maxWedgeEstimate = 1000L).collect()
    }
    assert(ex.getMessage.contains("maxWedgeEstimate"))
  }
}
