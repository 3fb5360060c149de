package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LabelProp

class LabelPropSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lab(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    LabelProp.run(edges.toDF("a", "b"), "a", "b", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // triangle {1,2,3} + disconnected pair {4,5}
  private val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L))

  test("hand-computed 3 rounds: triangle converges to min label, pair oscillates") {
    // r1: 1->2, 2->1, 3->1, 4->5, 5->4
    // r2: 1->1, 2->1, 3->1, 4->4, 5->5
    // r3: triangle stable at 1; the bipartite pair swaps again — the
    //     documented synchronous-LPA oscillation the fixed-round
    //     contract exists for
    assert(lab(tri, 3) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 5L, 5L -> 4L))
    assert(lab(tri, 4) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }

  test("plurality wins over min label; ties break to the smallest label") {
    // node 1 sees labels {2, 3}: tie -> 2. node 9's neighbors after r1
    // are a plurality case: 9-2, 9-3, 9-4 with 2,3,4 leaves of 9 is
    // symmetric; instead pin plurality directly on a 1-round star:
    // node 5 adjacent to 6,7,8 -> labels {6,7,8}, tie -> 6
    val star = Seq((5L, 6L), (5L, 7L), (5L, 8L))
    val r1 = lab(star, 1)
    assert(r1(5L) === 6L) // min-label tie-break
    assert(r1(6L) === 5L && r1(7L) === 5L && r1(8L) === 5L)
    // plurality: node 1 adjacent to 2,3,4; 3 and 4 also adjacent to
    // each other and to 2 — after round 1 the label counts at node 1
    // are a strict plurality, not a tie
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    val r2 = lab(g, 2)
    // r1: 1->2 (tie of 2,3,4), 2->1, 3->1, 4->1 (ties), then r2: node 1
    // sees {1,1,1} -> strict plurality 1
    assert(r2(1L) === 1L)
  }

  test("deterministic under repartitioning and duplicate input edges") {
    val base = lab(tri, 3)
    val dup = tri ++ tri ++ tri.map { case (a, b) => (b, a) }
    val got = LabelProp.run(dup.toDF("a", "b").repartition(7), "a", "b", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === base)
  }

  test("refuses out-of-contract round counts") {
    intercept[IllegalArgumentException] { lab(tri, 0) }
    intercept[IllegalArgumentException] { lab(tri, 17) }
  }
}
