package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PageRank

class PageRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def edgeDf(es: Seq[(Long, Long)]) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }

  private def ranksOf(es: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edgeDf(es), "src", "dst", iters)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"))).toMap

  test("hand-computed single edge with a dangling sink") {
    // N=2, scale=1e12: perNode=5e11, base=(5e11*15)/100=7.5e10
    // iter1: dang=5e11 (the sink's mass), dsh=2.5e11
    //   r(a) = 7.5e10 + 85*(0 + 2.5e11)/100     = 2.875e11
    //   r(b) = 7.5e10 + 85*(5e11 + 2.5e11)/100  = 7.125e11
    val got = ranksOf(Seq((1L, 2L)), iters = 1)
    assert(got === Map(1L -> 287500000000L, 2L -> 712500000000L))
    assert(got.values.sum === 1000000000000L) // no mass lost here
  }

  test("a 2-cycle is a fixed point: both nodes keep exactly perNode") {
    val got = ranksOf(Seq((1L, 2L), (2L, 1L)), iters = 7)
    assert(got === Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("star graph: the hub out-ranks every leaf; iters=0 is uniform") {
    val star = Seq((1L, 99L), (2L, 99L), (3L, 99L), (4L, 99L))
    val r0 = ranksOf(star, iters = 0)
    assert(r0.values.toSet === Set(1000000000000L / 5))
    val r3 = ranksOf(star, iters = 3)
    assert(Seq(1L, 2L, 3L, 4L).forall(l => r3(99L) > r3(l)))
    // leaves are symmetric -> identical ranks
    assert(Seq(r3(1L), r3(2L), r3(3L), r3(4L)).distinct.size === 1)
  }

  test("deterministic under repartitioning and duplicate input edges") {
    import spark.implicits._
    val es = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val a = ranksOf(es, iters = 4)
    val dup = (es ++ es ++ es).toDF("src", "dst").repartition(7)
    val b = PageRank.run(dup, "src", "dst", iters = 4)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"))).toMap
    assert(a === b)
  }

  test("floor rounding only ever loses mass: total rank never exceeds scale") {
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 2L), (6L, 3L), (7L, 3L))
    val total = ranksOf(es, iters = 5).values.sum
    assert(total <= 1000000000000L)
    assert(total > 900000000000L) // and losses stay tiny (sub-ppm per step)
  }
}
