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

  private def triOf(es: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    graft.operators.Triangles.perNode(es.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("personalized: teleport mass (restart + dangling) flows only to the seeds") {
    // graph 1->2, 1->4, 2->3, 3->1; node 4 dangles; seed {1}; scale 1e6:
    // perSeed=1e6, base=150000; r0 = (1e6, 0, 0, 0)
    // iter1: dang=0; r=(150000, 425000, 0, 425000)
    // iter2: dang=425000 -> all of it back to seed 1:
    //   r(1)=150000+85*(0+425000)/100=511250, r(2)=85*75000/100=63750,
    //   r(3)=85*425000/100=361250, r(4)=63750
    val es = Seq((1L, 2L), (1L, 4L), (2L, 3L), (3L, 1L))
    val got = PageRank.personalized(edgeDf(es), "src", "dst",
        seedPred = col("node") === 1L, iters = 2, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"))).toMap
    assert(got === Map(1L -> 511250L, 2L -> 63750L, 3L -> 361250L, 4L -> 63750L))
    // a node unreachable from the seeds holds exactly zero forever
    val far = PageRank.personalized(edgeDf(es :+ ((9L, 8L))), "src", "dst",
        seedPred = col("node") === 1L, iters = 2, scale = 1000000L)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rank"))).toMap
    assert(far(9L) === 0L && far(8L) === 0L)
  }

  test("triangles: hand-computed counts on fixtures") {
    // K4 minus edge (3,4): triangles {1,2,3} and {1,2,4}
    val k4m = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(triOf(k4m) === Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // a star has no triangles
    assert(triOf(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) === Map.empty)
    // direction, duplicates and self-loops do not matter
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 3L), (3L, 2L))
    assert(triOf(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangles: degree-oriented count equals the brute-force triple count on a random graph") {
    val rnd = new scala.util.Random(23)
    val es = Seq.fill(160)((rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .filter { case (a, b) => a != b }
    val got = triOf(es)
    // brute force over canonical edge set
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var expect = Map.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if und((i, j)) && und((j, k)) && und((i, k))
    } Seq(i, j, k).foreach(n => expect += n -> (expect(n) + 1L))
    assert(got === expect.filter(_._2 > 0))
    assert(got.values.sum % 3 === 0 && got.values.sum > 0)
  }

  test("triangles: bucketed physical design is result-identical to the declarative plan") {
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val es = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val df = es.toDF("s", "d")
    val declarative = triOf(es)
    val bucketed = graft.operators.Triangles.perNodeBucketed(df, "s", "d",
      table = "graft_tri_spec", path = "/tmp/graft_tri_spec", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bucketed === declarative)
    // overwrite-idempotent: a second build over the same table name works
    val again = graft.operators.Triangles.perNodeBucketed(df, "s", "d",
      table = "graft_tri_spec", path = "/tmp/graft_tri_spec", buckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === declarative)
  }

  test("g8 sampling: md5-threshold survivors are deterministic and the 8x estimator is triangle-count arithmetic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // dense-ish random graph so the sample holds triangles
    val rnd = new scala.util.Random(5)
    val es = Seq.fill(400)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val df = es.toDF("p1", "p2")
    val keep = expr("cast(conv(substring(md5(concat('tri:', " +
      "cast(p1 as string), ':', cast(p2 as string))), 1, 1), 16, 10) as int) < 8")
    val kept = df.filter(keep).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // deterministic (pure function of the edge): repartition changes nothing
    val kept2 = df.repartition(7).filter(keep).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === kept2)
    // roughly half survive (p = 1/2 over the hash's first nibble)
    assert(kept.size > es.size / 4 && kept.size < es.size * 3 / 4,
      s"${kept.size} of ${es.size} survived")
    // the estimator is EXACTLY 8x the surviving triangle count
    def tris(edges: Set[(Long, Long)]): Long = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      (for {
        i <- nodes; j <- nodes if j > i; k <- nodes if k > j
        if edges((i, j)) && edges((j, k)) && edges((i, k))
      } yield 1L).sum
    }
    val sampledTris = tris(kept)
    val sparkSampled = graft.operators.Triangles.perNode(df.filter(keep), "p1", "p2")
      .agg(expr("sum(n_tri) div 3")).head().getLong(0)
    assert(sparkSampled === sampledTris)
    assert(sampledTris * 8 === sparkSampled * 8) // the estimator arithmetic
  }
}
