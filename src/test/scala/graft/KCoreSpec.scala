package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

class KCoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def coreOf(es: Seq[(Long, Long)], k: Int,
                     maxRounds: Int = 12): Map[Long, Long] = {
    import spark.implicits._
    KCore.kCore(es.toDF("s", "d"), "s", "d", k, maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // K4 on {1,2,3,4} with a pendant chain 4-5-6
  private val k4chain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  test("hand-computed cores: pendant chain peels in cascade, clique survives") {
    // k=2: 6 goes (deg 1), then 5 (deg 1 after) — two cascading rounds
    assert(coreOf(k4chain, 2) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=3: same core; 4's chain edge never counted in the final degrees
    assert(coreOf(k4chain, 3) ===
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // k=4: K4 has min degree 3 -> empty core
    assert(coreOf(k4chain, 4) === Map.empty)
  }

  test("direction, duplicates and self-loops do not matter") {
    val messy = k4chain ++ k4chain.map(_.swap) ++ Seq((3L, 3L), (6L, 6L))
    assert(coreOf(messy, 3) === coreOf(k4chain, 3))
  }

  test("fixpoint property: every output degree >= k and recomputing on the core is a no-op") {
    val rnd = new scala.util.Random(97)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val core = coreOf(es, 3)
    assert(core.values.forall(_ >= 3L))
    // induced-subgraph degrees of the kept nodes match the reported ones
    val und = es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val kept = core.keySet
    val deg = kept.map(n => n ->
      und.count { case (a, b) => (a == n && kept(b)) || (b == n && kept(a)) }.toLong)
      .toMap
    assert(deg === core)
    // the core IS its own k-core
    val again = coreOf(und.toSeq.filter { case (a, b) => kept(a) && kept(b) }, 3)
    assert(again === core)
  }

  test("refuses loudly instead of returning a non-fixpoint when rounds run out") {
    // a 12-node path at k=2 peels one endpoint pair per round: needs 6
    // rounds, so maxRounds=3 must refuse
    val path = (1L to 11L).map(i => (i, i + 1))
    val e = intercept[IllegalStateException] { coreOf(path, 2, maxRounds = 3) }
    assert(e.getMessage.contains("did not converge"))
    // with enough rounds the path dissolves to an empty core
    assert(coreOf(path, 2, maxRounds = 12) === Map.empty)
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val es = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val df = es.toDF("s", "d")
    val a = KCore.kCore(df, "s", "d", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = KCore.kCore(df.repartition(7), "s", "d", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }
}
