package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mmr

/** Mmr.rerank on vectors whose quantized dots are exact round numbers,
  * so every greedy score is checkable by hand.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rerank: greedy scores, redundancy penalty against the max-selected sim") {
    import spark.implicits._
    // probe (1,0); quantized dots: rel A=1e6, B=8e5, C=6e5;
    // sim(A,B)=8e5, sim(A,C)=6e5, sim(B,C)=9.6e5
    val emb = Seq(
      (10L, Array(1.0f, 0.0f)),
      (20L, Array(0.8f, 0.6f)),
      (30L, Array(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val got = Mmr.rerank(emb, col("vec_id"), col("embedding"),
        Array(1.0f, 0.0f), poolSize = 3, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 10L, 2000000L),         // 2*rel, empty selected set
      (2L, 20L, 800000L),          // 1.6e6 - sim(B,A)=8e5 beats C's 6e5
      (3L, 30L, 240000L)))         // 1.2e6 - max(6e5, 9.6e5)
  }

  test("rerank: exact-duplicate candidates tie-break on id ascending") {
    import spark.implicits._
    val emb = Seq(
      (7L, Array(1.0f, 0.0f)), (3L, Array(1.0f, 0.0f)),
      (9L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Mmr.rerank(emb, col("vec_id"), col("embedding"),
        Array(1.0f, 0.0f), poolSize = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // step1: id 3 (tie on rel with 7 -> lower id); step2: the dup of 3
    // scores 2e6 - 1e6 = 1e6, the orthogonal 9 scores 0 -> dup wins
    assert(got.toSeq === Seq((1L, 3L), (2L, 7L)))
  }

  test("rerank: deterministic under repartitioning; picks are distinct pool members") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val emb = (1L to 200L).map(i =>
      (i, Array.fill(8)(rnd.nextInt(2000) / 1000.0f - 1.0f))).toDF("vec_id", "embedding")
    val probe = Array.fill(8)(rnd.nextInt(2000) / 1000.0f - 1.0f)
    def run(df: org.apache.spark.sql.DataFrame) =
      Mmr.rerank(df, col("vec_id"), col("embedding"), probe, poolSize = 16, k = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val a = run(emb)
    val b = run(emb.repartition(7))
    assert(a === b)
    val ids = a.map(_._2)
    assert(ids.distinct.size === 6) // no repeats ever
  }

  test("rerank: pool larger than corpus and k > survivors degrade gracefully") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Mmr.rerank(emb, col("vec_id"), col("embedding"),
      Array(1.0f, 0.0f), poolSize = 16, k = 5)
    assert(got.count() === 1)
  }
}
