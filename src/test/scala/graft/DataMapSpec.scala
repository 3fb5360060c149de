package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DataMap

class DataMapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("clusterLabels: hand-computed cluster tf-idf; distinctive terms beat shared ones") {
    import spark.implicits._
    // "common" appears in BOTH clusters (df = 2 -> idf quantum 1e6);
    // "alpha"/"beta" in one each (df = 1 -> quantum 2e6)
    val docs = Seq(
      (1L, "common alpha alpha"),
      (2L, "common  ALPHA"), // lowercased, multi-space split
      (3L, "common beta"),
      (4L, "beta beta common")).toDF("doc_id", "text")
    val assigned = Seq((1L, 0), (2L, 0), (3L, 1), (4L, 1)).toDF("id", "bucket")
    val got = DataMap.clusterLabels(assigned, docs, "doc_id", "text", topTerms = 2)
      .orderBy("bucket", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4)))
    // cluster 0: tf(alpha)=3 -> 3*2e6=6e6; tf(common)=2 -> 2*1e6=2e6
    // cluster 1: tf(beta)=3 -> 6e6; tf(common)=2 -> 2e6
    assert(got.toSeq === Seq(
      (0L, 2L, 1L, "alpha", 6000000L),
      (0L, 2L, 2L, "common", 2000000L),
      (1L, 2L, 1L, "beta", 6000000L),
      (1L, 2L, 2L, "common", 2000000L)))
  }

  test("clusterLabels: token-free docs count in sizes but not labels; ties break by term") {
    import spark.implicits._
    val docs = Seq((1L, "x y"), (2L, "   "), (3L, "y x")).toDF("doc_id", "text")
    val assigned = Seq((1L, 0), (2L, 0), (3L, 1)).toDF("id", "bucket")
    val got = DataMap.clusterLabels(assigned, docs, "doc_id", "text", topTerms = 2)
      .orderBy("bucket", "rnk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // both terms in both clusters: df=2, tf=1 everywhere -> all scores
    // equal; rank ties break alphabetically. Cluster 0 holds 2 docs
    // (the whitespace-only doc counts in n_docs, contributes no terms).
    assert(got.toSeq === Seq((0L, 2L, "x"), (0L, 2L, "y"), (1L, 1L, "x"), (1L, 1L, "y")))
  }
}
