package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sq

class SqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vecs(rows: (Long, Seq[Float])*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("train finds exact per-dim bounds; codes stay in [0, 255]; extremes map to 0/255") {
    val df = vecs(
      (1L, Seq(0f, -2f, 5f)), (2L, Seq(1f, 2f, 5f)), (3L, Seq(0.5f, 0f, 5f)))
    val m = Sq.train(df, "embedding")
    assert(m.mins.toSeq === Seq(0f, -2f, 5f) && m.maxs.toSeq === Seq(1f, 2f, 5f))
    val codes = Sq.encode(df, "vec_id", "embedding", m)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    codes.values.foreach(c => assert(c.forall(x => x >= 0L && x <= 255L)))
    assert(codes(1L)(0) === 0L && codes(2L)(0) === 255L) // min/max endpoints
    // constant dimension (rg = 0) codes to 0 everywhere
    assert(codes.values.forall(_.apply(2) === 0L))
    // midpoint rounds half-up: (0.5-0)/1*255+0.5 -> floor(128.0) = 127? no:
    // 0.5*255 = 127.5, +0.5 = 128.0 -> 128
    assert(codes(3L)(0) === 128L)
  }

  test("refine with a corpus-sized pool equals the exact cosine ranking") {
    import graft.operators.Knn
    val rnd = new scala.util.Random(41)
    val df = vecs((1L to 200L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 4f - 2f))): _*)
    val m = Sq.train(df, "embedding")
    val codes = Sq.encode(df, "vec_id", "embedding", m)
    val probe = df.filter(col("vec_id") === 7L)
      .head().getSeq[Float](1).toArray
    val got = Sq.searchRefine(codes, "code", "vec_id",
      df, "vec_id", "embedding", m, probe, k = 10, r = 200)
      .collect().map(_.getLong(0)).toSeq
    val exact = Knn.topK(df, col("embedding"), probe, k = 10, tieBreak = col("vec_id"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === exact)
  }

  test("persistence lifecycle: save -> load -> append -> serve round-trips exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val df = vecs((1L to 120L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 4f - 2f))): _*)
    val base = df.filter(col("vec_id") % 4 =!= 0)
    val extra = df.filter(col("vec_id") % 4 === 0)
    val m = Sq.train(base, "embedding")
    val path = "/tmp/graft_sq_spec"
    Sq.save(m, Sq.encode(base, "vec_id", "embedding", m), "vec_id", path)
    val back = Sq.loadModel(spark, path)
    assert(back.mins.toSeq === m.mins.toSeq && back.maxs.toSeq === m.maxs.toSeq)
    Sq.appendSaved(spark, path, extra, "vec_id", "embedding")
    val probe = df.filter(col("vec_id") === 5L).head().getSeq[Float](1).toArray
    val served = Sq.searchSaved(spark, path, probe, r = 15)
      .collect().map(_.getLong(0)).toSeq
    // serving the saved index equals the in-memory ADC over ALL codes
    val direct = Sq.searchADC(Sq.encode(df, "vec_id", "embedding", m),
      "code", "vec_id", m, probe, r = 15)
      .collect().map(_.getLong(0)).toSeq
    assert(served === direct)
    // appended ids are actually searchable
    assert(served.nonEmpty && Sq.searchSaved(spark, path, probe, r = 120)
      .collect().map(_.getLong(0)).toSet.exists(_ % 4 == 0))
  }

  test("ADC recall sanity: the quantized pool at r=20 contains the exact top-1") {
    import graft.operators.Knn
    val rnd = new scala.util.Random(59)
    val df = vecs((1L to 300L).map(i =>
      (i, Seq.fill(16)(rnd.nextFloat() * 4f - 2f))): _*)
    val m = Sq.train(df, "embedding")
    val codes = Sq.encode(df, "vec_id", "embedding", m)
    val probe = df.filter(col("vec_id") === 3L).head().getSeq[Float](1).toArray
    val pool = Sq.searchADC(codes, "code", "vec_id", m, probe, r = 20)
      .collect().map(_.getLong(0)).toSet
    // the probe row itself (quantization error ~ 1/255 per dim) must pool
    assert(pool.contains(3L))
  }
}
