package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def sketchOf(values: Seq[Long]): Seq[(Int, Long)] = {
    import spark.implicits._
    QuantileSketch.registers(values.map(Tuple1(_)).toDF("v"), Seq.empty, col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
  }

  test("estimate within the 1/16 relative bound; exact below 32") {
    // log-normal-ish skew: squares of 1..2000 plus a heavy small tail
    val values = (1L to 2000L).map(i => i * i) ++ (1L to 500L)
    val bins = sketchOf(values)
    val sorted = values.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val exact = sorted(math.ceil(q * sorted.length).toInt - 1)
      val est = QuantileSketch.quantile(bins, q)
      assert(est <= exact, s"q=$q: lower bound $est above exact $exact")
      assert(exact <= est + est / 16 + 1,
        s"q=$q: exact $exact outside the 1/16 band above $est")
    }
    // values below 32 bin exactly: a corpus of small values estimates
    // every quantile with zero error
    val small = (0L to 31L) ++ (0L to 31L)
    val sbins = sketchOf(small)
    for (q <- Seq(0.25, 0.5, 1.0)) {
      val exact = small.sorted.apply(math.ceil(q * small.length).toInt - 1)
      assert(QuantileSketch.quantile(sbins, q) === exact, s"small q=$q")
    }
  }

  test("merge is count addition: shards equal one pass; state bounded by bins") {
    import spark.implicits._
    val values = (1L to 5000L).map(i => i * 37 % 100000)
    val df = values.map(Tuple1(_)).toDF("v")
    val whole = QuantileSketch.registers(df, Seq.empty, col("v"))
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val a = QuantileSketch.registers(df.filter(col("v") % 2 === 0), Seq.empty, col("v"))
    val b = QuantileSketch.registers(df.filter(col("v") % 2 =!= 0), Seq.empty, col("v"))
    val merged = QuantileSketch.merge(Seq.empty, Seq(a, b))
      .orderBy("bin").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(merged === whole)
    assert(whole.length <= 17 * 16, s"bin count ${whole.length} above the bound")
  }

  test("negative values refuse loudly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      QuantileSketch.registers(Seq(3L, -1L).map(Tuple1(_)).toDF("v"),
        Seq.empty, col("v")).collect()
    }
    assert(ex.getMessage.contains("negative value") ||
      ex.getCause != null && ex.getCause.getMessage.contains("negative value"))
  }
}
