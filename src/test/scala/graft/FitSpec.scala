package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fit

class FitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("solve3 solves a known ridge system exactly enough to recover a planted line") {
    // y = 5 + 2*x1 - 3*x2 exactly, lambda tiny relative to the data:
    // coefficients must come back within the ridge shrinkage tolerance
    val pts = for (x1 <- 0 to 20; x2 <- 0 to 20)
      yield (x1.toLong, x2.toLong, 5L + 2L * x1 - 3L * x2)
    val n = pts.length.toDouble
    def s(f: ((Long, Long, Long)) => Long) = pts.map(f).sum.toDouble
    val c = Fit.solve3(n,
      s(_._1), s(_._2), s(p => p._1 * p._1), s(p => p._1 * p._2),
      s(p => p._2 * p._2), s(_._3), s(p => p._3 * p._1), s(p => p._3 * p._2),
      lambda = 1e-6)
    assert(math.abs(c.b0 - 5.0) < 1e-3, s"b0 ${c.b0}")
    assert(math.abs(c.b1 - 2.0) < 1e-3, s"b1 ${c.b1}")
    assert(math.abs(c.b2 + 3.0) < 1e-3, s"b2 ${c.b2}")
  }

  test("solve3 refuses a singular system (constant feature under zero penalty)") {
    // x1 == x2 everywhere and lambda = 0: rank-deficient normal matrix
    val e = intercept[IllegalArgumentException] {
      Fit.solve3(3, 6, 6, 14, 14, 14, 9, 20, 20, lambda = 0.0)
    }
    assert(e.getMessage.contains("singular"))
  }

  test("ridgeResidualOutliers survives features whose long products would wrap") {
    import spark.implicits._
    // x1 ~ 4e9 > sqrt(Long.MaxValue): x1*x1 in LongType would wrap to a
    // negative number and garbage the normal equations. The decimal-formed
    // products must still recover the planted outlier.
    val rows = (1L to 60L).map { i =>
      val x1 = 4000000000L + i * 1000L
      val x2 = i % 7
      val y = x1 + 50 * x2 + (if (i == 33) 100000000L else 0L)
      (i, x1, x2, y)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val top = Fit.ridgeResidualOutliers(df, "id",
      col("x1"), col("x2"), col("y"), lambda = 1.0, k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(top === Seq(33L))
  }

  test("ridgeResidualOutliers finds the planted disagreement rows; partitioning-invariant") {
    import spark.implicits._
    // labels follow y = 10*x1 + x2 exactly EXCEPT three planted outliers
    val rows = (1L to 200L).map { i =>
      val x1 = i % 13; val x2 = i % 7
      val y = 10 * x1 + x2 + (if (i == 17 || i == 90 || i == 151) 5000 else 0)
      (i, x1, x2, y)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    val top = Fit.ridgeResidualOutliers(df, "id",
      col("x1"), col("x2"), col("y"), lambda = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top.keySet === Set(17L, 90L, 151L))
    assert(top.values.toSeq.sorted === Seq(1L, 2L, 3L))
    // the fit is a pure function of the data, not the partitioning:
    // exact-decimal sums are order-independent
    val top7 = Fit.ridgeResidualOutliers(df.repartition(7), "id",
      col("x1"), col("x2"), col("y"), lambda = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(top7 === top)
    intercept[IllegalArgumentException] {
      Fit.ridgeResidualOutliers(df.limit(0), "id",
        col("x1"), col("x2"), col("y"))
    }
  }
}
