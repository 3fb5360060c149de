package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZOrderLayout

class ZOrderLayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rows = (1L to 2000L)
    .map(i => (i, i * 48271 % 1000, i * 16807 % 500, s"p$i"))
    .toDF("id", "a", "b", "payload")

  test("clustering is a permutation: content survives byte-for-byte") {
    val before = rows.collect().map(_.toSeq).toSet
    val after = ZOrderLayout.cluster(rows, Seq("a", "b"), bits = 4,
      numPartitions = 8).collect().map(_.toSeq).toSet
    assert(after === before)
    assert(after.size === 2000)
  }

  test("curve locality: a file-sized partition covers a compact (a, b) cell") {
    // within each range partition, the spread of each clustering column
    // should be far below the global spread (that's what makes row-group
    // stats tight); a hash layout's partitions each span ~everything
    val parts = ZOrderLayout.cluster(rows, Seq("a", "b"), bits = 4, numPartitions = 8)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("a") - min("a")).as("sa"), (max("b") - min("b")).as("sb"),
        count(lit(1)).as("n"))
      .collect()
    val meanSpreadA = parts.map(_.getAs[Long]("sa")).sum.toDouble / parts.length
    val meanSpreadB = parts.map(_.getAs[Long]("sb")).sum.toDouble / parts.length
    assert(meanSpreadA < 1000 * 0.6, s"a-spread $meanSpreadA not compact")
    assert(meanSpreadB < 500 * 0.8, s"b-spread $meanSpreadB not compact")
  }

  test("refuses degenerate parameters") {
    intercept[IllegalArgumentException] {
      ZOrderLayout.cluster(rows, Seq.empty, 4, 8)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.cluster(rows, Seq("a"), 0, 8)
    }
    intercept[IllegalArgumentException] {
      ZOrderLayout.cluster(rows, Seq("a"), 17, 8)
    }
    // interleaved width past 63 bits would silently alias curve bits
    // (shiftleft masks the shift count mod 64) — must refuse, not degrade
    intercept[IllegalArgumentException] {
      ZOrderLayout.cluster(rows.withColumn("c", col("a") + 1), Seq("a", "b", "c", "id"), 16, 8)
    }
  }
}
