package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Ingest

class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val schema = StructType(Seq(
    StructField("ord", LongType),
    StructField("id", StringType), StructField("name", StringType),
    StructField("type", StringType), StructField("description", StringType),
    StructField("url", StringType), StructField("metadata_text", StringType),
    StructField("embeddings", ArrayType(FloatType, containsNull = false)),
    StructField("geometry", BinaryType)))

  private def row(ord: Long, id: String, meta: String, name: String): Row =
    Row(ord, id, name, "Feature Layer", "d", "u", meta,
      Seq(1f, 2f), Array[Byte](1, 2, 3))

  lazy val raw = spark.createDataFrame(
    java.util.Arrays.asList(
      row(0L, "a", "m1", "first-a"),
      row(1L, "a", "m1", "second-a"),  // dup of (a, m1): must be dropped
      row(2L, "a", "m2", "a-other-meta"),
      row(3L, "b", "m1", "first-b"),
      row(4L, "b", "m1", "second-b")), // dup of (b, m1)
    schema)

  test("prepare: deterministic keep-first dedup + geometry rename + canonical projection") {
    val out = Ingest.prepare(raw, orderCol = Some("ord"))
    assert(out.columns.toSeq === Ingest.TableColumns)
    val names = out.collect().map(r => (r.getString(0), r.getString(5), r.getString(1)))
      .sortBy(t => (t._1, t._2))
    // keep-first in ord order, like pandas drop_duplicates file order
    assert(names === Array(("a", "m1", "first-a"), ("a", "m2", "a-other-meta"),
      ("b", "m1", "first-b")))
  }

  test("run: idempotence gate skips a populated target (reference S6)") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    raw.write.parquet(in)
    assert(Ingest.run(spark, in, out, Some("ord")) === true)   // loaded
    assert(spark.read.parquet(out).count() === 3)
    assert(Ingest.run(spark, in, out, Some("ord")) === false)  // gated
    assert(spark.read.parquet(out).count() === 3)
  }
}
