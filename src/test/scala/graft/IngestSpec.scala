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

  test("run: empty/debris target does not wedge the gate (mode overwrite after gate)") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    raw.write.parquet(in)
    Files.createDirectories(java.nio.file.Paths.get(out))
    Files.writeString(java.nio.file.Paths.get(s"$out/_started"), "debris") // failed-write leftover
    assert(Ingest.run(spark, in, out, Some("ord")) === true)   // loads, not wedged
    assert(spark.read.parquet(out).count() === 3)
  }

  test("compact: many small files collapse to few, rows and values intact") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    // 16 tiny files
    spark.range(1000).selectExpr("id", "id * 2 AS v")
      .repartition(16).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles === 16)
    val before = spark.read.parquet(dir).collect().map(_.toString).sorted
    val n = Ingest.compact(spark, dir, targetBytes = Long.MaxValue)
    assert(n === 1 && parquetFiles === 1)
    val after = spark.read.parquet(dir).collect().map(_.toString).sorted
    assert(after === before)
  }

  test("compact: partitioned (nested-directory) layout is rejected, not flattened") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(100).selectExpr("id", "id % 4 AS bucket")
      .write.partitionBy("bucket").parquet(dir)
    val e = intercept[IllegalArgumentException](Ingest.compact(spark, dir))
    assert(e.getMessage.contains("partitioned layout"))
    // table untouched
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("compact: leftover .old directory from an interrupted swap is refused") {
    val base = Files.createTempDirectory("graft-compact").toString
    val dir = s"$base/t"
    spark.range(10).write.parquet(dir)
    Files.createDirectories(java.nio.file.Paths.get(s"$base/.t.compact.old"))
    val e = intercept[IllegalArgumentException](Ingest.compact(spark, dir))
    assert(e.getMessage.contains("interrupted compaction"))
  }

  test("compact: concurrent readers see a complete table throughout the swap") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(2000).selectExpr("id", "id * 3 AS v")
      .repartition(8).write.parquet(dir)
    val expected = 2000L
    @volatile var done = false
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    var transientMisses = 0
    val reader = new Thread(() => {
      while (!done) {
        try {
          val c = spark.read.parquet(dir).count()
          if (c != expected) failures.add(s"read $c rows, expected $expected")
        } catch {
          // the rename-aside swap has a two-metadata-op window where the
          // path (or a just-listed file) can vanish; tolerated but counted
          case _: Exception => transientMisses += 1
        }
      }
    })
    reader.start()
    try Ingest.compact(spark, dir, targetBytes = Long.MaxValue)
    finally { done = true; reader.join(30000) }
    assert(failures.isEmpty, s"partial/duplicated reads: ${failures}")
    assert(transientMisses <= 1, s"swap window hit $transientMisses times — not microseconds")
    assert(spark.read.parquet(dir).count() === expected)
  }

  test("run: committed EMPTY target reads as loaded, not reclaimed") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    raw.write.parquet(in)
    // a legitimate zero-row load: _SUCCESS marker + schema-only part file
    raw.limit(0).write.parquet(out)
    assert(Ingest.run(spark, in, out, Some("ord")) === false) // gated
    assert(spark.read.parquet(out).count() === 0)             // not overwritten
  }

  // WKB for POLYGON((0 0,1 0,1 1,0 1,0 0)) and POINT(1 2), little-endian
  private def wkbPolygon: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + 4 + 5 * 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(3).putInt(1).putInt(5)
    for ((x, y) <- Seq((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)))
      bb.putDouble(x.toDouble).putDouble(y.toDouble)
    bb.array()
  }
  private def wkbPoint: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(1).putDouble(1.0).putDouble(2.0)
    bb.array()
  }
  // WKB for MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0))): type 6 wrapping the
  // polygon above as its single member
  private def wkbMultiPolygon: Array[Byte] = {
    val poly = wkbPolygon
    val bb = java.nio.ByteBuffer.allocate(1 + 4 + 4 + poly.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte).putInt(6).putInt(1).put(poly)
    bb.array()
  }

  private def constrained(embLen: Int, geom: Array[Byte]): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "ok", "good", "Feature Layer", "d", "u", "m-ok",
          Seq.tabulate(4)(_.toFloat), wkbPolygon),
        Row(1L, "bad", "bad", "Feature Layer", "d", "u", "m-bad",
          Seq.tabulate(embLen)(_.toFloat), geom)),
      schema)

  test("run: committed-but-unreadable target refuses to overwrite (no data loss)") {
    val dir = Files.createTempDirectory("graft-ingest").toString
    val in = s"$dir/in"
    val out = s"$dir/out"
    raw.write.parquet(in)
    // a commit marker plus a corrupt part file = committed data that fails
    // to read; the gate must fail safe, never reclaim the path
    Files.createDirectories(java.nio.file.Paths.get(out))
    Files.writeString(java.nio.file.Paths.get(s"$out/_SUCCESS"), "")
    Files.writeString(java.nio.file.Paths.get(s"$out/part-00000.parquet"), "not parquet")
    val e = intercept[IllegalStateException](Ingest.run(spark, in, out, Some("ord")))
    assert(e.getMessage.contains("refusing to overwrite"))
    assert(Files.exists(java.nio.file.Paths.get(s"$out/part-00000.parquet")))
  }

  test("quarantine: corrupt WKB lands in the rejected split instead of failing the job") {
    val docs = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "ok", "good", "t", "d", "u", "m1",
          Seq.tabulate(4)(_.toFloat), wkbPolygon),
        Row(1L, "corrupt", "bad", "t", "d", "u", "m2",
          Seq.tabulate(4)(_.toFloat), Array[Byte](9, 9, 9))), // not WKB
      schema)
    val (good, bad) = Ingest.quarantineInvalid(Ingest.prepare(docs), dim = 4)
    assert(good.collect().map(_.getString(0)).toSeq === Seq("ok"))
    assert(bad.collect().map(_.getString(0)).toSeq === Seq("corrupt"))
  }

  test("DDL validation: non-Polygon geometry fails strict prepare; nulls pass") {
    val e = intercept[Exception] {
      Ingest.prepare(constrained(4, wkbPoint), validateDim = Some(4)).collect()
    }
    assert(e.getMessage.contains("geometry type violation"))
    // null embedding + null geom sail through (nullable DDL columns)
    val nulls = spark.createDataFrame(
      java.util.Arrays.asList(Row(0L, "n", "x", "t", "d", "u", "m", null, null)), schema)
    assert(Ingest.prepare(nulls, validateDim = Some(4)).count() === 1)
  }

  test("MultiPolygon ingest: rejected by default (reference DDL parity), accepted under the flag") {
    // default = strict Polygon-only, the reference's geometry(Polygon,4326)
    val e = intercept[Exception] {
      Ingest.prepare(constrained(4, wkbMultiPolygon), validateDim = Some(4)).collect()
    }
    assert(e.getMessage.contains("geometry type violation"))
    // widened: MultiPolygon passes strict validation...
    val widened = Ingest.prepare(constrained(4, wkbMultiPolygon),
      validateDim = Some(4), allowMultiPolygon = true)
    assert(widened.count() === 2)
    // ...and quarantine keeps it while still rejecting anything else
    val mixed = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "poly", "a", "t", "d", "u", "m1", Seq.tabulate(4)(_.toFloat), wkbPolygon),
        Row(1L, "multi", "b", "t", "d", "u", "m2", Seq.tabulate(4)(_.toFloat), wkbMultiPolygon),
        Row(2L, "point", "c", "t", "d", "u", "m3", Seq.tabulate(4)(_.toFloat), wkbPoint)),
      schema)
    val (good, bad) = Ingest.quarantineInvalid(
      Ingest.prepare(mixed), dim = 4, allowMultiPolygon = true)
    assert(good.collect().map(_.getString(0)).sorted.toSeq === Seq("multi", "poly"))
    assert(bad.collect().map(_.getString(0)).toSeq === Seq("point"))
  }

  test("MultiPolygon GeoParquet round trip: write -> read -> widened ingest -> spatial predicate") {
    import org.apache.spark.sql.functions.col
    val out = Files.createTempDirectory("graft-geomulti-ingest").toString + "/layers"
    val src = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, "mp1", "multi layer", "Feature Layer", "d", "u", "m1",
          Seq.tabulate(4)(_.toFloat), wkbMultiPolygon),
        Row(1L, "p1", "poly layer", "Feature Layer", "d", "u", "m2",
          Seq.tabulate(4)(_.toFloat), wkbPolygon)),
      schema)
    graft.sources.LayersTable.writeGeoParquet(src, out)
    val back = graft.sources.LayersTable.readGeoParquet(spark, out)
    val prepared = Ingest.prepare(back, orderCol = None,
      validateDim = Some(4), allowMultiPolygon = true)
    assert(prepared.count() === 2)
    // the JTS-backed predicates work on the MultiPolygon as-is: the point
    // (0.5, 0.5) lies inside its single member
    val hit = prepared.filter(graft.functions.GraftFunctions.st_intersects(
        col("geom"), graft.functions.GraftFunctions.st_point(
          org.apache.spark.sql.functions.lit(0.5), org.apache.spark.sql.functions.lit(0.5))))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(hit === Seq("mp1", "p1"))
  }

  test("DDL validation: wrong embedding dim fails strict prepare; quarantine splits instead") {
    val e = intercept[Exception] {
      Ingest.prepare(constrained(7, wkbPolygon), validateDim = Some(4)).collect()
    }
    assert(e.getMessage.contains("embedding dimension violation"))
    val (good, bad) = Ingest.quarantineInvalid(
      Ingest.prepare(constrained(7, wkbPoint)), dim = 4)
    assert(good.collect().map(_.getString(0)).toSeq === Seq("ok"))
    assert(bad.collect().map(_.getString(0)).toSeq === Seq("bad"))
  }
}
