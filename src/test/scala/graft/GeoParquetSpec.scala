package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ingest, Search}
import graft.operators.Search.{Point, SearchRequest}
import graft.sources.LayersTable

/** End-to-end golden replay of the reference's only e2e evidence
  * (`agent.ipynb` cells 3-4 over the GeoParquet loaded by
  * `backend/load_data.py:173-190`): a real GeoParquet fixture (geo footer
  * metadata + WKB polygon geometry) ingested through the canonical path
  * and searched with the notebook's two requests in spirit — parcel data
  * near Sanford, FL (Seminole County) and Kelso, WA (Cowlitz County),
  * type-filtered to Feature Layers, top-5.
  */
class GeoParquetSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val fixture = getClass.getResource("/golden_layers.geoparquet").getPath
  private val parcelProbe = Array(0.9f, 0.1f, 0f, 0f, 0f, 0f, 0f, 0.1f)

  test("geo footer metadata is detected; plain parquet is refused") {
    val meta = LayersTable.geoMetadata(spark, fixture)
    assert(meta === Some(LayersTable.GeoMeta("geometry", "WKB")))
    val plain = s"${SparkTestSession.sfDir}/documents.parquet"
    assert(LayersTable.geoMetadata(spark, plain) === None)
    val e = intercept[IllegalArgumentException](LayersTable.readGeoParquet(spark, plain))
    assert(e.getMessage.contains("not GeoParquet"))
    // empty directory: descriptive error, not empty.minBy
    val empty = java.nio.file.Files.createTempDirectory("graft-empty").toString
    val e2 = intercept[IllegalArgumentException](LayersTable.geoMetadata(spark, empty))
    assert(e2.getMessage.contains("no parquet files"))
  }

  test("golden replay: GeoParquet -> ingest (dedup + validate) -> the notebook's two searches") {
    val raw = LayersTable.readGeoParquet(spark, fixture)
    assert(raw.count() === 7)
    // ingest: dedup on (id, metadata_text) drops the planted duplicate;
    // DDL validation (dim 8 here, Polygon geometry) passes every row
    val layers = Ingest.prepare(raw, validateDim = Some(8)).cache()
    assert(layers.count() === 6)
    assert(layers.columns.toSeq === Ingest.TableColumns)

    // cell-3 request in spirit: parcel data near Sanford, FL (Seminole Cty)
    val sanford = Search.search(layers, SearchRequest(parcelProbe,
      typeFilter = Some(Seq("Feature Layer")),
      inputPoint = Some(Point(-81.27, 28.80)), limit = 5))
    assert(sanford.error === None)
    assert(sanford.layers.get.map(_.id) === Seq("seminole_parcels", "seminole_roads"))
    assert(sanford.layers.get.head.name === "Seminole County Parcels")

    // cell-3/4 follow-up in spirit: parcel data near Kelso, WA (Cowlitz Cty)
    // (the zoning layer intersects too but is a Map Service -> filtered out)
    val kelso = Search.search(layers, SearchRequest(parcelProbe,
      typeFilter = Some(Seq("Feature Layer")),
      inputPoint = Some(Point(-122.91, 46.15)), limit = 5))
    assert(kelso.error === None)
    assert(kelso.layers.get.map(_.id) === Seq("cowlitz_parcels"))
    layers.unpersist()
  }

  test("writeGeoParquet round trip: engine write -> readGeoParquet -> golden replay") {
    val out = java.nio.file.Files.createTempDirectory("graft-geowrite").toString + "/layers"
    // write the golden fixture back out through the engine, geometry under
    // a non-default column name to exercise primary-column normalization
    val original = LayersTable.readGeoParquet(spark, fixture)
    LayersTable.writeGeoParquet(original.withColumnRenamed("geometry", "geom"), out, "geom")
    // the footer is a real GeoParquet footer...
    assert(LayersTable.geoMetadata(spark, out) === Some(LayersTable.GeoMeta("geom", "WKB")))
    // ...rows and values survive the byte-copy rewrite...
    val back = LayersTable.readGeoParquet(spark, out)
    assert(back.columns.contains("geometry")) // normalized back from 'geom'
    assert(back.count() === original.count())
    // ...and the golden replay still passes on the round-tripped data
    val layers = Ingest.prepare(back, validateDim = Some(8)).cache()
    val sanford = Search.search(layers, SearchRequest(parcelProbe,
      typeFilter = Some(Seq("Feature Layer")),
      inputPoint = Some(Point(-81.27, 28.80)), limit = 5))
    assert(sanford.layers.get.map(_.id) === Seq("seminole_parcels", "seminole_roads"))
    layers.unpersist()
  }

  test("writeGeoParquet stamps many part files via the distributed path") {
    val out = java.nio.file.Files.createTempDirectory("graft-geomulti").toString + "/layers"
    // repartition(8) spreads the 7 fixture rows one-per-partition; empty
    // partitions write no file, so 7 part files land — above the
    // driver-loop threshold, so the footer stamping runs as a Spark job
    // over the file list
    val original = LayersTable.readGeoParquet(spark, fixture)
    LayersTable.writeGeoParquet(original.repartition(8), out)
    val parts = new java.io.File(out).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(parts.length === 7)
    // EVERY part file carries the geo footer (geoMetadata reads only the
    // first part; check each file directly)
    parts.foreach { f =>
      val meta = LayersTable.geoMetadata(spark, f.getPath)
      assert(meta === Some(LayersTable.GeoMeta("geometry", "WKB")),
        s"missing/wrong geo footer on ${f.getName}")
    }
    // rows survive the distributed rewrite
    assert(LayersTable.readGeoParquet(spark, out).count() === original.count())
  }

  test("DDL validation: wrong embedding dimension fails the load (COPY-abort analogue)") {
    val raw = LayersTable.readGeoParquet(spark, fixture)
    val e = intercept[Exception] {
      Ingest.prepare(raw, validateDim = Some(1024)).collect()
    }
    assert(e.getMessage.contains("embedding dimension violation"))
  }
}
