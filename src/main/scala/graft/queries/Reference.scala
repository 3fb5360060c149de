package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.operators.Search
import graft.operators.Search.{Point, SearchRequest}

/** The reference's canonical query (`backend/models.py:186-191`) run
  * END-TO-END through the Search planner and checked against the DuckDB
  * oracle: case-insensitive type filter (client-lowered, empty probe
  * dropped) AND point-in-polygon filter AND cosine-distance ordering AND
  * offset/limit pagination AND text-field projection — every clause of
  * the reference's one query shape in a single gate-checked query.
  *
  * The layers table is synthesized deterministically from the driver's
  * tables: documents ⋈ embeddings supplies the text + vector columns;
  * each row gets a ±45-degree square polygon centered at integer
  * coordinates derived from doc_id. The polygons are real WKB geometry on
  * the Spark side (built with st_geomfromtext, filtered with JTS
  * st_intersects); the oracle states the identical predicate as integer
  * interval arithmetic — exact for axis-aligned squares.
  */
object Reference extends QueryPack {

  private val HalfW = 45L

  private def layersFrom(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val embs = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    // integer rect center per doc; corners as strings -> WKT -> WKB
    val xi = col("doc_id") * 7 % 360 - 180
    val yi = col("doc_id") * 3 % 180 - 90
    val wkt = concat(
      lit("POLYGON (("),
      (xi - HalfW).cast("string"), lit(" "), (yi - HalfW).cast("string"), lit(", "),
      (xi + HalfW).cast("string"), lit(" "), (yi - HalfW).cast("string"), lit(", "),
      (xi + HalfW).cast("string"), lit(" "), (yi + HalfW).cast("string"), lit(", "),
      (xi - HalfW).cast("string"), lit(" "), (yi + HalfW).cast("string"), lit(", "),
      (xi - HalfW).cast("string"), lit(" "), (yi - HalfW).cast("string"), lit("))"))
    docs.join(embs, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id").cast("string").as("id"),
        col("source").as("name"),
        col("lang").as("type"),
        col("text").as("description"),
        concat(lit("doc://"), col("doc_id").cast("string")).as("url"),
        col("text").as("metadata_text"),
        col("embedding").as("embeddings"),
        st_geomfromtext(wkt).as("geom"))
  }

  private def probe(s: SparkSession, d: String): Array[Float] =
    Tables.embeddings(s, d).filter(col("vec_id") === 0L)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x1_reference_search" -> { (s, d) =>
      Search.plan(layersFrom(s, d), SearchRequest(
        probe = probe(s, d),
        typeFilter = Some(Seq("EN", "fr", "")), // case + empty-drop quirks live
        inputPoint = Some(Point(0.5, 0.5)),
        skip = 2,
        limit = 8))
    }
  )

  def sql: Map[String, String] = Map(
    "x1_reference_search" ->
      s"""SELECT CAST(doc_id AS VARCHAR) AS id, source AS name, lang AS type,
         |  text AS description,
         |  'doc://' || CAST(doc_id AS VARCHAR) AS url,
         |  text AS metadata_text
         |FROM documents JOIN embeddings ON doc_id = vec_id
         |WHERE lower(lang) IN ('en', 'fr')
         |  AND abs((doc_id * 7) % 360 - 180 - 0.5) <= $HalfW
         |  AND abs((doc_id * 3) % 180 - 90 - 0.5) <= $HalfW
         |ORDER BY 1 - list_cosine_similarity(embedding,
         |    (SELECT embedding FROM embeddings WHERE vec_id = 0)) ASC,
         |  CAST(doc_id AS VARCHAR) ASC
         |LIMIT 8 OFFSET 2""".stripMargin
  )
}
