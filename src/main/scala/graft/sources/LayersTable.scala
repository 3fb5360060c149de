package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** The canonical `layers` table: schema, catalog DDL, and GeoParquet
  * normalization — the engine's replacement for the reference's
  * `CREATE TABLE IF NOT EXISTS` + GeoParquet load
  * (`backend/load_data.py:67-81,173-180`).
  */
object LayersTable {

  /** Reference DDL order (`backend/load_data.py:16-25`): six text columns,
    * vector(1024) as float array, geometry as WKB bytes (SRID 4326).
    */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("type", StringType),
    StructField("description", StringType),
    StructField("url", StringType),
    StructField("metadata_text", StringType),
    StructField("embeddings", ArrayType(FloatType, containsNull = false)),
    StructField("geom", BinaryType)))

  /** The reference's embedding dimension (`vector(1024)`). The engine is
    * dimension-agnostic; ingest validation uses this when configured.
    */
  val EmbeddingDim = 1024

  /** Identifier whitelist, reference `backend/models.py:131-136` — the
    * table name is the only user-configurable identifier and must match.
    */
  private val Identifier = "^[A-Za-z_][A-Za-z0-9_]*$".r

  def validateIdentifier(name: String): String = {
    require(Identifier.matches(name),
      s"invalid table identifier: '$name' (must match ${Identifier.regex})")
    name
  }

  /** CREATE TABLE IF NOT EXISTS analogue (reference S4): registers an
    * empty managed table with the canonical schema unless present.
    * Returns true if created.
    */
  def createIfNotExists(spark: SparkSession, table: String): Boolean = {
    validateIdentifier(table)
    if (spark.catalog.tableExists(table)) false
    else {
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
        .write.format("parquet").saveAsTable(table)
      true
    }
  }

  /** Normalize a GeoParquet-shaped DataFrame (geometry column carrying
    * WKB) to the canonical layers layout. GeoParquet stores geometry as
    * WKB `binary` named `geometry`, so no decoding is needed — rename and
    * project (reference P2, `backend/load_data.py:178`).
    */
  def fromGeoParquet(raw: DataFrame): DataFrame =
    graft.operators.Ingest.prepare(raw)
}
