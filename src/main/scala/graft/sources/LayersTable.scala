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

  /** GeoParquet footer metadata: primary geometry column name, its
    * encoding, and (when the writer recorded them) the data-derived
    * bbox [xmin, ymin, xmax, ymax] and geometry types, parsed from the
    * `geo` file-level key (GeoParquet spec §file metadata). */
  final case class GeoMeta(primaryColumn: String, encoding: String,
                           bbox: Option[Seq[Double]] = None,
                           geometryTypes: Seq[String] = Seq.empty)

  /** Read the `geo` footer metadata of a GeoParquet file (or of the first
    * part-file of a directory). None when the file carries no geo key
    * (plain parquet).
    */
  def geoMetadata(spark: SparkSession, path: String): Option[GeoMeta] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(p).isDirectory) {
        val parts = fs.listStatus(p).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
        if (parts.isEmpty) throw new IllegalArgumentException(
          s"$path is not GeoParquet: directory contains no parquet files")
        parts.minBy(_.getName.toString)
      } else p
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val kv = reader.getFooter.getFileMetaData.getKeyValueMetaData
      Option(kv.get("geo")).map { json =>
        import org.json4s._
        import org.json4s.jackson.JsonMethods
        implicit val fmts: Formats = DefaultFormats
        val j = JsonMethods.parse(json)
        val primary = (j \ "primary_column").extract[String]
        val colMeta = j \ "columns" \ primary
        val encoding = (colMeta \ "encoding").extract[String]
        // json4s extracts a MISSING field to Some(empty list); require a
        // real JSON array before treating the bbox as present
        val bbox = colMeta \ "bbox" match {
          case a: JArray => a.extractOpt[Seq[Double]].filter(_.nonEmpty)
          case _         => None
        }
        val types = colMeta \ "geometry_types" match {
          case a: JArray => a.extract[Seq[String]]
          case _         => Seq.empty[String]
        }
        GeoMeta(primary, encoding, bbox, types)
      }
    } finally reader.close()
  }

  /** Write a DataFrame as GeoParquet: plain parquet with the `geo`
    * file-level footer key stamped on every part file, closing the
    * read/write asymmetry with the reference's input format
    * (`backend/load_data.py:176` reads GeoParquet; [[readGeoParquet]]
    * verifies the footer — this emits it).
    *
    * Spark's parquet writer exposes no hook for custom file-level
    * key-value metadata, so the footer is stamped in a post-pass: each
    * part file's row groups are BYTE-COPIED into a rewritten file via
    * `ParquetFileWriter.appendFile` (no decode/re-encode — pages move
    * verbatim) and the footer is re-serialized with the `geo` key merged
    * in. Tables above a handful of part files stamp DISTRIBUTED — a Spark
    * job over the file list, one independent rewrite per file — so a
    * 10k-file table re-footers at cluster width instead of serializing
    * through the driver; small tables take a driver loop to skip the job
    * overhead. Both paths run the identical per-file kernel.
    */
  def writeGeoParquet(df: DataFrame, path: String, geomCol: String = "geometry",
                      computeBbox: Boolean = true): Unit = {
    require(df.columns.contains(geomCol),
      s"writeGeoParquet: no geometry column '$geomCol' in ${df.columns.mkString(", ")}")
    require(df.schema(geomCol).dataType == BinaryType,
      s"writeGeoParquet: column '$geomCol' must be WKB binary, " +
        s"found ${df.schema(geomCol).dataType.simpleString}")
    df.write.mode("overwrite").parquet(path)
    stampGeoParquet(df.sparkSession, path, geomCol, computeBbox)
  }

  /** Stamp an EXISTING committed parquet directory as GeoParquet — the
    * footer pass [[writeGeoParquet]] runs, exposed separately so sinks
    * with their own write protocol (e.g. [[graft.operators.Ingest.run]]'s
    * errorifexists race gate) can compose it. With `computeBbox` the
    * data-derived per-column `bbox` and `geometry_types` are recorded
    * (the fields geopandas emits): ONE column-pruned distributed
    * aggregate over the written files — only the geometry column is
    * read, min/max reduce map-side to 4 doubles per partition, so the
    * pass costs a narrow scan, never a shuffle of the data. Unparseable
    * or NULL geometries are skipped (try-envelope), matching the footer
    * fields' advisory role.
    */
  def stampGeoParquet(spark: SparkSession, path: String, geomCol: String,
                      computeBbox: Boolean = true): Unit = {
    import graft.functions.GraftFunctions.{st_try_envelope, st_try_geometrytype}
    import org.apache.spark.sql.functions._
    val (bbox, types) =
      if (!computeBbox) (None, Seq.empty[String])
      else {
        val row = spark.read.parquet(path)
          .select(st_try_envelope(col(geomCol)).as("e"),
            st_try_geometrytype(col(geomCol)).as("t"))
          .agg(min(col("e").getItem(0)), min(col("e").getItem(1)),
            max(col("e").getItem(2)), max(col("e").getItem(3)),
            sort_array(collect_set(col("t"))))
          .head()
        val box =
          if (row.isNullAt(0)) None // no parseable geometry anywhere
          else Some(Seq(row.getDouble(0), row.getDouble(1),
            row.getDouble(2), row.getDouble(3)))
        (box, row.getSeq[String](4))
      }
    stampGeoFooter(spark, path, geoFooterJson(geomCol, bbox, types))
  }

  /** GeoParquet 1.0.0 `geo` footer JSON for a WKB geometry column. */
  private[graft] def geoFooterJson(geomCol: String, bbox: Option[Seq[Double]] = None,
                                   geometryTypes: Seq[String] = Seq.empty): String = {
    val typesJson = geometryTypes.map(t => s""""$t"""").mkString(",")
    val bboxJson = bbox.map(b => s""","bbox":[${b.mkString(",")}]""").getOrElse("")
    s"""{"version":"1.0.0","primary_column":"$geomCol",""" +
      s""""columns":{"$geomCol":{"encoding":"WKB","geometry_types":[$typesJson]$bboxJson}}}"""
  }

  /** Part-file count at or below which stamping loops on the driver: the
    * per-file rewrite is ~ms on local files, so a Spark job only pays off
    * once there are more files than a scheduler round-trip is worth.
    */
  private val DriverStampMax = 4

  /** Rewrite every part file under `path` with the `geo` footer key added
    * (row groups byte-copied, existing key-value metadata preserved).
    * Distributed over executors beyond [[DriverStampMax]] files.
    */
  private def stampGeoFooter(spark: SparkSession, path: String, geoJson: String): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    if (parts.length <= DriverStampMax)
      parts.foreach(p => stampOneFile(conf, p, geoJson))
    else {
      // ship the Hadoop conf as plain key-value pairs (Configuration is
      // not serializable); each task rebuilds it and rewrites its files
      // independently — per-file work has no cross-file state
      val confKv = conf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
      val sc = spark.sparkContext
      sc.parallelize(parts.toSeq, math.min(parts.length, sc.defaultParallelism))
        .foreachPartition { files =>
          val c = new org.apache.hadoop.conf.Configuration(false)
          confKv.foreach { case (k, v) => c.set(k, v) }
          files.foreach(p => stampOneFile(c, p, geoJson))
        }
    }
  }

  /** The per-file stamping kernel (runs on the driver or inside an
    * executor task): byte-copy row groups, merge the `geo` key into the
    * footer, swap into place.
    */
  private def stampOneFile(conf: org.apache.hadoop.conf.Configuration,
                           pathStr: String, geoJson: String): Unit = {
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val part = new Path(pathStr)
    val fs = part.getFileSystem(conf)
    val in = HadoopInputFile.fromPath(part, conf)
    val (schema, existingKv) = {
      val r = ParquetFileReader.open(in)
      try (r.getFooter.getFileMetaData.getSchema,
        r.getFooter.getFileMetaData.getKeyValueMetaData.asScala.toMap)
      finally r.close()
    }
    val tmp = new Path(part.getParent, s".${part.getName}.geo.tmp")
    val writer = new ParquetFileWriter(HadoopOutputFile.fromPath(tmp, conf),
      schema, ParquetFileWriter.Mode.OVERWRITE,
      org.apache.parquet.hadoop.ParquetWriter.DEFAULT_BLOCK_SIZE,
      org.apache.parquet.hadoop.ParquetWriter.MAX_PADDING_SIZE_DEFAULT)
    writer.start()
    writer.appendFile(in)
    writer.end((existingKv + ("geo" -> geoJson)).asJava)
    if (!fs.delete(part, false) || !fs.rename(tmp, part))
      throw new java.io.IOException(s"geo footer stamp failed for $part")
  }

  /** GeoParquet scan (reference S1): verify the file IS GeoParquet (geo
    * footer present, WKB encoding), then read it with the primary geometry
    * column normalized to the name `geometry`. Fails loudly on plain
    * parquet or non-WKB encodings (native-arrow GeoParquet 1.1 point
    * encodings are not WKB and would corrupt downstream WKB parsing).
    */
  def readGeoParquet(spark: SparkSession, path: String): DataFrame = {
    val meta = geoMetadata(spark, path).getOrElse(throw new IllegalArgumentException(
      s"$path is not GeoParquet: no 'geo' footer metadata"))
    require(meta.encoding.equalsIgnoreCase("WKB"),
      s"unsupported GeoParquet geometry encoding '${meta.encoding}' (only WKB)")
    val df = spark.read.parquet(path)
    if (meta.primaryColumn == "geometry") df
    else {
      require(!df.columns.contains("geometry"),
        s"cannot normalize primary geometry column '${meta.primaryColumn}': " +
          "a different column named 'geometry' already exists")
      df.withColumnRenamed(meta.primaryColumn, "geometry")
    }
  }
}
