package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacement for the reference's single-process pandas
  * ingest (`backend/load_data.py:173-190`: read_parquet ->
  * drop_duplicates([id, metadata_text]) -> rename geometry->geom ->
  * project 8 columns -> COPY), which SURVEY.md §3.3 flags as its clearest
  * 100 TB liability (whole dataset in one process's memory).
  *
  * Dedup semantics (SURVEY.md §2.9 D1): pandas keeps the FIRST duplicate
  * in file order; Spark's dropDuplicates keeps an arbitrary row. For
  * deterministic keep-first parity, callers supply an ordering column
  * (explicit ordinal, ingest timestamp, ...) and we take row_number()=1
  * per key. With no ordering column we fall back to dropDuplicates and
  * document the weaker guarantee.
  */
object Ingest {

  /** The canonical 8-column layers schema, `backend/load_data.py:16-25`. */
  val TableColumns: Seq[String] = Seq(
    "id", "name", "type", "description", "url", "metadata_text",
    "embeddings", "geom")

  /** Deterministic keep-first dedup on a key subset. */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** GeoParquet-shaped input -> canonical layers table:
    * dedup on (id, metadata_text), rename geometry->geom, project the 8
    * canonical columns (reference `backend/load_data.py:177-178`).
    *
    * `validateDim`: enforce the reference DDL's column constraints —
    * `vector(1024)` and `geometry(Polygon,4326)`
    * (`backend/load_data.py:67-81`; there a malformed row fails the COPY
    * transaction). Strict mode mirrors that: the load fails on the first
    * violating row, via a codegen'd raise_error branch — single pass, no
    * extra validation job. NULL embedding/geom pass (the DDL columns are
    * nullable). For quarantine-instead-of-fail semantics use
    * [[quarantineInvalid]] before the load.
    *
    * `allowMultiPolygon`: the reference DDL is Polygon-only
    * (`backend/load_data.py:79`), so the default keeps strict parity —
    * but real GIS servers routinely serve MultiPolygon layers, so the
    * flag widens the accepted set to {Polygon, MultiPolygon} (the WKB
    * codec, bbox derivation, and the JTS-backed predicates all handle
    * MultiPolygon already; only this DDL gate was Polygon-only).
    */
  def prepare(raw: DataFrame, orderCol: Option[String] = None,
              validateDim: Option[Int] = None,
              allowMultiPolygon: Boolean = false): DataFrame = {
    val renamed =
      if (raw.columns.contains("geometry")) raw.withColumnRenamed("geometry", "geom")
      else raw
    val deduped = orderCol match {
      case Some(oc) => dedupKeepFirst(renamed, Seq("id", "metadata_text"), oc)
      case None     => renamed.dropDuplicates(Seq("id", "metadata_text"))
    }
    val projected = deduped.select(TableColumns.map(col): _*)
    validateDim.fold(projected)(dim => validated(projected, dim, allowMultiPolygon))
  }

  import graft.functions.GraftFunctions.st_geometrytype

  private def badEmbedding(dim: Int) =
    col("embeddings").isNotNull && size(col("embeddings")) =!= dim
  private def allowedTypes(allowMulti: Boolean): Seq[String] =
    if (allowMulti) Seq("Polygon", "MultiPolygon") else Seq("Polygon")
  private def badGeom(allowMulti: Boolean) =
    col("geom").isNotNull &&
      !st_geometrytype(col("geom")).isin(allowedTypes(allowMulti): _*)

  /** Strict DDL-constraint enforcement: first violating row fails the job
    * with a descriptive error (the COPY-transaction-abort analogue).
    */
  private def validated(df: DataFrame, dim: Int, allowMulti: Boolean): DataFrame = df
    .withColumn("embeddings",
      when(badEmbedding(dim), raise_error(concat(
        lit(s"embedding dimension violation (expected $dim, got "),
        size(col("embeddings")).cast("string"), lit(") for id "), col("id"))))
        .otherwise(col("embeddings")))
    .withColumn("geom",
      when(badGeom(allowMulti), raise_error(concat(
        lit(s"geometry type violation (expected ${allowedTypes(allowMulti).mkString("|")}, got "),
        st_geometrytype(col("geom")), lit(") for id "), col("id"))))
        .otherwise(col("geom")))

  /** Split off DDL-constraint violators instead of failing: returns
    * (valid rows, rejected rows) for load + quarantine sinks. Uses the
    * try-parse geometry read so malformed WKB — the most invalid input
    * this path exists for — lands in the rejected split rather than
    * aborting the job. `allowMultiPolygon` widens the accepted geometry
    * set exactly as in [[prepare]].
    */
  def quarantineInvalid(df: DataFrame, dim: Int = graft.sources.LayersTable.EmbeddingDim,
                        allowMultiPolygon: Boolean = false)
      : (DataFrame, DataFrame) = {
    val tryType = graft.functions.GraftFunctions.st_try_geometrytype(col("geom"))
    val bad = badEmbedding(dim) ||
      (col("geom").isNotNull &&
        (tryType.isNull || !tryType.isin(allowedTypes(allowMultiPolygon): _*)))
    (df.filter(!bad), df.filter(bad))
  }

  /** Compact a parquet table directory into ~targetBytes files — the
    * small-file maintenance op every long-lived table needs (streaming
    * sinks and incremental appends accumulate files whose per-file
    * overhead eventually dominates scan cost). One distributed
    * round-robin repartition to ceil(bytes/target) files, written beside
    * the original and swapped in via rename-aside: dir -> .old, tmp ->
    * dir, delete .old. A crash at ANY point leaves the data intact in a
    * recoverable directory (dir, tmp, or .old — never gone), unlike the
    * delete-then-rename it replaces, whose mid-swap crash lost the table
    * path. The swap window for concurrent readers is two metadata renames
    * (microseconds); a reader that listed the pre-compaction files can
    * still lose them mid-scan — full snapshot isolation needs a
    * manifest-versioned table format, out of scope for a plain parquet
    * directory. Partitioned (nested-directory) layouts are rejected: the
    * flat rewrite would silently discard the partitioning — compact each
    * leaf partition directory instead. Returns the new file count.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val hconf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(hconf)
    val entries = fs.listStatus(dir)
    val subdirs = entries.filter(_.isDirectory).map(_.getPath.getName)
    require(subdirs.isEmpty,
      s"compact: $path contains subdirectories (${subdirs.take(3).mkString(", ")}" +
        s"${if (subdirs.length > 3) ", ..." else ""}) — a partitioned layout; " +
        "compact each leaf partition directory instead of flattening it")
    val totalBytes = entries
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir.getParent, s".${dir.getName}.compact.tmp")
    val old = new org.apache.hadoop.fs.Path(dir.getParent, s".${dir.getName}.compact.old")
    require(!fs.exists(old),
      s"compact: leftover $old from an interrupted compaction — inspect and remove it first")
    spark.read.parquet(path)
      .repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // compacted data is fully committed (tmp/_SUCCESS) before the original
    // is touched; then the three-step swap, recoverable at every boundary
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compaction swap failed renaming $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // best-effort rollback to the original
      throw new java.io.IOException(s"compaction swap failed installing $tmp at $dir")
    }
    fs.delete(old, true)
    n
  }

  /** One-shot idempotent load (reference S6 gate: skip when the target is
    * already populated — `backend/load_data.py:130-136,203`). The parquet
    * write commit protocol gives the same all-or-nothing visibility as the
    * reference's single COPY transaction (SURVEY.md §2.1 S3).
    *
    * `geoParquet`: stamp the committed output with the GeoParquet `geo`
    * footer (+ data-derived bbox/geometry_types) so it round-trips into
    * any GeoParquet reader — the reference's own entry point is
    * geopandas `read_parquet` (`backend/load_data.py:176`), which
    * requires the footer. The stamp runs AFTER the commit marker: a
    * crash mid-stamp leaves committed, readable plain parquet (re-run
    * `LayersTable.stampGeoParquet` to finish), never a lost table.
    */
  def run(spark: SparkSession, inPath: String, outPath: String,
          orderCol: Option[String] = None, validateDim: Option[Int] = None,
          allowMultiPolygon: Boolean = false,
          geoParquet: Boolean = false): Boolean = {
    val hconf = spark.sessionState.newHadoopConf()
    val out = new org.apache.hadoop.fs.Path(outPath)
    val fs = out.getFileSystem(hconf)
    val committed = fs.exists(new org.apache.hadoop.fs.Path(out, "_SUCCESS"))
    val alreadyLoaded =
      if (!fs.exists(out)) false // absent -> load
      else if (committed) {
        // The commit marker IS the loaded state: a committed-but-EMPTY
        // result (a legitimate zero-row load) must read as loaded, not be
        // reclaimed. The read is a corruption probe only — a committed
        // target that fails to read is corruption, never clobbered.
        try { spark.read.parquet(outPath).isEmpty; true }
        catch {
          case e: Exception => throw new IllegalStateException(
            s"$outPath carries a commit marker but is unreadable — refusing to overwrite", e)
        }
      } else
        // no marker: externally-written non-empty data still gates the
        // load; empty or unreadable leftovers are debris from a failed
        // partial write and the gate may reclaim the path
        try !spark.read.parquet(outPath).isEmpty
        catch { case _: Exception => false }
    if (alreadyLoaded) false
    else {
      // The gate established the target holds only uncommitted debris (or
      // nothing): delete it explicitly, then write with errorifexists so
      // two CONCURRENT loaders that both passed the gate race to create
      // the path — the loser fails loudly instead of silently clobbering
      // the winner's committed output (the overwrite mode this replaces
      // let both proceed).
      if (fs.exists(out)) fs.delete(out, true)
      prepare(spark.read.parquet(inPath), orderCol, validateDim, allowMultiPolygon)
        .write.mode("errorifexists").parquet(outPath)
      if (geoParquet)
        graft.sources.LayersTable.stampGeoParquet(spark, outPath, "geom")
      true
    }
  }
}
