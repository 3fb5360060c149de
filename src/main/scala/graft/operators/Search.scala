package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._
import graft.functions.Geo

/** The reference's core capability, re-expressed as a Spark planner: the
  * parameterized hybrid semantic+spatial search of
  * `backend/models.py:114-193` / `backend/app.py:38-57`.
  *
  * Query shape (reference `backend/models.py:186-191`):
  *   SELECT <text fields> FROM layers
  *   WHERE LOWER(type) = ANY(<lowered probes>)          -- optional, P3
  *     AND ST_Intersects(geom, ST_SetSRID(ST_MakePoint(lon, lat), 4326))
  *   ORDER BY embeddings <=> <probe vector>             -- V1 cosine
  *   LIMIT k OFFSET s                                   -- V2/V3
  *
  * Deliberately-preserved reference quirks (SURVEY.md §7.5):
  *  - type probes are lowercased client-side and empty strings dropped;
  *    the filter clause is omitted entirely (plan-time) when the list is
  *    empty (`backend/models.py:159-164`);
  *  - validate-before-reproject: the raw coordinates are range-checked
  *    against +-180/+-90 BEFORE reprojection, so e.g. EPSG:3857 points
  *    beyond ~180 m of the origin are rejected (`backend/models.py:45-64`);
  *  - limit in [1,10] (default 5) and skip >= 0 are request-level errors,
  *    not clamps (`backend/models.py:23-25,89-95`);
  *  - execution errors are captured in the response envelope
  *    ({layers: null, error}) while validation errors propagate — matching
  *    the reference's HTTP 422 vs in-body error split (`backend/app.py:49-53`);
  *  - documented deviation: a deterministic (dist, id) tie-break; the
  *    reference's top-N heapsort leaves ties unordered (SURVEY.md §2.5 V2).
  *
  * Physical plan at any scale: parquet scan (text-column pruning keeps the
  * 4 KB embeddings column out of the projection until the distance is
  * computed) -> filters -> codegen cosine distance -> TakeOrderedAndProject
  * (per-partition top-(skip+limit) heaps, driver merge) -> project. No
  * shuffle of the corpus, embarrassingly parallel across files.
  */
object Search {

  /** Six output columns; embeddings/geom never leave the engine
    * (`backend/models.py:27` TEXT_FIELDS).
    */
  val TextFields: Seq[String] =
    Seq("id", "name", "type", "description", "url", "metadata_text")

  val MinLimit = 1
  val MaxLimit = 10
  val DefaultLimit = 5

  /** API-level point, `backend/models.py:30-42`. */
  case class Point(longitude: Double, latitude: Double, epsg: Int = 4326) {
    /** Reproject to 4326 (reference F6). Raw-coordinate validation happens
      * in [[Search.validate]] BEFORE this is called — the quirk.
      */
    def to4326: Point =
      if (epsg == 4326) this
      else {
        val (x, y) = Geo.transformPoint(longitude, latitude, epsg, 4326)
        Point(x, y, 4326)
      }
  }

  /** `backend/models.py:75-102`, with the probe vector precomputed
    * (embedding is outside the engine boundary — SURVEY.md §2.7 F8).
    */
  case class SearchRequest(
      probe: Array[Float],
      typeFilter: Option[Seq[String]] = None,
      inputPoint: Option[Point] = None,
      skip: Int = 0,
      limit: Int = DefaultLimit)

  case class LayerResult(id: String, name: String, `type`: String,
      description: String, url: String, metadata_text: String)

  /** `{layers, error}` envelope, `backend/app.py:49-56`. */
  case class SearchResponse(layers: Option[Seq[LayerResult]], error: Option[String])

  /** Request-level validation (reference P6; violations are errors, not
    * clamps or row filters).
    */
  def validate(req: SearchRequest): Unit = {
    require(req.limit >= MinLimit && req.limit <= MaxLimit,
      s"limit must be in [$MinLimit, $MaxLimit], got ${req.limit}")
    require(req.skip >= 0, s"skip must be >= 0, got ${req.skip}")
    req.inputPoint.foreach { p =>
      // Validate RAW coordinates before reprojection (reference quirk F6).
      require(p.longitude >= -180 && p.longitude <= 180,
        s"longitude out of range [-180, 180]: ${p.longitude}")
      require(p.latitude >= -90 && p.latitude <= 90,
        s"latitude out of range [-90, 90]: ${p.latitude}")
    }
  }

  /** Beyond this many skipped rows, the offset path's physical plan
    * (TakeOrdered heaps of skip+limit rows per partition, skip+limit rows
    * collected to the driver) becomes the SURVEY §7.5 liability. The
    * reference's own caps (skip is unbounded but limit <= 10 and real
    * requests page shallowly) keep gate traffic on the offset path; the
    * deep path serves lifted-cap deployments.
    */
  val DeepSkipThreshold = 1000

  /** Assemble the logical plan. Filters absent from the request are
    * omitted from the plan (not evaluated as no-ops) — reference P5.
    */
  def plan(layers: DataFrame, req: SearchRequest): DataFrame = {
    validate(req)
    // Locale.ROOT: Spark's lower() is locale-independent, so the client-side
    // probe lowering must be too (default-locale toLowerCase turns 'I' into
    // a dotless 'ı' under a Turkish JVM and silently matches nothing).
    val probes = req.typeFilter.getOrElse(Nil).filter(_.nonEmpty)
      .map(_.toLowerCase(java.util.Locale.ROOT))
    val point = req.inputPoint.map(_.to4326)

    var df = layers
    if (probes.nonEmpty)
      df = df.filter(lower(col("type")).isin(probes: _*))
    point.foreach { p =>
      df = df.filter(st_intersects(col("geom"),
        st_point(lit(p.longitude), lit(p.latitude))))
    }
    val ranked = df.withColumn("dist",
      cosine_distance(col("embeddings"), vector_lit(req.probe)))
    if (req.skip <= DeepSkipThreshold)
      ranked
        .orderBy(col("dist").asc, col("id").asc)
        .offset(req.skip)
        .limit(req.limit)
        .select(TextFields.map(col): _*)
    else deepPage(ranked, req)
  }

  /** Deep-skip pagination: a range-partitioned global sort plus
    * distributed ordinal assignment (`zipWithIndex` — one per-partition
    * count pass, order-preserving), then a filter to the requested
    * ordinal window. Total work is a full sort instead of top-k heaps —
    * more than the offset path for shallow pages, but no skip-sized state
    * ever concentrates on one executor or the driver: only `limit` rows
    * leave the cluster regardless of skip depth.
    */
  private def deepPage(ranked: DataFrame, req: SearchRequest): DataFrame = {
    val spark = ranked.sparkSession
    val sorted = ranked
      .orderBy(col("dist").asc, col("id").asc)
      .select(TextFields.map(col): _*)
    val page = sorted.rdd.zipWithIndex()
      .filter { case (_, i) => i >= req.skip && i < req.skip.toLong + req.limit }
      .map(_._1)
    spark.createDataFrame(page, sorted.schema)
  }

  /** Execute with the reference's error envelope: validation errors
    * propagate (HTTP-422 analogue); execution errors land in `error`.
    */
  def search(layers: DataFrame, req: SearchRequest): SearchResponse = {
    validate(req) // request-level errors propagate (HTTP-422 analogue)
    try {
      val rows = plan(layers, req).collect().toSeq.map { r: Row =>
        LayerResult(r.getString(0), r.getString(1), r.getString(2),
          r.getString(3), r.getString(4), r.getString(5))
      }
      SearchResponse(Some(rows), None)
    } catch {
      case e: Exception => SearchResponse(None, Some(e.getMessage))
    }
  }
}
