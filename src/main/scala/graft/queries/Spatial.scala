package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Spatial predicate coverage with a DuckDB oracle and NO spatial
  * extension on the oracle side: the Spark plans run the real JTS
  * expressions (st_point / st_geomfromtext / st_intersects / st_contains /
  * st_distance) while the oracle states the same predicate as plain
  * arithmetic — exact for axis-aligned rectangles (OGC intersects on a
  * rectangle == inclusive BETWEEN on both axes; OGC contains == strict
  * inequalities, boundary excluded) and for point-point euclidean
  * distance (identical IEEE expression). Non-rectangular geometry,
  * vertex cases, and CRS transforms are covered in ScalaTest
  * (SpatialSpec) instead.
  *
  * Synthetic coordinates are derived from customer keys with integer
  * arithmetic + one double division — bit-identical on both engines.
  */
object Spatial extends QueryPack {

  // lon in [-180, 179] + small fraction, lat in [-90, 89] + small fraction
  private def xCol: Column =
    ((col("c_custkey") * 7) % 360 - 180 + col("c_nationkey") / 100.0).as("x")
  private def yCol: Column =
    ((col("c_custkey") * 3) % 180 - 90 + col("c_nationkey") / 100.0).as("y")
  private val xSql = "((c_custkey * 7) % 360 - 180 + c_nationkey / 100.0)"
  private val ySql = "((c_custkey * 3) % 180 - 90 + c_nationkey / 100.0)"

  private val RectWkt =
    "POLYGON ((-50 -20, 40 -20, 40 35, -50 35, -50 -20))"

  private def points(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"), xCol, yCol)

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Point-in-polygon via real JTS intersects against a constant polygon
    // (the reference's P4 shape with geom/point roles exercised both ways).
    "s1_point_in_rect" -> { (s, d) =>
      points(s, d)
        .filter(st_intersects(st_geomfromtext(lit(RectWkt)),
          st_point(col("x"), col("y"))))
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // st_contains: the strict interior test — boundary points are NOT
    // contained (OGC/JTS), so the oracle states strict inequalities where
    // s1's intersects states inclusive BETWEEN. The distinction is live:
    // c_nationkey = 0 rows have integer coordinates, and at sf0.1 two of
    // them land exactly on the rectangle's x = 40 edge (s1 counts them,
    // s2 must not — an inclusive oracle here overcounted by 2).
    "s2_rect_contains" -> { (s, d) =>
      points(s, d)
        .filter(st_contains(st_geomfromtext(lit(RectWkt)),
          st_point(col("x"), col("y"))))
        .agg(count(lit(1)).as("n_inside"))
    },

    // Within-distance (point-point euclidean, identical IEEE both sides).
    "s3_within_distance" -> { (s, d) =>
      points(s, d)
        .filter(st_distance(st_point(col("x"), col("y")),
          st_point(lit(5.0), lit(5.0))) < 30.0)
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    },

    // Spatial kNN: 20 nearest points to a probe location — the spatial
    // twin of v1 (TakeOrderedAndProject again).
    "s4_nearest_points" -> { (s, d) =>
      points(s, d)
        .withColumn("sdist", st_distance(st_point(col("x"), col("y")),
          st_point(lit(-81.27), lit(28.80))))
        .orderBy(col("sdist").asc, col("c_custkey").asc)
        .limit(20)
        .select(col("c_custkey"))
    },

    // GEODESIC nearest neighbors (PostGIS ST_DistanceSphere): s4's
    // planar query done right on lon/lat — haversine meters on the
    // IUGG sphere. Near the poles and across the antimeridian the two
    // orderings genuinely differ, which is the point. Output is ids
    // only (ordering compare): the synthetic grid's distance gaps are
    // kilometers, far above any libm last-ulp divergence.
    "s10_sphere_nearest" -> { (s, d) =>
      points(s, d)
        .withColumn("gdist", st_distance_sphere(st_point(col("x"), col("y")),
          st_point(lit(-81.27), lit(28.80))))
        .orderBy(col("gdist").asc, col("c_custkey").asc)
        .limit(20)
        .select(col("c_custkey"))
    },

    // Web-Mercator grid binning (heatmap/tiling aggregation): points
    // reprojected through the engine's CRS stack (st_transform_point ->
    // EPSG:3857), bucketed into 1000 km cells, counted per cell. The
    // oracle restates the spherical Mercator formulas arithmetically;
    // FLOOR at megameter scale absorbs last-ulp libm differences (a cell
    // flip would need a point within ~1e-7 m of a cell edge). Mercator's
    // defined band only (|lat| <= ~85) — poles excluded by the filter.
    "s5_mercator_grid" -> { (s, d) =>
      points(s, d)
        .filter(col("y").between(-85.0, 85.0))
        .select(st_transform_point(col("x"), col("y"), lit(4326), lit(3857)).as("p"))
        .groupBy(floor(col("p.x") / 1e6).cast("long").as("cell_x"),
          floor(col("p.y") / 1e6).cast("long").as("cell_y"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("cell_x"), col("cell_y"))
    },

    // distributed spatial JOIN (point-in-rectangle, many x many): the
    // grid rewrite turns the BETWEEN theta join Catalyst would
    // nest-loop into an equi-join on the cell id (SpatialJoin.
    // gridBboxJoin — a pair meets in exactly the point's cell, so no
    // distinct). Supplier-derived rectangles, 6 x 4 degrees, cells
    // sized to the rectangle.
    "s6_grid_spatial_join" -> { (s, d) =>
      graft.operators.SpatialJoin.gridBboxJoin(
        points(s, d), "x", "y",
        rects(s, d), "minx", "miny", "maxx", "maxy",
        cellW = 6.0, cellH = 4.0)
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },

    // distance self-join (ST_DWithin shape): customer pairs within
    // radius 2 via the radius-sized grid — one home cell per point,
    // 3x3 replication on one side, exact squared-distance verify
    "s7_within_distance_join" -> { (s, d) =>
      graft.operators.SpatialJoin.withinDistanceJoin(
        points(s, d), "c_custkey", "x", "y", radius = 2.0)
        .orderBy(col("id1"), col("id2"))
    },

    // k-nearest-within-radius join (the GIS "nearest facilities within
    // r" shape): every supplier probe gets its 3 nearest customers
    // within radius 5, rank-deterministic on (squared distance, id) —
    // the radius-sized grid + the q28 bounded heap. The oracle states
    // the plain cross-distance theta join + ROW_NUMBER the grid and
    // heap must be invisible against.
    "s9_knn_within_join" -> { (s, d) =>
      val probes = Tables.supplier(s, d).select(col("s_suppkey"),
        ((col("s_suppkey") * 7) % 360 - 180 + col("s_nationkey") / 100.0).as("x"),
        ((col("s_suppkey") * 3) % 180 - 90 + col("s_nationkey") / 100.0).as("y"))
      graft.operators.SpatialJoin.knnWithinJoin(
        probes, "s_suppkey", "x", "y",
        points(s, d), "c_custkey", "x", "y", radius = 5.0, k = 3)
        .orderBy(col("pid"), col("rnk"))
    },

    // polygon-polygon spatial join (many x many bbox OVERLAP, the shape
    // a GIS-metadata corpus needs beyond s6's point-in-rect): both
    // sides tile to grid cells, pairs meet once in the reporting cell
    // (the intersection's min corner — no distinct), and the exact JTS
    // st_intersects runs on the REAL polygons of the candidates only.
    // Axis-aligned rectangles keep the oracle exact (OGC intersects ==
    // inclusive interval overlap on both axes — the s1/s2 precedent);
    // rotated-polygon refine behavior is covered in SpatialSpec.
    "s8_polygon_overlap_join" -> { (s, d) =>
      def rectWkt(minx: Column, miny: Column, maxx: Column, maxy: Column): Column =
        concat(lit("POLYGON (("),
          minx.cast("string"), lit(" "), miny.cast("string"), lit(", "),
          maxx.cast("string"), lit(" "), miny.cast("string"), lit(", "),
          maxx.cast("string"), lit(" "), maxy.cast("string"), lit(", "),
          minx.cast("string"), lit(" "), maxy.cast("string"), lit(", "),
          minx.cast("string"), lit(" "), miny.cast("string"), lit("))"))
      val refine = st_intersects(
        st_geomfromtext(rectWkt(col("cminx"), col("cminy"), col("cmaxx"), col("cmaxy"))),
        st_geomfromtext(rectWkt(col("minx"), col("miny"), col("maxx"), col("maxy"))))
      graft.operators.SpatialJoin.gridBboxOverlapJoin(
        custRects(s, d), "cminx", "cminy", "cmaxx", "cmaxy",
        rects(s, d), "minx", "miny", "maxx", "maxy",
        cellW = 6.0, cellH = 4.0, refine = Some(refine))
        .select(col("c_custkey"), col("s_suppkey"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    }
  )

  // customer-derived axis-aligned rectangles for the polygon join's left
  // side (2.0 x 1.4 degrees, same arithmetic discipline; names prefixed
  // so the two sides' columns stay disjoint)
  private def custRects(s: SparkSession, d: String): DataFrame = {
    val cx = (col("c_custkey") * 7) % 360 - 180 + col("c_nationkey") / 100.0
    val cy = (col("c_custkey") * 3) % 180 - 90 + col("c_nationkey") / 100.0
    Tables.customer(s, d).select(col("c_custkey"),
      (cx - 1.0).as("cminx"), (cy - 0.7).as("cminy"),
      (cx + 1.0).as("cmaxx"), (cy + 0.7).as("cmaxy"))
  }

  // supplier-derived axis-aligned rectangles (same integer + one-division
  // arithmetic discipline as the point coordinates)
  private def rects(s: SparkSession, d: String): DataFrame = {
    val cx = (col("s_suppkey") * 11) % 360 - 180 + col("s_nationkey") / 100.0
    val cy = (col("s_suppkey") * 5) % 180 - 90 + col("s_nationkey") / 100.0
    Tables.supplier(s, d).select(col("s_suppkey"),
      (cx - 3.0).as("minx"), (cy - 2.0).as("miny"),
      (cx + 3.0).as("maxx"), (cy + 2.0).as("maxy"))
  }

  def sql: Map[String, String] = Map(
    "s1_point_in_rect" ->
      s"""SELECT c_custkey FROM customer
         |WHERE $xSql BETWEEN -50 AND 40 AND $ySql BETWEEN -20 AND 35
         |ORDER BY c_custkey""".stripMargin,

    "s2_rect_contains" ->
      s"""SELECT COUNT(*) AS n_inside FROM customer
         |WHERE $xSql > -50 AND $xSql < 40 AND $ySql > -20 AND $ySql < 35""".stripMargin,

    "s3_within_distance" ->
      s"""SELECT c_custkey FROM customer
         |WHERE SQRT(($xSql - 5.0) * ($xSql - 5.0) + ($ySql - 5.0) * ($ySql - 5.0)) < 30.0
         |ORDER BY c_custkey""".stripMargin,

    "s4_nearest_points" ->
      s"""SELECT c_custkey FROM customer
         |ORDER BY SQRT(($xSql - (-81.27)) * ($xSql - (-81.27)) +
         |              ($ySql - 28.80) * ($ySql - 28.80)) ASC, c_custkey ASC
         |LIMIT 20""".stripMargin,

    // the same haversine stated in SQL trig (asin form, IUGG radius)
    "s10_sphere_nearest" ->
      s"""SELECT c_custkey FROM customer
         |ORDER BY 2 * 6371008.8 * ASIN(LEAST(1.0, SQRT(
         |    POWER(SIN(RADIANS(($ySql) - 28.80) / 2), 2)
         |    + COS(RADIANS(28.80)) * COS(RADIANS($ySql))
         |      * POWER(SIN(RADIANS(($xSql) - (-81.27)) / 2), 2)))) ASC,
         |  c_custkey ASC
         |LIMIT 20""".stripMargin,

    // the plain theta join the grid rewrite must equal (DuckDB IEJoin
    // executes it directly); inclusive bbox containment on both axes
    "s6_grid_spatial_join" ->
      s"""WITH r AS (
         |  SELECT s_suppkey,
         |    ((s_suppkey * 11) % 360 - 180 + s_nationkey / 100.0) - 3.0 AS minx,
         |    ((s_suppkey * 5) % 180 - 90 + s_nationkey / 100.0) - 2.0 AS miny,
         |    ((s_suppkey * 11) % 360 - 180 + s_nationkey / 100.0) + 3.0 AS maxx,
         |    ((s_suppkey * 5) % 180 - 90 + s_nationkey / 100.0) + 2.0 AS maxy
         |  FROM supplier)
         |SELECT c_custkey, s_suppkey
         |FROM customer JOIN r
         |  ON $xSql BETWEEN r.minx AND r.maxx
         | AND $ySql BETWEEN r.miny AND r.maxy
         |ORDER BY c_custkey, s_suppkey""".stripMargin,

    // the plain distance theta join the grid must be invisible against;
    // same squared-distance expression, no sqrt
    "s7_within_distance_join" ->
      s"""WITH p AS (SELECT c_custkey AS id, $xSql AS x, $ySql AS y FROM customer)
         |SELECT a.id AS id1, b.id AS id2
         |FROM p a JOIN p b ON a.id < b.id
         |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 4.0
         |ORDER BY id1, id2""".stripMargin,

    // the plain cross-distance + window rank the grid/heap must equal;
    // identical squared-distance association, no sqrt
    "s9_knn_within_join" ->
      s"""WITH p AS (SELECT s_suppkey AS pid,
         |    ((s_suppkey * 7) % 360 - 180 + s_nationkey / 100.0) AS x,
         |    ((s_suppkey * 3) % 180 - 90 + s_nationkey / 100.0) AS y
         |  FROM supplier),
         |c AS (SELECT c_custkey AS cid, $xSql AS x, $ySql AS y FROM customer),
         |j AS (
         |  SELECT pid, cid,
         |    (p.x - c.x) * (p.x - c.x) + (p.y - c.y) * (p.y - c.y) AS d2
         |  FROM p, c),
         |r AS (
         |  SELECT pid, cid, d2,
         |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d2 ASC, cid ASC) AS rnk
         |  FROM j WHERE d2 <= 25.0)
         |SELECT pid, rnk, cid, d2 FROM r WHERE rnk <= 3
         |ORDER BY pid, rnk""".stripMargin,

    // the plain bbox-overlap theta join the grid rewrite + reporting-cell
    // dedup must equal (DuckDB IEJoin executes it directly); inclusive
    // interval overlap on both axes == OGC intersects for rectangles
    "s8_polygon_overlap_join" ->
      s"""WITH c AS (
         |  SELECT c_custkey,
         |    ($xSql) - 1.0 AS cminx, ($ySql) - 0.7 AS cminy,
         |    ($xSql) + 1.0 AS cmaxx, ($ySql) + 0.7 AS cmaxy
         |  FROM customer),
         |r AS (
         |  SELECT s_suppkey,
         |    ((s_suppkey * 11) % 360 - 180 + s_nationkey / 100.0) - 3.0 AS minx,
         |    ((s_suppkey * 5) % 180 - 90 + s_nationkey / 100.0) - 2.0 AS miny,
         |    ((s_suppkey * 11) % 360 - 180 + s_nationkey / 100.0) + 3.0 AS maxx,
         |    ((s_suppkey * 5) % 180 - 90 + s_nationkey / 100.0) + 2.0 AS maxy
         |  FROM supplier)
         |SELECT c_custkey, s_suppkey
         |FROM c JOIN r
         |  ON c.cminx <= r.maxx AND r.minx <= c.cmaxx
         | AND c.cminy <= r.maxy AND r.miny <= c.cmaxy
         |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "s5_mercator_grid" ->
      s"""SELECT
         |  CAST(FLOOR(radians($xSql) * 6378137.0 / 1000000.0) AS BIGINT) AS cell_x,
         |  CAST(FLOOR(ln(tan(pi() / 4 + radians($ySql) / 2)) * 6378137.0 / 1000000.0) AS BIGINT) AS cell_y,
         |  COUNT(*) AS n
         |FROM customer
         |WHERE $ySql BETWEEN -85.0 AND 85.0
         |GROUP BY 1, 2
         |ORDER BY cell_x, cell_y""".stripMargin
  )
}
