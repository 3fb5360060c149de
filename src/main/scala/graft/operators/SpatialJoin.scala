package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-partitioned spatial join — the spatial analogue of
  * [[RangeJoin.bucketed]]: a point-in-rectangle theta join
  * (`x BETWEEN minx AND maxx AND y BETWEEN miny AND maxy`) that Catalyst
  * can only nest-loop becomes a shuffled EQUI-join on a grid cell id.
  *
  * Rewrite: tile the plane with cellW x cellH cells. Each rectangle
  * emits every cell its bbox overlaps (bounded — see the guard); each
  * point emits exactly ONE cell. A (point, rect) pair that matches
  * meets in precisely the point's cell, so the equi-join on
  * (cellx, celly) + the exact containment predicate is the theta
  * join's result with no post-join distinct and no pair-space blowup.
  * The shuffle key is the cell id; the points side is never
  * replicated (the grid-file spatial-join shape, Patel & DeWitt 1996,
  * public).
  *
  * Cell indices are floor(coord / cell) — one IEEE division + floor,
  * bit-identical on any engine, negative-safe. Sizing: pick cells no
  * smaller than the typical rectangle (cells-per-rect stays O(1)) and
  * no larger than a few times it (each cell's candidate population
  * stays small). The guard computes the WORST rectangle's cell count
  * with one bounded aggregate BEFORE the explode and refuses loudly
  * past `maxCellsPerRect`, naming the knobs — the e10/d2 posture.
  *
  * This is the bbox FILTER stage of the standard filter+refine spatial
  * join; for non-rectangular geometry pass the exact JTS predicate
  * (st_intersects/st_contains) as `refine` and it runs on the
  * grid-joined candidates only.
  */
object SpatialJoin {

  private def cellIdx(c: Column, size: Double): Column =
    floor(c / lit(size)).cast("long")

  def gridBboxJoin(points: DataFrame, px: String, py: String,
                   rects: DataFrame, minx: String, miny: String,
                   maxx: String, maxy: String,
                   cellW: Double, cellH: Double,
                   maxCellsPerRect: Long = 64L,
                   refine: Option[Column] = None): DataFrame = {
    require(cellW > 0 && cellH > 0, s"cell sizes must be positive: $cellW x $cellH")

    val cellsX = cellIdx(col(maxx), cellW) - cellIdx(col(minx), cellW) + lit(1L)
    val cellsY = cellIdx(col(maxy), cellH) - cellIdx(col(miny), cellH) + lit(1L)
    val worstRow = rects.agg(max(cellsX * cellsY)).head()
    val worst = if (worstRow.isNullAt(0)) 0L else worstRow.getLong(0)
    require(worst <= maxCellsPerRect,
      s"gridBboxJoin: a rectangle overlaps $worst grid cells " +
        s"(> $maxCellsPerRect) at cell $cellW x $cellH — grow the cells " +
        "toward the rectangle size, or raise maxCellsPerRect deliberately")

    val tiled = rects
      .withColumn("__cx", explode(sequence(cellIdx(col(minx), cellW),
        cellIdx(col(maxx), cellW))))
      .withColumn("__cy", explode(sequence(cellIdx(col(miny), cellH),
        cellIdx(col(maxy), cellH))))
    val keyed = points
      .withColumn("__cx", cellIdx(col(px), cellW))
      .withColumn("__cy", cellIdx(col(py), cellH))

    val contained = keyed.join(tiled, Seq("__cx", "__cy"))
      .filter(col(px).between(col(minx), col(maxx)) &&
        col(py).between(col(miny), col(maxy)))
      .drop("__cx", "__cy")
    refine.fold(contained)(contained.filter)
  }

  /** Polygon-polygon spatial join, filter+refine: bbox-OVERLAP
    * candidates from the same grid rewrite as [[gridBboxJoin]], each
    * matching pair reported exactly once, then the exact JTS predicate
    * on candidates only.
    *
    * Rewrite: both sides tile their bboxes to overlapped cells and meet
    * in a shuffled equi-join on the cell id. Overlapping bboxes share
    * every cell their INTERSECTION covers, so a plain cell join would
    * duplicate pairs; instead a pair is emitted only in its reporting
    * cell — the cell holding the intersection's min corner,
    * (max(cellIdx(aminx), cellIdx(bminx)), max(cellIdx(aminy),
    * cellIdx(bminy))) — the reference-point de-duplication of the
    * partition-based spatial-merge join family (Patel & DeWitt 1996;
    * the reference-point variant as in SpatialHadoop, Eldawy & Mokbel
    * 2015 — both public). No post-join distinct, no pair-space blowup.
    *
    * Guards, the s7 posture: the worst bbox's cell count is checked on
    * BOTH sides before any explode (cells-per-rect stays O(1)), and the
    * candidate-pair volume is counted EXACTLY from the two per-cell
    * occupancy tables (cell-count sized, persisted for the estimate
    * only) and refused loudly past `maxCandidates` BEFORE the pair join
    * materializes anything.
    *
    * The two inputs' column names must be disjoint (alias before
    * calling); `refine` runs the exact geometry predicate
    * (st_intersects on the real polygons) over the bbox candidates
    * only — for axis-aligned rectangles it is equivalent to the bbox
    * filter, for general polygons it is the correctness step.
    */
  def gridBboxOverlapJoin(left: DataFrame,
                          lminx: String, lminy: String, lmaxx: String, lmaxy: String,
                          right: DataFrame,
                          rminx: String, rminy: String, rmaxx: String, rmaxy: String,
                          cellW: Double, cellH: Double,
                          maxCellsPerRect: Long = 64L,
                          maxCandidates: Long = 50000000L,
                          refine: Option[Column] = None): DataFrame = {
    require(cellW > 0 && cellH > 0, s"cell sizes must be positive: $cellW x $cellH")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"gridBboxOverlapJoin: column names must be disjoint, both sides carry ${overlap.mkString(",")}")

    def guardCells(df: DataFrame, minx: String, miny: String,
                   maxx: String, maxy: String, side: String): Unit = {
      val cellsX = cellIdx(col(maxx), cellW) - cellIdx(col(minx), cellW) + lit(1L)
      val cellsY = cellIdx(col(maxy), cellH) - cellIdx(col(miny), cellH) + lit(1L)
      val worstRow = df.agg(max(cellsX * cellsY)).head()
      val worst = if (worstRow.isNullAt(0)) 0L else worstRow.getLong(0)
      require(worst <= maxCellsPerRect,
        s"gridBboxOverlapJoin: a $side bbox overlaps $worst grid cells " +
          s"(> $maxCellsPerRect) at cell $cellW x $cellH — grow the cells " +
          "toward the bbox size, or raise maxCellsPerRect deliberately")
    }
    guardCells(left, lminx, lminy, lmaxx, lmaxy, "left")
    guardCells(right, rminx, rminy, rmaxx, rmaxy, "right")

    def tiled(df: DataFrame, minx: String, miny: String,
              maxx: String, maxy: String): DataFrame = df
      .withColumn("__cx", explode(sequence(cellIdx(col(minx), cellW),
        cellIdx(col(maxx), cellW))))
      .withColumn("__cy", explode(sequence(cellIdx(col(miny), cellH),
        cellIdx(col(maxy), cellH))))
    def occupancy(df: DataFrame, minx: String, miny: String,
                  maxx: String, maxy: String): DataFrame =
      tiled(df, minx, miny, maxx, maxy)
        .groupBy(col("__cx"), col("__cy")).agg(count(lit(1)).as("n"))

    val locc = occupancy(left, lminx, lminy, lmaxx, lmaxy)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rocc = occupancy(right, rminx, rminy, rmaxx, rmaxy)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val estRow = locc.withColumnRenamed("n", "na")
        .join(rocc.withColumnRenamed("n", "nb"), Seq("__cx", "__cy"))
        .agg(sum(col("na") * col("nb"))).head()
      val est = if (estRow.isNullAt(0)) 0L else estRow.getLong(0)
      require(est <= maxCandidates,
        s"gridBboxOverlapJoin: ~$est candidate pairs at cell $cellW x $cellH " +
          s"(> $maxCandidates) — hot grid cells; resize the cells, " +
          "pre-filter the inputs, or raise maxCandidates deliberately")
    } finally { locc.unpersist(); rocc.unpersist() }

    val candidates = tiled(left, lminx, lminy, lmaxx, lmaxy)
      .join(tiled(right, rminx, rminy, rmaxx, rmaxy), Seq("__cx", "__cy"))
      // bbox overlap, inclusive on boundaries (OGC intersects for rects)
      .filter(col(lminx) <= col(rmaxx) && col(rminx) <= col(lmaxx) &&
        col(lminy) <= col(rmaxy) && col(rminy) <= col(lmaxy))
      // reporting cell: emit the pair only where the intersection starts
      .filter(col("__cx") === greatest(cellIdx(col(lminx), cellW),
          cellIdx(col(rminx), cellW)) &&
        col("__cy") === greatest(cellIdx(col(lminy), cellH),
          cellIdx(col(rminy), cellH)))
      .drop("__cx", "__cy")
    refine.fold(candidates)(candidates.filter)
  }

  private val NineOffsets: Column = array((for {
    dx <- -1 to 1; dy <- -1 to 1
  } yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))): _*)

  /** Distance self-join (the ST_DWithin shape): pairs (id1 < id2) within
    * euclidean `radius`. Grid with cell size = radius: each point homes
    * in exactly ONE cell; the left side replicates to its 3x3
    * neighborhood, so a qualifying pair (always <= 1 cell apart on each
    * axis) meets exactly once per orientation and the id1 < id2 filter
    * keeps one row — no post-join distinct. The verify compares SQUARED
    * distance against radius^2 (the identical IEEE expression the oracle
    * states; no sqrt).
    *
    * Scale shape: shuffle key = cell id; candidate volume is counted
    * EXACTLY before the pair join from the 9-neighborhood occupancy
    * join (cells x 9 rows — tiny) and refused loudly past
    * `maxCandidates`, the s6/e10 guard posture. Dense hot cells are the
    * caller's signal to shrink `radius`'s cell (or pre-aggregate).
    */
  def withinDistanceJoin(points: DataFrame, idCol: String,
                         xCol: String, yCol: String, radius: Double,
                         maxCandidates: Long = 50000000L): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val pts = points.select(col(idCol).as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .withColumn("cx", cellIdx(col("x"), radius))
      .withColumn("cy", cellIdx(col("y"), radius))
    val occ = pts.groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val estRow = occ
        .select(col("cx"), col("cy"), col("n").as("na"), explode(NineOffsets).as("o"))
        .select((col("cx") + col("o.dx")).as("jcx"),
          (col("cy") + col("o.dy")).as("jcy"), col("na"))
        .join(occ.select(col("cx").as("jcx"), col("cy").as("jcy"),
          col("n").as("nb")), Seq("jcx", "jcy"))
        .agg(sum(col("na") * col("nb"))).head()
      val est = if (estRow.isNullAt(0)) 0L else estRow.getLong(0)
      require(est <= maxCandidates,
        s"withinDistanceJoin: ~$est candidate pairs at radius $radius " +
          s"(> $maxCandidates) — hot grid cells; shrink the radius, " +
          "pre-aggregate dense sites, or raise maxCandidates deliberately")
      val reps = pts.select(col("id").as("id1"),
          col("x").as("x1"), col("y").as("y1"),
          col("cx"), col("cy"), explode(NineOffsets).as("o"))
        .select(col("id1"), col("x1"), col("y1"),
          (col("cx") + col("o.dx")).as("jcx"), (col("cy") + col("o.dy")).as("jcy"))
      val homes = pts.select(col("id").as("id2"),
        col("x").as("x2"), col("y").as("y2"),
        col("cx").as("jcx"), col("cy").as("jcy"))
      reps.join(homes, Seq("jcx", "jcy"))
        .filter(col("id1") < col("id2"))
        .filter((col("x1") - col("x2")) * (col("x1") - col("x2")) +
          (col("y1") - col("y2")) * (col("y1") - col("y2")) <= lit(radius * radius))
        .select(col("id1"), col("id2"))
    } finally occ.unpersist()
  }

  /** k-nearest-WITHIN-RADIUS join (the bounded spatial kNN join): for
    * every probe point, the k nearest corpus points among those within
    * euclidean `radius`, rank-deterministic on (squared distance,
    * corpus id). The radius bound is what makes a kNN join gridable at
    * all: cell = radius, probes replicate to their 3x3 neighborhood,
    * corpus points home once, candidates verify on the exact squared
    * distance, and the per-probe top-k runs through the bounded
    * `topk_by` heap — the exchange after the grid join carries
    * probes x partitions x k rows, never the candidate volume (the q28
    * argument), while the candidate volume itself is counted exactly
    * from the two occupancy tables and refused past `maxCandidates`
    * (the s6/s7 guard posture).
    *
    * Unbounded exact kNN (no radius) deliberately does NOT fit here: a
    * probe in an empty region needs ring expansion with data-dependent
    * rounds. Callers wanting that semantics use Knn.knnJoin on
    * coordinates-as-vectors; this operator is the GIS "nearest
    * facilities within 5 km" shape.
    */
  def knnWithinJoin(probes: DataFrame, pId: String, px: String, py: String,
                    corpus: DataFrame, cId: String, cx: String, cy: String,
                    radius: Double, k: Int,
                    maxCandidates: Long = 50000000L): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    require(k >= 1, s"k must be >= 1, got $k")
    val pr = probes.select(col(pId).as("pid"),
        col(px).cast("double").as("px1"), col(py).cast("double").as("py1"))
      .withColumn("cx0", cellIdx(col("px1"), radius))
      .withColumn("cy0", cellIdx(col("py1"), radius))
    val co = corpus.select(col(cId).as("cid"),
        col(cx).cast("double").as("cx2"), col(cy).cast("double").as("cy2"))
      .withColumn("jcx", cellIdx(col("cx2"), radius))
      .withColumn("jcy", cellIdx(col("cy2"), radius))
    val cocc = co.groupBy(col("jcx"), col("jcy")).agg(count(lit(1)).as("nc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val estRow = pr.groupBy(col("cx0"), col("cy0")).agg(count(lit(1)).as("np"))
        .select(col("np"), explode(NineOffsets).as("o"), col("cx0"), col("cy0"))
        .select((col("cx0") + col("o.dx")).as("jcx"),
          (col("cy0") + col("o.dy")).as("jcy"), col("np"))
        .join(cocc, Seq("jcx", "jcy"))
        .agg(sum(col("np") * col("nc"))).head()
      val est = if (estRow.isNullAt(0)) 0L else estRow.getLong(0)
      require(est <= maxCandidates,
        s"knnWithinJoin: ~$est candidate pairs at radius $radius " +
          s"(> $maxCandidates) — hot grid cells; shrink the radius, " +
          "pre-filter the corpus, or raise maxCandidates deliberately")
      val reps = pr
        .select(col("pid"), col("px1"), col("py1"),
          col("cx0"), col("cy0"), explode(NineOffsets).as("o"))
        .select(col("pid"), col("px1"), col("py1"),
          (col("cx0") + col("o.dx")).as("jcx"), (col("cy0") + col("o.dy")).as("jcy"))
      val d2 = (col("px1") - col("cx2")) * (col("px1") - col("cx2")) +
        (col("py1") - col("cy2")) * (col("py1") - col("cy2"))
      reps.join(co, Seq("jcx", "jcy"))
        .withColumn("d2", d2)
        .filter(col("d2") <= lit(radius * radius))
        .groupBy(col("pid"))
        .agg(graft.functions.GraftFunctions.topk_by(
          struct(col("d2"), col("cid")), struct(col("cid"), col("d2")), k).as("top"))
        .select(col("pid"), posexplode(col("top")).as(Seq("rnk", "r")))
        .select(col("pid"), (col("rnk") + 1).cast("long").as("rnk"),
          col("r.cid").as("cid"), col("r.d2").as("d2"))
    } finally cocc.unpersist()
  }
}
