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
}
