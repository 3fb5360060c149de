package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.morton_code

/** Space-filling-curve physical layout (the engine's GiST-index analogue,
  * SURVEY.md §2.1 S5): range-partition and sort rows by their Z-order
  * key before writing, so each output file covers a compact spatial cell
  * and its parquet min/max statistics on the coordinate columns are
  * tight. Combined with [[graft.plans.SpatialFilterPushdown]]'s derived
  * bbox conjuncts, spatial scans then skip the files/row groups whose
  * extent cannot match — the batch equivalent of an R-tree probe.
  */
object SpatialLayout {

  /** Add a Z-order key and cluster by it: repartitionByRange gives each
    * output partition a contiguous curve segment (compact spatial cell);
    * sortWithinPartitions tightens per-row-group stats inside each file.
    */
  def cluster(df: DataFrame, lonCol: Column, latCol: Column,
              numPartitions: Int): DataFrame =
    df.withColumn("__z", morton_code(lonCol, latCol))
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")

  /** Cluster and write: `spatialWrite(df, x, y, 64, path)`. */
  def write(df: DataFrame, lonCol: Column, latCol: Column,
            numPartitions: Int, path: String): Unit =
    cluster(df, lonCol, latCol, numPartitions).write.mode("overwrite").parquet(path)
}
