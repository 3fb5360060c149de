package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed managed tables — the 100 TB co-location primitive. Writing
  * both sides of a recurring join bucketed (and sorted) by the join key
  * lets Catalyst plan a SortMergeJoin with NO Exchange on either side:
  * the shuffle is paid once at write time and amortized over every
  * subsequent join, which is the standard physical design for fact-fact
  * joins (orders x lineitem) at scale.
  */
object BucketedTables {

  /** Write `df` as a managed parquet table bucketed+sorted by `key`. */
  def write(df: DataFrame, table: String, key: String, numBuckets: Int,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    LayersTable.validateIdentifier(table)
    df.write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
