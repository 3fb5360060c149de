package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftColumnBridge

import graft.functions.PqEncode

/** The persisted IVF-PQ index — [[Ivf]]'s bucket-pruned layout composed
  * with [[Pq]]'s code compression ON DISK (the on-disk FAISS IVFPQ
  * shape, public): the corpus is stored as PQ codes PARTITIONED BY
  * IVF bucket, with the two tiny sidecars ([[Ivf.save]]'s centroids,
  * [[Pq.save]]'s codebooks) beside it. A query then
  *
  *   1. ranks the nlist centroids on the driver (bounded),
  *   2. reads ONLY the nprobe matching bucket directories — partition
  *      pruning, the v11 mechanism — and
  *   3. ranks the surviving codes by ADC table lookups — the v12
  *      kernel.
  *
  * At 100 TB both reductions compound at the SCAN layer: the bytes
  * touched are (nprobe/nlist) x (M bytes per row instead of 4D) of the
  * corpus, with no join anywhere — the bucket restriction that v13's
  * in-memory composition pays a code/bucket join for disappears into
  * the directory layout, exactly as promised in v13's design note
  * (`graft.queries.Vectors` v13: "with the encoded table stored
  * partitioned by bucket, the code/bucket join disappears into
  * partition pruning").
  *
  * Reference analogue: its pgvector path stores one flat vector column
  * and brute-force scans it (`backend/load_data.py:89-99`); this is the
  * index structure that replaces the scan at scale.
  */
object IvfPq {

  /** Persist: encode the bucket-assigned corpus against `model` and
    * write codes partitioned by bucket, plus both sidecars. One
    * distributed pass over the assignment — the embeddings themselves
    * are NOT stored (ADC answers from codes alone; keep the float
    * corpus only if [[Pq.searchRefine]]-style re-ranking is wanted).
    */
  def save(index: Ivf.IvfIndex, model: Pq.PqModel, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned
      .select(col("id"), col("bucket"),
        GraftColumnBridge.column(PqEncode(
          GraftColumnBridge.expression(col("emb").cast("array<float>")),
          model.flat, model.m, model.k, model.subDim)).as("code"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/codes")
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    val rows = for (j <- 0 until model.m; c <- 0 until model.k)
      yield (j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Query the saved index: centroid ranking on the driver, partition-
    * pruned scan of the nprobe bucket directories, ADC top-k within —
    * the original vectors are never touched.
    */
  def searchSaved(spark: SparkSession, path: String,
                  probe: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val centroids = Ivf.loadCentroids(spark, path)
    val model = Pq.loadModel(spark, path)
    val buckets = Ivf.nearestBuckets(centroids, probe, nprobe)
    val pruned = spark.read.parquet(s"$path/codes")
      .filter(col("bucket").isin(buckets: _*))
    Pq.searchADC(pruned, "code", "id", model, probe, k)
  }

  /** Saved-index search WITH the exact re-rank stage (FAISS IVFPQ+R on
    * the persisted layout): partition-pruned ADC nominates the top-`r`
    * pool from codes alone, then ONLY those `r` rows of the original
    * float corpus are fetched (an isin point-lookup the scan prunes
    * on) and exactly L2-re-ranked to top-k — the [[Pq.searchRefine]]
    * recall mitigation composed with [[searchSaved]]'s pruning. The
    * float corpus is touched for r rows, never scanned.
    */
  def searchSavedRefine(spark: SparkSession, path: String,
                        corpus: DataFrame, corpusIdCol: String, embCol: String,
                        probe: Array[Float], k: Int, r: Int,
                        nprobe: Int): DataFrame = {
    require(r >= k, s"refine pool r=$r must be >= k=$k")
    import graft.functions.GraftFunctions.{l2_distance, vector_lit}
    val candIds = searchSaved(spark, path, probe, r, nprobe)
      .select(col("id")).collect().map(_.get(0)) // bounded by r
    corpus
      .filter(col(corpusIdCol).isin(candIds: _*))
      .withColumn("dist",
        l2_distance(col(embCol).cast("array<float>"), vector_lit(probe)))
      .orderBy(col("dist").asc, col(corpusIdCol).asc)
      .limit(k)
      .select(col(corpusIdCol), col("dist"))
  }

  /** Append new vectors WITHOUT retraining either structure: assign
    * each row to its nearest STORED centroid (the [[Ivf.appendSaved]]
    * rule) and encode it against the STORED codebooks (the
    * [[Pq.appendSaved]] rule), appending to the bucket-partitioned
    * codes. Returns the number of rows appended.
    */
  def appendSaved(spark: SparkSession, path: String,
                  newRows: DataFrame, idCol: String, embCol: String): Long = {
    import spark.implicits._
    val centroids = Ivf.loadCentroids(spark, path)
    require(centroids.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF-PQ index")
    val model = Pq.loadModel(spark, path)
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = newRows
      .select(col(idCol).cast("long").as("id"), col(embCol).cast("array<float>").as("emb"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.map { case (id, emb) => (id, emb, Ivf.nearestCentroid(emb, cents)) }
      }
      .toDF("id", "emb", "bucket")
      .select(col("id"), col("bucket"),
        GraftColumnBridge.column(PqEncode(
          GraftColumnBridge.expression(col("emb")),
          model.flat, model.m, model.k, model.subDim)).as("code"))
    assigned.persist()
    try {
      assigned.write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
      assigned.count()
    } finally assigned.unpersist()
  }
}
