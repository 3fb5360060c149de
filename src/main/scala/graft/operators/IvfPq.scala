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
      // one file per bucket (the Ivf.save clustering note — guide §6)
      .repartition(col("bucket"))
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
    // appended-row count rides the write as an observe() metric (the
    // Ivf.appendSaved treatment): one job, no persist; clustered by
    // bucket so each append lands one file per bucket
    val obs = org.apache.spark.sql.Observation()
    assigned.observe(obs, count(lit(1)).as("n"))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
    obs.get("n").asInstanceOf[Long]
  }

  // --- unattended maintenance (round 16 — the v38 posture on the
  // compressed layout): IVF-PQ stores codes, never the float corpus,
  // so telemetry and splitting both run on RECONSTRUCTIONS (PqDecode:
  // codebook-row concatenation, FAISS's `reconstruct`). The codes
  // themselves are bucket-INDEPENDENT (codebooks are global), so a
  // split MOVES code rows between bucket directories without
  // re-encoding anything — full-probe ADC results are invariant under
  // the whole operation, which is exactly what the v39 gate pins.

  /** The codes with their reconstructions — (id, bucket, code, recon). */
  private def reconstructed(spark: SparkSession, path: String): DataFrame = {
    val model = Pq.loadModel(spark, path)
    spark.read.parquet(s"$path/codes")
      .withColumn("recon", GraftColumnBridge.column(
        graft.functions.PqDecode(
          GraftColumnBridge.expression(col("code")),
          model.flat, model.m, model.k, model.subDim)))
  }

  /** Saved-index health report on reconstructions — per bucket, row
    * count + mean cosine distance of reconstructions to the centroid
    * (nano-quantized long sums; order-independent). One pruned-free
    * scan, centroids broadcast.
    *
    * Scope note: reconstruction drift is BOUNDED BY THE CODEBOOK SPAN —
    * appended rows whose novelty quantizes back onto the baseline
    * population's entries register no drift (they are also served
    * indistinguishably, so the blind spot is self-consistent); drift
    * registers exactly when rows start snapping to entries far from
    * the bucket centroid, which is also when ADC quality degrades.
    * The size arm needs no such caveat.
    */
  def savedBucketStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val cents = Ivf.loadCentroids(spark, path)
    require(cents.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF-PQ index")
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
    reconstructed(spark, path)
      .join(broadcast(cdf), Seq("bucket"))
      .withColumn("qd", floor(graft.functions.GraftFunctions.cosine_distance(
        col("recon"), col("centroid")) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(col("qd")).cast("double") / count(lit(1)).cast("double") / lit(1e9))
          .as("mean_dist"))
  }

  /** Snapshot the current stats as the drift baseline sidecar. */
  def snapshotStats(spark: SparkSession, path: String): Unit =
    savedBucketStats(spark, path)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats_baseline")

  /** The v38 policy on the compressed layout: flag a bucket when its
    * size exceeds `sizeFactor` x the mean, or its reconstruction-drift
    * exceeds `driftFactor` x its baseline. Buckets born after the
    * snapshot use the size arm only.
    */
  def maintenanceDecision(spark: SparkSession, path: String,
                          sizeFactor: Double = 2.0,
                          driftFactor: Double = 1.5): DataFrame = {
    val cur = savedBucketStats(spark, path)
    val base = spark.read.parquet(s"$path/stats_baseline")
      .select(col("bucket"), col("mean_dist").as("base_mean_dist"))
    val meanN = cur.agg(avg(col("n"))).head().getDouble(0)
    cur.join(base, Seq("bucket"), "left")
      .withColumn("split",
        col("n").cast("double") > lit(sizeFactor) * lit(meanN) ||
          (col("base_mean_dist").isNotNull &&
            col("mean_dist") > lit(driftFactor) * col("base_mean_dist")))
      .select(col("bucket"), col("n"), col("mean_dist"),
        col("base_mean_dist"), col("split"))
  }

  /** Split an explicit list of buckets on their reconstructions: sub-
    * k-means (deterministic seeded — [[Ivf.trainCentroids]]) over a
    * bounded reconstruction sample, code rows MOVED (never re-encoded)
    * to sub-0's renamed directory / fresh tail ids, centroid sidecar
    * extended — the [[Ivf.rebalanceBuckets]] write protocol (scratch
    * id, delete-then-rename, crash-leftover refusal) on the codes
    * layout. Returns buckets split.
    */
  def rebalanceBuckets(spark: SparkSession, path: String,
                       buckets: Seq[Int], splitInto: Int = 2, iters: Int = 5,
                       sampleSize: Int = 100000, seed: Long = 42L): Int = {
    require(splitInto >= 2, s"splitInto must be >= 2, got $splitInto")
    import spark.implicits._
    val centroids = Ivf.loadCentroids(spark, path)
    require(centroids.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF-PQ index")
    val targets = buckets.distinct.sorted
    targets.foreach(b => require(b >= 0 && b < centroids.length,
      s"rebalance: bucket $b outside the sidecar's ${centroids.length} buckets"))
    if (targets.isEmpty) return 0
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bucketIdRe = "bucket=(\\d+)".r
    val orphanDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/codes"))
      .map(_.getPath.getName)
      .collect { case bucketIdRe(n) if n.toInt >= centroids.length => n.toInt }
      .sorted
    require(orphanDirs.isEmpty,
      s"rebalance: bucket dirs ${orphanDirs.mkString(",")} have no sidecar " +
        s"centroid (sidecar holds ${centroids.length}) — leftovers of a " +
        "crashed rebalance; recover by hand before re-running.")
    val cents = scala.collection.mutable.ArrayBuffer(centroids.toSeq: _*)
    targets.foreach { b =>
      val rows = reconstructed(spark, path)
        .filter(col("bucket") === b).select(col("id"), col("code"), col("recon"))
      val sample = Ivf.drawSample(rows.select(col("id"), col("recon")),
        "id", "recon", splitInto, sampleSize, seed).map(_._2)
      require(sample.length >= splitInto,
        s"bucket $b sample ${sample.length} < splitInto $splitInto")
      val sub = Ivf.trainCentroids(sample, splitInto, iters)
      val tailBase = cents.length
      val scratch = tailBase + (splitInto - 1)
      val bc = spark.sparkContext.broadcast(sub)
      val reassigned = rows.as[(Long, Array[Int], Array[Float])]
        .mapPartitions { iter =>
          val cs = bc.value
          iter.map { case (id, code, recon) =>
            val j = Ivf.nearestCentroid(recon, cs)
            (id, code, if (j == 0) scratch else tailBase + (j - 1))
          }
        }
        .toDF("id", "code", "bucket")
      // one file per split-target bucket (the Ivf clustering note)
      reassigned.repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$path/codes")
      val oldDir = new org.apache.hadoop.fs.Path(s"$path/codes/bucket=$b")
      val scratchDir = new org.apache.hadoop.fs.Path(s"$path/codes/bucket=$scratch")
      if (!fs.delete(oldDir, true))
        throw new java.io.IOException(s"rebalance: failed deleting $oldDir")
      if (fs.exists(scratchDir) && !fs.rename(scratchDir, oldDir))
        throw new java.io.IOException(s"rebalance: failed renaming $scratchDir onto $oldDir")
      cents(b) = sub(0)
      cents ++= sub.drop(1)
    }
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    targets.length
  }

  /** Decide, split the flagged buckets, refresh the baseline for the
    * TOUCHED id space only (the v38 rule: untouched buckets keep their
    * reference row so slow drift still accumulates across runs).
    */
  def maintainSaved(spark: SparkSession, path: String,
                    sizeFactor: Double = 2.0, driftFactor: Double = 1.5,
                    splitInto: Int = 2): DataFrame = {
    val decision = maintenanceDecision(spark, path, sizeFactor, driftFactor)
      .localCheckpoint(true) // decide BEFORE mutating what it reads
    val flagged = decision.filter(col("split") && col("n") >= splitInto)
      .select(col("bucket")).collect().map(_.getInt(0)).toSeq
    if (flagged.nonEmpty) {
      val preCount = Ivf.loadCentroids(spark, path).length
      rebalanceBuckets(spark, path, flagged, splitInto)
      val postCount = Ivf.loadCentroids(spark, path).length
      val touched = (flagged ++ (preCount until postCount)).distinct
      val fresh = savedBucketStats(spark, path)
        .filter(col("bucket").isin(touched: _*))
      val kept = spark.read.parquet(s"$path/stats_baseline")
        .filter(!col("bucket").isin(touched: _*))
      val merged = kept.unionByName(fresh).localCheckpoint(true)
      merged.coalesce(1).write.mode("overwrite").parquet(s"$path/stats_baseline")
    }
    decision
  }
}
