package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the scale path for
  * similarity search. The reference serves exact brute-force kNN (no
  * ivfflat/hnsw index exists — SURVEY.md §1.4); [[Knn.topK]] reproduces
  * that exactly. Ivf trades a bounded recall loss for scanning only
  * `nprobe / nlist` of the corpus, the standard move when the corpus no
  * longer fits a single scan budget.
  *
  * Design (mirrors pgvector ivfflat / FAISS IVF-Flat, both public):
  *  1. train: k-means on a driver-side sample (deterministic: centroids
  *     seeded from the sample's first `nlist` vectors in id order, fixed
  *     iteration count — no RNG);
  *  2. assign: broadcast centroids, one distributed pass tags each corpus
  *     row with its nearest centroid (`bucket`);
  *  3. search: rank centroids by distance to the probe on the driver,
  *     scan only the `nprobe` nearest buckets (partition pruning when the
  *     assigned table is written partitioned by `bucket`).
  */
object Ivf {

  /** Trained centroids + the corpus tagged with bucket ids.
    * Persist `assigned` partitioned by `bucket` to get file-level pruning
    * at query time: `assigned.write.partitionBy("bucket").parquet(...)`.
    */
  case class IvfIndex(centroids: Array[Array[Float]], assigned: DataFrame)

  private[operators] def nearestCentroid(emb: Array[Float], cs: Array[Array[Float]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      val d = Knn.cosineDist(emb, cs(c))
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic k-means (cosine geometry) on an in-memory sample. */
  private[graft] def trainCentroids(sample: Array[Array[Float]], nlist: Int,
                                    iters: Int): Array[Array[Float]] = {
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    val dim = sample(0).length
    var cs = sample.take(nlist).map(_.clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Long](nlist)
      sample.foreach { v =>
        val b = nearestCentroid(v, cs)
        counts(b) += 1
        val s = sums(b)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
      }
      cs = Array.tabulate(nlist) { b =>
        if (counts(b) == 0) cs(b) // keep empty centroid where it was
        else {
          val s = sums(b)
          Array.tabulate(dim)(i => (s(i) / counts(b)).toFloat)
        }
      }
      it += 1
    }
    cs
  }

  /** Per-partition reservoir seed (draws) — splitmix-decorrelated from the
    * build seed. Public within graft so the oracle SQL builder interpolates
    * the IDENTICAL constants (see queries/Vectors.IvfSampleSql).
    */
  private[graft] def reservoirSeed(seed: Long, pid: Int): Long =
    graft.functions.SketchHash.mix(seed + 0x9E3779B97F4A7C15L * (pid + 1))

  /** Per-partition quota-selection seed — independent stream. */
  private[graft] def quotaSeed(seed: Long, pid: Int): Long =
    graft.functions.SketchHash.mix(seed ^ (0xC2B2AE3D27D4EB4FL * (pid + 1)))

  /** The uniform [0,1) draw for row index `i` (0-based) of a partition:
    * counter-based splitmix64 (Steele et al. 2014), NOT a stateful RNG —
    * the draw is a pure function of (partition seed, i), so the whole
    * reservoir is restatable as set-based SQL for the oracle (each row's
    * draw and slot are computable independently; the "last writer wins"
    * slot content becomes a max_by). A stateful java.util.Random here
    * would force the oracle to simulate the call sequence row by row.
    */
  private[graft] def rowDraw(resSeed: Long, i: Long): Double =
    (graft.functions.SketchHash.mix(resSeed + (i + 1) * 0x9E3779B97F4A7C15L) >>> 11)
      .toDouble / 9007199254740992.0 // 2^53

  /** Quota-selection sort key for a sampled id: elements of an over-quota
    * reservoir are kept in ascending key order (a seeded "random sort"
    * subsample — uniform over the reservoir, like the Fisher-Yates prefix
    * it replaces, but stateless so the oracle states it as an ORDER BY).
    */
  private[graft] def quotaKey(qSeed: Long, id: Long): Long =
    graft.functions.SketchHash.mix(qSeed + id * 0x9E3779B97F4A7C15L)

  /** Build the index: sample -> train -> distributed assignment.
    *
    * Sampling is a seeded per-partition reservoir (Vitter's algorithm R,
    * capacity ~1.2*sampleSize/partitions per partition) followed by a
    * size-weighted driver-side merge: ONE scan of the corpus, bounded
    * executor memory, and — unlike a Bernoulli `sample(fraction)` — no
    * prior `count()` pass to size the fraction (round-2 advice: the build
    * used to scan the corpus twice). Each partition returns (rows seen,
    * reservoir); the driver allocates the ~1.2*sampleSize budget across
    * partitions PROPORTIONALLY to rows seen, so the final sample is
    * unbiased across skewed partition layouts and the driver never holds
    * more than ~1.2*sampleSize + #partitions vectors (round-3 advice: the
    * old per-partition nlist floor grew the collect as parts x nlist).
    * Residual bias bound: a partition can contribute at most its reservoir
    * capacity, so a single partition holding far more than 1/parts of the
    * corpus is represented by capacity rows, not its full proportional
    * share — still a uniform sample of that partition.
    * The merged sample is sorted by id on the driver (trivial at
    * ~sampleSize rows) so k-means initialization stays deterministic
    * regardless of partition arrival order. Determinism scope: fixed seed
    * + fixed input layout => identical index (same contract as the
    * Bernoulli form: per-partition RNG).
    *
    * All randomness is counter-based splitmix64 ([[rowDraw]]/[[quotaKey]]),
    * so the SUBSAMPLING regime (corpus > budget) is itself under a
    * hash-exact DuckDB oracle (v7s) — the round-5 gap where only the
    * degenerate sample-equals-corpus regime was oracled.
    */
  /** The reservoir + quota sampling pass of [[build]], exposed so tests
    * and the oracle harness can inspect the sampled ids. Returns the
    * merged sample sorted by id.
    */
  private[graft] def drawSample(corpus: DataFrame, idCol: String, embCol: String,
                                nlist: Int, sampleSize: Int,
                                seed: Long): Array[(Long, Array[Float])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val pairs = corpus
      .select(col(idCol).cast("long"), col(embCol).cast("array<float>"))
      .as[(Long, Array[Float])]
    val rdd = pairs.rdd
    val parts = math.max(1, rdd.getNumPartitions)
    val budget = math.max(nlist, math.ceil(1.2 * sampleSize).toInt)
    val perPart = (budget.toLong / parts + 1).toInt
    val partSamples: Array[(Int, Long, Array[(Long, Array[Float])])] = rdd
      .mapPartitionsWithIndex { (pid, iter) =>
        val resSeed = reservoirSeed(seed, pid)
        val buf = new Array[(Long, Array[Float])](perPart)
        var seen = 0L
        iter.foreach { row =>
          if (seen < perPart) buf(seen.toInt) = row
          else {
            val j = (rowDraw(resSeed, seen) * (seen + 1)).toLong
            if (j < perPart) buf(j.toInt) = row
          }
          seen += 1
        }
        Iterator.single((pid, seen, buf.take(math.min(seen, perPart.toLong).toInt)))
      }
      .collect()
    val totalSeen = math.max(1L, partSamples.map(_._2).sum)
    partSamples
      .flatMap { case (pid, seen, res) =>
        // proportional quota (ceil: total overshoot <= #partitions). A
        // reservoir is a uniform sample of its partition, but its array
        // order is not uniform — keep the quota rows in seeded-hash key
        // order ([[quotaKey]]) so they are a uniform subsample of the
        // reservoir regardless of slot order.
        val quota = math.min(res.length.toLong,
          math.ceil(budget.toDouble * seen / totalSeen).toLong).toInt
        if (quota >= res.length) res
        else {
          val qs = quotaSeed(seed, pid)
          res.sortBy { case (id, _) => (quotaKey(qs, id), id) }.take(quota)
        }
      }
      .sortBy(_._1)
  }

  def build(corpus: DataFrame, idCol: String, embCol: String,
            nlist: Int, iters: Int = 5, sampleSize: Int = 100000,
            seed: Long = 42L): IvfIndex = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Float]] =
      drawSample(corpus, idCol, embCol, nlist, sampleSize, seed).map(_._2)
    require(sample.length >= nlist,
      s"sample ${sample.length} < nlist $nlist — raise sampleSize")
    val cs = trainCentroids(sample, nlist, iters)
    val bc = spark.sparkContext.broadcast(cs)
    val assigned = corpus
      .select(col(idCol).cast("long").as("id"), col(embCol).cast("array<float>").as("emb"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.map { case (id, emb) => (id, emb, nearestCentroid(emb, cents)) }
      }
      .toDF("id", "emb", "bucket")
    IvfIndex(cs, assigned)
  }

  /** FILTERED approximate top-k (the production "ANN + metadata
    * predicate" query): rank only candidates whose id survives the
    * caller's predicate, applied BEFORE the distance heap — a post-hoc
    * filter on an unfiltered top-k under-returns whenever the predicate
    * is selective (the classic filtered-ANN bug). The qualifying-id set
    * arrives as a relation and semi-joins the nprobe bucket scan: the
    * index stays payload-free, predicates stay ad hoc, and AQE
    * broadcasts the id set when it is small; at warehouse scale where
    * one predicate dominates, bake that column into the index rows and
    * filter the bucket scan directly instead.
    */
  def searchFiltered(index: IvfIndex, probe: Array[Float], k: Int, nprobe: Int,
                     allowed: DataFrame, allowedIdCol: String): DataFrame = {
    val pruned = index.assigned
      .filter(col("bucket").isin(nearestBuckets(index.centroids, probe, nprobe): _*))
      .join(allowed.select(col(allowedIdCol).cast("long").as("id")).distinct(),
        Seq("id"), "left_semi")
    Knn.topK(pruned, col("emb"), probe, k, col("id"))
      .select(col("id"), col("dist"))
  }

  /** Approximate top-k: scan only the nprobe buckets nearest the probe. */
  def search(index: IvfIndex, probe: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val pruned = index.assigned.filter(
      col("bucket").isin(nearestBuckets(index.centroids, probe, nprobe): _*))
    Knn.topK(pruned, col("emb"), probe, k, col("id"))
      .select(col("id"), col("dist"))
  }

  /** The nprobe buckets a probe would scan — exposed for compositions
    * (IVF-PQ: prune buckets here, rank the survivors by ADC).
    */
  def probeBuckets(index: IvfIndex, probe: Array[Float], nprobe: Int): Seq[Int] =
    nearestBuckets(index.centroids, probe, nprobe)

  private[operators] def nearestBuckets(centroids: Array[Array[Float]], probe: Array[Float],
                             nprobe: Int): Seq[Int] =
    centroids.zipWithIndex
      .map { case (c, i) => (Knn.cosineDist(probe, c), i) }
      .sorted.take(nprobe).map(_._2).toSeq

  /** Approximate batch kNN join — the documented escape hatch for probe
    * sets beyond [[Knn.knnJoin]]'s economical chunk count (each 100k
    * chunk re-scans the corpus; past ~10M probes the re-scans dominate).
    * Both sides scale out:
    *  1. each probe is tagged with its `nprobe` nearest centroid buckets
    *     (distributed map over the probes, centroids broadcast);
    *  2. probes join the bucket-assigned corpus ON bucket — a plain
    *     shuffle join whose key cardinality is `nlist`, or a co-located
    *     join when the corpus side is the saved bucket-partitioned index;
    *  3. exact distances within the probed buckets, window top-k per probe.
    * Recall matches single-probe IVF search at the same nprobe (identical
    * bucket selection); output matches [[Knn.knnJoin]]'s
    * (probe_id, corpus_id, dist, rnk) contract.
    */
  def knnJoinApprox(index: IvfIndex, probes: DataFrame, probeId: String,
                    probeEmb: String, k: Int, nprobe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(index.centroids)
    val probeBuckets = probes
      .select(col(probeId).cast("long"), col(probeEmb).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.flatMap { case (pid, emb) =>
          nearestBuckets(cents, emb, nprobe).map(b => (pid, emb, b))
        }
      }
      .toDF("probe_id", "probe_emb", "bucket")
    val joined = probeBuckets
      .join(index.assigned, "bucket")
      .withColumn("dist", graft.functions.GraftFunctions.cosine_distance(
        col("probe_emb"), col("emb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("dist").asc, col("corpus_id").asc)
    joined
      .select(col("probe_id"), col("id").as("corpus_id"), col("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Batch kNN join SERVED FROM a saved index: identical semantics to
    * [[knnJoinApprox]], with the corpus side read from the
    * bucket-partitioned files — the join key IS the partitioning, so on
    * a cluster the corpus never re-shuffles for the join (each probe's
    * bucket rows are already co-located) and buckets no probe selects
    * are pruned from the scan entirely via the pre-computed bucket
    * filter. The batch serving shape of a persisted ANN index.
    */
  def knnJoinApproxSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                         probes: DataFrame, probeId: String, probeEmb: String,
                         k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, path)
    require(centroids.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF index")
    val bc = spark.sparkContext.broadcast(centroids)
    val probeBuckets = probes
      .select(col(probeId).cast("long"), col(probeEmb).cast("array<float>"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.flatMap { case (pid, emb) =>
          nearestBuckets(cents, emb, nprobe).map(b => (pid, emb, b))
        }
      }
      .toDF("probe_id", "probe_emb", "bucket")
    // prune the scan to the union of selected buckets before the join
    // (one extra pass over the probe map — cheap next to the corpus scan
    // it saves; bounded by nlist values)
    val buckets = probeBuckets.select(col("bucket")).distinct()
      .collect().map(_.getInt(0))
    val corpus = spark.read.parquet(s"$path/data")
      .filter(col("bucket").isin(buckets.map(Integer.valueOf): _*))
    val joined = probeBuckets
      .join(corpus, "bucket")
      .withColumn("dist", graft.functions.GraftFunctions.cosine_distance(
        col("probe_emb"), col("emb")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id")).orderBy(col("dist").asc, col("corpus_id").asc)
    joined
      .select(col("probe_id"), col("id").as("corpus_id"), col("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
  }

  /** Persist the index partitioned by bucket — queries then read only the
    * nprobe matching directories (partition pruning, no full scan).
    * Centroids ride along as a tiny `centroids` parquet beside `data/` —
    * deliberately NOT `_`-prefixed: Spark's file index skips `_` paths,
    * which made every sidecar read emit a "All paths were ignored" WARN.
    */
  def save(index: IvfIndex, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    // cluster by the partition column before the partitioned write
    // (guide §6 small files): un-clustered, every assignment task emits
    // one file into every bucket directory (tasks x nlist tiny files,
    // every one re-opened by each nprobe-pruned search); clustered, a
    // bucket is one writer's file. One narrow exchange of (id, emb,
    // bucket) — the write.distribution-mode=hash posture; at production
    // nlist the buckets spread over all shuffle partitions, so write
    // parallelism scales with the cluster, not with nlist.
    index.assigned.repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/data")
    index.centroids.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Load the centroid sidecar, sorted by bucket id. Falls back to the
    * legacy `_centroids` location so indexes saved by earlier versions
    * stay readable.
    */
  private[operators] def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                            path: String): Array[Array[Float]] = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sidecar =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/centroids")))
        s"$path/centroids"
      else s"$path/_centroids"
    spark.read.parquet(sidecar)
      .select(col("bucket"), col("centroid"))
      .as[(Int, Array[Float])].collect().sortBy(_._1).map(_._2)
  }

  /** Append new vectors to a saved index WITHOUT retraining: load the
    * stored centroids, assign the new rows distributively, and append
    * them to the bucket-partitioned data files. This is the standard IVF
    * maintenance path (pgvector's ivfflat handles inserts the same way —
    * rows join existing lists); recall degrades only if the data
    * distribution drifts from the training sample, at which point
    * [[build]] + [[save]] rebuilds. Returns the number of rows appended.
    */
  def appendSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                  newRows: DataFrame, idCol: String, embCol: String): Long = {
    import spark.implicits._
    val centroids = loadCentroids(spark, path)
    require(centroids.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF index")
    val bc = spark.sparkContext.broadcast(centroids)
    val assigned = newRows
      .select(col(idCol).cast("long").as("id"), col(embCol).cast("array<float>").as("emb"))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val cents = bc.value
        iter.map { case (id, emb) => (id, emb, nearestCentroid(emb, cents)) }
      }
      .toDF("id", "emb", "bucket")
    // the returned count rides the append as an observe() metric
    // (CollectMetricsExec — no extra pass): ONE job, no persist — the
    // cache existed only so the count wouldn't re-scan newRows
    // (guide §1.4/§5)
    val obs = org.apache.spark.sql.Observation()
    assigned.observe(obs, count(lit(1)).as("n"))
      // cluster by bucket (the save() small-files note): one file per
      // bucket per append instead of one per (task x bucket)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/data")
    obs.get("n").asInstanceOf[Long]
  }

  /** Split oversized buckets of a saved index WITHOUT retraining the
    * rest — the maintenance step after skewed appends: a hot bucket
    * degrades both pruning power (nprobe buckets cover more rows) and
    * tail latency (one partition dominates the probe scan). Buckets
    * whose row count exceeds `maxBucketRows` are re-trained into
    * `splitInto` sub-centroids on their own rows (the same deterministic
    * seeded sampling + k-means as [[build]]), their rows re-assigned,
    * and the centroid sidecar rewritten: sub-centroid 0 takes over the
    * split bucket's id (the id space stays DENSE, which the
    * array-indexed centroid ranking relies on) and the rest append at
    * the tail. Untouched buckets' data files are never rewritten.
    *
    * Write protocol per split: re-assigned rows land under fresh bucket
    * ids (sub-0 under a scratch id), the old directory is deleted, then
    * the scratch directory renames onto the old id — no window where
    * rows exist only in memory. The steps are not atomic as a group;
    * run on a quiesced index, the normal posture for index maintenance.
    * A crash mid-split leaves bucket directories with ids the centroid
    * sidecar does not know (the scratch/tail ids of the interrupted
    * split) — the next rebalance REFUSES to start while such orphan
    * directories exist, because appending would collide with their ids
    * and surface the crashed run's duplicated rows in search results.
    * Recovery: if every sidecar-known bucket directory is still present
    * (crash before the old-dir delete), the orphans are redundant copies
    * and can simply be deleted; otherwise restore from the orphans by
    * hand before re-running. Returns the number of buckets split.
    */
  def rebalanceSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                     maxBucketRows: Long, splitInto: Int = 2, iters: Int = 5,
                     sampleSize: Int = 100000, seed: Long = 42L): Int = {
    require(maxBucketRows > 0, s"maxBucketRows must be positive, got $maxBucketRows")
    import spark.implicits._
    val sizes = spark.read.parquet(s"$path/data")
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .as[(Int, Long)].collect()
    val oversized = sizes.filter(_._2 > maxBucketRows).map(_._1).sorted
    rebalanceBuckets(spark, path, oversized.toSeq, splitInto, iters, sampleSize, seed)
  }

  /** Split an EXPLICIT list of buckets — the primitive
    * [[rebalanceSaved]] (size policy) and [[maintainSaved]] (size+drift
    * policy) both lower onto. Same write protocol, same crash-recovery
    * orphan gate (doc on [[rebalanceSaved]]). Returns buckets split.
    */
  def rebalanceBuckets(spark: org.apache.spark.sql.SparkSession, path: String,
                       buckets: Seq[Int], splitInto: Int = 2, iters: Int = 5,
                       sampleSize: Int = 100000, seed: Long = 42L): Int = {
    require(splitInto >= 2, s"splitInto must be >= 2, got $splitInto")
    import spark.implicits._
    val centroids = loadCentroids(spark, path)
    require(centroids.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF index")
    val oversized = buckets.distinct.sorted
    oversized.foreach(b => require(b >= 0 && b < centroids.length,
      s"rebalance: bucket $b outside the sidecar's ${centroids.length} buckets"))
    if (oversized.isEmpty) return 0
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // crash-recovery gate: every data/bucket=N directory must have a
    // sidecar centroid (N < centroids.length). Orphan ids are the
    // scratch/tail directories of a previously crashed split; this run's
    // fresh tail ids would collide with them (the sidecar was never
    // rewritten, so tailBase repeats) and make the crashed run's
    // duplicated rows visible to searches. Refuse with the recovery path.
    val bucketIdRe = "bucket=(\\d+)".r
    val orphanDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/data"))
      .map(_.getPath.getName)
      .collect { case bucketIdRe(n) if n.toInt >= centroids.length => n.toInt }
      .sorted
    require(orphanDirs.isEmpty,
      s"rebalance: bucket dirs ${orphanDirs.mkString(",")} have no sidecar " +
        s"centroid (sidecar holds ${centroids.length}) — leftovers of a " +
        "crashed rebalance. If every sidecar-known bucket dir is still " +
        "present they are redundant copies and safe to delete; otherwise " +
        "restore from them by hand before re-running.")
    val cents = scala.collection.mutable.ArrayBuffer(centroids.toSeq: _*)
    oversized.foreach { b =>
      val rows = spark.read.parquet(s"$path/data")
        .filter(col("bucket") === b).select(col("id"), col("emb"))
      val sample = drawSample(rows, "id", "emb", splitInto, sampleSize, seed).map(_._2)
      require(sample.length >= splitInto,
        s"bucket $b sample ${sample.length} < splitInto $splitInto")
      val sub = trainCentroids(sample, splitInto, iters)
      // sub-0 will take over id b via directory rename; the rest get
      // fresh tail ids now, with one scratch id past them for sub-0
      val tailBase = cents.length
      val scratch = tailBase + (splitInto - 1)
      val bc = spark.sparkContext.broadcast(sub)
      val reassigned = rows.as[(Long, Array[Float])]
        .mapPartitions { iter =>
          val cs = bc.value
          iter.map { case (id, emb) =>
            val j = nearestCentroid(emb, cs)
            (id, emb, if (j == 0) scratch else tailBase + (j - 1))
          }
        }
        .toDF("id", "emb", "bucket")
      // one file per split-target bucket (the save() clustering note)
      reassigned.repartition(col("bucket"))
        .write.mode("append").partitionBy("bucket").parquet(s"$path/data")
      val oldDir = new org.apache.hadoop.fs.Path(s"$path/data/bucket=$b")
      val scratchDir = new org.apache.hadoop.fs.Path(s"$path/data/bucket=$scratch")
      if (!fs.delete(oldDir, true))
        throw new java.io.IOException(s"rebalance: failed deleting $oldDir")
      // sub-0 can end up empty (every row nearer the other sub-centroids):
      // no scratch dir was written, bucket b is simply empty after the split
      if (fs.exists(scratchDir) && !fs.rename(scratchDir, oldDir))
        throw new java.io.IOException(s"rebalance: failed renaming $scratchDir onto $oldDir")
      cents(b) = sub(0)
      cents ++= sub.drop(1)
    }
    cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    oversized.length
  }

  /** Saved-index health report — the staleness telemetry that tells an
    * operator WHEN to rebuild vs keep appending: per bucket, the row
    * count (skew after appends) and the mean cosine distance of rows to
    * their assigned centroid (assignment quality; drifting data raises
    * it). Distances are nano-quantized per row and long-summed, so the
    * report is order-independent and oracle-exact. One scan, one
    * combinable aggregate, centroids broadcast.
    */
  def savedBucketStats(spark: org.apache.spark.sql.SparkSession,
                       path: String): DataFrame = {
    import spark.implicits._
    val cents = loadCentroids(spark, path)
    require(cents.nonEmpty, s"$path carries no centroid sidecar — not a saved IVF index")
    val cdf = cents.zipWithIndex.map { case (c, i) => (i, c) }.toSeq
      .toDF("bucket", "centroid")
    spark.read.parquet(s"$path/data")
      .join(broadcast(cdf), Seq("bucket"))
      .withColumn("qd", floor(graft.functions.GraftFunctions.cosine_distance(
        col("emb"), col("centroid")) * lit(1e9) + lit(0.5)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (sum(col("qd")).cast("double") / count(lit(1)).cast("double") / lit(1e9))
          .as("mean_dist"))
  }

  /** Snapshot the current [[savedBucketStats]] as the index's baseline
    * sidecar — taken at build/rebuild time, read by
    * [[maintenanceDecision]] as the drift reference.
    */
  def snapshotStats(spark: org.apache.spark.sql.SparkSession, path: String): Unit =
    savedBucketStats(spark, path)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats_baseline")

  /** The DECISION operator the health report feeds — v20 gives the
    * MECHANISM (split a bucket), [[savedBucketStats]] the TELEMETRY;
    * this is the policy between them, so maintenance can run unattended:
    * flag a bucket for splitting when
    *  - SKEW: its row count exceeds `sizeFactor` x the current
    *    mean bucket size (appends concentrated somewhere), or
    *  - DRIFT: its mean row-to-centroid distance exceeds `driftFactor`
    *    x its baseline value from [[snapshotStats]] (the data moved
    *    under a stale centroid — the recall killer skew checks miss).
    * Buckets born after the snapshot (no baseline row) use the size arm
    * only. Output: (bucket, n, mean_dist, base_mean_dist, split).
    */
  def maintenanceDecision(spark: org.apache.spark.sql.SparkSession, path: String,
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

  /** Decide, split the flagged buckets, refresh the baseline for the
    * buckets that changed. Returns the decision table the run acted on
    * (bounded: one row per bucket — the codebook-collect posture).
    */
  def maintainSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                    sizeFactor: Double = 2.0, driftFactor: Double = 1.5,
                    splitInto: Int = 2): DataFrame = {
    val decision = maintenanceDecision(spark, path, sizeFactor, driftFactor)
      .localCheckpoint(true) // decide BEFORE mutating what it reads
    // a bucket below splitInto rows cannot train sub-centroids — skip
    // (it cannot be a skew problem at that size anyway)
    val flagged = decision.filter(col("split") && col("n") >= splitInto)
      .select(col("bucket")).collect().map(_.getInt(0)).toSeq
    if (flagged.nonEmpty) {
      val preCount = loadCentroids(spark, path).length
      rebalanceBuckets(spark, path, flagged, splitInto)
      val postCount = loadCentroids(spark, path).length
      // post-split stats are the new normal for the TOUCHED id space only
      // (the split buckets + the fresh tail ids the split created);
      // untouched buckets KEEP their original reference row so slow drift
      // still accumulates against it across maintenance runs — a global
      // snapshot here would reset every bucket's baseline each run and a
      // bucket drifting slowly under driftFactor could never trip the arm.
      val touched = (flagged ++ (preCount until postCount)).distinct
      val fresh = savedBucketStats(spark, path)
        .filter(col("bucket").isin(touched: _*))
      val kept = spark.read.parquet(s"$path/stats_baseline")
        .filter(!col("bucket").isin(touched: _*))
      // baseline is one row per bucket — checkpoint the merge before
      // overwriting the directory it reads from
      val merged = kept.unionByName(fresh).localCheckpoint(true)
      merged.coalesce(1).write.mode("overwrite").parquet(s"$path/stats_baseline")
    }
    decision
  }

  /** Query a saved index: centroid ranking on the driver, partition-pruned
    * scan of the nprobe nearest buckets, exact top-k within them.
    */
  def searchSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                  probe: Array[Float], k: Int, nprobe: Int): DataFrame = {
    import spark.implicits._
    val centroids = loadCentroids(spark, path)
    val pruned = spark.read.parquet(s"$path/data")
      .filter(col("bucket").isin(nearestBuckets(centroids, probe, nprobe): _*))
    Knn.topK(pruned, col("emb"), probe, k, col("id"))
      .select(col("id"), col("dist"))
  }
}
