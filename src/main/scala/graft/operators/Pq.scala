package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftColumnBridge

import graft.functions.{PqAdcDistance, PqCodec, PqEncode}

/** Product quantization (Jégou et al. 2011, public) — the vector
  * COMPRESSION scale path beside IVF's scan-pruning path: a D-dim float
  * corpus (4D bytes/row) stores as M small integers (M bytes/row at
  * K<=256), a 4D/M-fold reduction — 64x at D=64, M=4 — and kNN answers
  * from the codes alone via ADC, never touching the original vectors.
  * At 100 TB this is the difference between scanning vectors and
  * scanning codes: the scan I/O shrinks by the same factor as storage,
  * and the per-row work drops from a D-dim dot product to M table
  * lookups inside whole-stage codegen.
  *
  * Training mirrors [[Ivf]]'s determinism contract so the whole path
  * sits under the DuckDB oracle (v12): the sample is Ivf.drawSample's
  * counter-based reservoir (identical seeds and draws), each subspace's
  * k-means seeds from the first K sample subvectors in id order, runs a
  * fixed iteration count, keeps empty centroids in place, and stores
  * means as float. Assignment distance is squared L2 in the dot-product
  * shape ([[PqCodec.l2sq]]) with first-index tie-breaks.
  *
  * Recall behavior is the standard PQ tradeoff (bounded by subspace
  * quantization error); the exact kNN (v1) and IVF (v7) paths remain
  * for higher-recall regimes, and [[searchRefine]] implements the
  * standard production mitigation (FAISS IVFPQ+R, public): ADC top-R →
  * exact re-rank of those r originals → top-k. [[save]]/[[loadModel]]/
  * [[appendSaved]]/[[searchSavedADC]] give the index the same
  * encode-once persistence lifecycle as [[Ivf.save]].
  */
object Pq {

  /** codebooks(j)(c) = subspace-j centroid c (subDim floats). */
  case class PqModel(codebooks: Array[Array[Array[Float]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
    private[operators] def flat: Array[Float] = {
      val out = new Array[Float](m * k * subDim)
      var j = 0
      while (j < m) {
        var c = 0
        while (c < k) {
          System.arraycopy(codebooks(j)(c), 0, out, (j * k + c) * subDim, subDim)
          c += 1
        }
        j += 1
      }
      out
    }
  }

  /** Deterministic per-subspace k-means under squared L2 — the same
    * loop shape as Ivf.trainCentroids with the distance swapped (PQ
    * quantizes raw subvectors, where L2 is the spec's objective;
    * cosine's normalization has no meaning on a vector fragment).
    */
  private[operators] def trainSub(sample: Array[Array[Float]], lo: Int, subDim: Int,
                                  k: Int, iters: Int): Array[Array[Float]] = {
    require(sample.length >= k, s"sample ${sample.length} < k $k")
    var cs: Array[Array[Float]] =
      sample.take(k).map(v => java.util.Arrays.copyOfRange(v, lo, lo + subDim))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](subDim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val d = PqCodec.l2sq(v, lo, cs(c), 0, subDim)
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best)
        var i = 0
        while (i < subDim) { s(i) += v(lo + i); i += 1 }
      }
      cs = Array.tabulate(k) { c =>
        if (counts(c) == 0) cs(c)
        else Array.tabulate(subDim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
      it += 1
    }
    cs
  }

  /** Train M codebooks of K entries on a seeded reservoir sample (one
    * corpus scan — Ivf.drawSample). dim must divide evenly into M.
    */
  def train(corpus: DataFrame, idCol: String, embCol: String,
            m: Int, k: Int, iters: Int = 5, sampleSize: Int = 100000,
            seed: Long = 42L): PqModel = {
    val sample = Ivf.drawSample(corpus, idCol, embCol, nlist = k,
      sampleSize = sampleSize, seed = seed).map(_._2)
    require(sample.nonEmpty, "empty corpus")
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m
    PqModel(Array.tabulate(m)(j => trainSub(sample, j * subDim, subDim, k, iters)))
  }

  /** Corpus codes: (idCol, code array<int> of M entries). The 4D/M-fold
    * smaller table to persist; kNN then runs on it alone.
    */
  def encode(corpus: DataFrame, idCol: String, embCol: String, model: PqModel): DataFrame =
    corpus.select(col(idCol),
      GraftColumnBridge.column(PqEncode(
        GraftColumnBridge.expression(col(embCol).cast("array<float>")),
        model.flat, model.m, model.k, model.subDim)).as("code"))

  /** ADC top-k: one M*K distance table computed driver-side from the
    * exact probe, then per-row table lookups + TakeOrderedAndProject —
    * the v1 plan shape on 4D/M-fold less data.
    */
  def searchADC(encoded: DataFrame, codeCol: String, idCol: String,
                model: PqModel, probe: Array[Float], k: Int): DataFrame = {
    require(probe.length == model.m * model.subDim,
      s"probe dim ${probe.length} != ${model.m} * ${model.subDim}")
    val table = new Array[Double](model.m * model.k)
    var j = 0
    while (j < model.m) {
      var c = 0
      while (c < model.k) {
        table(j * model.k + c) =
          PqCodec.l2sq(probe, j * model.subDim, model.codebooks(j)(c), 0, model.subDim)
        c += 1
      }
      j += 1
    }
    encoded
      .withColumn("dist", GraftColumnBridge.column(
        PqAdcDistance(GraftColumnBridge.expression(col(codeCol)), table, model.m, model.k)))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("dist"))
  }

  /** ADC top-R → exact re-rank (the public FAISS IVFPQ+refine shape):
    * the code scan nominates `r` candidates cheaply, then ONLY those
    * r rows of the original float corpus are read — an `isin` filter
    * that pushes to the parquet scan — and ranked by exact L2 for the
    * final top-k. This caps the recall loss of subspace quantization at
    * the cost of one r-row lookup: the 100 TB scan still touches codes
    * only, and r is a driver-side constant (bounded collect, the
    * Ivf.searchSaved precedent). `r >= k`; larger r trades one narrow
    * point-lookup pass for recall.
    */
  def searchRefine(encoded: DataFrame, codeCol: String, idCol: String,
                   corpus: DataFrame, corpusIdCol: String, embCol: String,
                   model: PqModel, probe: Array[Float], k: Int, r: Int): DataFrame = {
    require(r >= k, s"refine pool r=$r must be >= k=$k")
    import graft.functions.GraftFunctions.{l2_distance, vector_lit}
    val candIds = searchADC(encoded, codeCol, idCol, model, probe, r)
      .select(col(idCol)).collect().map(_.get(0)) // bounded by r
    corpus
      .filter(col(corpusIdCol).isin(candIds: _*))
      .withColumn("dist",
        l2_distance(col(embCol).cast("array<float>"), vector_lit(probe)))
      .orderBy(col("dist").asc, col(corpusIdCol).asc)
      .limit(k)
      .select(col(corpusIdCol), col("dist"))
  }

  /** Persist the PQ index: the encoded corpus under `codes/` plus a
    * tiny `codebooks/` sidecar (m*k rows) — deliberately not
    * `_`-prefixed, the [[Ivf.save]] sidecar lesson. Encode once, scan
    * codes forever: without this a 100 TB corpus would re-train and
    * re-encode every session.
    */
  def save(model: PqModel, codes: DataFrame, idCol: String, path: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.select(col(idCol).cast("long").as("id"), col("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
    val rows = for (j <- 0 until model.m; c <- 0 until model.k)
      yield (j, c, model.codebooks(j)(c).toSeq)
    rows.toDF("subspace", "centroid_id", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Load the codebook sidecar back into a [[PqModel]] (m*k rows — a
    * bounded collect).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    import spark.implicits._
    val rows = spark.read.parquet(s"$path/codebooks")
      .select(col("subspace"), col("centroid_id"), col("centroid"))
      .as[(Int, Int, Array[Float])].collect()
    require(rows.nonEmpty, s"$path carries no codebooks sidecar — not a saved PQ index")
    val byKey = rows.map(t => (t._1, t._2) -> t._3).toMap
    val m = rows.iterator.map(_._1).max + 1
    val k = rows.iterator.map(_._2).max + 1
    PqModel(Array.tabulate(m)(j => Array.tabulate(k)(c => byKey((j, c)))))
  }

  /** Append new vectors to a saved PQ index WITHOUT retraining: encode
    * them against the STORED codebooks and append to `codes/` — the
    * same maintenance contract as [[Ivf.appendSaved]] (recall degrades
    * only under distribution drift, at which point retrain + re-encode
    * rebuilds). Returns the number of rows appended.
    */
  def appendSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                  newRows: DataFrame, idCol: String, embCol: String): Long = {
    val model = loadModel(spark, path)
    val encoded = encode(newRows, idCol, embCol, model)
      .select(col(idCol).cast("long").as("id"), col("code"))
    // the returned count rides the write as an observe() metric (the
    // Ivf.appendSaved treatment): one job, no persist — the cache
    // existed only so the count wouldn't re-scan newRows
    val obs = org.apache.spark.sql.Observation()
    encoded.observe(obs, count(lit(1)).as("n"))
      .write.mode("append").parquet(s"$path/codes")
    obs.get("n").asInstanceOf[Long]
  }

  /** Query a saved PQ index: load the codebooks, ADC over the stored
    * codes — the original vectors are never touched.
    */
  def searchSavedADC(spark: org.apache.spark.sql.SparkSession, path: String,
                     probe: Array[Float], k: Int): DataFrame = {
    val model = loadModel(spark, path)
    searchADC(spark.read.parquet(s"$path/codes"), "code", "id", model, probe, k)
  }
}
