package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization for vector search (the FAISS `SQ8` shape,
  * Guo et al. / the standard uniform-quantizer compression path,
  * public): each dimension compresses independently to an 8-bit code
  * against per-dimension [min, max] bounds trained from the corpus —
  * 4x smaller than float32 with NO codebook training loop (min/max is
  * one combinable aggregate), the simplest point on the
  * compression/recall curve next to [[Pq]] (16x, trained) and binary
  * quantization (32x, sign-only).
  *
  * Exactness discipline: training is exact (float min/max are
  * comparisons, order-free); the quantization rule
  * `floor((x - mn)/(mx - mn) * 255 + 0.5)` and the asymmetric
  * reconstruction distance `sum_d ((mn_d + code_d * scale_d) - q_d)^2`
  * evaluate in double through ONE fixed expression tree, left-folded in
  * dimension order on both engines — bit-reproducible, so the v26 gate
  * hash-matches end to end (the t33/x4 posture: exact inputs, mirrored
  * trees).
  *
  * Scale shape: train = one aggregate whose exchange carries dims x
  * partitions rows; encode/search are per-row codegen array transforms
  * with the (tiny) bounds broadcast as literals; the ADC pool is a
  * TakeOrderedAndProject (the v1/v12 kNN shape on the 4x-narrower
  * codes); refine re-ranks only the r-bounded pool on raw vectors.
  */
object Sq {

  /** Per-dimension quantization bounds (float, as trained). */
  final case class SqModel(mins: Array[Float], maxs: Array[Float])
      extends Serializable {
    require(mins.length == maxs.length && mins.nonEmpty, "bad SQ bounds")
    def dim: Int = mins.length
  }

  /** Train per-dimension [min, max] over `vecCol` — one combinable
    * aggregate pass (posexplode then min/max per position), dims rows
    * collected (bounded by the vector width).
    */
  def train(df: DataFrame, vecCol: String): SqModel = {
    val rows = df
      .select(posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy("pos")
      .agg(min("x").as("mn"), max("x").as("mx"))
      .orderBy("pos")
      .collect() // bounded by dim
    require(rows.nonEmpty, "Sq.train: empty corpus")
    SqModel(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  private def minsLit(m: SqModel): Column = typedLit(m.mins.map(_.toDouble).toSeq)
  /** Per-dim reconstruction step (mx - mn) / 255, double. */
  private def scaleLit(m: SqModel): Column =
    typedLit(m.mins.indices.map(d =>
      (m.maxs(d).toDouble - m.mins(d).toDouble) / 255.0))
  private def rangeLit(m: SqModel): Column =
    typedLit(m.mins.indices.map(d => m.maxs(d).toDouble - m.mins(d).toDouble))

  /** Encode `vecCol` to per-dim 8-bit codes (as array<bigint> — the
    * storage narrowing to bytes is a sink concern): codegen transform,
    * no shuffle. Constant dimensions (mx = mn) code to 0.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             model: SqModel): DataFrame = {
    val mns = minsLit(model); val rng = rangeLit(model)
    df.select(col(idCol), transform(col(vecCol), (x, i) => {
      val mn = element_at(mns, i + 1)
      val rg = element_at(rng, i + 1)
      when(rg === 0.0, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor((x.cast("double") - mn) / rg * 255.0 + 0.5))))
    }).as("code"))
  }

  /** Asymmetric (reconstruct-vs-raw-probe) squared-L2 over the codes:
    * `sum_d ((mn_d + code_d * scale_d) - q_d)^2`, left-folded in
    * dimension order — the expression tree the oracle mirrors.
    */
  def adcDist(codeCol: Column, model: SqModel, probe: Array[Float]): Column = {
    val mns = minsLit(model); val scl = scaleLit(model)
    val q = typedLit(probe.map(_.toDouble).toSeq)
    val terms = transform(codeCol, (c, i) => {
      val rec = element_at(mns, i + 1) + c.cast("double") * element_at(scl, i + 1)
      val diff = rec - element_at(q, i + 1)
      diff * diff
    })
    aggregate(terms, lit(0.0), (acc, t) => acc + t)
  }

  /** Top-r ADC pool over the encoded corpus (TakeOrderedAndProject). */
  def searchADC(encoded: DataFrame, codeCol: String, idCol: String,
                model: SqModel, probe: Array[Float], r: Int): DataFrame =
    encoded
      .withColumn("dist", adcDist(col(codeCol), model, probe))
      .orderBy(col("dist").asc, col(idCol).asc)
      .limit(r)

  /** Persist the SQ index: the encoded corpus under `codes/` plus a
    * tiny `bounds/` sidecar (dim rows) — encode once, scan 4x-narrower
    * codes forever (the [[Pq.save]] amortization argument; at 100 TB
    * re-encoding per session is a full corpus pass wasted).
    */
  def save(model: SqModel, codes: DataFrame, idCol: String, path: String): Unit = {
    val spark = codes.sparkSession
    import spark.implicits._
    codes.select(col(idCol).cast("long").as("id"), col("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
    model.mins.indices.map(d => (d, model.mins(d), model.maxs(d)))
      .toDF("dim", "mn", "mx")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/bounds")
  }

  /** Load the bounds sidecar back into an [[SqModel]] (dim rows — a
    * bounded collect).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession, path: String): SqModel = {
    val rows = spark.read.parquet(s"$path/bounds")
      .orderBy("dim").collect()
    require(rows.nonEmpty, s"no SQ bounds sidecar at $path/bounds")
    SqModel(rows.map(_.getFloat(1)), rows.map(_.getFloat(2)))
  }

  /** Append new rows to a saved index: encode against the STORED bounds
    * (values outside the trained range clamp to 0/255 — the documented
    * SQ append semantics; retrain when drift matters) and add their
    * codes to `codes/`.
    */
  def appendSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                  extra: DataFrame, idCol: String, vecCol: String): Unit = {
    val model = loadModel(spark, path)
    encode(extra, idCol, vecCol, model)
      .select(col(idCol).cast("long").as("id"), col("code"))
      .write.mode("append").parquet(s"$path/codes")
  }

  /** Serve an ADC top-r pool from the saved codes. */
  def searchSaved(spark: org.apache.spark.sql.SparkSession, path: String,
                  probe: Array[Float], r: Int): DataFrame = {
    val model = loadModel(spark, path)
    searchADC(spark.read.parquet(s"$path/codes"), "code", "id", model, probe, r)
  }

  /** ADC pool then exact cosine re-rank of the r-bounded candidates on
    * the raw vectors (the [[Pq.searchRefine]] recall mitigation).
    */
  def searchRefine(encoded: DataFrame, codeCol: String, idCol: String,
                   corpus: DataFrame, corpusIdCol: String, embCol: String,
                   model: SqModel, probe: Array[Float], k: Int, r: Int): DataFrame = {
    require(r >= k, s"refine pool r=$r must be >= k=$k")
    import graft.functions.GraftFunctions.{cosine_distance, vector_lit}
    val candIds = searchADC(encoded, codeCol, idCol, model, probe, r)
      .select(col(idCol)).collect().map(_.get(0)) // bounded by r
    corpus
      .filter(col(corpusIdCol).isin(candIds: _*))
      .withColumn("dist",
        cosine_distance(col(embCol).cast("array<float>"), vector_lit(probe)))
      .orderBy(col("dist").asc, col(corpusIdCol).asc)
      .limit(k)
      .select(col(corpusIdCol), col("dist"))
  }
}
