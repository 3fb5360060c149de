package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reproducible sampling operators for training-mixture construction.
  *
  * The core primitive is HASH-ordered selection: ordering rows by
  * `md5(salt || id)` is a deterministic pseudo-random permutation, so
  * "take k per stratum" and "take fraction p" become exact, replayable,
  * engine-independent operations — unlike `rand()`-based sampling, the
  * same (salt, data) always yields the same sample on any engine, any
  * partitioning, any retry. This is the standard reproducible-pipeline
  * trick for assembling corpus mixtures.
  *
  * Scale: both operators are a single hash + one shuffle (window by
  * stratum / filter); no driver-side collection, no skew beyond the
  * stratum sizes themselves.
  */
object Sampling {

  private def hashKey(idCol: Column, salt: String): Column =
    md5(concat(lit(salt), idCol.cast("string")))

  /** k pseudo-random rows per stratum, deterministic in (salt, data).
    * Output carries `sample_rank` in [1, k] within each stratum.
    */
  def stratifiedHead(df: DataFrame, strataCol: String, idCol: String,
                     k: Int, salt: String = "graft"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt).asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Training-MIXTURE sampling: per-stratum quotas instead of a uniform k
    * — the "3 parts web, 1 part code, 1 part books" step of corpus
    * assembly. Strata absent from `quotas` contribute nothing; strata
    * smaller than their quota contribute everything (with a rank, so the
    * shortfall is visible downstream). Same determinism contract as
    * [[stratifiedHead]]: a pure function of (salt, data).
    */
  def mixtureHead(df: DataFrame, strataCol: String, idCol: String,
                  quotas: Map[String, Int], salt: String = "graft"): DataFrame = {
    require(quotas.nonEmpty, "mixtureHead needs at least one stratum quota")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(col(idCol), salt).asc, col(idCol).asc)
    val quota = quotas.foldLeft(lit(0)) { case (acc, (s, k)) =>
      when(col(strataCol) === s, lit(k)).otherwise(acc)
    }
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= quota)
  }

  /** Temperature-based mixture sampling — the multilingual/multi-source
    * data-balancing rule public in the XLM-R / mT5 reports: stratum i
    * receives budget proportional to n_i^alpha, with alpha < 1 flattening
    * the head so low-resource strata are over-represented relative to raw
    * counts. Computes the quotas from the corpus and delegates selection
    * to [[mixtureHead]].
    *
    * Determinism: n^alpha is nano-quantized (floor(x * 1e9)) BEFORE the
    * normalization, so quota arithmetic is exact integer — no float
    * summation order anywhere (the hashSplit-boundaries posture). With
    * the default alpha = 0.5 the power is IEEE sqrt (correctly rounded,
    * engine-portable → oracle-exact); other alphas ride libm pow, fine
    * for pipelines but documented as not bit-portable cross-engine.
    *
    * The stratum count table collects to the driver — bounded by stratum
    * cardinality (languages/sources), the same contract quotas-as-a-Map
    * already implies.
    */
  def temperatureMixture(df: DataFrame, strataCol: String, idCol: String,
                         budget: Long, alpha: Double = 0.5,
                         salt: String = "graft"): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(alpha > 0.0 && alpha <= 1.0, s"alpha $alpha out of (0, 1]")
    val counts = df.groupBy(col(strataCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureMixture: empty input")
    val qn = counts.map { case (s, n) =>
      val x = if (alpha == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, alpha)
      (s, math.floor(x * 1e9).toLong)
    }
    // budget * q can overflow Long (qn ~ n^alpha * 1e9), and a wrapped
    // .toInt would silently drop strata — do the quota arithmetic in
    // BigInt and fail loudly on a quota no Int can hold.
    val tot = qn.map(q => BigInt(q._2)).sum
    val quotas = qn.map { case (s, q) =>
      val quota = BigInt(budget) * q / tot
      require(quota <= Int.MaxValue,
        s"temperatureMixture: quota $quota for stratum '$s' exceeds Int.MaxValue")
      (s, quota.toInt)
    }.toMap
    mixtureHead(df, strataCol, idCol, quotas, salt)
  }

  /** Approximate-fraction Bernoulli sample, deterministic in (salt, data):
    * keeps rows whose hash falls below the threshold. Unlike
    * `df.sample()`, membership is a pure function of the row id — stable
    * across partitionings, retries, and engines.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 salt: String = "graft"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction out of [0,1]")
    // first 8 hex chars -> uniform 32-bit value
    val bucket = conv(substring(hashKey(col(idCol), salt), 1, 8), 16, 10).cast("long")
    df.filter(bucket < (fraction * (1L << 32)).toLong)
  }

  /** Deterministic train/val/test assignment: a `split` column from the
    * row's hash bucket against cumulative weight boundaries. Membership
    * is a pure function of (salt, id) — stable across partitionings,
    * retries, engines, AND dataset versions: appending new rows never
    * reassigns an existing row's split, the property `randomSplit`
    * fundamentally lacks (its assignment depends on partition layout
    * and sampling order). That stability is what makes held-out sets
    * trustworthy across pipeline re-runs — the reason every production
    * training pipeline splits by content hash, not by RNG.
    *
    * Weights are relative (normalized over their sum); boundaries are
    * exact integer thresholds in the 32-bit bucket space, so the split
    * is reproducible bit-for-bit from the spec alone.
    */
  def hashSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)],
                salt: String = "graft"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      s"hashSplit: weights must be positive: $weights")
    val total = weights.map(_._2).sum
    val bounds = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .tail.map(c => (c * (1L << 32)).toLong)
    val bucket = conv(substring(hashKey(col(idCol), salt), 1, 8), 16, 10).cast("long")
    val splitCol = weights.init.zip(bounds.init)
      .foldRight(lit(weights.last._1)) { case (((name, _), b), rest) =>
        when(bucket < b, name).otherwise(rest)
      }
    df.withColumn("split", splitCol)
  }
}
