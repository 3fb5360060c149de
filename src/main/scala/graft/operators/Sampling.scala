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

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", public): score every
    * document by how much its tokens look drawn from a TARGET slice's
    * unigram distribution rather than the raw corpus's, under
    * hashed-bucket bag-of-words models with Laplace smoothing. The
    * published recipe weights by the log-likelihood ratio; this operator
    * uses the per-token quantized probability RATIO (mean over tokens)
    * so the whole computation stays in exact integer arithmetic — the
    * t23/t32 precedent: no libm transcendental, hash-exact cross-engine.
    *
    * Quantization is two-step (probabilities to 1e-9, then their ratio
    * to 1e-9) so every intermediate product fits a BIGINT while bucket
    * counts stay below ~9e9 tokens; corpora past that reduce the
    * quantum (the scale note, not a correctness cliff — the guard
    * refuses loudly rather than wrapping). The raw-corpus probability
    * is floored at one quantum (greatest(...,1), mirrored in the
    * oracle): past ~1e9 tokens a sparse bucket's quantized p_raw would
    * otherwise round to 0 and the ratio division would emit NULLs that
    * sum() skips while count() keeps — a silent mean deflation, not an
    * error.
    *
    * Scale design: one corpus pass builds BOTH bucket tables in a single
    * combinable aggregate (count + conditional count); the bucket table
    * (`buckets` rows) broadcasts back for the scoring pass — two corpus
    * passes total, the irreducible stats-then-apply shape. No shuffle
    * carries text; the explode ships (id, bucket) pairs only.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    import graft.functions.TextFunctions.tokens
    val toks = graft.Tables.spread(docs)
      .select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(tokens(col(textCol))).as("w"))
      .select(col("id"), col("tgt"),
        (conv(substring(md5(col("w")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    val bucketStats = toks.groupBy("b").agg(
      count(lit(1)).as("n_raw"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("n_tgt"))
    val totals = bucketStats.agg(
      sum("n_raw").as("tot_raw"), sum("n_tgt").as("tot_tgt"))
    val rated = bucketStats.crossJoin(broadcast(totals))
      .select(col("b"),
        // overflow guard inline (no extra driver action): 1e9 * count
        // must fit a BIGINT, so counts are capped at 9e9 tokens
        when(col("tot_raw") >= 9000000000L, raise_error(concat(
          lit("corpus too large for the 1e-9 quantum ("),
          col("tot_raw").cast("string"),
          lit(" tokens); reduce the quantum or shard the stats pass"))))
          .otherwise(expr(s"(1000000000 * (n_tgt + 1)) div (tot_tgt + $buckets)"))
          .as("p_tgt_q"),
        // floor at one quantum: a sparse bucket in a >1e9-token corpus
        // would quantize to 0 and poison the ratio division with NULLs
        expr(s"greatest((1000000000 * (n_raw + 1)) div (tot_raw + $buckets), 1)")
          .as("p_raw_q"))
      .select(col("b"),
        expr("(1000000000 * p_tgt_q) div p_raw_q").as("ratio_q"))
    toks.join(broadcast(rated), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"), sum("ratio_q").as("ratio_sum"))
      .select(col("id"), col("n_tok"),
        expr("ratio_sum div n_tok").as("mean_ratio_q"))
  }

  /** Deterministic weighted SYSTEMATIC sampling (Madow 1949's systematic
    * PPS design, public): k equally-spaced positions (stride W/k,
    * midpoint offset) on the id-ordered cumulative-weight line select
    * the documents covering them — inclusion probability proportional
    * to weight, variance far below independent PPS draws, and the whole
    * selection a pure integer function of (corpus, k): no RNG, no
    * floats, hash-exact cross-engine. Heavy documents may cover several
    * positions (each selection row carries its position index j). The
    * training-data use: "sample this corpus down to ~k equal token
    * slots" with long docs represented proportionally.
    *
    * Scale shape: the cumulative line comes from the t21 two-pass
    * distributed prefix sum (per-partition totals as broadcast base
    * offsets — NEVER a single-partition window); selection is a per-row
    * integer range + sequence explode (at most one output row per
    * covered position). All divisions on non-negative longs, so Spark's
    * truncating `div` and the oracle's floor `//` agree.
    *
    * Output: (j in [0, k), id, w) ordered by j.
    *
    * Contract: `idCol` must be UNIQUE. The cumulative line is ordered by
    * id with an explicit ROWS frame, so duplicate ids would make the
    * intra-tie order (and thus which duplicate covers a position)
    * engine-dependent; the oracle's `ROWS BETWEEN UNBOUNDED PRECEDING
    * AND CURRENT ROW` assumes the same uniqueness.
    */
  def systematicSample(docs: DataFrame, idCol: String, textCol: String,
                       k: Int, numPartitions: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.TextFunctions.token_count
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val counted = docs
      .select(col(idCol).as("id"), token_count(col(textCol)).cast("long").as("w"))
      .repartitionByRange(n, col("id"))
      .sortWithinPartitions(col("id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val totals = counted.groupBy(col("pid")).agg(sum(col("w")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // <= n rows
      val w = totals.values.sum
      require(w >= k,
        s"systematicSample: corpus weight $w < k=$k sample positions")
      val stride = w / k
      val h = stride / 2
      val bases = {
        val ids = totals.keys.toSeq.sorted
        val acc = ids.scanLeft(0L)((s, p) => s + totals(p))
        ids.zip(acc).toMap
      }
      val baseOf = coalesce(
        element_at(typedLit(bases), col("pid")), lit(0L))
      // explicit ROWS frame: the default RANGE frame would hand every
      // tied id the combined sum, overstating `start` for duplicates
      val win = Window.partitionBy(col("pid")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val out = counted
        .withColumn("start", sum(col("w")).over(win) + baseOf - col("w"))
        .withColumn("j_lo",
          when(col("start") <= h, lit(0L))
            .otherwise(expr(s"(start - $h + $stride - 1) div $stride")))
        .withColumn("j_hi",
          least(lit(k - 1L),
            when(col("start") + col("w") <= h, lit(-1L))
              .otherwise(expr(s"(start + w - 1 - $h) div $stride"))))
        .filter(col("j_lo") <= col("j_hi"))
        .select(explode(sequence(col("j_lo"), col("j_hi"))).as("j"),
          col("id"), col("w"))
        .orderBy(col("j"))
      out.localCheckpoint(true) // realize before unpersist releases pids
    } finally counted.unpersist()
  }

  /** Deterministic EPOCH SHUFFLE — the training-loader data order: for
    * each epoch, every document gets a pseudo-random position that is a
    * pure function of (epoch, id), so the order is reproducible across
    * reruns, resumable mid-epoch, and different between epochs (the
    * "reshuffle each epoch" training requirement without any RNG state
    * to checkpoint — same md5-keyed determinism as the t24 hash split).
    *
    * Scale shape: the order is materialized as (epoch, shard, pos) with
    * shard = first md5 byte mod `shards` and pos dense WITHIN the
    * (epoch, shard) partition — the shard is the unit of parallelism
    * (each training worker streams its shard in pos order), and the
    * window sorts one shard's ID-SIZED rows, never the corpus in one
    * partition and never the payload. Readers recover a single global
    * order as (shard, pos) interleave if they need one; loaders
    * consume shards independently.
    *
    * Output: (epoch, shard, pos, id) — pos is 1-based within its shard.
    */
  def epochShuffle(docs: DataFrame, idCol: String,
                   epochs: Int, shards: Int): DataFrame = {
    require(epochs >= 1 && epochs <= 64,
      s"epochShuffle: epochs must be in [1, 64], got $epochs")
    require(shards >= 1 && shards <= 4096,
      s"epochShuffle: shards must be in [1, 4096], got $shards")
    val keyed = docs
      .select(col(idCol).cast("long").as("id"),
        explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
      .withColumn("k", md5(concat_ws(":", col("epoch"), col("id")).cast("binary")))
      .withColumn("shard",
        // 4 hex chars = 16 bits of the key — covers the full shards
        // range (<= 4096); 2 chars would leave shards 256+ permanently
        // empty, starving the loaders the shard is the unit of
        // parallelism for
        expr(s"cast(conv(substring(k, 1, 4), 16, 10) as bigint) % $shards"))
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("k"), col("id"))
    keyed.select(col("epoch").cast("long").as("epoch"), col("shard"),
      row_number().over(w).cast("long").as("pos"), col("id"))
  }
}
