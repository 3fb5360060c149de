package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.token_count

/** Sequence-packing manifest — the concatenate-then-chunk step every
  * LLM training-data pipeline runs before batching (the GPT-style
  * "pack documents into fixed context windows" layout, public in every
  * training codebase): within each group, documents concatenate in id
  * order into one token stream that is cut every `maxLen` tokens, and
  * each document is assigned the [start, end) token span it occupies —
  * from which its window ids fall out arithmetically. The manifest is
  * the (doc -> windows, offset) map a downstream tokenizer/batcher
  * consumes; no text moves, only integer spans.
  *
  * Scale shape: ONE grouped running-sum window (partitioned by
  * `groupCol`, ordered by id) over a per-row token count that comes
  * from the same codegen'd `token_count` kernel as t1 — the corpus is
  * scanned once and shuffles once on the group key. Parallelism is the
  * group count (language/source/shard keys at corpus scale — a
  * training mixture has many), never one global stream: packing IS
  * sequential within a stream by definition, so the group key is the
  * unit of parallelism; shard a single-stream corpus by a derived key
  * first (each shard packs independently, the standard practice).
  *
  * Determinism: spans depend only on (group, id order, token counts) —
  * retry- and partitioning-independent, the [[Sampling]] reproducibility
  * contract.
  */
object Packing {

  /** Integral floor division for non-negative longs (Spark's `/` casts
    * to double — the RangeJoin.floorDiv lesson).
    */
  private def div(c: Column, w: Long): Column =
    call_function("div", c, lit(w)).cast("long")

  /** The packing manifest: one row per non-empty document with
    * `(group, id, n_tok, start_off, first_bin, last_bin, n_bins)` —
    * `start_off` its 0-based offset in the group's concatenated token
    * stream, bins the `maxLen`-token windows it touches (a document
    * longer than the remainder of its window straddles into the next;
    * the manifest records the full range). Token-free documents pack
    * nothing and are dropped, mirroring BM25's N semantics.
    */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               groupCol: String, maxLen: Long): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val counted = docs.select(col(groupCol).as("grp"), col(idCol).as("id"),
      token_count(col(textCol)).cast("long").as("n_tok"))
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
    spans(counted.withColumn("end_off", sum(col("n_tok")).over(w)), maxLen,
      Seq(col("grp"), col("id")))
  }

  /** LENGTH-BUCKETED dynamic batching — the inference/training batch
    * manifest (the public bucketed-batching practice: sort-by-length
    * batching so pad tokens, which cost compute but carry no signal,
    * are bounded by the bucket width): documents bucket by
    * ceil(n_tok / bucketWidth), within a bucket order by (n_tok, id)
    * and chunk into `batchSize`-doc batches; each batch pads to its own
    * max. Output is the BATCH-LEVEL summary
    * (bucket, batch_idx, n_docs, max_tok, pad_waste) — pad_waste =
    * n_docs·max_tok − Σ n_tok, the number the bucket width is tuned on.
    *
    * Scale shape: one token-count pass, then per-BUCKET windows (the
    * bucket key partitions the sort — never a corpus-wide window) and a
    * combinable batch aggregate. Token-free documents batch nothing.
    */
  def lengthBatches(docs: DataFrame, idCol: String, textCol: String,
                    bucketWidth: Long = 16L, batchSize: Long = 8L): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val t = docs.select(col(idCol).cast("long").as("id"),
        token_count(col(textCol)).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0L)
      .withColumn("bucket",
        div(col("n_tok") + lit(bucketWidth - 1L), bucketWidth))
    val w = Window.partitionBy(col("bucket")).orderBy(col("n_tok"), col("id"))
    t.withColumn("batch_idx",
        div((row_number().over(w) - 1).cast("long"), batchSize))
      .groupBy(col("bucket"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"), max(col("n_tok")).as("max_tok"),
        (count(lit(1)) * max(col("n_tok")) - sum(col("n_tok"))).as("pad_waste"))
  }

  /** ONE global stream, no group key — the case a single unpartitioned
    * window would serialize onto one core (the q25 failure mode, fatal
    * at corpus scale). Classic two-pass distributed prefix sum instead:
    *
    *   pass 1 — range-partition by id, per-partition token totals (one
    *            row per partition, a bounded collect);
    *   pass 2 — per-PARTITION running-sum windows (parallel: each
    *            partition is its own window) plus the broadcast base
    *            offset of everything before it.
    *
    * The output depends only on the global id order and the counts —
    * partition boundaries cancel out — so the manifest is identical to
    * the grouped operator's under a constant group, at full-cluster
    * parallelism. The input is persisted across the two passes so both
    * see one partition assignment (range partitioning samples).
    */
  def manifestGlobal(docs: DataFrame, idCol: String, textCol: String,
                     maxLen: Long, numPartitions: Int = 0): DataFrame = {
    require(maxLen > 0, s"maxLen must be positive, got $maxLen")
    val spark = docs.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sparkContext.defaultParallelism
    val counted = docs
      .select(col(idCol).as("id"), token_count(col(textCol)).cast("long").as("n_tok"))
      .repartitionByRange(n, col("id"))
      .sortWithinPartitions(col("id"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val totals = counted.groupBy(col("pid")).agg(sum(col("n_tok")).as("t"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap // <= n rows
      val bases = {
        val ids = totals.keys.toSeq.sorted
        val acc = ids.scanLeft(0L)((s, p) => s + totals(p))
        ids.zip(acc).toMap
      }
      // base offsets ride as a literal map expression (codegen'd
      // element_at), not a UDF
      val baseOf = coalesce(
        element_at(typedLit(bases), col("pid")), lit(0L))
      val w = Window.partitionBy(col("pid")).orderBy(col("id"))
      val out = spans(
        counted.withColumn("end_off", sum(col("n_tok")).over(w) + baseOf),
        maxLen, Seq(col("id")))
      out.localCheckpoint(true) // realize before unpersist releases pids
    } finally counted.unpersist()
  }

  private def spans(withEnd: DataFrame, maxLen: Long, keep: Seq[Column]): DataFrame =
    withEnd
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .filter(col("n_tok") > 0)
      .select(keep ++ Seq(col("n_tok"), col("start_off"),
        div(col("start_off"), maxLen).as("first_bin"),
        div(col("end_off") - 1, maxLen).as("last_bin")): _*)
      .withColumn("n_bins", col("last_bin") - col("first_bin") + 1)

  /** NO-SPLIT packing via next-fit-decreasing: documents keep their
    * integrity (the fine-tuning / long-context regime where truncating
    * mid-document hurts) and pack into fixed-capacity bins with bounded
    * padding waste — the complement of [[manifest]]'s concat-then-chunk.
    * Deterministic: docs shard by md5 hash (the t24 convention), each
    * shard orders (n_tok DESC, id ASC) and folds the classic next-fit
    * rule — a bin closes when the next document would overflow it;
    * oversized documents get singleton bins.
    *
    * Scale shape: packing is sequential WITHIN a stream by definition,
    * so the shard key is the unit of parallelism (the [[manifest]]
    * argument): one repartition on the shard key + an in-partition sort,
    * then a single O(1)-state pass per shard (mapPartitions — no
    * window, no accumulated array). Output: (shard, bin, id, n_tok).
    */
  def nextFitShards(docs: DataFrame, idCol: String, textCol: String,
                    capacity: Long, shards: Int,
                    salt: String = "graft"): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // the typed fold below carries ids as Long; a silent cast would turn
    // non-numeric ids into NULLs that unbox to a collapsed id 0 — refuse
    // loudly instead (hash string ids to a long upstream, e.g. fnv64)
    val idType = docs.schema(idCol).dataType
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(integral,
      s"nextFitShards: id column '$idCol' must be integral, got " +
        s"${idType.simpleString}; hash non-numeric ids to a long upstream")
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(col(idCol).cast("long").as("id"),
        token_count(col(textCol)).cast("long").as("n_tok"))
      .withColumn("shard",
        (conv(substring(md5(concat(lit(salt), col("id").cast("string"))), 1, 8),
          16, 10).cast("long") % shards).cast("int"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("n_tok").desc, col("id").asc)
    sized.select(col("shard"), col("id"), col("n_tok"))
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        val st = new NextFitState(capacity)
        it.map { case (shard, id, n) => (shard, st.assign(shard, n), id, n) }
      }
      .toDF("shard", "bin", "id", "n_tok")
  }

  /** The next-fit bin-assignment state machine shared by the
    * [[nextFitShards]] mapPartitions pass and KernelProperties (so the
    * property-tested fold IS the engine's fold): a bin closes when the
    * next document would overflow it; an oversized document lands alone
    * (it enters an empty bin, overflows it, and the NEXT document closes
    * that bin immediately).
    *
    * PADDING BOUND (the classic next-fit guarantee, Johnson 1973): when
    * every item fits `capacity`, any two CONSECUTIVE bins in one shard
    * hold strictly more than `capacity` together (the second bin's first
    * item did not fit the first bin's remainder), so
    * `n_bins <= 2 * ceil(total / capacity) - 1 <= 2 * OPT - 1` — waste
    * is bounded at under half, shard by shard, regardless of input.
    * Next-fit-DECREASING (the (n_tok desc, id) shard order upstream)
    * only tightens the constant in practice; the stated bound is the
    * order-free worst case KernelProperties checks.
    */
  private[graft] final class NextFitState(capacity: Long) {
    private var curShard = Int.MinValue
    private var bin = 0L
    private var running = 0L
    def assign(shard: Int, n: Long): Long = {
      if (shard != curShard) { curShard = shard; bin = 0L; running = 0L }
      else if (running + n > capacity && running > 0) { bin += 1; running = 0L }
      running += n
      bin
    }
  }
}
