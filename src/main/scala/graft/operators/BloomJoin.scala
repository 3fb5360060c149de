package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{toCol, toExpr}
import graft.functions.BloomMightContain

/** Bloom-filter semi-join reduction: probe the FACT side against a
  * compact filter of the dim side's join keys BEFORE the join's
  * shuffle, so fact rows that cannot match never enter the exchange.
  *
  * The move that matters at 100 TB: a selective dim (after its own
  * predicates) usually matches a small fraction of the fact table, but
  * a plain shuffled join still shuffles EVERY fact row. A Bloom filter
  * of the dim keys (~10 bits/key at 1% fpp — a few MB for millions of
  * keys, far under broadcast limits even when the dim ROWS are not)
  * filters the fact scan down to matching-plus-epsilon rows first.
  * No false negatives, so the result is exactly the plain join's; the
  * fpp-bounded false positives are eliminated by the join itself.
  *
  * This is the explicit, deterministic form of the row-level runtime
  * filtering AQE can inject (`spark.sql.optimizer.runtime.bloomFilter`,
  * public Spark conf, off by default and planner-discretionary) — an
  * operator the pipeline author controls, with the filter built once
  * and reusable across consumers.
  *
  * Build path: `dim.stat.bloomFilter` (public API) — a distributed
  * treeAggregate over dim partitions; only the filter's bit array
  * (not the keys) ever reaches the driver. The probe expression
  * ships the bits with the task binary and probes inside whole-stage
  * codegen ([[graft.functions.BloomMightContain]]).
  */
object BloomJoin {

  /** `fact JOIN dim` with the fact side Bloom-reduced first.
    *
    * @param expectedDimKeys sizing hint for the filter; defaults to a
    *                        counted pass over dim (cheap: count-star on
    *                        the dim's own plan, no shuffle of fact)
    * @param fpp false-positive rate — tune DOWN for fatter fact rows
    *            (fewer stray rows through the exchange)
    */
  def join(fact: DataFrame, factKey: String,
           dim: DataFrame, dimKey: String,
           expectedDimKeys: Option[Long] = None,
           fpp: Double = 0.01): DataFrame = {
    val reduced = reduceFact(fact, factKey, dim, dimKey, expectedDimKeys, fpp)
    reduced.join(dim, reduced(factKey) === dim(dimKey))
  }

  /** Just the reduced fact side (for callers composing their own join
    * shape — semi/anti/aggregated-before-join).
    */
  def reduceFact(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String,
                 expectedDimKeys: Option[Long] = None,
                 fpp: Double = 0.01): DataFrame = {
    val n = expectedDimKeys.getOrElse(dim.count())
    if (n == 0L) return fact.filter(lit(false))
    val bf = dim.stat.bloomFilter(dimKey, n, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val probe: Column = toCol(BloomMightContain(toExpr(col(factKey)), bos.toByteArray))
    fact.filter(col(factKey).isNotNull && probe)
  }
}
