package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.fnv64

/** HyperLogLog distinct-count registers (Flajolet et al. 2007, public),
  * built DECLARATIVELY: the register table is an ordinary `max`
  * aggregate over (key, bucket), so it is map-side combinable, mergeable
  * across shards/days by construction (max of maxes), and — unlike
  * Spark's built-in approx_count_distinct, whose HLL++ buffer is an
  * opaque binary — every register is an oracle-checkable integer
  * derived from the engine's own FNV-1a hash stream (the d3/d4 kernel,
  * already restated in SQL). The t22 Misra-Gries posture, applied to
  * distinct counting: the sketch itself is the gated artifact.
  *
  * Layout: p=8 -> 256 registers per key; bucket = top 8 hash bits, rho =
  * leading-zero count of the remaining 56 bits + 1 (capped 57 when they
  * are all zero).
  *
  * Scale design: the corpus pass is ONE combinable aggregate whose
  * exchange carries at most keys x 256 rows regardless of cardinality —
  * the distinct-counting exchange that `COUNT(DISTINCT)` would pay a
  * full repartition of the value space for. Registers persist and merge
  * across incremental loads (union -> same max aggregate).
  */
object Hll {

  val P = 8
  val Registers: Int = 1 << P // 256
  private val RemMask = (1L << 56) - 1

  /** Per-(key, bucket) max-rho register rows for `valueCol`'s distinct
    * set. Output: keyCols..., bucket, max_rho.
    */
  def registers(df: DataFrame, keyCols: Seq[String], valueCol: Column): DataFrame = {
    // mixed: raw FNV-1a high bits have near-zero avalanche on short
    // inputs; the splitmix64 finalizer restores bucket uniformity
    val u = fnv64(valueCol.cast("string"), mixed = true)
    val bucket = shiftrightunsigned(u, 64 - P).cast("int")
    val rem = u.bitwiseAND(lit(RemMask))
    // rho = 56-bit leading zeros + 1 = 57 - bitlength(rem); bin() of a
    // positive long strips leading zeros in both engines (bin(0)='0' is
    // why the zero case is explicit)
    val rho = when(rem === 0L, lit(57)).otherwise(lit(57) - length(bin(rem)))
    df.select(keyCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho"): _*)
      .groupBy(keyCols.map(col) :+ col("bucket"): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge register tables from disjoint (or overlapping) shards: union
    * then the same max aggregate — max of maxes, so merging N shards'
    * registers equals one pass over their union by construction. This is
    * the incremental-load path: persist each day's/shard's registers,
    * merge on read; the exchange again carries at most keys x 256 rows
    * per shard.
    */
  def merge(keyCols: Seq[String], regs: Seq[DataFrame]): DataFrame = {
    require(regs.nonEmpty, "merge: no register tables")
    regs.reduce(_ unionByName _)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(max(col("max_rho")).as("max_rho"))
  }

  /** The standard HLL estimate from a register table (small-range linear
    * counting below 2.5m, raw harmonic estimate above). Spec-level
    * accuracy helper — the GATED artifact is the integer register table;
    * the float estimate is not oracle-compared (sum order is
    * engine-chosen).
    */
  def estimate(regs: DataFrame, keyCols: Seq[String]): DataFrame = {
    val m = Registers.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m) // standard bias constant, m >= 128
    val zeroes = lit(m) - count(lit(1)) // registers never observed -> rho 0
    val s = sum(pow(lit(0.5), col("max_rho"))) + zeroes * 1.0
    val raw = lit(alpha * m * m) / s
    regs.groupBy(keyCols.map(col): _*)
      .agg(raw.as("raw"), zeroes.as("z"))
      .select(keyCols.map(col) :+
        when(col("raw") <= 2.5 * m && col("z") > 0,
          lit(-m) * log(col("z") / m)).otherwise(col("raw"))
          .as("estimate"): _*)
  }
}
