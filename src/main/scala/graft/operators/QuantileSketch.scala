package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable LOG-BINNED quantile sketch — the quantile member of the
  * sketch family (HLL = distinct, Count-Min/Misra-Gries = frequency,
  * this = ranks), in the same registers-are-the-artifact posture: the
  * sketch is an ordinary combinable COUNT per (key, bin), where a
  * non-negative integer value's bin is its bit length refined by the 4
  * mantissa bits below the leading one —
  *
  *   L   = bit length of v (0 for v = 0)
  *   sub = (v >> max(L-5, 0)) & 15
  *   bin = L * 16 + sub
  *
  * so bin boundaries are exact integer arithmetic both engines state
  * identically, every bin spans at most a (1 + 2^-4) relative range,
  * and merging shards is ADDING counts (the e19b union property, by
  * construction of +). This is the fixed-precision core of the
  * log-histogram quantile practice (HDR-histogram / DDSketch's
  * relative-error binning, public) without their dynamic bucket maps —
  * the price is a fixed ~6% worst-case relative error at the bin edge
  * (spec-measured much tighter in the belly of a distribution), the
  * win is a sketch that is ALSO an oracle-checkable integer table.
  *
  * Scale shape: one combinable aggregate; the exchange carries at most
  * keys × (65 × 16) rows regardless of row count or value cardinality
  * (bin = L*16 + sub with L ∈ [0,64], so ≤1040 distinct bins) — the
  * quantile analogue of the HLL argument. `estimate` is a driver-side
  * fold over ONE key's ≤1040 bins.
  */
object QuantileSketch {

  /** Per-(key, bin) counts for the non-negative long `valueCol`.
    * Output: keyCols..., bin, cnt. Negative values are the caller's
    * contract violation — refuse at plan level with a runtime guard
    * column check (assert_true folds into the scan).
    */
  def registers(df: DataFrame, keyCols: Seq[String], valueCol: Column): DataFrame = {
    val v = valueCol.cast("long")
    // bit length via the Hll convention: bin() of a positive long has
    // no leading zeros; length(bin(0)) is 1, special-cased to L = 0
    // (local names avoid shadowing functions.bin, which `len` uses)
    val lenC = when(v === 0L, lit(0))
      .otherwise(length(org.apache.spark.sql.functions.bin(v))).cast("int")
    // the column-shift overload of shiftrightunsigned is SQL-only —
    // call_function reaches it (the Packing.div pattern)
    val subC = call_function("shiftrightunsigned", v, greatest(lenC - 5, lit(0)))
      .bitwiseAND(lit(15L)).cast("int")
    val binC = (lenC * 16 + subC).cast("int")
    val guarded = when(v < 0L,
      raise_error(concat(lit("QuantileSketch: negative value "), v.cast("string"))))
      .otherwise(binC)
    df.select(keyCols.map(col) :+ guarded.as("bin"): _*)
      .groupBy(keyCols.map(col) :+ col("bin"): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge register tables from shards: union + the same count-sum —
    * addition, so merging N shards equals one pass by construction.
    */
  def merge(keyCols: Seq[String], regs: Seq[DataFrame]): DataFrame = {
    require(regs.nonEmpty, "merge: no register tables")
    regs.reduce(_ unionByName _)
      .groupBy((keyCols :+ "bin").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** The LOWER BOUND of values in `bin` — the estimate `quantile`
    * returns (every member of the bin is within (1 + 2^-4) of it).
    */
  def binLow(bin: Int): Long = {
    val len = bin / 16; val sub = bin % 16
    if (len == 0) 0L
    // len <= 5: sub carries the ENTIRE value below the 5-bit line
    // (bins are exact for v < 32); the OR is a no-op when the leading
    // bit is already inside sub (len <= 4)
    else if (len <= 5) ((1 << (len - 1)) | sub).toLong
    else (1L << (len - 1)) | (sub.toLong << (len - 5))
  }

  /** Driver-side quantile estimate from ONE key's register rows
    * (bin -> cnt): the lower bound of the bin holding rank
    * ceil(q * N). Bounded input by construction (≤ 1040 bins).
    */
  def quantile(bins: Seq[(Int, Long)], q: Double): Long = {
    require(q > 0.0 && q <= 1.0, s"q must be in (0, 1], got $q")
    require(bins.nonEmpty, "empty sketch")
    val n = bins.map(_._2).sum
    val rank = math.ceil(q * n).toLong
    var acc = 0L
    for ((bin, cnt) <- bins.sortBy(_._1)) {
      acc += cnt
      if (acc >= rank) return binLow(bin)
    }
    binLow(bins.map(_._1).max)
  }
}
