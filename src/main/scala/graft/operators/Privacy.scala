package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.fnv64

/** Differentially-private release of group counts via the geometric
  * mechanism (Ghosh, Roughgarden & Sundararajan 2009 — the universally
  * optimal mechanism for counting queries): each count is perturbed by
  * two-sided geometric noise G1 - G2 with ratio alpha = 1/2, giving
  * epsilon = ln 2 per release at sensitivity 1.
  *
  * Exact-integer construction (no float, no RNG state): a Geometric(1/2)
  * draw is the TRAILING-ZERO COUNT of a uniform 64-bit word — P(tz = k)
  * = 2^-(k+1) exactly — and the words come from the engine's seeded
  * splitmix64(FNV-1a) stream over the group key, so both engines (and
  * every replay) derive the identical noise. Determinism per key is
  * memoized ("sticky") noise in the RAPPOR sense: re-running the release
  * answers with the SAME perturbed value instead of averaging the noise
  * away — repeated queries do not compound privacy loss. The flip side
  * is stated plainly: a new release epoch needs a new `tag` (which
  * spends fresh budget).
  *
  * Scale posture: one combinable count per group, then per-ROW codegen
  * hash arithmetic on the group-sized table — no second corpus pass, no
  * driver state, nothing to coordinate across executors (the noise is a
  * pure function of the key).
  */
object Privacy {

  /** tz(h) on a signed 64-bit column, as portable SQL arithmetic:
    * h ^ (h-1) sets exactly tz+1 low bits, so bit_count(...) - 1 = tz;
    * h = 0 (the all-zeros word) reads as 64. */
  private def tz(h: Column): Column =
    when(h === 0L, lit(64L))
      // sign-bit-only word: tz = 63, and h-1 would overflow under ANSI
      .when(h === Long.MinValue, lit(63L))
      .otherwise((bit_count(h.bitwiseXOR(h - lit(1L))) - lit(1)).cast("long"))

  /** One Geometric(1/2) draw per row: tz of the mixed FNV stream over
    * `keyStr` + the draw tag. */
  def geometricDraw(keyStr: Column, tag: String): Column =
    tz(fnv64(concat(keyStr, lit(tag)), mixed = true))

  /** Two-sided geometric (discrete Laplace, alpha = 1/2) noise keyed by
    * `keyStr` and release `tag`. */
  def twoSidedGeometric(keyStr: Column, tag: String): Column =
    geometricDraw(keyStr, s"|$tag|1") - geometricDraw(keyStr, s"|$tag|2")

  /** DP-perturbed group counts: true `n` is NOT in the output (releasing
    * it would defeat the mechanism); `n_noisy` may be negative — callers
    * clamp at presentation if they must, but the unbiased value is the
    * one that composes (clamping skews downstream sums).
    */
  def dpCounts(df: DataFrame, keys: Seq[String], tag: String = "r1"): DataFrame = {
    // \u0001-separated so composite keys cannot alias ("1","23" vs "12","3")
    val keyStr = concat_ws("\u0001", keys.map(k => col(k).cast("string")): _*)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(keys.map(col) :+
        (col("n") + twoSidedGeometric(keyStr, tag)).as("n_noisy"): _*)
  }
}
