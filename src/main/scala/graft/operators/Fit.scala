package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form distributed model fitting — the quality-classifier step
  * of a training-data pipeline (CCNet/fasttext-style weak supervision)
  * reduced to a shape a 100 TB engine can run exactly: RIDGE REGRESSION
  * on a small engineered feature set has a closed-form solution whose
  * sufficient statistics are plain sums, so the whole fit is ONE
  * combinable aggregate pass + an O(k^3) driver solve — no iterations,
  * no gradient state, no MLlib dependency, and (unlike SGD) a result
  * that is a pure function of the data.
  *
  * Exactness discipline (the t23/g1 posture): the label arrives
  * nano-quantized (an exact integer), features are exact integers, and
  * every sufficient statistic — the cross-products included, which are
  * FORMED in decimal, not merely summed in it — lives in DECIMAL(38,0),
  * which holds any long*long product: overflow-proof and
  * order-independent, so the normal-equation matrix is EXACT. The
  * doubles appear only in the final Cramer solve and per-row scoring,
  * through one fixed expression tree mirrored verbatim by the oracle —
  * IEEE arithmetic on identical inputs through identical trees is
  * bit-identical across engines.
  *
  * The shipped application is label-model disagreement mining: fit the
  * label from the features, then surface the top-k rows by absolute
  * residual — the documents whose quality label their own surface
  * statistics cannot explain (mislabeled, adversarial, or simply odd
  * rows; the standard curation triage step before retraining).
  *
  * Scale shape: two scans (one aggregate with map-side partial combine,
  * one scoring pass ending in TakeOrderedAndProject), 9 longs to the
  * driver, coefficients broadcast back as literals. The trailing rank
  * window runs over the k selected rows only.
  */
object Fit {

  /** Ridge coefficients for y ~ b0 + b1*x1 + b2*x2 (intercept included
    * in the penalty; lambda is in the label's quantized units).
    */
  final case class Ridge3(b0: Double, b1: Double, b2: Double, det: Double)

  /** 3x3 symmetric Cramer solve of (X^T X + lambda I) b = X^T y.
    * The expression tree here is the contract: the oracle states the
    * same formulas textually, so keep the association EXACTLY as
    * written.
    */
  def solve3(n: Double, s1: Double, s2: Double, s11: Double, s12: Double,
             s22: Double, sy: Double, sy1: Double, sy2: Double,
             lambda: Double): Ridge3 = {
    val a11 = n + lambda; val a12 = s1; val a13 = s2
    val a22 = s11 + lambda; val a23 = s12
    val a33 = s22 + lambda
    val det = a11 * (a22 * a33 - a23 * a23) -
      a12 * (a12 * a33 - a23 * a13) +
      a13 * (a12 * a23 - a22 * a13)
    require(det != 0.0, "ridge system is singular even under the penalty " +
      "(degenerate features — constant columns collapse the normal matrix)")
    val b0 = (sy * (a22 * a33 - a23 * a23) -
      a12 * (sy1 * a33 - a23 * sy2) +
      a13 * (sy1 * a23 - a22 * sy2)) / det
    val b1 = (a11 * (sy1 * a33 - a23 * sy2) -
      sy * (a12 * a33 - a23 * a13) +
      a13 * (a12 * sy2 - sy1 * a13)) / det
    val b2 = (a11 * (a22 * sy2 - sy1 * a23) -
      a12 * (a12 * sy2 - sy1 * a13) +
      sy * (a12 * a23 - a22 * a13)) / det
    Ridge3(b0, b1, b2, det)
  }

  /** Fit yq ~ x1, x2 on the whole frame, then return the `k` rows whose
    * label disagrees most with the fit: (id, rnk) ordered by
    * |yq - prediction| descending, ties to the lower id.
    *
    * `x1`/`x2` must be exact-integer expressions and `yq` the exact
    * quantized label (e.g. `floor(quality * 1e9 + 0.5)`); exactness of
    * the sufficient statistics — and thus cross-engine reproducibility
    * of the fit — is the caller's contract.
    */
  def ridgeResidualOutliers(df: DataFrame, idCol: String,
                            x1: Column, x2: Column, yq: Column,
                            lambda: Double = 1000.0, k: Int = 20): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val feats = df.select(col(idCol).as("id"),
      x1.cast("long").as("x1"), x2.cast("long").as("x2"),
      yq.cast("long").as("yq"))
    def dsum(c: Column) = sum(c.cast("decimal(38,0)"))
    // products are formed IN decimal — a LongType multiply would wrap
    // silently (e.g. a 1e9-quantized label times a >9e9 feature) before
    // the cast ever saw it; decimal(38,0) holds any long*long product
    def dprod(a: Column, b: Column) =
      sum(a.cast("decimal(38,0)") * b.cast("decimal(38,0)"))
    val row = feats.agg(
      count(lit(1)).as("n"),
      dsum(col("x1")).as("s1"), dsum(col("x2")).as("s2"),
      dprod(col("x1"), col("x1")).as("s11"),
      dprod(col("x1"), col("x2")).as("s12"),
      dprod(col("x2"), col("x2")).as("s22"),
      dsum(col("yq")).as("sy"),
      dprod(col("yq"), col("x1")).as("sy1"),
      dprod(col("yq"), col("x2")).as("sy2")).head()
    require(row.getLong(0) > 0, "ridgeResidualOutliers: empty input")
    def d(i: Int): Double = row.getDecimal(i).doubleValue()
    val c = solve3(row.getLong(0).toDouble, d(1), d(2), d(3), d(4), d(5),
      d(6), d(7), d(8), lambda)
    val pred = lit(c.b0) + lit(c.b1) * col("x1").cast("double") +
      lit(c.b2) * col("x2").cast("double")
    val top = feats
      .withColumn("resid", abs(col("yq").cast("double") - pred))
      .orderBy(col("resid").desc, col("id").asc)
      .limit(k)
    // rank the k selected rows (k-sized window, not data-sized)
    top.withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("resid").desc, col("id").asc)).cast("long"))
      .select(col("id"), col("rnk"))
  }
}
