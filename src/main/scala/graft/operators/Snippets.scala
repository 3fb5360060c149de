package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snippet extraction — the search-result highlighter: per document,
  * the width-`w` token window holding the most query-term hits, with a
  * deterministic leftmost tie rule. The piece a serving layer renders
  * under each hit (every search UI needs one; the reference's layer
  * results render description text the same way).
  *
  * Algorithm (per-row, zero shuffle): an optimal window can always be
  * shifted right until its LEFT EDGE sits on a hit without losing any
  * hit (every hit inside stays inside), so only hit-anchored windows
  * need scoring — O(H^2) over the hit POSITIONS, not O(n*w) over the
  * tokens. The whole pass is higher-order array code (sequence →
  * filter → nested-lambda transform → array_max / array_position):
  * per-row work with zero explode and zero shuffle; the leftmost rule
  * falls out of array_position returning the FIRST index of the max.
  */
object Snippets {

  /** Appends: n_hits (total query-term occurrences), best_pos (1-based
    * token index of the best window's start), best_hits (hits inside
    * it), snippet (the window's text). Rows with zero hits are dropped
    * (no window to rank). Runs as ONE native-kernel call per row
    * ([[graft.functions.SnippetWindow]]: two-pointer O(tokens + hits));
    * the equivalent higher-order-function formulation evaluates
    * interpreted and measured ~10x slower — SnippetsSpec keeps it as
    * the differential reference.
    */
  def bestWindow(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], w: Int = 12): DataFrame = {
    val win = graft.functions.GraftFunctions.toCol(
      graft.functions.SnippetWindow(
        graft.functions.GraftFunctions.toExpr(col(textCol)), terms, w))
    df.withColumn("__w", win)
      .filter(col("__w").isNotNull)
      .withColumn("n_hits", col("__w.n_hits"))
      .withColumn("best_hits", col("__w.best_hits"))
      .withColumn("best_pos", col("__w.best_pos"))
      .withColumn("snippet", col("__w.snippet"))
      .drop("__w")
  }

  /** The higher-order-function formulation of the SAME semantics —
    * kept as the spec's differential reference (and proof the
    * semantics are expressible in plain array lambdas).
    */
  def bestWindowHof(df: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], w: Int = 12): DataFrame = {
    require(terms.nonEmpty && w >= 1, "snippets: need terms and a positive width")
    val q = array(terms.map(lit): _*)
    df.withColumn("__toks", split(col(textCol), " "))
      .withColumn("__pos", filter(sequence(lit(1), size(col("__toks"))),
        i => array_contains(q, element_at(col("__toks"), i))))
      .filter(size(col("__pos")) > 0)
      .withColumn("__scores", transform(col("__pos"),
        p => size(filter(col("__pos"), o => o >= p && o < p + lit(w)))))
      .withColumn("n_hits", size(col("__pos")).cast("long"))
      .withColumn("best_hits", array_max(col("__scores")).cast("long"))
      .withColumn("best_pos", element_at(col("__pos"),
        array_position(col("__scores"), array_max(col("__scores"))).cast("int"))
        .cast("long"))
      .withColumn("snippet",
        array_join(slice(col("__toks"), col("best_pos").cast("int"), lit(w)), " "))
      .drop("__toks", "__pos", "__scores")
  }
}
