package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 line-level cleaning rules (Raffel et al. 2020, §2.2 — the
  * published recipe behind the C4 corpus), in the t25 auditable-flags
  * form: every rule is its own observable column beside the decision,
  * so a rule can be ablated or debugged instead of vanishing into one
  * boolean.
  *
  * Line rules (a line survives iff ALL hold):
  *   - ends in a terminal punctuation mark (. ! ? or ")
  *   - has at least 5 words
  *   - does not contain the word "javascript" (case-insensitive)
  * Page rules (the page survives iff ALL hold):
  *   - no curly brace anywhere (code, not prose)
  *   - no "lorem ipsum" (placeholder text)
  *   - at least 3 lines survived the line rules
  *
  * Spark-first shape: the ENTIRE pass is higher-order array functions
  * on the line array — split, filter-with-lambda, array_join — pure
  * per-row work with ZERO explode and ZERO shuffle (the q49 surface;
  * the lambdas themselves evaluate interpreted, CodegenFallback, but
  * stay inside the scan's projection); at 100 TB it is just another
  * per-row column on the scan, like the Gopher flags (t25) and the
  * PII chain (t54).
  */
object C4Filters {

  /** The line-survival predicate — one lambda, reused by page(). */
  def lineKeep(l: Column): Column =
    l.rlike("[.!?\"]$") &&
      size(split(l, " ")) >= 5 &&
      !lower(l).contains("javascript")

  /** Per-page flag table: n_lines, n_kept, has_brace, has_lorem,
    * keep_page, and the cleaned page (kept lines re-joined; NULL when
    * the page is dropped — a dropped page has no cleaned form).
    */
  def page(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, lineKeep _)
    val hasBrace = col(textCol).contains("{")
    val hasLorem = lower(col(textCol)).contains("lorem ipsum")
    val keepPage = !hasBrace && !hasLorem && size(kept) >= 3
    df.select(col(idCol),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      hasBrace.as("has_brace"),
      hasLorem.as("has_lorem"),
      keepPage.as("keep_page"),
      when(keepPage, array_join(kept, "\n")).as("cleaned"))
  }
}
