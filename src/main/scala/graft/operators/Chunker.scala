package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the RAG/embedding
  * preprocessing step (split every document into `size`-token windows
  * advancing by `size - overlap`, so consecutive chunks share `overlap`
  * tokens of context). The content-defined sibling is
  * [[Dedup.cdcChunks]] (t37): CDC re-syncs after edits, fixed windows
  * give uniform embedding inputs — pipelines use both.
  *
  * Chunk rule, exact on both engines: tokens are the canonical
  * whitespace split of trimmed text (the d3 convention, case
  * preserved); chunk starts are 0, stride, 2*stride, ... while
  * start < max(n - overlap, 1) — so every token is covered, the final
  * chunk may be short, an n <= size document yields exactly one chunk,
  * and an empty document yields none. The manifest carries an md5
  * fingerprint of each chunk's joined text instead of the text itself
  * (rows stay index-sized; md5 hex agrees across engines — the t24
  * split convention).
  *
  * Scale shape: one projection + one bounded posexplode per row — no
  * shuffle at all; the chunk arithmetic is array slicing inside
  * whole-stage codegen. Chunk count per doc is ceil((n - overlap) /
  * stride) — linear in the document, never quadratic.
  */
object Chunker {

  /** Manifest (id, chunk_idx, start_tok, n_tok, fp) ordered by caller. */
  def fixedChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunker: size must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"chunker: overlap must be in [0, size), got $overlap for size $chunkSize")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol).cast("long").as("id"),
        filter(split(trim(col(textCol)), "\\s+"), t => t =!= "").as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .filter(col("n") > 0)
      // ceil(max(n - overlap, 1) / stride) chunk starts — `div`, not `/`
      // (Column./ is floating-point division)
      .withColumn("n_chunks",
        expr(s"(greatest(n - $overlap, 1L) + ${stride - 1}) div $stride"))
      .select(col("id"), col("toks"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(col("id"), col("chunk_idx"), col("start_tok"),
        least(lit(chunkSize.toLong), col("n") - col("start_tok")).as("n_tok"),
        md5(array_join(
          slice(col("toks"), (col("start_tok") + 1).cast("int"), lit(chunkSize)),
          " ").cast("binary")).as("fp"))
  }
}
