package graft.operators

import org.apache.spark.sql.Dataset

import graft.functions.SketchHash

/** Batch text embedding — the engine-boundary seam for the reference's
  * in-process embedding model (`backend/app.py:28-33`: BGE-large-en-v1.5
  * loaded once per process, queries embedded on demand; SURVEY.md §2.7 F8
  * keeps the model outside the relational engine).
  *
  * The distribution shape is the real design: one encoder instance per
  * partition (the mapPartitions closure is where an ONNX/JNI session
  * would be loaded once and rows run through in inference batches), rows
  * streamed in order, output schema fixed. The default encoder is a REAL
  * reference-free model: [[HashingEncoder]], the feature-hashing signed
  * projection of Weinberger et al. (ICML 2009, "Feature Hashing for
  * Large Scale Multitask Learning") — deterministic, vocabulary-free,
  * and semantically meaningful (texts sharing tokens land near each
  * other in cosine space), so embed-then-search works end to end with
  * no external runtime. Swapping in a neural encoder changes only the
  * closure body (load the session where the HashingEncoder is built).
  */
object Embed {

  case class TextRow(id: Long, text: String)
  case class EmbeddedRow(id: Long, embedding: Array[Float])

  /** Feature-hashing signed-projection text encoder.
    *
    * Per token occurrence (whitespace split of the trimmed text, the
    * engine-wide tokenization convention): the splitmix64-finalized
    * FNV-1a hash of the token's UTF-8 bytes yields a bucket
    * `(u >>> 1) % dim` and a sign `±1` from the low bit; signed counts
    * accumulate into a dense `dim`-vector. Unbiased estimator of the
    * token-count inner product (the hashing-trick guarantee), so cosine
    * over these vectors approximates token-profile similarity.
    *
    * With `normalize = false` every component is an exact small integer
    * stored losslessly in float32 — downstream double-precision cosine
    * arithmetic is then bit-reproducible across engines, which is what
    * the x3 oracle relies on. `normalize = true` gives unit vectors
    * (the convention of the reference's BGE model, which ships
    * normalized embeddings).
    *
    * Empty/whitespace-only text has no tokens and encodes to the zero
    * vector; callers that feed cosine must filter it (cosine is
    * undefined at zero norm), the same posture as the t-family's
    * `len(trim(text)) = 0` guards.
    */
  final class HashingEncoder(val dim: Int, val normalize: Boolean)
      extends Serializable {
    require(dim > 0, s"dim must be positive, got $dim")

    def encode(text: String): Array[Float] = {
      val v = new Array[Float](dim)
      val trimmed = text.trim
      if (trimmed.nonEmpty) {
        val toks = trimmed.split("\\s+")
        var i = 0
        while (i < toks.length) {
          val u = SketchHash.mix(SketchHash.fnv1a64(toks(i).getBytes("UTF-8")))
          val idx = ((u >>> 1) % dim).toInt
          v(idx) += (if ((u & 1L) == 0L) 1f else -1f)
          i += 1
        }
      }
      if (normalize) {
        val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
        if (norm > 0) { var i = 0; while (i < dim) { v(i) = (v(i) / norm).toFloat; i += 1 } }
      }
      v
    }
  }

  /** Embed a text column: one encoder per partition, batch-shaped. */
  def embedText(rows: Dataset[TextRow], dim: Int,
                normalize: Boolean = true): Dataset[EmbeddedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // a neural impl loads its model/session HERE, once per partition
      val enc = new HashingEncoder(dim, normalize)
      it.map(r => EmbeddedRow(r.id, enc.encode(r.text)))
    }
  }

  /** Driver-side single-probe embedding (the reference's query path:
    * embed the request string, then search — `backend/app.py:46`).
    */
  def embedQuery(text: String, dim: Int, normalize: Boolean = true): Array[Float] =
    new HashingEncoder(dim, normalize).encode(text)
}
