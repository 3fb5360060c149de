package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.functions.SketchHash

/** Batch text embedding — the engine-boundary seam for the reference's
  * in-process embedding model (`backend/app.py:28-33`: BGE-large-en-v1.5
  * loaded once per process, queries embedded on demand; SURVEY.md §2.7 F8
  * keeps the model outside the relational engine).
  *
  * The distribution shape is the real design: one model instance per
  * partition (the mapPartitions closure is where a real implementation
  * loads its ONNX/JNI session once and runs batched inference), rows
  * streamed through in order. The model itself is STUBBED — this
  * container has no inference runtime — with a deterministic hash-based
  * unit vector, exactly like [[Multimodal.FakeCodec.features]]. Swapping
  * in a real encoder changes only [[FakeEmbedder.embed]].
  */
object Embed {

  case class TextRow(id: Long, text: String)
  case class EmbeddedRow(id: Long, embedding: Array[Float])

  /** STUB encoder: deterministic, L2-normalized, dimension-stable. */
  object FakeEmbedder {
    def embed(text: String, dim: Int): Array[Float] = {
      val base = SketchHash.fnv1a64(text.getBytes("UTF-8"))
      val raw = Array.tabulate(dim) { i =>
        (SketchHash.mix(base + SketchHash.Golden * (i + 1)).toDouble / Long.MaxValue).toFloat
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0f) raw else raw.map(_ / norm)
    }
  }

  /** Embed a text column: one encoder per partition, batch-shaped. */
  def embedText(rows: Dataset[TextRow], dim: Int): Dataset[EmbeddedRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      // real impl: load the model/session HERE, once per partition
      it.map(r => EmbeddedRow(r.id, FakeEmbedder.embed(r.text, dim)))
    }
  }

  /** Driver-side single-probe embedding (the reference's query path:
    * embed the request string, then search).
    */
  def embedQuery(text: String, dim: Int): Array[Float] = FakeEmbedder.embed(text, dim)
}
