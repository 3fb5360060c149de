package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.InvertedIndex

/** CONTINUOUS LEXICAL INDEX INGESTION — the 15th batch==stream twin,
  * and the AnnIngestStream pattern applied to the OTHER retrieval
  * artifact: documents stream into a saved inverted index as they are
  * published, each micro-batch tokenized and appended to the
  * hash-bucketed posting directories via [[InvertedIndex.appendSaved]]
  * — the batch maintenance contract t28/t52 gate, so the twin property
  * is structural: per-(id, term) tf rows are computed per batch
  * (term counts never span documents), posting/doclen files are
  * append-only, and the stats sidecar fold (+n, +sumdl) is
  * addition-associative across any batch split. A BM25 query over the
  * saved index cannot tell how its postings arrived; StreamingSpec
  * pins stream-ingested == batch-built search results, scores
  * included.
  *
  * Delivery contract: foreachBatch is at-least-once across restarts —
  * a replayed uncommitted batch re-appends its postings (double
  * counted tf/df for those ids). Exactly-once composes the e30 dedup
  * pattern upstream, keyed by the document id. Segment accretion is
  * the operational price of streaming (one file per writer task per
  * bucket per batch): [[InvertedIndex.segmentStats]] watches it and
  * [[InvertedIndex.compactSaved]] (on a quiesced index) repairs it —
  * ingestion, telemetry, policy, compaction: the full lexical index
  * lifecycle, continuous.
  */
object LexIngestStream {

  /** Start ingesting `stream` (columns `idCol`, `textCol`) into the
    * saved index at `path`. Caller owns checkpointing (restart-resume
    * skips committed batches; see the delivery contract above).
    */
  def ingest(stream: DataFrame, path: String, idCol: String,
             textCol: String, checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        InvertedIndex.appendSaved(batch, idCol, textCol, path): Unit
      }
      .start()
}
