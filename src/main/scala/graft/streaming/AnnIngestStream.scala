package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Ivf

/** CONTINUOUS ANN INDEX INGESTION — the 13th batch==stream twin:
  * embeddings stream into a SAVED IVF index as they are produced
  * (the embed → index pipeline of a live corpus), each micro-batch
  * assigned against the STORED centroids and appended to the
  * bucket-partitioned data files via [[Ivf.appendSaved]] — exactly the
  * batch maintenance contract v11 gates, so the twin property is
  * structural: N micro-batches of appendSaved ≡ one appendSaved of
  * their union (assignment is per-row against fixed centroids; the
  * bucket directories are append-only), and a search over the saved
  * index cannot tell how its rows arrived. StreamingSpec pins
  * stream-ingested == batch-ingested == built-fresh search results on
  * a shared fixture.
  *
  * Delivery contract: foreachBatch is at-least-once across restarts —
  * a batch replayed after a crash APPENDS ITS ROWS AGAIN (duplicate
  * ids in the index; searches then return duplicate hits). Exactly-once
  * ingestion composes the e30 pattern upstream
  * ([[EventsStream.streamingDedup]] keyed by the vector id) or dedups
  * on read; the index files themselves stay append-only either way.
  * Recall posture: as the streamed distribution drifts from the
  * training sample, appended buckets fatten where the drift lands —
  * [[Ivf.savedBucketStats]] watches it, [[Ivf.rebalanceSaved]] (on a
  * quiesced index) or a rebuild repairs it; the same lifecycle as
  * batch appends, just continuous.
  */
object AnnIngestStream {

  /** Start ingesting `stream` (columns `idCol`, `embCol`) into the
    * saved index at `path`. The caller owns checkpointing via
    * `checkpointDir` (restart-resume skips committed batches; replayed
    * UNcommitted batches re-append — see the delivery contract above).
    */
  def ingest(stream: DataFrame, path: String, idCol: String,
             embCol: String, checkpointDir: String): StreamingQuery = {
    val spark = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Ivf.appendSaved(spark, path, batch, idCol, embCol): Unit
      }
      .start()
  }
}
