package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Media ingestion as a CONTINUOUS flow (x19's audio curation in
  * streaming form — the 20th batch==stream twin, the first over a
  * MULTIMODAL column): the decode + metadata/duration/clipping gates
  * are stateless per-row expression work (they run unchanged on a
  * streaming frame); the only state is the exact-file keep-first —
  * the [[CrawlStream]]/[[CurateStream]] state machine keyed by the
  * blob's md5 (fingerprints, never media bytes, so state is bounded
  * by the distinct-file universe regardless of corpus size).
  *
  * Equivalence contract: under per-key in-order arrival (a duplicate's
  * smallest doc_id arrives first), N micro-batches ≡ the batch form's
  * global min-id keep-first. At 100 TB the wav column arrives from a
  * file-stream source over media shards; everything upstream of the
  * keep-first shuffles nothing.
  */
object MediaIngestStream {

  final case class KeptMedia(doc_id: Long, fp: String)

  /** The stateless pipe, shared VERBATIM by both forms: decode gate
    * (torn blobs quarantine), sample-rate gate (header read), duration
    * gate, clipping gate, then the whole-file fingerprint.
    */
  private def gated(wavs: DataFrame, minSampleRate: Int, minSamples: Long,
                    clipAmp: Int): DataFrame = {
    import graft.functions.GraftFunctions.{audio_meta, audio_pcm_stats}
    wavs
      .select(col("doc_id"), audio_meta(col("wav")).as("meta"),
        audio_pcm_stats(col("wav")).as("p"), md5(col("wav")).as("fp"))
      .filter(col("p").isNotNull)
      .filter(col("meta.sample_rate") >= minSampleRate)
      .filter(col("p.n_samples") >= minSamples)
      .filter(col("p.max_amp") < clipAmp)
      .select(col("doc_id"), col("fp"))
  }

  /** Batch twin surface: x19's gates + keep-first over the shared pipe. */
  def ingestBatch(wavs: DataFrame, minSampleRate: Int = 16000,
                  minSamples: Long = 10L, clipAmp: Int = 32000): DataFrame =
    gated(wavs, minSampleRate, minSamples, clipAmp)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))

  /** Streaming form: the shared pipe + fingerprint-keyed keep-first
    * (min-id within a batch, first batch wins). Checkpoint state is
    * `GroupState[Long]` (the kept id).
    */
  def ingestStream(wavs: DataFrame, minSampleRate: Int = 16000,
                   minSamples: Long = 10L, clipAmp: Int = 32000,
                   lateSmallerId: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[KeptMedia] = {
    import wavs.sparkSession.implicits._
    gated(wavs, minSampleRate, minSamples, clipAmp).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) {
            // later arrivals of a kept fingerprint: observable contract
            // violations when a SMALLER id shows up late
            lateSmallerId.foreach { acc =>
              rows.foreach { case (id, _) => if (id < state.get) acc.add(1L) }
            }
            Iterator.empty
          } else {
            val minId = rows.map(_._1).min
            state.update(minId)
            Iterator.single(KeptMedia(minId, fp))
          }
      }
  }
}
