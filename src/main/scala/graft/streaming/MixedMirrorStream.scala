package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Mixed-container mirror ingestion as a CONTINUOUS flow (x28's
  * container-agnostic curation in streaming form — the 22nd
  * batch==stream twin): real mirror feeds interleave gzip-era, zstd-
  * migration, and xz/bz2/lz4 long-tail shards of the SAME corpus, so
  * the inflation step routes by magic ([[graft.operators.Multimodal
  * .inflate_any]]) and everything downstream is container-blind.
  * Inflation + the token floor are stateless per-row expression work;
  * the only state is the exact-content keep-first keyed by the
  * DECODED TEXT's md5 — the same document arriving gzip'd in one
  * shard and xz'd in another still collides, which is the point of
  * keying on content, not bytes. State is one Long per distinct
  * document.
  *
  * Equivalence contract: under per-key in-order arrival (a duplicate's
  * smallest doc_id arrives first), N micro-batches ≡ the batch form's
  * global min-id keep-first. At 100 TB the blobs arrive from a
  * file-stream source over mirror shards; everything upstream of the
  * keep-first shuffles nothing.
  */
object MixedMirrorStream {

  final case class KeptDoc(doc_id: Long, fp: String)

  /** The stateless pipe, shared VERBATIM by both forms: triage-routed
    * inflation (torn/unknown/named-refusal blobs quarantine as one
    * NULL contract), UTF-8 decode, the token floor, the content
    * fingerprint.
    */
  private def gated(blobs: DataFrame, minTokens: Int): DataFrame =
    blobs
      // triage staged as a named column so the ~19-arm magic CASE
      // appears once in the plan (see Multimodal.inflate_by scaladoc)
      .select(col("doc_id"), col("blob"),
        graft.operators.Multimodal.media_format(col("blob")).as("fmt"))
      .select(col("doc_id"),
        decode(graft.operators.Multimodal.inflate_by(col("fmt"), col("blob")),
          "UTF-8").as("txt"))
      .filter(col("txt").isNotNull)
      .filter(size(split(regexp_replace(col("txt"), "^\\s+|\\s+$", ""),
        "\\s+")) >= minTokens)
      .select(col("doc_id"), md5(col("txt")).as("fp"))

  /** Batch twin surface: x28's gates + keep-first over the shared pipe. */
  def ingestBatch(blobs: DataFrame, minTokens: Int = 4): DataFrame =
    gated(blobs, minTokens)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))

  /** Streaming form: the shared pipe + content-keyed keep-first
    * (min-id within a batch, first batch wins). Checkpoint state is
    * `GroupState[Long]` (the kept id).
    */
  def ingestStream(blobs: DataFrame, minTokens: Int = 4): Dataset[KeptDoc] = {
    import blobs.sparkSession.implicits._
    gated(blobs, minTokens).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) Iterator.empty
          else {
            val minId = rows.map(_._1).min
            state.update(minId)
            Iterator.single(KeptDoc(minId, fp))
          }
      }
  }
}
