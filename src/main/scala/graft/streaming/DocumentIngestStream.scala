package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Document-mirror ingestion as a CONTINUOUS flow (x22's compressed-PDF
  * curation in streaming form — the 21st batch==stream twin): the
  * container inflation (zunstd), text extraction (pdf_text), and the
  * token-count quality floor are stateless per-row expression work;
  * the only state is the exact-content keep-first — the
  * [[MediaIngestStream]] state machine keyed by the EXTRACTED TEXT's
  * md5 (two mirrors shipping the same document in different containers
  * or compression levels still collide, which is the point of keying
  * on content, not bytes). State is one Long per distinct document.
  *
  * Equivalence contract: under per-key in-order arrival (a duplicate's
  * smallest doc_id arrives first), N micro-batches ≡ the batch form's
  * global min-id keep-first. At 100 TB the frames arrive from a
  * file-stream source over mirror shards; everything upstream of the
  * keep-first shuffles nothing.
  */
object DocumentIngestStream {

  final case class KeptDoc(doc_id: Long, fp: String)

  /** The stateless pipe, shared VERBATIM by both forms: inflate (torn
    * frames quarantine), extract (torn documents quarantine), the
    * token floor, then the content fingerprint.
    */
  private def gated(frames: DataFrame, minTokens: Int): DataFrame = {
    import graft.functions.GraftFunctions.{pdf_text, zunstd}
    frames
      .select(col("doc_id"), pdf_text(zunstd(col("blob"))).as("txt"))
      .filter(col("txt").isNotNull)
      .filter(size(split(regexp_replace(col("txt"), "^\\s+|\\s+$", ""),
        "\\s+")) >= minTokens)
      .select(col("doc_id"), md5(col("txt")).as("fp"))
  }

  /** Batch twin surface: x22's gates + keep-first over the shared pipe. */
  def ingestBatch(frames: DataFrame, minTokens: Int = 7): DataFrame =
    gated(frames, minTokens)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))

  /** Streaming form: the shared pipe + content-keyed keep-first
    * (min-id within a batch, first batch wins). Checkpoint state is
    * `GroupState[Long]` (the kept id).
    */
  def ingestStream(frames: DataFrame, minTokens: Int = 7): Dataset[KeptDoc] = {
    import frames.sparkSession.implicits._
    gated(frames, minTokens).as[(Long, String)]
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
