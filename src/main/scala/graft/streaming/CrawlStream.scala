package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The crawl front door as a CONTINUOUS ingestion (x14's batch flow in
  * streaming form — the 17th batch==stream twin): WARC record
  * extraction, HTTP-200 filter, PII scrub, and quality gate are all
  * stateless per-row work (they run unchanged on a streaming frame);
  * the only state is the fingerprint-keyed exactly-once keep-first —
  * the same state machine as [[CurateStream.curateKeptStream]] (kept id
  * stored, so in-order-contract violations are observable via the
  * accumulator; Append mode, no timeout — fingerprints are the state,
  * never document text).
  *
  * Equivalence contract (what the twin spec pins): under per-key
  * in-order arrival (a duplicate's smallest doc_id arrives first), N
  * micro-batches ≡ the batch form's global min-id keep-first. At 100 TB
  * the blobs column arrives from a file-stream source over crawl
  * segments; everything upstream of the keep-first shuffles nothing.
  */
object CrawlStream {

  final case class KeptDoc(doc_id: Long, fp: String)

  /** The stateless pipe, shared VERBATIM by both forms: extract ->
    * 200-filter -> scrub -> quality gate -> fingerprint.
    */
  private def cleaned(blobs: DataFrame): DataFrame = {
    import graft.functions.GraftFunctions.warc_records
    import graft.functions.TextFunctions.{fingerprint, quality_score}
    val extracted = blobs
      .select(col("doc_id"), explode(warc_records(col("blob"))).as("r"))
      .filter(col("r.rec_type") === "response" && col("r.http_status") === 200)
      .select(col("doc_id"), col("r.body").as("raw"))
    graft.operators.Pii.scrub(extracted, "raw")
      .filter(quality_score(col("redacted")) >= 0.5)
      .select(col("doc_id"), fingerprint(col("redacted")).as("fp"))
  }

  /** Batch twin surface: x14's keep-first over the shared pipe. */
  def frontDoorBatch(blobs: DataFrame): DataFrame =
    cleaned(blobs)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("fp"))

  /** Streaming form: the shared pipe + fingerprint-keyed keep-first
    * (min-id within a batch, first batch wins). Checkpoint state is
    * `GroupState[Long]` (the kept id).
    */
  def frontDoorStream(blobs: DataFrame,
                      lateSmallerId: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[KeptDoc] = {
    import blobs.sparkSession.implicits._
    cleaned(blobs).as[(Long, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: String, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          if (state.exists) {
            val kept = state.get
            val late = rows.count(_._1 < kept)
            if (late > 0) lateSmallerId.foreach(_.add(late.toLong))
            Iterator.empty
          } else {
            val first = rows.minBy(_._1)
            state.update(first._1)
            Iterator.single(KeptDoc(first._1, fp))
          }
      }
  }
}
