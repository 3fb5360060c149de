package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions.{fingerprint, quality_score}

/** STREAMING INGESTION of the curation gate — the 12th batch==stream
  * twin: d11's front half (language/quality gate + exact fingerprint
  * dedup keep-first) run as a continuous Structured Streaming pipeline,
  * so a training corpus curates AS IT ARRIVES instead of in nightly
  * batch passes. The reference's analogue is its single-process pandas
  * ingest loop (`backend/load_data.py:173-190`); this is that flow as
  * an unbounded stream.
  *
  * Stage semantics:
  *  - the gate is STATELESS (the same codegen [[quality_score]] /
  *    allowlist expressions as the batch form — rejected rows die in
  *    the micro-batch scan, exactly like batch rows die in the parquet
  *    scan stage);
  *  - keep-first dedup is the e30 exactly-once pattern keyed by the
  *    canonical-text FINGERPRINT: state is one boolean per fingerprint
  *    seen, each key emits exactly one document ever. Within a
  *    micro-batch the min-id duplicate wins (a deterministic choice,
  *    not iterator luck); across batches the first batch wins — so
  *    under the per-key in-order arrival contract every twin in this
  *    library states (ids nondecreasing per key across batches), the
  *    emitted set EQUALS the batch form's min-id keep-first, which
  *    StreamingSpec pins on a shared fixture.
  *
  * Scale: state is fingerprints-not-text (16-byte keys + a boolean),
  * the same keys-not-log bound d1/e30 argue; the packing tail
  * ([[graft.operators.Packing.manifest]]) stays a batch consumer of the
  * curated sink — its global running sum has no incremental form, and
  * recomputing it over the kept set is the cheap part of the pipeline.
  */
object CurateStream {

  /** The curated row the stream emits (and the batch surface projects
    * to): id, text, lang.
    */
  final case class CuratedDoc(doc_id: Long, text: String, lang: String)

  /** Batch twin surface: [[graft.operators.Curate.kept]] projected to
    * the stream's column contract.
    */
  def curateKeptBatch(docs: DataFrame, langs: Seq[String],
                      minQuality: Double): DataFrame =
    graft.operators.Curate.kept(docs, "doc_id", "text", "lang",
      langs, minQuality)
      .select(col("doc_id"), col("text"), col("lang"))

  /** The streaming form: gate (stateless) then fingerprint-keyed
    * exactly-once keep-first (min-id within a batch, first batch wins).
    *
    * The state stores the KEPT id (not just a seen-bit), so violations
    * of the in-order arrival contract are observable at runtime: a row
    * arriving in a later batch with a SMALLER id than the kept one would
    * silently diverge from the batch twin's global min-id — such rows
    * are counted into `lateSmallerId` (pass an accumulator to monitor;
    * alerting on a nonzero count is the operational contract check).
    *
    * Checkpoint compatibility: the state type changed from
    * `GroupState[Boolean]` (seen-bit) to `GroupState[Long]` (kept id) in
    * round 13 — a streaming query restarted from a checkpoint written by
    * the seen-bit version will fail or misdecode its state store. Start
    * a NEW checkpoint directory when upgrading across that boundary.
    */
  def curateKeptStream(docs: Dataset[CuratedDoc], langs: Seq[String],
                       minQuality: Double,
                       lateSmallerId: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[CuratedDoc] = {
    require(langs.nonEmpty, "curateKeptStream: empty language allowlist")
    import docs.sparkSession.implicits._
    val gated = docs.toDF()
      .filter(col("lang").isInCollection(langs) &&
        quality_score(col("text")) >= minQuality)
      .withColumn("__fp", fingerprint(col("text")))
      .select(col("doc_id"), col("text"), col("lang"), col("__fp"))
      .as[(Long, String, String, String)]
    gated
      .groupByKey(_._4)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, String, String, String)],
         state: GroupState[Long]) =>
          if (state.exists) {
            val kept = state.get
            val late = rows.count(_._1 < kept)
            if (late > 0) lateSmallerId.foreach(_.add(late.toLong))
            Iterator.empty
          } else {
            val first = rows.minBy(_._1)
            state.update(first._1)
            Iterator.single(CuratedDoc(first._1, first._2, first._3))
          }
      }
  }
}
