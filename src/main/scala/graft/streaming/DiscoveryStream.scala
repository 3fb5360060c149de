package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap discovery as a CONTINUOUS flow (t60's batch recrawl decision
  * in streaming form — the 19th batch==stream twin): the XML parse
  * (regexp_extract_all + zip_with + explode, built-ins only, exactly
  * t60's arm of the custom-operator ladder) is stateless per-row work,
  * and the recrawl decision is a STREAM-STATIC inner join against the
  * fetch-history dimension — the e15 enrichment class: the static side
  * is re-read per trigger, there is NO state store, no watermark, and
  * Append mode emits each discovered URL exactly once.
  *
  * Equivalence contract: batch and stream run the IDENTICAL lazy pipe
  * (the twin is structural — there is no aggregation, so arrival order
  * and micro-batch boundaries cannot change any row). At 100 TB the
  * sitemap blobs arrive from a file-stream source over crawl segments
  * and the history dimension is the crawl log's latest-fetch compaction
  * (e11's latestByKey), snapshot per trigger.
  */
object DiscoveryStream {

  /** The shared pipe: parse each sitemap's `<loc>`/`<lastmod>` pairs,
    * join the fetch history on the URL, decide
    * `refetch = lastmod > last_fetch` (ISO dates compare as strings).
    * `sitemaps` needs (doc_id, xml); `history` needs (url, last_fetch).
    */
  private def decide(sitemaps: DataFrame, history: DataFrame): DataFrame = {
    val locs = regexp_extract_all(col("xml"), lit("<loc>([^<]*)</loc>"), lit(1))
    val mods = regexp_extract_all(col("xml"), lit("<lastmod>([^<]*)</lastmod>"), lit(1))
    sitemaps
      .select(col("doc_id"), explode(zip_with(locs, mods,
        (l, m) => struct(l.as("url"), m.as("lastmod")))).as("e"))
      .select(col("doc_id"), col("e.url").as("url"),
        col("e.lastmod").as("lastmod"))
      .join(history, Seq("url"), "inner")
      .select(col("doc_id"), col("url"), col("lastmod"), col("last_fetch"),
        (col("lastmod") > col("last_fetch")).as("refetch"))
  }

  /** Batch twin surface: t60's parse + recrawl join. */
  def recrawlBatch(sitemaps: DataFrame, history: DataFrame): DataFrame =
    decide(sitemaps, history)

  /** Streaming form: the SAME pipe over a streaming frame — the join
    * plans as a stream-static inner join (stateless; the static side
    * snapshots per trigger).
    */
  def recrawlStream(sitemaps: DataFrame, history: DataFrame): DataFrame =
    decide(sitemaps, history)
}
