package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap discovery as a CONTINUOUS flow (t60's batch recrawl decision
  * in streaming form — the 19th batch==stream twin): the XML parse
  * (regexp_extract_all over `<url>` blocks + explode + per-block
  * regexp_extract, built-ins only, exactly t60's arm of the
  * custom-operator ladder) is stateless per-row work,
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
    *
    * Pairing contract: loc and lastmod are pulled from the SAME `<url>`
    * block (extract-blocks-then-extract-fields, never two independent
    * document-wide scans zipped positionally — `<lastmod>` is optional
    * in real sitemaps, and one absent tag would shift every later URL
    * onto the wrong date). A `<url>` missing either field is skipped
    * (the recrawl decision needs both; discovery of undated URLs is
    * t60c's arm). Both extracts run AFTER the explode, so they are
    * codegen'd per-row regexps, not per-element lambdas.
    */
  /** The five XML predefined entities, unescaped in REVERSE of escape
    * order — `&amp;` last, so `&amp;lt;` correctly yields the literal
    * text `&lt;`, not `<`. The sitemap protocol REQUIRES entity-escaped
    * URLs, so a real `<loc>` with a query string carries `&amp;`.
    */
  private def unescapeXml(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, r)) => regexp_replace(acc, e, r) }
  }

  private def decide(sitemaps: DataFrame, history: DataFrame): DataFrame = {
    val blocks = regexp_extract_all(col("xml"),
      lit("(?s)<url>(.*?)</url>"), lit(1))
    sitemaps
      .select(col("doc_id"), explode(blocks).as("b"))
      .select(col("doc_id"),
        unescapeXml(regexp_extract(col("b"), "<loc>([^<]*)</loc>", 1)).as("url"),
        regexp_extract(col("b"), "<lastmod>([^<]*)</lastmod>", 1).as("lastmod"))
      .filter(col("url") =!= "" && col("lastmod") =!= "")
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
