package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every public-crawl curation
  * pipeline runs before training (emails, phone numbers, IP addresses;
  * the C4/RedPajama-style rule set). Spark-first: a SEQUENTIAL chain of
  * built-in `regexp_replace` stages, entirely whole-stage codegen — no
  * UDF, no shuffle, scan-fused like the quality rules (t25).
  *
  * Determinism contract (what makes the gate hash-exact): the three
  * patterns use only the regex subset Java's engine and RE2 agree on —
  * ASCII classes, bounded counts, `\b` ASCII word boundaries, no
  * alternation whose leftmost-first vs leftmost-longest semantics could
  * diverge — and the stages run in a FIXED order (email, then IP, then
  * phone), each counting its matches on the text as the previous stage
  * left it. Replacement tokens contain no digits or `@`, so a stage
  * cannot manufacture matches for a later one.
  *
  * At 100 TB this is pure per-row CPU on the existing scan: no state,
  * no exchange, composes with the d11 curation manifest as just another
  * fused column.
  */
object Pii {

  /** user@host.tld — host labels need a final alphabetic TLD of 2+, so
    * raw IPv4 hosts do NOT count as emails (they fall to the IP stage).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded (no octet-range validation — the
    * scrubber errs toward redaction, the usual curation stance).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NNN-NNN-NNNN / NNN NNN NNNN, optional leading +. */
  val PhoneRe = "\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}"

  /** Scrub `textCol`: appends per-type match counts (as counted when
    * that stage ran) and the fully redacted text.
    * Output columns: n_email, n_ip, n_phone, redacted.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    def count(c: Column, re: String): Column =
      size(regexp_extract_all(c, lit(re), lit(0))).cast("long")
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, EmailRe, "<EMAIL>")
    val t2 = regexp_replace(t1, Ipv4Re, "<IP>")
    val t3 = regexp_replace(t2, PhoneRe, "<PHONE>")
    df.withColumn("n_email", count(t0, EmailRe))
      .withColumn("n_ip", count(t1, Ipv4Re))
      .withColumn("n_phone", count(t2, PhoneRe))
      .withColumn("redacted", t3)
  }
}
