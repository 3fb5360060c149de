package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions.{fingerprint, quality_score}
import graft.operators.{Curate, Packing}

class CurateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  test("curation == hand-composed gate -> window keep-first -> manifest on the corpus") {
    val docs = Tables.documents(spark, sfDir)
    val got = Curate.manifest(docs, "doc_id", "text", "lang",
      langs = Seq("en", "de"), minQuality = 0.5, maxLen = 256L)
      .orderBy(col("grp"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gated = docs.filter(col("lang").isin("en", "de") &&
      quality_score(col("text")) >= 0.5)
    val w = Window.partitionBy(col("__fp")).orderBy(col("doc_id"))
    val kept = gated.withColumn("__fp", fingerprint(col("text")))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__fp", "__rn")
    val want = Packing.manifest(kept, "doc_id", "text", "lang", 256L)
      .orderBy(col("grp"), col("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === want)
    assert(got.nonEmpty)
    // the gate and dedup actually bite on this corpus
    assert(got.length < docs.count())
  }

  test("observed pipeline: funnel counters match independent counts, result unchanged, no extra jobs' worth of passes") {
    val docs = Tables.documents(spark, sfDir)
    val (out, obsIn, obsGate, obsKept) = Curate.manifestObserved(
      docs, "doc_id", "text", "lang",
      langs = Seq("en", "de"), minQuality = 0.5, maxLen = 256L)
    // one action drives the plan AND fills every observation
    val rows = out.orderBy(col("grp"), col("id")).collect()
    val nIn = obsIn.get("n_in").asInstanceOf[Long]
    val nGated = obsGate.get("n_gated").asInstanceOf[Long]
    val nKept = obsKept.get("n_kept").asInstanceOf[Long]
    assert(nIn === docs.count())
    val gatedExpected = docs.filter(col("lang").isin("en", "de") &&
      quality_score(col("text")) >= 0.5).count()
    assert(nGated === gatedExpected)
    val keptExpected = docs.filter(col("lang").isin("en", "de") &&
      quality_score(col("text")) >= 0.5)
      .select(fingerprint(col("text"))).distinct().count()
    assert(nKept === keptExpected)
    assert(nIn >= nGated && nGated >= nKept, "funnel must be monotone")
    // the instrumented plan returns the identical manifest
    val plain = Curate.manifest(docs, "doc_id", "text", "lang",
      langs = Seq("en", "de"), minQuality = 0.5, maxLen = 256L)
      .orderBy(col("grp"), col("id")).collect()
    assert(rows.toSeq === plain.toSeq)
  }

  test("curation drops junk, keeps first duplicate, packs the survivors") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog and friends again"
    val docs = Seq(
      (1L, good, "en"),
      (2L, good + " ", "en"),        // canonical dup of 1 -> dropped
      (3L, "!!! ??? !!! ???", "en"),  // low quality (no alpha, repeats) -> dropped
      (4L, good + " more words", "fr") // lang not allowed -> dropped
    ).toDF("doc_id", "text", "lang")
    val got = Curate.manifest(docs, "doc_id", "text", "lang",
      langs = Seq("en", "de"), minQuality = 0.5, maxLen = 8L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Array(("en", 1L, 12L)))
  }
}
