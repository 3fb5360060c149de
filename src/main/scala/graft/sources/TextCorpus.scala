package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL corpus ingestion — training corpora commonly ship as one JSON
  * document per line (the interchange format of the public web-scrape
  * pipelines), not parquet. The reader takes an EXPLICIT schema so the
  * scan is a single pass (schema inference would add a sampling job over
  * the corpus) and type-stable across shards; lines that fail to parse
  * land in a quarantine split instead of poisoning the load, mirroring
  * `Ingest.quarantineInvalid`'s fail-or-quarantine choice.
  */
object TextCorpus {

  /** The canonical `documents` shape (TESTDATA.md). */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Strict read: malformed lines fail the job (FAILFAST), the right
    * default for curated inputs.
    */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType = documentsSchema): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Permissive read: returns (parsed rows, corrupt raw lines). Spark's
    * PERMISSIVE mode routes unparseable lines to a corrupt-record column;
    * the split keeps the load running while preserving the evidence.
    */
  def readJsonlQuarantine(spark: SparkSession, path: String,
                          schema: StructType = documentsSchema): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val raw = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // Spark requires materializing the parsed view before the corrupt
      // column can be filtered reliably (documented JSON-source caveat)
      .cache()
    val good = raw.filter(col("_corrupt_record").isNull)
      .select(schema.fieldNames.map(col): _*)
    val bad = raw.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("raw_line"))
    (good, bad)
  }
}
