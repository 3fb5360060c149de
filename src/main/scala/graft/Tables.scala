package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical access to the driver-generated parquet tables
  * (`/root/repo/TESTDATA.md`). One parquet file per table under the
  * scale-factor directory passed to every query.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets schema from
  * the footer and can push filters / prune columns into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    if (name == "events") readEvents(spark, dir) else
      spark.read.parquet(s"$dir/$name.parquet")
  }

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects.
    * Read it as a raw nanos long (legacy conf) and floor-convert to
    * microsecond TimestampType — the same truncation DuckDB applies when
    * it narrows nanos to its native microsecond timestamps, so oracle
    * comparisons agree.
    */
  private def readEvents(spark: SparkSession, dir: String): DataFrame =
    // An explicit LongType schema for the nanos column reads cleanly with
    // no session-global conf mutation (the legacy nanosAsLong conf would
    // leak LongType into every later nanos parquet read in the session).
    spark.read
      .schema("event_id BIGINT, ts BIGINT, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
      .parquet(s"$dir/events.parquet")
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))

  /** Round-robin-spread a scan that is narrower than the cluster: a
    * single small parquet file scans as ONE partition, which serializes
    * any heavy per-row kernel downstream (regex ladders, levenshtein
    * blocks, LSH banding — the round-4 v8 lesson). At real scale the
    * input already arrives in many partitions and this is a no-op —
    * never a shuffle tax. Apply ONLY where per-row kernel work dominates
    * the query; cheap scans don't earn the exchange.
    */
  def spread(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
