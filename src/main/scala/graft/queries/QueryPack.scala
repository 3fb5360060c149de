package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named set of oracle-checked queries.
  *
  * Conventions (driver contract, see /root/repo prompt + Verify.scala):
  *  - `defs(name)(spark, sfDir)` builds the DataFrame for a scale-factor dir;
  *  - `sql(name)` is the equivalent DuckDB SQL over the same parquet tables
  *    (omitted for ops not expressible in SQL -> weaker rows-only check);
  *  - every query ends with a total ORDER BY (all key columns) so row order
  *    is deterministic on both sides;
  *  - floating aggregates go through DECIMAL(18,2) so sums are exact and
  *    order-insensitive, then CAST to DOUBLE identically on both sides;
  *  - column names are aliased identically in Spark and SQL.
  */
trait QueryPack {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def sql: Map[String, String]
}
