package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: print a gate's formatted physical plan (test scope). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.SpatialFilterPushdown)
    val df = (SparkEntry.queries ++ SparkEntry.benchOnly)(args(1))(spark, args(0))
    df.explain("formatted")
    spark.stop()
  }
}
