package graft

import org.apache.spark.sql.SparkSession

/** Spot-timing main for scale evidence runs (the sf10/g100x sections of
  * CORRECTNESS_SF1.md / BASELINE.md): times each named gate against an
  * arbitrary sf directory with the Bench methodology's essentials (noop
  * sink so the full plan executes, one warmup query, tmpfs shuffle) but
  * none of its stall bracketing — these are one-off asymptotics
  * measurements, not standing minima.
  *
  * Usage: `sbt "runMain graft.TimeQueries <sfDir> <query> [query ...]"`
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQueries <sfDir> <query> [query ...]")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.SpatialFilterPushdown)
    val queryMap = SparkEntry.queries ++ SparkEntry.benchOnly
    // warmup: JVM/codegen spin-up is not charged to the first measurement
    SparkEntry.queries("q9_distinct_counts")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      try {
        queryMap(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[time] $n: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      } catch {
        case e: Throwable => println(s"[time] $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
