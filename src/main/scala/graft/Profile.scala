package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ad-hoc micro-profiler for plan-shape investigations (not part of the
  * driver contract). Usage: runMain graft.Profile [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations ++= Seq(graft.plans.SpatialFilterPushdown)

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    // repeat mode: runMain graft.Profile <sfDir> repeat <query> <times>
    if (args.length >= 4 && args(1) == "repeat") {
      val name = args(2)
      val times = args(3).toInt
      (1 to times).foreach { i =>
        time(s"$name run $i")(SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop()
      return
    }

    // plan mode: runMain graft.Profile <sfDir> g5plan — the LAZY
    // common-neighbor scoring plan (g5's commonNeighbors realizes its
    // k rows eagerly, so Explain shows only the checkpoint scan)
    if (args.length >= 2 && args(1) == "g5plan") {
      val lo = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lo.groupBy(col("o"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
        .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
        .distinct()
      graft.operators.LinkPredict.commonNeighborsPlan(edges, "p1", "p2", k = 20)
        .explain("formatted")
      spark.stop()
      return
    }

    // stage mode: runMain graft.Profile <sfDir> g5stages — break g5 into
    // edge build / adjacency / wedge generation / pair aggregation / full
    if (args.length >= 2 && args(1) == "g5stages") {
      (1 to 2).foreach { pass =>
        val lo = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = lo.groupBy(col("o"))
          .agg(sort_array(collect_list(col("p"))).as("ps"))
          .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
          .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
          .distinct()
        time(s"pass $pass edges noop")(
          edges.write.format("noop").mode("overwrite").save())
        val adj = edges.select(col("p1").as("c"), col("p2").as("n"))
          .unionAll(edges.select(col("p2").as("c"), col("p1").as("n")))
        time(s"pass $pass adj noop")(
          adj.write.format("noop").mode("overwrite").save())
        val wedges = adj.groupBy(col("c"))
          .agg(sort_array(collect_list(col("n"))).as("ns"))
          .select(col("ns"), posexplode(col("ns")).as(Seq("i", "u")))
          .select(col("u"), explode(expr("slice(ns, i + 2, size(ns))")).as("v"))
        time(s"pass $pass wedge generate noop")(
          wedges.write.format("noop").mode("overwrite").save())
        val packed = wedges
          .select((shiftleft(col("u").cast("long"), 32) + col("v")).as("pk"))
        time(s"pass $pass wedge count + approx distinct")({
          val r = packed.agg(count(lit(1)), approx_count_distinct(col("pk"))).head()
          println(s"  wedges: ${r.getLong(0)}, ~distinct pairs: ${r.getLong(1)}")
        })
        time(s"pass $pass packed pair agg noop")(
          packed.groupBy(col("pk")).agg(count(lit(1)).as("cn"))
            .write.format("noop").mode("overwrite").save())
        time(s"pass $pass repart(128)-first agg noop")(
          packed.repartition(128, col("pk"))
            .groupBy(col("pk")).agg(count(lit(1)).as("cn"))
            .write.format("noop").mode("overwrite").save())
        time(s"pass $pass repart(32)-first agg noop")(
          packed.repartition(32, col("pk"))
            .groupBy(col("pk")).agg(count(lit(1)).as("cn"))
            .write.format("noop").mode("overwrite").save())
        time(s"pass $pass full g5")(SparkEntry.queries("g5_link_prediction")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop()
      return
    }

    // stage mode: runMain graft.Profile <sfDir> v8stages — break v8 into
    // vectorization / banding / candidates / full pipeline
    if (args.length >= 2 && args(1) == "v8stages") {
      import graft.functions.GraftFunctions._
      (1 to 2).foreach { pass =>
        val dv = graft.queries.Vectors.docVectors(spark, sfDir)
        time(s"pass $pass docVectors materialize")(dv.count())
        time(s"pass $pass banding only")(
          dv.select(col("doc_id"),
            hyperplane_bands(col("vec"), 64, 12, 42L).as("bb"))
            .write.format("noop").mode("overwrite").save())
        val cand = graft.operators.Knn.lshCandidatePairs(dv, "doc_id", "vec",
          bands = 64, rowsPerBand = 12, seed = 42L)
        time(s"pass $pass candidates")(println(s"  candidates: ${cand.count()}"))
        time(s"pass $pass full v8")(SparkEntry.queries("v8_lsh_near_dup")(spark, sfDir)
          .write.format("noop").mode("overwrite").save())
      }
      spark.stop()
      return
    }

    val e = Tables.embeddings(spark, sfDir)
    time("embeddings count")(e.count())
    time("embeddings noop")(e.write.format("noop").mode("overwrite").save())
    val exploded = e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
    time("posexplode count")(exploded.count())
    val agg = exploded.groupBy(col("label"), col("pos"))
      .agg((sum(col("v").cast("double").cast(DecimalType(18, 9))).cast("double") /
        count(lit(1))).as("centroid"))
    time("centroid agg noop")(agg.write.format("noop").mode("overwrite").save())
    time("centroid agg + sort noop")(agg.orderBy(col("label"), col("pos"))
      .write.format("noop").mode("overwrite").save())
    time("v5 via SparkEntry")(SparkEntry.queries("v5_label_centroids")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    time("v1 via SparkEntry")(SparkEntry.queries("v1_knn_top10")(spark, sfDir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
