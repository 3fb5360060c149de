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

    // A/B mode: runMain graft.Profile <sfDir> d2forms — the d2 pair
    // stage as posting SELF-JOIN vs sorted POSTING ARRAYS, interleaved
    // in ONE session so a host-epoch drift cannot masquerade as a form
    // difference (the r19 serial BenchOne windows disagreed by 2x).
    if (args.length >= 2 && args(1) == "d2forms") {
      val docs = Tables.documents(spark, sfDir)
      val ex = Tables.spread(docs)
        .select(col("doc_id").as("id"),
          explode(graft.functions.TextFunctions.shingle_set(col("text"), 3)).as("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfs = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      val kept = dfs.filter(col("df") <= 100)
      val kx = ex.join(kept.select(col("s")), "s").select(col("id"), col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      kx.write.format("noop").mode("overwrite").save() // materialize both caches
      def joinForm = kx.toDF("id1", "s").join(kx.toDF("id2", "s"), Seq("s"))
        .filter(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("common"))
      def arrayForm = kx.groupBy(col("s"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"), explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("common"))
      (1 to 4).foreach { pass =>
        time(s"pass $pass JOIN form noop")(
          joinForm.write.format("noop").mode("overwrite").save())
        time(s"pass $pass ARRAY form noop")(
          arrayForm.write.format("noop").mode("overwrite").save())
      }
      kx.unpersist(); ex.unpersist()
      spark.stop()
      return
    }

    // A/B mode: runMain graft.Profile <sfDir> d10forms — the FULL d10
    // pipeline (fresh explode + df-blocking, nothing pre-cached) with the
    // pair stage as self-join vs posting arrays, interleaved in one
    // session. Unlike d2forms (cached input), this times the realistic
    // end-to-end shape the bench sees.
    if (args.length >= 2 && args(1) == "d10forms") {
      val docs = Tables.documents(spark, sfDir)
      def keptEx = {
        val ex = Tables.spread(docs).select(col("doc_id").as("id"),
          explode(graft.functions.TextFunctions.shingle_set(col("text"), 8)).as("win"))
        val dfs = ex.groupBy(col("win")).agg(count(lit(1)).as("df"))
        ex.join(dfs.filter(col("df") <= 100).select(col("win")), "win")
          .select(col("id"), col("win"))
      }
      def joinForm = {
        val kx = keptEx
        kx.toDF("id1", "win").join(kx.toDF("id2", "win"), Seq("win"))
          .filter(col("id1") < col("id2"))
          .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
          .orderBy(col("id1"), col("id2"))
      }
      def arrayForm = keptEx.groupBy(col("win"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"), explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("id1"), col("id2"))
      (1 to 4).foreach { pass =>
        time(s"pass $pass FULL JOIN form noop")(
          joinForm.write.format("noop").mode("overwrite").save())
        time(s"pass $pass FULL ARRAY form noop")(
          arrayForm.write.format("noop").mode("overwrite").save())
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
