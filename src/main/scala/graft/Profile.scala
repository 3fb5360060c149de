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
      // both timed forms read only kx — release the exploded table now so
      // its storage-pool pressure doesn't shadow the timing (r19 advice)
      ex.unpersist()
      def joinForm = kx.toDF("id1", "s").join(kx.toDF("id2", "s"), Seq("s"))
        .filter(col("id1") < col("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("common"))
      def arrayForm = kx.groupBy(col("s"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"), explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("common"))
      // alternate which form runs first per pass so within-pass warm-up
      // (file cache, codegen, JIT) is shared evenly (r19 advice: the
      // fixed JOIN-first order systematically favored the ARRAY form)
      (1 to 4).foreach { pass =>
        val forms = Seq(
          ("JOIN", () => joinForm.write.format("noop").mode("overwrite").save()),
          ("ARRAY", () => arrayForm.write.format("noop").mode("overwrite").save()))
        val ordered = if (pass % 2 == 0) forms.reverse else forms
        ordered.foreach { case (l, f) => time(s"pass $pass $l form noop")(f()) }
      }
      kx.unpersist()
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
      // alternate form order per pass — see d2forms
      (1 to 4).foreach { pass =>
        val forms = Seq(
          ("FULL JOIN", () => joinForm.write.format("noop").mode("overwrite").save()),
          ("FULL ARRAY", () => arrayForm.write.format("noop").mode("overwrite").save()))
        val ordered = if (pass % 2 == 0) forms.reverse else forms
        ordered.foreach { case (l, f) => time(s"pass $pass $l form noop")(f()) }
      }
      spark.stop()
      return
    }

    // A/B mode: runMain graft.Profile <sfDir> g2bforms — g2b's bucketed
    // triangle pipeline with the oriented-edge write CLUSTERED
    // (repartition(buckets, u) before bucketBy — each task one bucket)
    // vs UNCLUSTERED (the r19 shape: at sf0.1 ONE AQE-coalesced task
    // wrote all 32 buckets serially). Interleaved, order alternating.
    // g2 (declarative) rides along as the crossover reference.
    if (args.length >= 2 && args(1) == "g2bforms") {
      def run(clusterFirst: Boolean, tag: String): Unit = {
        val lo = Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = lo.groupBy(col("o"))
          .agg(sort_array(collect_list(col("p"))).as("ps"))
          .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
          .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
        graft.operators.Triangles.perNodeBucketed(edges, "p1", "p2",
            table = s"graft_tri_ab_$tag", path = s"/dev/shm/graft_tri_ab_$tag",
            clusterFirst = clusterFirst)
          .orderBy(col("n_tri").desc, col("node").asc).limit(15)
          .write.format("noop").mode("overwrite").save()
      }
      (1 to 4).foreach { pass =>
        val forms = Seq(
          ("g2b CLUSTERED", () => run(clusterFirst = true, "c")),
          ("g2b UNCLUSTERED", () => run(clusterFirst = false, "u")),
          ("g2 declarative", () => SparkEntry.queries("g2_triangles")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()))
        val ordered = if (pass % 2 == 0) forms.reverse else forms
        ordered.foreach { case (l, f) => time(s"pass $pass $l noop")(f()) }
      }
      spark.stop()
      return
    }

    // A/B mode: runMain graft.Profile <sfDir> aggparts — the g5 packed
    // pair aggregate at different repartition counts, interleaved: the
    // volume-scaled 99 (148M/1.5M) is 3.1 waves on 32 cores (a 3-task
    // straggler tail holds the stage, guide §2.6); 128 is 4 full waves.
    if (args.length >= 2 && args(1) == "aggparts") {
      import org.apache.spark.storage.StorageLevel
      val lo = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lo.groupBy(col("o"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
        .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
        .distinct()
      val adj = edges.select(col("p1").as("c"), col("p2").as("n"))
        .unionAll(edges.select(col("p2").as("c"), col("p1").as("n")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      adj.write.format("noop").mode("overwrite").save()
      def packed = adj.groupBy(col("c"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "u")))
        .select(col("u"), explode(expr("slice(ns, i + 2, size(ns))")).as("v"))
        .select((shiftleft(col("u").cast("long"), 32) + col("v")).as("pk"))
      def agg(parts: Int) = packed.repartition(parts, col("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("cn"))
      (1 to 3).foreach { pass =>
        val counts = Seq(160, 224, 320, 448)
        val ordered = if (pass % 2 == 0) counts.reverse else counts
        ordered.foreach { p =>
          time(s"pass $pass agg parts=$p noop")(
            agg(p).write.format("noop").mode("overwrite").save())
        }
      }
      adj.unpersist()
      spark.stop()
      return
    }

    // A/B mode: runMain graft.Profile <sfDir> g5forms — g5's scoring
    // TAIL over identical cached inputs: the r19 shape (degree-join all
    // ~0.7x-of-wedges distinct pairs, then TakeOrdered k) vs the r20
    // shape (TakeOrdered k FIRST, then degree-join k rows). Interleaved
    // in one session, order alternating per pass (d2forms discipline).
    if (args.length >= 2 && args(1) == "g5forms") {
      import org.apache.spark.storage.StorageLevel
      val lo = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = lo.groupBy(col("o"))
        .agg(sort_array(collect_list(col("p"))).as("ps"))
        .select(col("ps"), posexplode(col("ps")).as(Seq("i", "p1")))
        .select(col("p1"), explode(expr("slice(ps, i + 2, size(ps))")).as("p2"))
        .distinct()
      val e = edges.select(col("p1").as("a"), col("p2").as("b"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val adj = e.select(col("a").as("c"), col("b").as("n"))
        .unionAll(e.select(col("b").as("c"), col("a").as("n")))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      deg.write.format("noop").mode("overwrite").save() // materialize caches
      val est = deg.agg(sum(col("d") * (col("d") - lit(1L)))).head()
      val wedgeVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
      val parts = math.max(spark.sparkContext.defaultParallelism,
        math.min(4096L, wedgeVolume / 1500000L + 1L).toInt)
      println(s"[profile] g5 wedges ~$wedgeVolume, aggParts $parts")
      def pk(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        shiftleft(u.cast("long"), 32) + v.cast("long")
      def wedges = adj.groupBy(col("c"))
        .agg(sort_array(collect_list(col("n"))).as("ns"))
        .select(col("ns"), posexplode(col("ns")).as(Seq("i", "u")))
        .select(col("u"), explode(expr("slice(ns, i + 2, size(ns))")).as("v"))
      def cn = wedges
        .select(pk(col("u"), col("v")).as("pkc"))
        .repartition(parts, col("pkc"))
        .groupBy(col("pkc")).agg(count(lit(1)).as("cn"))
        .join(e.select(pk(col("a"), col("b")).as("pkc")), Seq("pkc"), "left_anti")
        .select(shiftrightunsigned(col("pkc"), 32).cast("int").as("u"),
          col("pkc").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("v"),
          col("cn"))
      def tail(c: org.apache.spark.sql.DataFrame) = c
        .join(deg.select(col("c").as("u"), col("d").as("deg_a")), "u")
        .join(deg.select(col("c").as("v"), col("d").as("deg_b")), "v")
        .select(col("u").as("a"), col("v").as("b"), col("cn"),
          col("deg_a"), col("deg_b"),
          expr("cast((cn * 1000000) div (deg_a + deg_b - cn) as bigint)")
            .as("jac_ppm"))
        .orderBy(col("cn").desc, col("a").asc, col("b").asc).limit(20)
      def joinFirst = tail(cn)
      def topkFirst = tail(cn.orderBy(col("cn").desc, col("u").asc,
        col("v").asc).limit(20))
      (1 to 4).foreach { pass =>
        val forms = Seq(
          ("JOIN-FIRST", () => joinFirst.write.format("noop").mode("overwrite").save()),
          ("TOPK-FIRST", () => topkFirst.write.format("noop").mode("overwrite").save()))
        val ordered = if (pass % 2 == 0) forms.reverse else forms
        ordered.foreach { case (l, f) => time(s"pass $pass $l noop")(f()) }
      }
      e.unpersist(); adj.unpersist(); deg.unpersist()
      spark.stop()
      return
    }

    // probe mode: runMain graft.Profile <sfDir> g1loop — replicate ONE
    // PageRank iteration's dataframes (g1's bipartite graph) and print
    // the EXECUTED plans of the in-loop joins, to establish whether AQE
    // already broadcasts the node-sized ranks/contrib sides (VERDICT r19
    // item 7) before touching the operator.
    if (args.length >= 2 && args(1) == "g1loop") {
      import org.apache.spark.storage.StorageLevel
      val edges = Tables.orders(spark, sfDir)
        .join(Tables.lineitem(spark, sfDir), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + lit(1000000000L)).as("dst"))
      val e = edges.select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"))
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      val deg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("out"))
      val od = nodes.join(deg, Seq("node"), "left")
        .na.fill(0L, Seq("out")).persist(StorageLevel.MEMORY_AND_DISK)
      val n = od.count()
      println(s"[profile] g1 nodes: $n")
      val ew = e.join(od.withColumnRenamed("node", "src"), Seq("src"))
        .repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[profile] g1 ew rows: ${ew.count()}")
      e.unpersist()
      val perNode = 1000000000000L / n
      val ranks = od.select(col("node"), col("out"), lit(perNode).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      ranks.count()
      val contrib = ew
        .join(ranks.select(col("node").as("src"), col("r")), Seq("src"))
        .select(col("dst").as("node"),
          call_function("div", col("r"), col("out")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      time("contrib noop")(contrib.write.format("noop").mode("overwrite").save())
      println("=== contrib EXECUTED plan (post-AQE) ===")
      println(contrib.queryExecution.executedPlan.toString.take(4000))
      val next = od.join(contrib, Seq("node"), "left")
        .select(col("node"), col("out"),
          (lit(perNode * 15L / 100L) + call_function("div",
            coalesce(col("contrib"), lit(0L)) * lit(85L), lit(100L))).as("r"))
      time("next noop")(next.write.format("noop").mode("overwrite").save())
      println("=== next EXECUTED plan (post-AQE) ===")
      println(next.queryExecution.executedPlan.toString.take(4000))
      spark.stop()
      return
    }

    // A/B mode: runMain graft.Profile <sfDir> recallforms — d21/d22 with
    // the exact pair list's CALLER-level localCheckpoint(true) kept (the
    // r19 form) vs dropped (jaccardNearDupPairs checkpoints INTERNALLY
    // since r19, so the outer one re-materializes a few-hundred-row
    // orderBy — one extra job per query that may be the r19 d21/d22
    // in-suite residual). Interleaved in one session, order alternating
    // per pass (the d2forms discipline).
    if (args.length >= 2 && args(1) == "recallforms") {
      val docs = Tables.documents(spark, sfDir)
      def exactPairs(outerCkpt: Boolean) = {
        val e = graft.operators.Dedup.jaccardNearDupPairs(docs, "doc_id",
          "text", n = 3, minJaccard = 0.5, maxDf = Some(100),
          maxPairEstimate = 500000000L)
        if (outerCkpt) e.localCheckpoint(true) else e
      }
      def d21(outerCkpt: Boolean) = {
        val exact = exactPairs(outerCkpt)
        val coarse = graft.operators.Dedup.minhashLshNearDupPairs(docs,
          "doc_id", "text", n = 3, numHashes = 128, bands = 8,
          minJaccard = 0.5)
        val hit = exact.join(coarse, Seq("id1", "id2"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(coarse.agg(count(lit(1)).as("n_lsh")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact"), col("n_lsh"), col("n_hit"),
            expr("(n_hit * 1000000L) div nullif(n_exact, 0)").as("recall_ppm"))
      }
      def d22(outerCkpt: Boolean) = {
        val exact = exactPairs(outerCkpt)
        val sim0 = graft.operators.Dedup.simhashNearDupPairs(docs, "doc_id",
          "text", n = 3, maxHamming = 3)
        // the sim list stays checkpointed in BOTH forms: hammingPairs has
        // no internal checkpoint, and it feeds two consumers
        val sim = sim0.localCheckpoint(true)
        val hit = exact.join(sim, Seq("id1", "id2"), "left_semi")
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(sim.agg(count(lit(1)).as("n_sim")))
          .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
          .select(col("n_exact"), col("n_sim"), col("n_hit"),
            expr("(n_hit * 1000000L) div nullif(n_exact, 0)").as("recall_ppm"),
            expr("(n_hit * 1000000L) div nullif(n_sim, 0)").as("precision_ppm"))
      }
      (1 to 4).foreach { pass =>
        val forms = Seq(
          ("d21 OUTER-CKPT", () => d21(true).write.format("noop").mode("overwrite").save()),
          ("d21 NO-OUTER", () => d21(false).write.format("noop").mode("overwrite").save()),
          ("d22 OUTER-CKPT", () => d22(true).write.format("noop").mode("overwrite").save()),
          ("d22 NO-OUTER", () => d22(false).write.format("noop").mode("overwrite").save()))
        val ordered = if (pass % 2 == 0) forms.reverse else forms
        ordered.foreach { case (l, f) => time(s"pass $pass $l noop")(f()) }
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
