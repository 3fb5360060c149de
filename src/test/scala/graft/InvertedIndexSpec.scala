package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Bm25, InvertedIndex}

class InvertedIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import SparkTestSession.sfDir

  private def idxPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-invidx").toString + "/idx"
    InvertedIndex.save(Tables.documents(spark, sfDir), "doc_id", "text", p, buckets = 8)
    p
  }

  test("saved-index search equals the from-scratch BM25 pass, scores included") {
    val path = idxPath
    val queries = Seq(
      Seq("spark", "join", "fast", "window"),
      Seq("the"),
      Seq("nosuchterm"),
      Seq("value", "nosuchterm", "table"))
    queries.foreach { terms =>
      val fresh = Bm25.topK(Tables.documents(spark, sfDir), "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val served = InvertedIndex.searchSaved(spark, path, terms, k = 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(served === fresh, s"terms $terms")
    }
  }

  test("postings read is bucket-pruned: only the query terms' hash directories scan") {
    val path = idxPath
    // the partition filter on tb must reach the scan (directory pruning)
    val plan = InvertedIndex.searchSaved(spark, path, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("tb"),
      s"no tb partition filter in plan:\n$plan")
    // one term prunes to exactly one of the 8 bucket directories on disk
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"$path/postings")
    val dirs = p.getFileSystem(hconf).listStatus(p)
      .filter(_.getPath.getName.startsWith("tb=")).map(_.getPath.getName).toSet
    assert(dirs.size > 1, s"need multiple bucket dirs to prove pruning, got $dirs")
    import spark.implicits._
    val qb = Seq("spark").toDF("term")
      .select(pmod(hash(col("term")), lit(8)).as("tb")).head().getInt(0)
    assert(dirs.contains(s"tb=$qb"))
    assert(plan.contains(s"tb=$qb") || plan.contains(qb.toString),
      "plan should name the single probed bucket")
  }

  test("appendSaved: incremental index equals a rebuild over the union, stats fold exactly") {
    val docs = Tables.documents(spark, sfDir)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val extra = docs.filter(col("doc_id") % 5 === 0)
    val incPath = java.nio.file.Files.createTempDirectory("graft-invinc").toString + "/idx"
    InvertedIndex.save(base, "doc_id", "text", incPath, buckets = 8)
    val appended = InvertedIndex.appendSaved(extra, "doc_id", "text", incPath)
    assert(appended > 0L)
    val fullPath = java.nio.file.Files.createTempDirectory("graft-invfull").toString + "/idx"
    InvertedIndex.save(docs, "doc_id", "text", fullPath, buckets = 8)
    // identical stats
    val si = spark.read.parquet(s"$incPath/stats").head()
    val sf = spark.read.parquet(s"$fullPath/stats").head()
    assert(si.getAs[Long]("n") === sf.getAs[Long]("n"))
    assert(si.getAs[Long]("sumdl") === sf.getAs[Long]("sumdl"))
    // identical served results, scores included
    val terms = Seq("spark", "join", "fast", "window")
    val a = InvertedIndex.searchSaved(spark, incPath, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val b = InvertedIndex.searchSaved(spark, fullPath, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(a === b)
  }

  test("compaction: plan flags multi-segment buckets, rewrite collapses them, results identical") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft-compact-idx").toString + "/idx"
    InvertedIndex.save(docs.filter(pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", "text", path, buckets = 8)
    InvertedIndex.appendSaved(docs.filter(pmod(col("doc_id"), lit(3)) === 1),
      "doc_id", "text", path)
    InvertedIndex.appendSaved(docs.filter(pmod(col("doc_id"), lit(3)) === 2),
      "doc_id", "text", path)
    val before = InvertedIndex.segmentStats(spark, path)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(before.values.exists(_ > 1L), "appends should leave multi-segment buckets")
    val plan = InvertedIndex.compactionPlan(spark, path, maxFiles = 1)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getBoolean(3))).toMap
    plan.foreach { case (tb, (nf, c)) =>
      assert(c === (nf > 1L), s"bucket $tb: $nf files flagged $c")
    }
    val terms = Seq("spark", "join", "fast", "window")
    val preSearch = InvertedIndex.searchSaved(spark, path, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val preDoclens = spark.read.parquet(s"$path/doclens").count()
    val n = InvertedIndex.compactSaved(spark, path, maxFiles = 1)
    assert(n === plan.count(_._2._2))
    // the rewrite is ONE distributed job over ALL flagged buckets (not a
    // driver-sequenced loop) — pin that the single call really covered
    // several buckets, so the parallel path is what this test exercises
    assert(n >= 2, s"fixture should flag several buckets in one run, got $n")
    val after = InvertedIndex.segmentStats(spark, path)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after.keySet === before.keySet)
    assert(after.values.forall(_ === 1L), s"segments left uncompacted: $after")
    // physical only: scores bit-identical, doclens untouched
    val postSearch = InvertedIndex.searchSaved(spark, path, terms, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(postSearch === preSearch)
    assert(spark.read.parquet(s"$path/doclens").count() === preDoclens)
    // quiesced-run gate: a leftover scratch dir refuses the next run.
    // Re-append fresh ids so buckets are multi-segment again (the run
    // must get past the nothing-flagged early return to hit the gate).
    InvertedIndex.appendSaved(
      docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")).limit(50),
      "doc_id", "text", path)
    assert(InvertedIndex.compactionPlan(spark, path, maxFiles = 1)
      .filter(col("compact")).count() > 0L, "fixture: re-append left nothing flagged")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$path/postings_compact/tb=0"))
    val ex = intercept[IllegalArgumentException] {
      InvertedIndex.compactSaved(spark, path, maxFiles = 1)
    }
    assert(ex.getMessage.contains("postings_compact"))
  }

  test("stats sidecar carries the bucket fan-out; empty query refuses") {
    val path = idxPath
    val stats = spark.read.parquet(s"$path/stats").head()
    assert(stats.getAs[Int]("buckets") === 8)
    assert(stats.getAs[Long]("n") ===
      Tables.documents(spark, sfDir).filter(length(trim(col("text"))) > 0).count())
    intercept[IllegalArgumentException] {
      InvertedIndex.searchSaved(spark, path, Seq.empty, k = 5)
    }
  }
}
