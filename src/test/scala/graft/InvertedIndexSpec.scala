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
