package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted inverted index — the lexical sibling of [[Ivf.save]]'s
  * vector lifecycle: tokenize once, store posting lists forever, serve
  * BM25 queries from a partition-pruned read instead of re-scanning the
  * corpus text per query. [[Bm25.topK]] stays the from-scratch oracle
  * path; this is what a 100 TB deployment actually queries.
  *
  * On-disk layout under `path`:
  *  - `postings/` — (term, id, tf), PARTITIONED BY `tb` = pmod(hash(term),
  *    buckets): a query touches only its terms' hash buckets (directory
  *    pruning) and pushes `term IN (...)` into the parquet scan;
  *  - `doclens/` — (id, dl), one row per document with >= 1 token;
  *  - `stats/` — one row (n, sumdl, buckets): corpus size, total token
  *    count, and the bucket fan-out the reader must re-derive keys with.
  *
  * Query cost: |terms| bucket directories scanned with the term filter
  * pushed down, a |matched docs|-sized join against doclens for lengths
  * (broadcast from the postings side — query-term postings are tiny
  * next to the corpus), dfs collected bounded by |terms|, one top-k
  * heap. Nothing corpus-sized moves.
  *
  * Scoring reproduces [[Bm25.topK]]'s arithmetic exactly: per-doc tf
  * columns in the fixed query-term order (so the float sum association
  * matches the one-pass form, not an unordered posting-sum), the same
  * expression shape for idf and the saturation term.
  */
object InvertedIndex {

  private def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .filter(col("term") =!= "")

  /** Build and persist the index. Returns the number of postings.
    *
    * Job shape (guide §1.4/§5 — don't re-scan what a write already
    * computed): the postings count and the stats aggregates ride the
    * two writes as `observe()` metrics (CollectMetricsExec — no extra
    * pass, no exchange), so save runs exactly TWO distributed jobs
    * (postings write, doclens write) plus the one-row local stats
    * write. The previous shape re-read the postings for doclens' stats
    * and again for the return count — four scans of the just-written
    * index per build.
    */
  def save(docs: DataFrame, idCol: String, textCol: String, path: String,
           buckets: Int = 64): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = docs.sparkSession
    val toks = tokens(docs, idCol, textCol)
    val nPost = org.apache.spark.sql.Observation()
    val postings = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(buckets)))
      .observe(nPost, count(lit(1)).as("n"))
      // cluster by the bucket column before the partitioned write
      // (guide §6 small files): un-clustered, every aggregate task
      // emits one file into every tb= directory (tasks x buckets tiny
      // segments); clustered, a bucket lands as ONE file per build —
      // searches and compactions open `buckets` files, not hundreds.
      // Accretion ACROSS appends (the compaction gate's subject) is
      // untouched: each append still adds its own segment per bucket.
      .repartition(col("tb"))
    postings.write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    val dlStats = org.apache.spark.sql.Observation()
    val doclens = spark.read.parquet(s"$path/postings")
      .groupBy(col("id")).agg(sum(col("tf")).as("dl"))
      .observe(dlStats, count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    doclens.write.mode("overwrite").parquet(s"$path/doclens")
    import spark.implicits._
    // sumdl is null for an empty corpus, exactly as the replaced
    // re-read's sum() aggregate produced — Option keeps the parquet
    // schema/content bit-identical
    Seq((dlStats.get("n").asInstanceOf[Long],
        Option(dlStats.get("sumdl")).map(_.asInstanceOf[Long]), buckets))
      .toDF("n", "sumdl", "buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
    nPost.get("n").asInstanceOf[Long]
  }

  /** Append new documents to a saved index without rebuilding: their
    * postings land in the existing hash-bucket directories, doclens
    * append, and the one-row stats sidecar is rewritten with the summed
    * corpus size/token count (stats are the only rewrite — two longs).
    * Ids must be new; postings for an id already present would
    * double-count (same contract as [[Ivf.appendSaved]]'s fresh rows).
    * The steps are not atomic as a group (the stats overwrite is last;
    * a crash between appends and the stats rewrite leaves served idf/
    * avgdl computed from the pre-append stats — re-run the append's
    * stats fold to repair): run on a quiesced index, the
    * [[Ivf.rebalanceSaved]] maintenance posture. Returns the number of
    * postings appended.
    */
  def appendSaved(docs: DataFrame, idCol: String, textCol: String,
                  path: String): Long = {
    val spark = docs.sparkSession
    val statsRow = spark.read.parquet(s"$path/stats").head()
    val buckets = statsRow.getAs[Int]("buckets")
    val toks = tokens(docs, idCol, textCol)
    // append-delta counts ride the two writes as observe() metrics (the
    // save() job-shape note): two distributed jobs per append, no
    // re-aggregation pass and no trailing count() over the cache
    val nPost = org.apache.spark.sql.Observation()
    val postings = toks.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(hash(col("term")), lit(buckets)))
      .persist()
    try {
      postings.observe(nPost, count(lit(1)).as("n"))
        // one segment per bucket per append (the save() clustering
        // note) — the LSM accretion the compaction gate exercises is
        // across appends, not within one
        .repartition(col("tb"))
        .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
      val dlStats = org.apache.spark.sql.Observation()
      postings.groupBy(col("id")).agg(sum(col("tf")).as("dl"))
        .observe(dlStats, count(lit(1)).as("n"), sum(col("dl")).as("s"))
        .write.mode("append").parquet(s"$path/doclens")
      val n = statsRow.getAs[Long]("n") + dlStats.get("n").asInstanceOf[Long]
      val sumdl = statsRow.getAs[Long]("sumdl") +
        Option(dlStats.get("s")).map(_.asInstanceOf[Long]).getOrElse(0L)
      import spark.implicits._
      Seq((n, sumdl, buckets)).toDF("n", "sumdl", "buckets")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
      nPost.get("n").asInstanceOf[Long]
    } finally postings.unpersist()
  }

  /** BM25 top-k from the saved index — same formula, same association,
    * same tie-break as [[Bm25.topK]] on the original corpus.
    */
  def searchSaved(spark: SparkSession, path: String, terms: Seq[String], k: Int,
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val qTerms = terms.map(_.toLowerCase).distinct
    val statsRow = spark.read.parquet(s"$path/stats").head()
    val n = statsRow.getAs[Long]("n")
    val sumdl = statsRow.getAs[Long]("sumdl")
    val buckets = statsRow.getAs[Int]("buckets")
    // avgdl exactly as Average(long) computes it: sum.toDouble / count
    val avgdl = sumdl.toDouble / n
    // bucket keys via the engine's own hash (a |terms|-row local job —
    // never re-implement Murmur3 driver-side)
    import spark.implicits._
    val tbs = qTerms.toDF("term")
      .select(pmod(hash(col("term")), lit(buckets)).as("tb"))
      .collect().map(_.getInt(0)).distinct
    val posts = spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(tbs.map(Integer.valueOf): _*) &&
        col("term").isin(qTerms: _*))
    // dfs: bounded by |terms|
    val dfs = posts.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // per-doc tf columns in fixed query order -> the same float-sum
    // association as Bm25.topK's one-pass form
    val tfCols = qTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("tf")).otherwise(0L)).as(s"__tf_$i")
    }
    val perDoc = posts.groupBy(col("id")).agg(tfCols.head, tfCols.tail: _*)
    // perDoc has one row per document matching ANY query term; a common
    // term makes that corpus-sized, so only hint broadcast when the
    // df-sum (an exact upper bound on matched docs) is provably small —
    // otherwise leave the join strategy to Catalyst/AQE.
    val matchedDocsBound = dfs.values.sum
    val perDocHinted =
      if (matchedDocsBound <= 100000L) broadcast(perDoc) else perDoc
    val withDl = perDocHinted
      .join(spark.read.parquet(s"$path/doclens"), Seq("id"))
    val termScore: Int => org.apache.spark.sql.Column = { i =>
      val tf = col(s"__tf_$i").cast("double")
      val dft = dfs.getOrElse(qTerms(i), 0L).toDouble
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - lit(dft) + lit(0.5)) / (lit(dft) + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / lit(avgdl)))
    }
    withDl
      .withColumn("score", qTerms.indices.map(termScore).reduce(_ + _))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Physical per-bucket stats of the postings tier: parquet file count
    * and bytes per `tb=` directory. Every [[appendSaved]] lands up to
    * one file per writing task per bucket, so a streamed/batched ingest
    * accretes small files until scan cost is dominated by per-file open
    * overhead — the LSM small-segment problem, measured here so a
    * policy can act on it.
    */
  def segmentStats(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(s"$path/postings")
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val bucketRe = "tb=(\\d+)".r
    val rows = fs.listStatus(root).toSeq
      .flatMap(st => st.getPath.getName match {
        case bucketRe(b) =>
          val files = fs.listStatus(st.getPath)
            .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          Some((b.toInt, files.length.toLong, files.map(_.getLen).sum))
        case _ => None
      })
    rows.toDF("tb", "n_files", "bytes")
  }

  /** Compaction DECISION: flag buckets whose postings hold more than
    * `maxFiles` segments. Pure policy over [[segmentStats]] — the IVF
    * maintenanceDecision posture for the lexical tier.
    */
  def compactionPlan(spark: SparkSession, path: String, maxFiles: Int): DataFrame = {
    require(maxFiles >= 1, s"maxFiles must be >= 1, got $maxFiles")
    segmentStats(spark, path)
      .withColumn("compact", col("n_files") > maxFiles)
  }

  /** Rewrite the flagged buckets' postings as ONE file each. Logical
    * content (and therefore every search result) is unchanged — only the
    * segment layout collapses; doclens/stats are untouched.
    *
    * Write protocol (the rebalanceSaved posture, parallel across
    * buckets): ALL flagged buckets' merged postings land under
    * `postings_compact/tb=N` in ONE distributed job first — the scan is
    * partition-pruned to the flagged directories and repartitioned by
    * tb, so every bucket becomes exactly one file and hundreds of
    * flagged buckets rewrite concurrently across the cluster instead of
    * one driver-sequenced job each — then each old directory is deleted
    * and its scratch renamed onto it (cheap metadata ops; rows are never
    * memory-only). Not atomic as a group: run quiesced. A leftover
    * `postings_compact` dir means a previous run crashed between the
    * delete and the rename — this run REFUSES to start; recover by
    * renaming the scratch tb= dirs onto their `postings/tb=N` targets
    * (or deleting them if the targets still exist — then they are
    * redundant copies). Returns the number of buckets compacted.
    */
  def compactSaved(spark: SparkSession, path: String, maxFiles: Int): Int = {
    val flagged = compactionPlan(spark, path, maxFiles)
      .filter(col("compact")).select(col("tb"))
      .collect().map(_.getInt(0)).sorted
    if (flagged.isEmpty) return 0
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val scratchRoot = new org.apache.hadoop.fs.Path(s"$path/postings_compact")
    require(!fs.exists(scratchRoot),
      s"compact: $scratchRoot exists — leftovers of a crashed compaction. " +
        "Rename its tb= dirs onto postings/ (or delete them if the " +
        "postings/tb= targets still exist) before re-running.")
    // phase 1, one job: each bucket's rows hash to one task (repartition
    // on tb), so partitionBy emits exactly one file per bucket
    spark.read.parquet(s"$path/postings")
      .filter(col("tb").isin(flagged.map(Integer.valueOf).toSeq: _*))
      .select(col("tb"), col("id"), col("term"), col("tf"))
      .repartition(flagged.length, col("tb"))
      .write.mode("errorifexists").partitionBy("tb").parquet(scratchRoot.toString)
    // phase 2, metadata sweep: swap each compacted directory into place
    flagged.foreach { b =>
      val scratch = new org.apache.hadoop.fs.Path(s"$path/postings_compact/tb=$b")
      if (!fs.exists(scratch))
        throw new java.io.IOException(s"compact: expected scratch $scratch missing")
      val target = new org.apache.hadoop.fs.Path(s"$path/postings/tb=$b")
      if (!fs.delete(target, true))
        throw new java.io.IOException(s"compact: failed deleting $target")
      if (!fs.rename(scratch, target))
        throw new java.io.IOException(s"compact: failed renaming $scratch onto $target")
    }
    fs.delete(scratchRoot, true)
    flagged.length
  }
}
