package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{minhash_signature, simhash64}
import graft.functions.TextFunctions._

/** Document deduplication operators (BASELINE.json north star: exact,
  * MinHash-LSH, SimHash, n-gram Jaccard). The exact variants are the
  * verified baselines; the sketch variants are the 100 TB scale paths —
  * candidate generation touches only hash buckets, never the full pair
  * space.
  *
  * Scale notes:
  *  - [[jaccardNearDupPairs]] shuffles on shingle value; ubiquitous
  *    shingles create both skew and candidate blow-up, so `maxDf` drops
  *    shingles seen in more than that many docs (standard blocking trick;
  *    a shingle shared by >maxDf docs carries ~no discriminating signal);
  *  - [[minhashLshNearDupPairs]] shuffles (bands x docs) fixed-size keys
  *    and verifies only bucket-colliding candidates — the pair space never
  *    materializes. Band/row geometry tunes the S-curve:
  *    P(candidate) = 1 - (1 - j^rows)^bands;
  *  - [[simhashNearDupPairs]] blocks on 16-bit simhash chunks (pigeonhole:
  *    hamming distance <= 3 over 64 bits guarantees one equal chunk).
  */
object Dedup {

  /** Exact duplicate groups by canonical-text fingerprint: one keeper
    * (min id) per group plus the group size. The groupBy is a hash
    * aggregate on a 32-char key — fully map-side combinable.
    */
  def exactDupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keeper"), count(lit(1)).as("n_copies"))

  /** Keep-BEST exact dedup: one keeper per canonical-text fingerprint,
    * chosen by the HIGHEST `score` (ties break to the lowest id) — the
    * policy curation pipelines actually want when duplicates differ in
    * provenance quality, where [[exactDupGroups]] keeps the first id.
    * Same map-side-combinable `max_by` aggregate shape: one candidate
    * per (fingerprint, map task) crosses the exchange.
    */
  def exactDupGroupsBest(docs: DataFrame, idCol: String, textCol: String,
                         score: Column): DataFrame =
    docs
      .select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"), score.as("q"))
      .groupBy(col("fp"))
      .agg(max_by(col("id"), struct(col("q"), (-col("id")).as("ni"))).as("keeper"),
        count(lit(1)).as("n_copies"))

  /** Round-robin-spread a corpus whose scan arrived in fewer partitions
    * than the cluster has cores (a small-file artifact: one parquet file
    * under maxPartitionBytes scans as ONE partition, so every pre-shuffle
    * kernel — shingling, signatures, explode — runs single-threaded). At
    * real scale inputs already arrive wide and this is a no-op; it never
    * adds a shuffle to an already-parallel input.
    */
  private def spread(docs: DataFrame): DataFrame = graft.Tables.spread(docs)

  private def shingled(docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    spread(docs).select(col(idCol).as("id"), shingle_set(col(textCol), n).as("shingles"))

  /** Exact n-gram Jaccard near-dup pairs via relational shingle
    * blocking — no cross product: explode distinct shingles, group each
    * shingle's posting list into a sorted array (bounded by maxDf),
    * generate each id1 < id2 pair once, count common per pair, compare
    * against |A|+|B|-common.
    *
    * With `maxDf`, shingles present in more than that many documents are
    * removed from the universe BEFORE both the numerator and the sizes —
    * Jaccard is computed exactly over the df-filtered shingle sets (not a
    * biased estimate of the unfiltered one), so blocking never drops a
    * pair whose filtered-universe similarity clears the threshold.
    *
    * Memory model: the exploded (doc x shingle) table is reused by two
    * consumers (the sizes aggregate and the postings groupBy), so
    * by default it is cached via `shingleStorage` —
    * MEMORY_AND_DISK-shaped levels are right at gate scale where the
    * exploded table fits the cluster. At 100 TB the exploded table is far
    * larger than the input; pass `StorageLevel.NONE` to recompute the
    * cheap explode per consumer (or checkpoint to a bucketed table
    * upstream) instead of caching rows x shingles.
    *
    * Pair-volume guard: the self-join's candidate volume is EXACTLY
    * sum over post-blocking shingles of df*(df-1)/2 — a one-row aggregate
    * over the df table the blocking step needs anyway. When a corpus's
    * vocabulary is too small for `maxDf` to prune (the regime the sf1
    * sweep entered silently at ~1e8 pairs), this operator now refuses
    * loudly with the scale path named, instead of absorbing a quadratic
    * shuffle — same posture as `Knn.nearDupPairs`' row guard. Raise
    * `maxPairEstimate` deliberately to run the exact baseline anyway.
    */
  def jaccardNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, minJaccard: Double = 0.5,
                          maxDf: Option[Int] = None,
                          shingleStorage: org.apache.spark.storage.StorageLevel =
                            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK,
                          maxPairEstimate: Long = 50000000L,
                          fallbackToLsh: Boolean = false): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n)
    var ex = sh.select(col("id"), explode(col("shingles")).as("s"))
    // one df row per distinct shingle — tiny next to the exploded table;
    // cached because the guard aggregate and the blocking filter both read it
    val dfs = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kept = maxDf.fold(dfs)(m => dfs.filter(col("df") <= m))
      // long arithmetic end-to-end (Spark's `/` is double division); the
      // halving happens driver-side on the summed long
      val est = kept.agg(sum(col("df") * (col("df") - lit(1L)))).head()
      val pairVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
      if (pairVolume > maxPairEstimate && fallbackToLsh) {
        // opt-in graceful degrade for pipeline users: route past-cap
        // inputs to the LSH scale path (same n and threshold) instead of
        // hard-stopping a multi-stage job. Logged loudly because LSH
        // pairs are a high-recall approximation of the exact baseline,
        // not a silent drop-in.
        dfs.unpersist()
        org.apache.log4j.Logger.getLogger(getClass)
          .warn(s"jaccardNearDupPairs: ~$pairVolume candidate pairs exceed " +
            s"maxPairEstimate=$maxPairEstimate after maxDf=$maxDf blocking; " +
            s"fallbackToLsh routing to minhashLshNearDupPairs(n=$n, " +
            s"minJaccard=$minJaccard)")
        return minhashLshNearDupPairs(docs, idCol, textCol, n = n,
          minJaccard = minJaccard)
      }
      require(pairVolume <= maxPairEstimate,
        s"jaccardNearDupPairs is the exact baseline and would shuffle ~" +
          s"$pairVolume candidate pairs after maxDf=$maxDf blocking " +
          s"(> $maxPairEstimate): the corpus vocabulary is too small for " +
          "df blocking to prune. Use minhashLshNearDupPairs for corpora " +
          "at scale (or fallbackToLsh=true to route automatically), or " +
          "raise maxPairEstimate deliberately")
      maxDf.foreach { _ =>
        // the USING join moves the key first; restore (id, s) order for the
        // positional toDF renames below
        ex = ex.join(kept.select(col("s")), "s").select(col("id"), col("s"))
      }
    } catch {
      case e: Throwable => dfs.unpersist(); throw e
    }
    val persistedEx =
      shingleStorage != org.apache.spark.storage.StorageLevel.NONE
    if (persistedEx) ex = ex.persist(shingleStorage)
    try {
      // sizes over the same (possibly df-filtered) universe as the numerator
      val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      // candidate pairs from per-shingle sorted POSTING ARRAYS (bounded by
      // maxDf after blocking): one groupBy of the exploded table, then
      // posexplode + slice emits each id1 < id2 pair once — the posting
      // self-join generated df^2 rows per shingle and filtered half away
      // (guide §2.3/§2.4: half the generated rows, one exchange instead of
      // the join's pair)
      val common = ex.groupBy(col("s"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"),
          explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("common"))
      common
        .join(sizes.toDF("id1", "sz1"), "id1")
        .join(sizes.toDF("id2", "sz2"), "id2")
        .filter(col("common").cast("double") /
          (col("sz1") + col("sz2") - col("common")) >= minJaccard)
        .select(col("id1"), col("id2"))
        // materialize the (tiny) verified pair list eagerly so the
        // corpus-sized shingle/df caches release in the finally below
        // instead of leaking for the session's lifetime (guide §5: a
        // suite/pipeline that runs many of these bled storage-pool
        // pressure into every LATER query — the r19 mid-bench measured
        // the g-family paying for the d-family's leaked caches). Same
        // lifecycle as minhashLshNearDupPairs/commonNeighbors.
        .localCheckpoint(true)
        .orderBy(col("id1"), col("id2"))
    } finally {
      if (persistedEx) ex.unpersist()
      dfs.unpersist()
    }
  }

  /** Exact substring-duplication signal — the distributed relational
    * form of exact-substring training-data dedup (Lee et al. 2022,
    * public: documents sharing any sufficiently long verbatim span are
    * duplicates regardless of overall Jaccard). Token granularity: two
    * documents match when they share ANY exact `w`-token window; the
    * returned pair list carries the count of distinct shared windows as
    * the evidence strength. Jaccard (d2) misses these pairs when the
    * shared span is small relative to the documents — a verbatim
    * boilerplate paragraph inside two long, otherwise-different pages is
    * exactly the case this operator exists for.
    *
    * Shape: distinct `w`-token windows per doc (shingle_set — one scan),
    * document-frequency blocking (a window in > maxDf docs is boilerplate
    * so ubiquitous it would emit O(df^2) rows on one join key — the d2
    * hot-key argument verbatim), pair volume counted BEFORE generation
    * and refused past the cap, then per-window sorted posting arrays emit
    * each pair once into a per-pair count. The shuffle key is the window
    * text (content blocking, no
    * pair space materialized); a production run at 100 TB swaps the key
    * for a 128-bit fingerprint of the window to bound shuffle width —
    * the plan shape is unchanged, so the gate pins semantics on the
    * transparent key.
    */
  def sharedWindowPairs(docs: DataFrame, idCol: String, textCol: String,
                        w: Int = 8, maxDf: Int = 100,
                        maxPairEstimate: Long = 50000000L): DataFrame = {
    val ex = shingled(docs, idCol, textCol, w)
      .select(col("id"), explode(col("shingles")).as("win"))
    val dfs = ex.groupBy(col("win")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keptEx =
      try {
        val kept = dfs.filter(col("df") <= maxDf)
        val est = kept.agg(sum(col("df") * (col("df") - lit(1L)))).head()
        val pairVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
        require(pairVolume <= maxPairEstimate,
          s"sharedWindowPairs would shuffle ~$pairVolume candidate pairs " +
            s"after maxDf=$maxDf blocking (> $maxPairEstimate): lower maxDf " +
            "(more aggressive boilerplate blocking), raise w (rarer " +
            "windows), or raise maxPairEstimate deliberately")
        // single consumer downstream (the postings groupBy) — no persist
        ex.join(kept.select(col("win")), "win").select(col("id"), col("win"))
      } finally dfs.unpersist()
    // per-window sorted posting arrays (bounded by maxDf) -> each
    // id1 < id2 pair once, instead of the df^2-row posting self-join
    keptEx.groupBy(col("win"))
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
      .select(col("id1"),
        explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("id1"), col("id2"))
  }

  /** Near-dup CLUSTERS from a pair list: connected components over the
    * pair graph, labeled by each component's minimum id — the step that
    * turns pairwise near-dup evidence (d2/d3/d4/v8 outputs) into "keep
    * one per cluster" decisions. Returns (id, keeper) for every id that
    * appears in at least one pair.
    *
    * Algorithm: iterative min-label propagation (each round every node
    * takes the min of its own and its neighbors' labels), which converges
    * in O(component diameter) rounds — near-dup components are tiny
    * chains/cliques in practice, so a handful. The edge set carries
    * TAGGED SELF-LOOPS (own = a==b), so one join + one aggregate per
    * round computes min over N(a) ∪ {a} AND recovers a's previous label
    * (the self-loop row) in the same pass — the convergence witness
    * piggybacks on the propagation aggregate (round-4 advice: the old
    * shape ran a separate union branch plus a hash-sum witness scan per
    * round). Labels persist per round and the previous round is
    * unpersisted, so lineage and memory stay bounded. For graphs with
    * giant components, swap in the large-star/small-star variant
    * (O(log n) rounds) — same interface.
    */
  def nearDupClusters(pairs: DataFrame, idCol1: String = "id1",
                      idCol2: String = "id2", maxRounds: Int = 20): DataFrame = {
    // Materialize the incoming pair list ONCE before anything references
    // it. The pair plan is typically the expensive near-dup join
    // (d2/d3/d4/v8); it appears under BOTH the edge orientation union
    // branches and again under the seed-label subtree, and the first
    // round's job would otherwise evaluate the whole join per reference
    // (the sf1 sweep measured d7 at ~260 s against d2's ~14 s for this
    // reason — the pair list itself is a few thousand rows). persist +
    // count, not localCheckpoint: lineage stays recomputable on block
    // loss (the round-5 knnJoin advice), and the count is O(|pairs|).
    val pc = pairs.select(col(idCol1).as("a0"), col(idCol2).as("b0"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pc.count(): Unit
    // every persisted handle the loop holds, unpersisted in the finally on
    // ANY exit path except the final `labels` on success (the result reads
    // its already-materialized cache; the caller's action releases it with
    // the session). Without this, a failed round leaked pc/withSelf/round
    // caches for the session's lifetime (round-6 advice).
    var withSelf: DataFrame = null
    var kept: DataFrame = null // persisted handle (labels drops the flag column)
    var prevKept: DataFrame = null
    var done = false
    try {
      val edges = pc.select(col("a0").as("a"), col("b0").as("b"))
        .union(pc.select(col("b0").as("a"), col("a0").as("b")))
        .distinct()
      withSelf = edges.select(col("a"), col("b"), lit(false).as("own"))
        .union(edges.select(col("a"), col("a").as("b"), lit(true).as("own")).distinct())
        .persist()
      // seed = one propagation over identity labels: label(n) = min(n, N(n))
      var labels = withSelf
        .groupBy(col("a"))
        .agg(min(col("b")).as("label"))
        .select(col("a").as("node"), col("label"))
        .persist()
      kept = labels
      var rounds = 0
      var converged = false
      while (!converged && rounds < maxRounds) {
        val next = withSelf
          .join(labels.withColumnRenamed("node", "b"), "b")
          .groupBy(col("a"))
          .agg(min(col("label")).as("label"),
            // a's own previous label rides the self-loop row
            min(when(col("own"), col("label"))).as("prev"))
          .select(col("a").as("node"), col("label"),
            (col("label") =!= col("prev")).as("moved"))
          .persist()
        prevKept = kept
        kept = next
        // the materializing action IS the convergence check (null on empty)
        val moved = next.agg(sum(when(col("moved"), 1L).otherwise(0L))).head()
        val changed = if (moved.isNullAt(0)) 0L else moved.getLong(0)
        if (prevKept != null) prevKept.unpersist() // null right after a truncation round
        prevKept = null
        labels = next.select(col("node"), col("label"))
        converged = changed == 0L
        rounds += 1
        // periodic lineage truncation: each round's plan re-embeds the
        // pair-join subtree through the previous labels, so a DEEP
        // component chain (many rounds) grows the plan string past the
        // heap even though the data is tiny (the KCore lesson — AQE
        // stringifies the full plan per job). Every 4th round cuts the
        // chain; shallow corpora (the common case, and every standing
        // bench number) never reach this branch.
        if (!converged && rounds % 4 == 0) {
          val cut = labels.localCheckpoint(true)
          kept.unpersist()
          kept = null
          labels = cut
        }
      }
      done = true
      labels.select(col("node").as("id"), col("label").as("keeper"))
        .orderBy(col("id"))
    } finally {
      if (withSelf != null) withSelf.unpersist()
      pc.unpersist()
      if (!done) {
        if (kept != null) kept.unpersist()
        if (prevKept != null) prevKept.unpersist()
      }
    }
  }

  /** The giant-component scale path for [[nearDupClusters]]: alternating
    * large-star / small-star rounds (Kiveris et al., "Connected
    * Components in MapReduce and Beyond" — public), which converge in
    * O(log n) rounds regardless of component diameter, where plain
    * min-label propagation needs O(diameter). Same output contract:
    * (id, keeper = component minimum) for every id in a pair.
    *
    *  - large-star(u): every strictly-larger neighbor of u re-attaches to
    *    min(neighbors(u) + u);
    *  - small-star(u): every not-larger neighbor (and u itself)
    *    re-attaches to that min.
    *
    * Each operation is one shuffle (group per node for the min + an
    * edge-side join) — no neighbor lists are ever collected, so hot nodes
    * cost a join key, not memory. Convergence witness: (count, hash sum)
    * of the canonical edge set, checked per round; rounds are also capped.
    */
  def nearDupClustersStars(pairs: DataFrame, idCol1: String = "id1",
                           idCol2: String = "id2", maxRounds: Int = 30,
                           checkpointDir: Option[String] = None): DataFrame = {
    // canonical undirected edges, no self loops. Each round references
    // its input ~16 times (two star ops, each reading the edge set for
    // both orientations and the per-node min), so lineage MUST be
    // truncated per round — checkpointing materializes the round and
    // resets the plan, keeping Catalyst analysis O(1) per round instead
    // of O(16^rounds). Default is localCheckpoint (executor-local blocks,
    // no durable storage needed — right for the gate and for clusters
    // without a shared checkpoint FS); pass `checkpointDir` to use
    // reliable checkpoint() instead, so a multi-hour 100 TB contraction
    // survives executor loss at the cost of one FS round-trip per round.
    val spark = pairs.sparkSession
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    // the witness aggregates RIDE the round's checkpoint materialization
    // as observe() metrics (CollectMetricsExec — no exchange, no second
    // pass): one job per round instead of checkpoint + witness-scan
    // (guide §1.4/§5 — don't re-scan what an action already computed)
    def truncateObserved(df: DataFrame): (DataFrame, (Long, Long, Long, Long)) = {
      val obs = org.apache.spark.sql.Observation()
      val observed = df.observe(obs, count(lit(1)).as("n"),
        sum(hash(col("a"), col("b")).cast("long")).as("h"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"))
      val cut = if (checkpointDir.isDefined) observed.checkpoint()
        else observed.localCheckpoint()
      def at(k: String) =
        Option(obs.get(k)).map(_.asInstanceOf[Long]).getOrElse(0L)
      (cut, (at("n"), at("h"), at("sa"), at("sb")))
    }
    var (e, prev) = truncateObserved(pairs
      .select(least(col(idCol1), col(idCol2)).as("a"),
        greatest(col(idCol1), col(idCol2)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())

    // one star operation: re-attach `keepLarger` (large-star) or the
    // complementary (small-star) neighbors of every node to that node's
    // min-neighborhood label
    def star(edges: DataFrame, large: Boolean): DataFrame = {
      val dir = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val m = dir.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      val attach = dir.join(m, "u")
        .filter(if (large) col("v") > col("u") else col("v") <= col("u"))
        .select(col("v"), col("m"))
      val self = m.select(col("u").as("v"), col("m"))
      attach.union(if (large) self.limit(0) else self)
        .filter(col("v") =!= col("m"))
        .select(least(col("v"), col("m")).as("a"), greatest(col("v"), col("m")).as("b"))
        .distinct()
    }

    // Four independent aggregates of the canonical edge set (observed
    // during each round's checkpoint, see truncateObserved): cardinality,
    // a hash sum, and the two endpoint sums. A (count, hash-sum) pair can
    // in principle collide across different edge sets; requiring the
    // endpoint sums to also match makes a false convergence practically
    // impossible — and the witness costs NO extra pass at all.
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      val (next, w) = truncateObserved(star(star(e, large = true), large = false))
      e = next
      converged = w == prev
      prev = w
      rounds += 1
    }
    // converged edge set is a star forest rooted at component minima
    e.select(col("b").as("id"), col("a").as("keeper"))
      .union(e.select(col("a").as("id"), col("a").as("keeper")))
      .groupBy(col("id")).agg(min(col("keeper")).as("keeper"))
      .orderBy(col("id"))
  }

  /** Incremental-load dedup (cross-dataset): rows of `incoming` whose
    * canonical fingerprint does not appear anywhere in `existing` — the
    * "is this new batch already in the corpus" step of a continuously-fed
    * training pipeline. A LEFT ANTI join on a 32-char md5 key: the
    * existing side reduces to distinct fingerprints (no payload), so at
    * 100 TB the join shuffles two narrow fingerprint columns — or none at
    * all when the fingerprint set of the standing corpus is maintained as
    * a bucketed table the anti-join co-locates with.
    */
  def incrementalNew(incoming: DataFrame, existing: DataFrame,
                     idCol: String, textCol: String): DataFrame = {
    val inc = incoming.select(col(idCol).as("id"), fingerprint(col(textCol)).as("fp"))
    val seen = existing.select(fingerprint(col(textCol)).as("fp")).distinct()
    inc.join(seen, Seq("fp"), "left_anti").select(col("id"))
  }

  /** One row per (doc, band); bucket key = hash of the band's signature
    * slice (static band count -> plain column expressions, no lambda).
    */
  private def lshBanded(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band"), hash(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Fuzzy incremental dedup — [[incrementalNew]]'s near-duplicate
    * sibling: keep only incoming documents that are NOT near-duplicates
    * (n-gram Jaccard >= minJaccard) of ANY standing document. The dedup
    * step every recurring crawl ingest runs against its accumulated
    * corpus, where exact fingerprints miss reformatted re-crawls.
    *
    * Scale shape: both sides reduce to banded LSH keys (fixed-size rows,
    * the d3 posture) and meet in a bucket equi-join — incoming x standing
    * never materializes; only bucket-colliding candidates are verified
    * with exact Jaccard. The standing side's signatures are recomputed
    * here from text; at 100 TB persist them once (they are 128 longs per
    * doc) and feed the banded table directly — the shape is unchanged.
    */
  def incrementalNearDupNew(incoming: DataFrame, existing: DataFrame,
                            idCol: String, textCol: String,
                            n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                            minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val shIn = shingled(incoming, idCol, textCol, n).cache()
    val shEx = shingled(existing, idCol, textCol, n).cache()
    try {
      def sig(sh: DataFrame) =
        sh.withColumn("sig", minhash_signature(col("shingles"), numHashes))
      val cand = lshBanded(sig(shIn), numHashes, bands).toDF("idn", "band", "bucket")
        .join(lshBanded(sig(shEx), numHashes, bands).toDF("ide", "band", "bucket"),
          Seq("band", "bucket"))
        .select(col("idn"), col("ide"))
        .distinct()
      // materialize the dup id set (eager, lineage-free, bounded by the
      // incoming batch) so the cached shingle tables can be released in
      // the finally below instead of leaking for the application lifetime
      val dup = cand
        .join(shIn.select(col("id").as("idn"), col("shingles").as("sh1")), "idn")
        .join(shEx.select(col("id").as("ide"), col("shingles").as("sh2")), "ide")
        .filter(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))) >= minJaccard)
        .select(col("idn").as("id"))
        .distinct()
        .localCheckpoint()
      incoming.select(col(idCol).as("id"))
        .join(dup, Seq("id"), "left_anti")
    } finally {
      shIn.unpersist()
      shEx.unpersist()
    }
  }

  /** MinHash-LSH near-dup pairs: signature -> banded buckets -> candidate
    * pairs -> exact Jaccard verification on the candidates only.
    * The verified pair set is materialized (eager, lineage-free) so the
    * cached shingle table can be released before returning — the same
    * lifecycle as [[incrementalNearDupNew]]; pairs are bounded by the
    * bucket-colliding candidates that survive verification, far below
    * the corpus-sized shingles the cache held.
    */
  def minhashLshNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                             n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                             minJaccard: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sh = shingled(docs, idCol, textCol, n).cache()
    try {
      val sig = sh.withColumn("sig", minhash_signature(col("shingles"), numHashes))
      // one row per (doc, band); bucket key = hash of the band's slice
      // (static band count -> plain column expressions, no lambda needed)
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b).as("band"), hash(slice(col("sig"), b * rows + 1, rows)).as("bucket"))
      }
      val banded = sig
        .select(col("id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      // per-(band, bucket) sorted id arrays -> each colliding id1 < id2
      // pair once, instead of the bucket self-join's |bucket|^2 rows
      val cand = banded.groupBy(col("band"), col("bucket"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"),
          explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .distinct()
      // verify candidates with exact Jaccard (arrays are already distinct)
      cand
        .join(sh.toDF("id1", "sh1"), "id1")
        .join(sh.toDF("id2", "sh2"), "id2")
        .filter(size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))) >= minJaccard)
        .select(col("id1"), col("id2"))
        .localCheckpoint()
        .orderBy(col("id1"), col("id2"))
    } finally sh.unpersist()
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, candidates from equal
    * 16-bit chunks, verified by hamming distance <= maxHamming (<= 3 for
    * the pigeonhole guarantee with 4 chunks).
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, maxHamming: Int = 3): DataFrame =
    hammingPairs(spread(docs).select(col(idCol).as("id"),
      simhash64(shingle_set(col(textCol), n)).as("sig")), maxHamming)

  /** The 64-bit hamming blocker alone, over ANY (id, sig) signature
    * table — SimHash (d4), the image aHash (d23), or any other 64-bit
    * perceptual fingerprint: candidates from equal 16-bit chunks (the
    * pigeonhole guarantee: hamming <= 3 forces at least one of 4 chunks
    * equal), verified by bit_count before the distinct so the dedup
    * shuffle only carries true near-dups.
    *
    * Bucket-volume guard (guide §2.5): the per-(chunk, v) posting arrays
    * are UNbounded — a degenerate corpus (many all-zero simhashes, one
    * hot 16-bit chunk value) makes one task materialize a |bucket|-sized
    * array in a single row, a straight OOM/2 GB-row failure at 100 TB
    * where the old self-join merely streamed |bucket|^2 rows. Candidate
    * volume is EXACTLY sum over buckets of df*(df-1)/2 — one cheap
    * combinable aggregate over the chunk table — so this refuses loudly
    * past `maxPairEstimate` (which also bounds the largest single bucket
    * at ~sqrt(2*cap) entries), the jaccardNearDupPairs/sharedWindowPairs
    * discipline.
    *
    * The (id, sig) input is materialized ONCE via a lazy localCheckpoint
    * (GC-released blocks — the docVectors lifecycle, no unpersist
    * bookkeeping): sig columns are typically expensive per-row kernels
    * (d4's simhash over shingles, d23/x18's image decode + aHash), and
    * both the guard aggregate and the pair generation read them — without
    * the checkpoint the guard would re-run the decode pass. One row of
    * (id, long) per document: node-sized at any corpus scale.
    */
  def hammingPairs(sigs: DataFrame, maxHamming: Int = 3,
                   maxPairEstimate: Long = 50000000L): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"hammingPairs: 4x16-bit chunks guarantee recall only for " +
        s"maxHamming <= 3, got $maxHamming")
    val sg = sigs.localCheckpoint(false)
    val chunkStructs = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
    }
    // per-(chunk, v) sorted (id, sig) arrays -> each colliding id1 < id2
    // pair once (ids are unique, so the struct sort IS the id sort),
    // instead of the chunk self-join's |bucket|^2 rows — the same
    // guide §2.3/§2.4 restructure as the jaccard/minhash/wedge pair
    // generators this round; the hamming verify runs BEFORE the
    // distinct so its exchange only carries true near-dups (unchanged)
    val chunked = sg
      .select(explode(array(chunkStructs: _*)).as("cc"),
        struct(col("id"), col("sig")).as("e"))
      .select(col("cc.chunk").as("chunk"), col("cc.v").as("v"), col("e"))
    val est = chunked.groupBy(col("chunk"), col("v"))
      .agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - lit(1L)))).head()
    val pairVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
    require(pairVolume <= maxPairEstimate,
      s"hammingPairs would materialize ~$pairVolume candidate pairs from " +
        s"per-chunk posting buckets (> $maxPairEstimate): the signature " +
        "distribution is too degenerate for 16-bit chunk blocking (hot " +
        "chunk values own the corpus). Split or pre-filter the hot " +
        "signatures, or raise maxPairEstimate deliberately")
    chunked.groupBy(col("chunk"), col("v"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("es"), posexplode(col("es")).as(Seq("i", "e1")))
      .select(col("e1"), explode(expr("slice(es, i + 2, size(es))")).as("e2"))
      .filter(bit_count(col("e1.sig").bitwiseXOR(col("e2.sig"))) <= maxHamming)
      .select(col("e1.id").as("id1"), col("e2.id").as("id2"))
      .distinct()
      .orderBy(col("id1"), col("id2"))
  }

  /** Content-defined chunking at token granularity (the rsync/LBFS cut
    * rule, Muthitacharoen et al. 2001, applied to token streams): a token
    * ENDS its chunk iff its content hash falls in the cut class
    * (`md5-prefix % divisor == 0` — the t24 hash convention). Because the
    * cut decision depends only on token CONTENT, an insertion or deletion
    * shifts positions but every chunk after the next cut point re-syncs —
    * so chunk fingerprints survive edits that shift the whole suffix,
    * which fixed-width windows (t10) and whole-doc fingerprints (t4)
    * both lose. Cross-doc `chunk_fp` equality is then shifted-content
    * dedup evidence at chunk granularity.
    *
    * Scale design: the chunk list comes from the single-pass native
    * kernel [[graft.functions.CdcChunksExpr]] (O(tokens) per row inside
    * codegen — the equivalent `aggregate()` fold copies its accumulator
    * array per token and evaluates interpreted), then a posexplode emits
    * manifest rows; no shuffle anywhere in the operator (callers group
    * by `chunk_fp` for the dedup application, a combinable aggregate).
    * Expected chunk length is `divisor` tokens.
    *
    * Output: (id, chunk_idx, start_tok 1-based, n_tok, chunk_fp).
    */
  /** The dedup APPLICATION of [[cdcChunks]]: per document, how much of
    * its token mass lives in chunks whose fingerprint also appears in
    * ANOTHER document (the rsync-style shifted-duplication measure
    * content-defined boundaries exist to expose).
    *
    * Scale shape: one chunk_fp-keyed aggregate over the manifest
    * (combinable: count + distinct-doc count per fp), broadcast-free
    * fp join back, then a doc-keyed aggregate — the exchange carries
    * fingerprints and doc keys, never text.
    */
  def chunkDupMass(docs: DataFrame, idCol: String, textCol: String,
                   divisor: Int = 8): DataFrame = {
    val chunks = cdcChunks(docs, idCol, textCol, divisor)
    val byFp = chunks.groupBy(col("chunk_fp"))
      .agg(countDistinct(col("id")).as("n_docs_fp"))
    chunks.join(byFp, "chunk_fp")
      .groupBy(col("id"))
      .agg(sum(col("n_tok")).as("n_tok"),
        sum(when(col("n_docs_fp") > 1, col("n_tok")).otherwise(0L))
          .as("dup_tok"))
      .select(col("id"), col("n_tok"), col("dup_tok"),
        (col("dup_tok").cast("double") / col("n_tok").cast("double"))
          .as("dup_frac"))
  }

  /** Near-SUPERSET detection via exact shingle CONTAINMENT — the dedup
    * case Jaccard structurally misses: a small document wrapped in
    * boilerplate (or quoted whole inside a bigger one) has
    * `|A n B| / |A| ~ 1` while Jaccard is low because |B| dominates the
    * union. Emits DIRECTED evidence `(contained, container)` where the
    * contained doc's df-filtered shingle set lies inside the container's
    * at >= `minContainment`, with the smaller set always the contained
    * side (equal sizes tie-break by id, so identical sets emit once).
    *
    * Same relational skeleton and guard discipline as
    * [[jaccardNearDupPairs]]: df blocking BEFORE both numerator and
    * sizes (containment is exact over the filtered universe), candidate
    * volume exactly counted and refused past `maxPairEstimate`.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, minContainment: Double = 0.9,
                       maxDf: Option[Int] = None,
                       maxPairEstimate: Long = 50000000L): DataFrame = {
    val sh = shingled(docs, idCol, textCol, n)
    var ex = sh.select(col("id"), explode(col("shingles")).as("s"))
    val dfs = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val kept = maxDf.fold(dfs)(m => dfs.filter(col("df") <= m))
      val est = kept.agg(sum(col("df") * (col("df") - lit(1L)))).head()
      val pairVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
      require(pairVolume <= maxPairEstimate,
        s"containmentPairs would shuffle ~$pairVolume candidate pairs " +
          s"after maxDf=$maxDf blocking (> $maxPairEstimate): tighten " +
          "maxDf or raise maxPairEstimate deliberately")
      maxDf.foreach { _ =>
        ex = ex.join(kept.select(col("s")), "s").select(col("id"), col("s"))
      }
    } catch {
      case e: Throwable => dfs.unpersist(); throw e
    }
    ex = ex.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val sizes = ex.groupBy(col("id")).agg(count(lit(1)).as("sz"))
      // per-shingle sorted posting arrays (bounded by maxDf) -> each
      // id1 < id2 pair once, instead of the df^2-row posting self-join
      val common = ex.groupBy(col("s"))
        .agg(sort_array(collect_list(col("id"))).as("ids"))
        .select(col("ids"), posexplode(col("ids")).as(Seq("i", "id1")))
        .select(col("id1"),
          explode(expr("slice(ids, i + 2, size(ids))")).as("id2"))
        .groupBy(col("id1"), col("id2"))
        .agg(count(lit(1)).as("common"))
        .join(sizes.toDF("id1", "sz1"), "id1")
        .join(sizes.toDF("id2", "sz2"), "id2")
      val tau = lit(minContainment)
      val fwd = common // id1 contained in id2
        .filter(col("common").cast("double") / col("sz1") >= tau &&
          (col("sz1") < col("sz2") ||
            (col("sz1") === col("sz2") && col("id1") < col("id2"))))
        .select(col("id1").as("contained"), col("id2").as("container"))
      val bwd = common // id2 contained in id1 (strictly smaller only)
        .filter(col("common").cast("double") / col("sz2") >= tau &&
          col("sz2") < col("sz1"))
        .select(col("id2").as("contained"), col("id1").as("container"))
      // eager-materialize the (tiny) directed pair list so the
      // corpus-sized shingle/df caches release below instead of leaking
      // for the session (the jaccardNearDupPairs lifecycle note)
      fwd.unionByName(bwd).localCheckpoint(true)
        .orderBy(col("contained"), col("container"))
    } finally {
      ex.unpersist()
      dfs.unpersist()
    }
  }

  /** Corpus-order n-gram NOVELTY fractions — the incremental-value
    * curation signal (how much of a document's n-gram vocabulary is
    * FIRST INTRODUCED by that document, under the corpus's id order):
    * for every distinct n-gram the min doc id is its first-occurrence
    * holder; a doc's novelty is the fraction of its distinct n-grams it
    * holds. Crawl-ordered ids make this "how much does this doc add
    * beyond everything crawled before it" — the dedup-adjacent signal
    * that downweights near-verbatim re-crawls without needing pairs.
    *
    * Scale shape: one shingle pass, ONE gram-keyed combinable min
    * aggregate (the exchange carries distinct grams, never pairs), a
    * broadcast-free equi-join back on the gram key, and a per-doc count
    * aggregate. No pair volume anywhere — this is the signal to reach
    * for when even banded pair generation is too expensive.
    *
    * Output: (id, n_grams, n_novel, novelty_frac); docs with fewer than
    * n tokens have no n-grams and are absent from the output (the
    * explode drops them — same posture as the other shingle operators).
    */
  def noveltyFractions(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3): DataFrame = {
    val grams = shingled(docs, idCol, textCol, n)
      .select(col("id"), explode(col("shingles")).as("g"))
    val firstHolder = grams.groupBy("g").agg(min(col("id")).as("first_id"))
    grams.join(firstHolder, "g")
      .groupBy("id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("id") === col("first_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty_frac"))
  }

  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                divisor: Int = 8): DataFrame = {
    require(divisor >= 2, s"divisor must be >= 2, got $divisor")
    val chunksCol = graft.functions.GraftFunctions.toCol(
      graft.functions.CdcChunksExpr(
        graft.functions.GraftFunctions.toExpr(col(textCol)), divisor))
    docs.select(col(idCol).as("id"), chunksCol.as("chunks"))
      .select(col("id"), posexplode(col("chunks")).as(Seq("chunk_idx", "c")))
      .select(col("id"), col("chunk_idx"),
        col("c")("start").as("start_tok"),
        col("c")("n").cast("long").as("n_tok"),
        md5(col("c")("txt")).as("chunk_fp"))
  }
}
