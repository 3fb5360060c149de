package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction (common-neighbor and Jaccard
  * scores for non-adjacent node pairs) — the classic "you may also
  * like" / record-linkage primitive over the same co-occurrence graphs
  * g1–g4 serve (Liben-Nowell & Kleinberg 2003).
  *
  * Shape: candidate pairs are exactly the WEDGES of the graph — for
  * each center c, every unordered pair of its neighbors — generated
  * once each from per-center sorted adjacency arrays (one groupBy on
  * the center key + posexplode/slice, no self-join) and counted with
  * one combinable count, then anti-joined against the edge set so only
  * genuinely new links remain, then degree-joined for the Jaccard
  * denominator. All arithmetic is integer (counts, degrees, ppm
  * quotient), bit-stable across engines.
  *
  * Scale posture: wedge volume is Σ_c deg(c)·(deg(c)−1)/2 — quadratic
  * in hub degree, the same regime Dedup.jaccardNearDupPairs guards.
  * The operator computes that sum exactly from the degree table it
  * needs anyway and REFUSES loudly past `maxWedgeEstimate`, naming the
  * mitigations (degree-cap the centers, or sample), rather than
  * absorbing an unbounded shuffle. Degrees join via two key shuffles of
  * candidate volume; the top-k exits through TakeOrderedAndProject.
  */
object LinkPredict {

  /** The LAZY scoring plan (no caching, no guard, no checkpoint) —
    * the shape PlanShapeSpec pins (equi-join wedges + TakeOrdered
    * exit); [[commonNeighbors]] wraps it with the persist / wedge-guard
    * / eager-realize / unpersist lifecycle.
    */
  def commonNeighborsPlan(edges: DataFrame, aCol: String, bCol: String,
                          k: Int = 20): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val adj = e.select(col("a").as("c"), col("b").as("n"))
      .unionAll(e.select(col("b").as("c"), col("a").as("n")))
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
    scoreWedges(e, adj, deg, k)
  }

  /** Top-`k` non-adjacent pairs by common-neighbor count over an
    * undirected edge list (`aCol` < `bCol`, deduped). Output:
    * (a, b, cn, deg_a, deg_b, jac_ppm), ordered by cn desc then (a, b).
    */
  def commonNeighbors(edges: DataFrame, aCol: String, bCol: String,
                      k: Int = 20,
                      maxWedgeEstimate: Long = 50000000L): DataFrame = {
    // the edge list is typically itself a derived plan (the gate's is a
    // co-occurrence self-join + distinct) and is read FOUR times here
    // (guard/degrees/wedges via adj, plus the anti-join) — persist it so
    // the upstream plan executes once
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // adjacency in both directions: (c = center, n = neighbor)
    // cached: the guard aggregate, the degree table, and the wedge
    // groupBy all read the adjacency. The (u, v) pair aggregation's
    // wedge-volume shuffle dominates and no layout of the adjacency can
    // reduce it (a cached repartition(c) was measured at 20.3 s vs
    // 17.9 s on the round-12 self-join shape — the up-front shuffle
    // cost more than it saved).
    val adj = e.select(col("a").as("c"), col("b").as("n"))
      .unionAll(e.select(col("b").as("c"), col("a").as("n")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the guard aggregate also reads off the id range: ids in
      // [0, 2^31) let the dominant wedge aggregation key on ONE packed
      // long instead of two (guide §2.3 "narrower types" — half the key
      // bytes through the wedge-volume exchange and a primitive-long
      // hash in the aggregate); out-of-range or non-castable ids keep
      // the two-column key, same results either way
      val est = deg.agg(sum(col("d") * (col("d") - lit(1L))),
        min(col("c").cast("long")), max(col("c").cast("long"))).head()
      val wedgeVolume = (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2
      require(wedgeVolume <= maxWedgeEstimate,
        s"commonNeighbors would enumerate ~$wedgeVolume wedges (sum of " +
          s"deg*(deg-1)/2 over centers) > maxWedgeEstimate=$maxWedgeEstimate; " +
          "cap hub degrees (commonNeighborsCapped) or sample centers, or " +
          "raise maxWedgeEstimate deliberately")
      val packable = !est.isNullAt(1) && !est.isNullAt(2) &&
        est.getLong(1) >= 0L && est.getLong(2) < (1L << 31)
      // pair-aggregation parallelism derived from the MEASURED wedge
      // volume (profiled at sf0.1: the wedge stage inherits the
      // adjacency exchange's AQE-coalesced partition count, so the
      // 148M-row partial aggregate ran nearly unparallelized and
      // spilled; distinct pairs are ~0.7x of wedges, so map-side
      // combining is worthless here anyway — repartitioning the RAW
      // pairs to volume-scaled partitions and aggregating ONCE measured
      // 27 -> 11.4 s for the aggregation stage). ~1.5M pair rows
      // (~12 MB packed) per task, floored at the session parallelism,
      // capped to keep task counts bounded at any scale.
      val parts = math.max(adj.sparkSession.sparkContext.defaultParallelism,
        math.min(4096L, wedgeVolume / 1500000L + 1L).toInt)
      // realize the k-row result eagerly so the finally can release the
      // cached tables without a later action re-running the whole plan
      // uncached (the LabelProp/Occupancy cleanup pattern)
      scoreWedges(e, adj, deg, k, packed = packable, aggParts = parts)
        .localCheckpoint(true)
    } finally { e.unpersist(); adj.unpersist(); deg.unpersist() }
  }

  /** Degree-capped GENERATE + exact REFINE — the 100×-scale route past
    * the exact operator's wedge refusal (the IVF posture applied to the
    * graph: a cheap bounded candidate generator, then exact rescoring of
    * a candidate pool that is k-sized, not corpus-sized).
    *
    * Generate: drop wedges CENTERED on nodes with deg > `maxDegree`
    * before enumeration, bounding wedge volume at n·D·(D−1)/2 REGARDLESS
    * of skew — no exact pre-count needed, the bound holds by
    * construction. Take the top `k * refineFactor` pairs by capped
    * count. Refine: rescore just those pairs with their TRUE
    * common-neighbor counts (cost Σ_cand deg — candidate-bounded, never
    * wedge-shaped) and emit the top k with true degrees and Jaccard.
    *
    * `maxDegree` is a recall/cost knob exactly like IVF's nprobe: recall
    * vs the exact top-k is MEASURED by the g7b sweep (the d21/d22
    * posture), not assumed — at gate scale D=100/140/180 recovers
    * 4/17/20 of the exact top-20.
    */
  def commonNeighborsCapped(edges: DataFrame, aCol: String, bCol: String,
                            maxDegree: Long, k: Int = 20,
                            refineFactor: Int = 10): DataFrame = {
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    require(refineFactor >= 1, s"refineFactor must be >= 1, got $refineFactor")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = e.select(col("a").as("c"), col("b").as("n"))
      .unionAll(e.select(col("b").as("c"), col("a").as("n")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = adj.groupBy(col("c")).agg(count(lit(1)).as("d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // centers filtered BEFORE wedge generation: the low-degree center
      // set reaches the adjacency groupBy, so the hub-quadratic blow-up
      // never materializes
      val okCenters = deg.filter(col("d") <= lit(maxDegree)).select(col("c"))
      val cappedAdj = adj.join(okCenters, "c")
      // ONE pre-aggregate over the cached degree table reads off the
      // capped wedge volume (for volume-scaled aggregation parallelism —
      // the scoreWedges repartition-first treatment; the wedge stage
      // otherwise inherits the adjacency exchange's AQE-coalesced
      // partition count and the pair aggregate runs nearly
      // unparallelized) and the id range (for the packed pair key).
      val pre = deg.agg(
        sum(when(col("d") <= lit(maxDegree), col("d") * (col("d") - lit(1L)))),
        min(col("c").cast("long")), max(col("c").cast("long"))).head()
      val cappedVolume = (if (pre.isNullAt(0)) 0L else pre.getLong(0)) / 2
      val packable = !pre.isNullAt(1) && !pre.isNullAt(2) &&
        pre.getLong(1) >= 0L && pre.getLong(2) < (1L << 31)
      val parts = math.max(adj.sparkSession.sparkContext.defaultParallelism,
        math.min(4096L, cappedVolume / 1500000L + 1L).toInt)
      val idType = adj.schema("n").dataType
      def pk(u: Column, v: Column): Column =
        shiftleft(u.cast("long"), 32) + v.cast("long")
      // candidate pool: top k*refineFactor NEW pairs by capped count,
      // realized eagerly (R rows) so everything downstream is
      // candidate-bounded; (ccn desc, pk) ordering == (ccn desc, u, v)
      // for the non-negative packed ids
      val gen = (if (packable)
        wedgePairs(cappedAdj)
          .select(pk(col("u"), col("v")).as("pk"))
          .repartition(parts, col("pk"))
          .groupBy(col("pk")).agg(count(lit(1)).as("ccn"))
          .join(e.select(pk(col("a"), col("b")).as("pk")),
            Seq("pk"), "left_anti")
          .orderBy(col("ccn").desc, col("pk").asc)
          .limit(k * refineFactor)
          .select(shiftrightunsigned(col("pk"), 32).cast(idType).as("u"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast(idType).as("v"))
      else
        wedgePairs(cappedAdj)
          .repartition(parts, col("u"), col("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("ccn"))
          .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
          .orderBy(col("ccn").desc, col("u").asc, col("v").asc)
          .limit(k * refineFactor)
          .select(col("u"), col("v")))
        .localCheckpoint(true)
      // exact rescore: per candidate pair, count the centers adjacent
      // to BOTH endpoints over the FULL adjacency. Join volume is
      // Σ_cand deg(endpoint) — R·maxTrueDeg worst case, never the wedge
      // volume; gen (R rows) broadcasts into the first join.
      val ref = broadcast(gen)
        .join(adj.select(col("n").as("u"), col("c")), "u")
        .join(adj.select(col("n").as("v"), col("c")), Seq("v", "c"))
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
      ref.hint("broadcast")
        .join(deg.select(col("c").as("u"), col("d").as("deg_a")), "u")
        .join(deg.select(col("c").as("v"), col("d").as("deg_b")), "v")
        .select(col("u").as("a"), col("v").as("b"), col("cn"),
          col("deg_a"), col("deg_b"),
          expr("cast((cn * 1000000) div (deg_a + deg_b - cn) as bigint)")
            .as("jac_ppm"))
        .orderBy(col("cn").desc, col("a").asc, col("b").asc)
        .limit(k)
        .localCheckpoint(true)
    } finally { e.unpersist(); adj.unpersist(); deg.unpersist() }
  }

  /** Wedge pairs (u < v) generated from per-center adjacency ARRAYS:
    * one groupBy of the adjacency (neighbors sorted ascending — distinct
    * per center, so u < v strictly), then posexplode + slice emits each
    * unordered pair exactly once. The self-join formulation produced
    * sum-of-d^2 join rows and filtered half away; this emits the
    * d(d-1)/2 wedges directly and removes the join (guide §2.3/§2.4).
    * Skew is unchanged (a center's wedges were already generated in one
    * task by the join's hash(c) partitioning); array size = degree.
    */
  private def wedgePairs(adj: DataFrame): DataFrame =
    adj.groupBy(col("c"))
      .agg(sort_array(collect_list(col("n"))).as("ns"))
      .select(col("ns"), posexplode(col("ns")).as(Seq("i", "u")))
      .select(col("u"), explode(expr("slice(ns, i + 2, size(ns))")).as("v"))

  /** Shared scoring tail: count co-neighbors per wedge pair, drop
    * existing edges, join TRUE degrees, integer Jaccard, top-k.
    * With `packed` (caller proved ids in [0, 2^31)), the pair key
    * through the dominant exchange is ONE long (u << 32 | v); the edge
    * anti-join runs on the same packed key (so the aggregate's
    * partitioning is reused, no extra exchange), and the pair unpacks —
    * cast back to the input id type — only after the anti-join.
    * With `aggParts` > 0, the RAW pairs repartition to that count
    * before ONE aggregation pass: distinct pairs run ~0.7x of wedges,
    * so the default partial-then-final plan pays a near-useless
    * map-side hash (spilling, at the upstream stage's AQE-coalesced
    * parallelism) to save ~30% of exchange rows — measured 2.4x slower
    * than exchanging the raw pairs at volume-scaled parallelism.
    *
    * The top-k on (cn desc, u, v) runs BEFORE the degree joins: the
    * ordering never reads degrees or Jaccard, and the inner joins drop
    * nothing (every pair endpoint is some center's neighbor, so its
    * degree row exists) — so only k rows pay the two degree joins and
    * the ppm arithmetic, not the ~0.7x-of-wedges distinct pair set
    * (guide §1.2 "don't compute things you throw away"). A final
    * orderBy restores the k-row total order the joins may permute.
    */
  private def scoreWedges(e: DataFrame, adj: DataFrame, deg: DataFrame,
                          k: Int, packed: Boolean = false,
                          aggParts: Int = 0): DataFrame = {
    val idType = adj.schema("n").dataType
    def pack(u: Column, v: Column): Column =
      shiftleft(u.cast("long"), 32) + v.cast("long")
    val cn =
      if (packed) {
        val raw = wedgePairs(adj).select(pack(col("u"), col("v")).as("pk"))
        (if (aggParts > 0) raw.repartition(aggParts, col("pk")) else raw)
          .groupBy(col("pk")).agg(count(lit(1)).as("cn"))
          // wedge pairs that are already edges are triangles, not
          // predictions — dropped on the packed key so the aggregate's
          // pk partitioning carries straight through
          .join(e.select(pack(col("a"), col("b")).as("pk")),
            Seq("pk"), "left_anti")
          .select(shiftrightunsigned(col("pk"), 32).cast(idType).as("u"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).cast(idType).as("v"),
            col("cn"))
      } else {
        val raw = wedgePairs(adj)
        (if (aggParts > 0) raw.repartition(aggParts, col("u"), col("v")) else raw)
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
          // wedge pairs that are already edges are triangles, not predictions
          .join(e, col("u") === col("a") && col("v") === col("b"), "left_anti")
      }
    cn.orderBy(col("cn").desc, col("u").asc, col("v").asc)
      .limit(k)
      .join(deg.select(col("c").as("u"), col("d").as("deg_a")), "u")
      .join(deg.select(col("c").as("v"), col("d").as("deg_b")), "v")
      .select(col("u").as("a"), col("v").as("b"), col("cn"),
        col("deg_a"), col("deg_b"),
        expr("cast((cn * 1000000) div (deg_a + deg_b - cn) as bigint)")
          .as("jac_ppm"))
      .orderBy(col("cn").desc, col("a").asc, col("b").asc)
      .limit(k)
  }
}
