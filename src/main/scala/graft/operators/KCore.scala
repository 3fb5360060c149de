package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction (Seidman 1983, "Network structure and minimum
  * degree", public; the standard distributed peeling loop, e.g.
  * Montresor et al. 2013): iteratively delete every node whose degree
  * in the REMAINING graph is below k until none is — the fixpoint is
  * the unique maximal subgraph with minimum degree >= k. The training-
  * data application is graph-shaped curation (citation/co-occurrence/
  * link graphs): the k-core keeps the densely-connected body and drops
  * the sparse periphery, the graph analogue of the quality gate.
  *
  * Scale design (the g1 posture): each peeling round is ONE combinable
  * degree aggregate (the exchange carries nodes, not edges) plus two
  * left-anti equi-joins against the (typically small) doomed-node set —
  * no driver-side graph state, edges stay partitioned by key
  * throughout. Rounds are data-dependent; each round's edge set
  * persists and the previous unpersists, so lineage stays O(1) deep
  * (the PageRank discipline). `maxRounds` REFUSES loudly when the graph
  * has not converged (the engine never silently returns a non-fixpoint;
  * the g3 oracle unrolls the same bounded peel, so the bound is part of
  * the operator contract, not a hidden cap).
  */
object KCore {

  /** Nodes of the k-core of the undirected graph induced by
    * (srcCol, dstCol) (self-loops dropped, parallel edges collapsed),
    * with their within-core degrees. Output: (node, deg), deg >= k.
    * Empty result when the core is empty.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 12): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    def degrees(e: DataFrame): DataFrame =
      e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("deg"))
    // localCheckpoint each round (the d7/d8 star-contraction discipline):
    // the next edge set references the current one THREE times (once
    // directly, twice through the doomed set), so an un-truncated lineage
    // grows 3^rounds — eager checkpointing keeps the logical plan O(1)
    // deep and each round's work exactly one aggregate + two anti-joins
    // ONE job per peeling round (the d8 observe-witness treatment):
    // the next edge set materializes eagerly with its own cardinality
    // riding along as an observe() metric; the round converged iff the
    // edge count did not move — doomed nodes all carry edges (their
    // degrees were computed FROM e), so |e| unchanged <=> doomed empty.
    // The previous shape paid a doomed.isEmpty job AND the checkpoint
    // job per round; convergence now costs the one no-change round
    // instead of a per-round second pass.
    def checkpointCounted(df: DataFrame): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation()
      val cut = df.observe(obs, count(lit(1)).as("n")).localCheckpoint(true)
      (cut, obs.get("n").asInstanceOf[Long])
    }
    var (e, nEdges) = checkpointCounted(edges.select(
      least(col(srcCol), col(dstCol)).as("a"),
      greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var rounds = 0
    var converged = nEdges == 0L
    while (!converged) {
      // persisted because the anti-join references it twice; it
      // materializes inside the round's single checkpoint job
      val doomed = degrees(e).filter(col("deg") < k).persist()
      val (next, n) = checkpointCounted(e
        .join(doomed.select(col("n").as("a")), Seq("a"), "left_anti")
        .join(doomed.select(col("n").as("b")), Seq("b"), "left_anti"))
      doomed.unpersist()
      converged = n == nEdges
      e = next
      nEdges = n
      if (!converged) {
        // this round genuinely peeled — count it against the budget
        // (the final no-change round is the convergence witness, free
        // of charge, exactly like the old shape's empty-doomed check)
        rounds += 1
        if (rounds > maxRounds)
          throw new IllegalStateException(
            s"k-core did not converge within $maxRounds peeling rounds; " +
              "raise maxRounds (each round is one aggregate + two anti-joins)")
      }
    }
    degrees(e).filter(col("deg") >= k)
      .select(col("n").as("node"), col("deg"))
  }
}
