package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan, Albert & Kumara 2007, "Near
  * linear time algorithm to detect community structures in large-scale
  * networks") made DETERMINISTIC: every node starts labeled with itself;
  * each round every node adopts the label carried by the plurality of
  * its neighbors, ties broken by the SMALLEST label. The classic
  * algorithm breaks ties randomly and updates asynchronously — both
  * nondeterministic, both unacceptable under a hash gate — so this is
  * the synchronous min-tie-break variant: a pure function of (edges,
  * rounds), replay- and partitioning-invariant.
  *
  * Fixed `rounds` is the CONTRACT, not a hidden cap: synchronous LPA can
  * oscillate between two colorings on bipartite-ish subgraphs (Raghavan
  * §4), so "run to convergence" is not well-defined here; the oracle
  * unrolls the identical rounds and both sides stop together. Community
  * detection quality plateaus in ~5 rounds on real graphs (the paper's
  * 95%-in-5-iterations observation).
  *
  * Scale shape, per round: one broadcast-free equi-join of the edge list
  * with the label table on the neighbor key, a combinable (node, label)
  * count, then a combinable per-node argmax — `max(struct(cnt, -label))`
  * instead of a row_number window, so plurality selection is ONE
  * map-side-combined aggregation and never sorts a partition-wide
  * window. The edge list is symmetrized once and persisted; label
  * lineage is cut with an eager localCheckpoint every two rounds (an
  * iterative plan that re-references its previous state grows
  * multiplicatively and stalls the DRIVER in AQE plan stringification
  * long before data volume matters — the round-11 k-core lesson).
  */
object LabelProp {

  /** Communities after `rounds` synchronous steps over the undirected
    * graph given as (aCol, bCol) pairs. Output: (node, lab) — both long.
    * Labels are node ids, so `-label` tie-breaking is exact for every
    * id but Long.MinValue (whose negation overflows; entity keys never
    * carry it).
    */
  def run(edges: DataFrame, aCol: String, bCol: String, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16,
      s"label_prop: rounds must be in [1, 16], got $rounds")
    // hash-partitioned ON dst (the per-round join key) once: every
    // round's join then exchanges only the node-count-sized label
    // table, never the edge list (the PageRank `ew` discipline;
    // guide §2.4 "two operations keyed the same way share one exchange")
    val sym = edges
      .select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .union(edges
        .select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist()
    try {
      var labels = sym.select(col("src").as("node"))
        .distinct()
        .withColumn("lab", col("node"))
      var i = 1
      while (i <= rounds) {
        val neigh = sym.join(labels, sym("dst") === labels("node"))
          .groupBy(col("src"), col("lab"))
          .agg(count(lit(1)).as("c"))
        labels = neigh
          .groupBy(col("src"))
          .agg(max(struct(col("c"), (-col("lab")).as("neg"))).as("m"))
          .select(col("src").as("node"), (-col("m.neg")).as("lab"))
        if (i % 2 == 0 || i == rounds) labels = labels.localCheckpoint(true)
        i += 1
      }
      labels
    } finally sym.unpersist()
  }
}
