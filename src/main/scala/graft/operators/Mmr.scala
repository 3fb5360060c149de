package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * from a relevance-ordered candidate pool, greedily pick the item
  * maximizing `2*rel(d) - max_{s in S} sim(d, s)` — relevance traded
  * against redundancy with what's already selected (lambda = 2/3 in the
  * classic parameterization, fixed here so the score stays integral).
  *
  * Determinism contract: rel and sim are INTEGER dot products of
  * floor-quantized embedding components (component -> floor(x*1000) as
  * BIGINT), so the greedy argmax compares exact integers — no last-ulp
  * float divergence can flip a pick between engines (the v1 oracle-note
  * problem, solved by quantizing *inputs* instead of outputs). Ties
  * break on id ascending. The first pick's score is 2*rel (max over the
  * empty set reads as 0).
  *
  * Scale posture: the corpus-sized work is ONE scan computing the
  * quantized relevance dot (codegen zip_with/aggregate, no shuffle) and
  * a TakeOrderedAndProject pool cut; the greedy loop is O(k * n * dim)
  * driver arithmetic on a pool bounded by `poolSize` (<= 4096 enforced)
  * — the same bounded-collect posture as Knn.topK's id handoff. MMR is
  * inherently sequential in k (each pick conditions the next); keeping
  * the pool small is the algorithm's own contract, not a shortcut.
  */
object Mmr {

  val QuantScale = 1000.0

  /** Quantize a float vector column to BIGINT components (double math —
    * float widens exactly, so both engines floor identical doubles). */
  def quantize(vec: Column): Column =
    transform(vec, e => floor(e.cast("double") * lit(QuantScale)).cast("long"))

  /** Integer dot product of two quantized BIGINT array columns. */
  def dotQ(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Top-`k` MMR selection from the `poolSize` most relevant candidates.
    * Output: (step, id, score) in selection order.
    */
  def rerank(emb: DataFrame, idCol: Column, vecCol: Column,
             probe: Array[Float], poolSize: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= poolSize, s"need 1 <= k <= poolSize, got k=$k pool=$poolSize")
    require(poolSize <= 4096, s"poolSize $poolSize exceeds the bounded-collect cap")
    val spark = emb.sparkSession
    val probeQ = probe.map(x => math.floor(x.toDouble * QuantScale).toLong)
    val pool = emb
      .select(idCol.as("id"), quantize(vecCol).as("q"))
      .withColumn("rel", dotQ(col("q"), typedlit(probeQ)))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(poolSize)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getSeq[Long](1).toArray))
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val remaining = scala.collection.mutable.ArrayBuffer(pool: _*)
    while (selected.size < k && remaining.nonEmpty) {
      val step = selected.size + 1L
      val best = remaining.map { case (id, rel, q) =>
        val maxSim =
          if (selected.isEmpty) 0L
          else selected.map { case (sid, _, _) =>
            val sq = pool.find(_._1 == sid).get._3
            var s = 0L; var i = 0
            while (i < q.length) { s += q(i) * sq(i); i += 1 }
            s
          }.max
        (2L * rel - maxSim, id, rel, q)
      }.maxBy { case (score, id, _, _) => (score, -id) }
      selected += ((best._2, best._1, step))
      remaining --= remaining.filter(_._1 == best._2)
    }
    import spark.implicits._
    selected.toSeq.map { case (id, score, step) => (step, id, score) }
      .toDF("step", "vec_id", "score")
  }
}
