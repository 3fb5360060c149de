package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** The geometric mechanism's noise stream: exact distribution of the
  * trailing-zeros draw, determinism per (key, tag), and the release
  * contract (true counts absent from the output).
  */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("geometric draws follow P(k) = 2^-(k+1) and are deterministic per key+tag") {
    import spark.implicits._
    val keys = (0 until 4096).map(i => s"key-$i").toDF("k")
    val draws = keys.select(Privacy.geometricDraw(col("k"), "|t|1").as("g"))
      .groupBy(col("g")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Geometric(1/2): ~half the mass at 0, a quarter at 1, ...
    assert(draws(0L) > 1800 && draws(0L) < 2300, s"P(0) off: ${draws(0L)}")
    assert(draws(1L) > 850 && draws(1L) < 1200, s"P(1) off: ${draws(1L)}")
    assert(draws.getOrElse(6L, 0L) < 150) // tail decays
    // determinism: the same projection twice is bit-identical
    val again = keys.select(Privacy.geometricDraw(col("k"), "|t|1").as("g"))
      .groupBy(col("g")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === draws)
  }

  test("two-sided noise is centered and the release hides the true count") {
    import spark.implicits._
    val rows = (0 until 2000).flatMap(i => Seq.fill(3)(s"g-${i % 500}")).toDF("k")
    val out = Privacy.dpCounts(rows, Seq("k"))
    assert(out.columns.toSeq === Seq("k", "n_noisy")) // no raw n
    val noisy = out.collect().map(_.getLong(1))
    val noise = noisy.map(_ - 12L) // every group has exactly 12 rows
    assert(math.abs(noise.sum.toDouble / noise.length) < 0.25,
      s"noise mean off: ${noise.sum.toDouble / noise.length}")
    assert(noise.exists(_ > 0) && noise.exists(_ < 0)) // two-sided
    // sticky noise: a second release under the SAME tag is identical...
    val again = Privacy.dpCounts(rows, Seq("k")).collect().map(_.getLong(1))
    assert(again.sorted.toSeq === noisy.sorted.toSeq)
    // ...and a new tag draws fresh noise
    val fresh = Privacy.dpCounts(rows, Seq("k"), tag = "r2")
      .collect().map(_.getLong(1))
    assert(fresh.sorted.toSeq !== noisy.sorted.toSeq)
    // each draw is a tz count, so noise is hard-bounded by construction
    assert(noise.forall(n => n >= -64 && n <= 64))
  }
}
