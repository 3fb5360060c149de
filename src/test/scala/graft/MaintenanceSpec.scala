package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IncrementalAgg, SnapshotDiff}

/** IncrementalAgg's monoid contract and SnapshotDiff's classification on
  * hand-built fixtures (NULL transitions included — the cases a naive
  * `=` comparison silently misses).
  */
class MaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("incremental state merge equals full recompute, any batch split") {
    import spark.implicits._
    val rows = Seq(("a", 1.0), ("a", 2.5), ("a", -4.0), ("b", 7.25),
      ("b", 0.0), ("a", 9.75), ("b", -1.5))
    val full = IncrementalAgg.present(
      IncrementalAgg.state(rows.toDF("k", "v"), Seq("k"), col("v")), Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    // every contiguous split point must produce identical state
    for (cut <- 1 until rows.size) {
      val a = IncrementalAgg.state(rows.take(cut).toDF("k", "v"), Seq("k"), col("v"))
      val b = IncrementalAgg.state(rows.drop(cut).toDF("k", "v"), Seq("k"), col("v"))
      val merged = IncrementalAgg.present(
        IncrementalAgg.merge(a, b, Seq("k")), Seq("k"))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
        .toMap
      assert(merged === full, s"split at $cut diverged")
    }
    assert(full("a") === ((4L, 9.25, 2.3125, -4.0, 9.75)))
  }

  test("incremental merge is split-shape-invariant: random 3-way partitions (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(60)((s"k${rnd.nextInt(5)}", rnd.nextInt(10000) / 100.0))
    val full = IncrementalAgg.present(
      IncrementalAgg.state(rows.toDF("k", "v"), Seq("k"), col("v")), Seq("k"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    for (_ <- 1 to 5) {
      // random assignment into three batches, then a two-step fold —
      // exercises merge(merge(a, b), c) with group sets that differ
      val tag = rows.map(_ => rnd.nextInt(3))
      val parts = (0 to 2).map(i =>
        rows.zip(tag).collect { case (r, t) if t == i => r }.toDF("k", "v"))
      val states = parts.map(p => IncrementalAgg.state(p, Seq("k"), col("v")))
      val folded = states.reduce(IncrementalAgg.merge(_, _, Seq("k")))
      val got = IncrementalAgg.present(folded, Seq("k"))
        .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
      assert(got === full)
    }
  }

  test("snapshot diff involution: swapping snapshots maps insert<->delete, fixes update/unchanged") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val old = (1 to 40).collect { case k if rnd.nextBoolean() || k < 5 =>
      (k.toLong, rnd.nextInt(3).toDouble) }.toDF("k", "v")
    val now = (1 to 40).collect { case k if rnd.nextBoolean() || k > 35 =>
      (k.toLong, rnd.nextInt(3).toDouble) }.toDF("k", "v")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val fwd = m(SnapshotDiff.diff(old, now, Seq("k"), Seq("v")))
    val bwd = m(SnapshotDiff.diff(now, old, Seq("k"), Seq("v")))
    assert(fwd.keySet === bwd.keySet)
    for ((k, c) <- fwd) {
      val expected = c match {
        case "insert" => "delete"
        case "delete" => "insert"
        case other => other
      }
      assert(bwd(k) === expected, s"key $k: $c forward, ${bwd(k)} backward")
    }
    // diff of a snapshot with itself is all-unchanged
    val self = m(SnapshotDiff.diff(old, old, Seq("k"), Seq("v")))
    assert(self.values.toSet === Set("unchanged"))
  }

  test("snapshot diff: insert/delete/update/unchanged incl. NULL transitions") {
    import spark.implicits._
    val old = Seq((1L, Some(10.0), "A"), (2L, Some(20.0), "B"),
      (3L, None: Option[Double], "C"), (4L, Some(40.0), "D"))
      .toDF("k", "price", "status")
    val now = Seq((1L, Some(10.0), "A"), // unchanged
      (2L, Some(99.0), "B"), // price update
      (3L, Some(30.0), "C"), // NULL -> value is an update
      (5L, Some(50.0), "E")) // insert; 4 deleted
      .toDF("k", "price", "status")
    val got = SnapshotDiff.diff(old, now, Seq("k"), Seq("price", "status"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "unchanged", 2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
  }
}
