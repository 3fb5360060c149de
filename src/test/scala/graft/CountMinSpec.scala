package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{CmBuckets, SketchHash}
import graft.operators.CountMin

class CountMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Depth = 4
  private val Width = 64 // narrow on purpose: force real collisions

  private def docs = Seq(
    (0L, "a b c a a"), (1L, "b c d"), (2L, "a a a a"), (3L, "e f g h"),
    (4L, "b b e"), (5L, ""), (6L, "  "), (7L, "c C c"), (8L, "x y z w v"),
    (9L, "a b c d e f g")).toDF("doc_id", "text")

  test("CmBuckets matches the independent scalar recurrence; range-valid") {
    val got = docs.filter(length(trim($"text")) > 0)
      .select(explode(split(lower($"text"), "\\s+")).as("t"))
      .filter($"t" =!= "")
      .select($"t", graft.functions.GraftFunctions.cm_buckets($"t", Depth, Width).as("bk"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val t = r.getString(0)
      val bk = r.getSeq[Int](1)
      assert(bk.length === Depth)
      val h = SketchHash.fnv1a64(t.getBytes("UTF-8"))
      val want = (0 until Depth).map { rr =>
        ((SketchHash.mix(h ^ ((rr + 1).toLong * SketchHash.Golden)) >>> 1) % Width).toInt
      }
      assert(bk === want, s"token $t")
      assert(bk.forall(b => b >= 0 && b < Width))
    }
  }

  test("estimates never underestimate, for EVERY token (not just the probed top-k)") {
    val regs = CountMin.registers(docs, "text", Depth, Width)
    val exact = CountMin.tokens(docs, "text")
      .groupBy($"token").agg(count(lit(1)).as("exact"))
    val est = CountMin.estimates(regs, exact.select($"token"), Depth, Width)
    val joined = est.join(exact, Seq("token")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("exact"),
        s"CMS underestimated ${r.getString(0)}")
    }
    // total register mass per row == total token occurrences (each
    // occurrence lands in exactly one bucket per row)
    val n = CountMin.tokens(docs, "text").count()
    val perRow = regs.groupBy($"r").agg(sum($"cnt").as("m")).collect()
    assert(perRow.length === Depth)
    perRow.foreach(r => assert(r.getAs[Long]("m") === n))
  }

  test("estimates report NEVER-SEEN probe tokens (zero or collision mass, not absence)") {
    val regs = CountMin.registers(docs, "text", Depth, Width)
    val probes = Seq("a", "zebra-never-seen", "qq-also-unseen")
      .toDF("token")
    val got = CountMin.estimates(regs, probes, Depth, Width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every probe appears, seen or not
    assert(got.keySet === Set("a", "zebra-never-seen", "qq-also-unseen"))
    assert(got("a") >= 7L) // true count of "a" in the fixture
    // unseen tokens report >= 0 (0 if no cell collided, else collision
    // mass) — the CMS overestimate bound with true count 0
    assert(got("zebra-never-seen") >= 0L && got("qq-also-unseen") >= 0L)
  }

  test("merge linearity: 3-way disjoint shards union-sum to the single pass") {
    val single = CountMin.registers(docs, "text", Depth, Width)
      .orderBy($"r", $"b").collect().toSeq
    val merged = CountMin.merge(
      CountMin.merge(
        CountMin.registers(docs.filter($"doc_id" % 3 === 0), "text", Depth, Width),
        CountMin.registers(docs.filter($"doc_id" % 3 === 1), "text", Depth, Width)),
      CountMin.registers(docs.filter($"doc_id" % 3 === 2), "text", Depth, Width))
      .orderBy($"r", $"b").collect().toSeq
    assert(merged === single)
  }

  test("registers are partition-invariant and empty-corpus-safe") {
    val a = CountMin.registers(docs, "text", Depth, Width)
      .orderBy($"r", $"b").collect().toSeq
    val b = CountMin.registers(docs.repartition(13), "text", Depth, Width)
      .orderBy($"r", $"b").collect().toSeq
    assert(a === b)
    assert(CountMin.registers(docs.filter($"doc_id" < 0), "text", Depth, Width)
      .count() === 0L)
  }

  test("constructor refuses degenerate depth/width") {
    intercept[IllegalArgumentException] { CmBuckets(null, 0, Width) }
    intercept[IllegalArgumentException] { CmBuckets(null, 65, Width) }
    intercept[IllegalArgumentException] { CmBuckets(null, Depth, 1) }
  }
}
