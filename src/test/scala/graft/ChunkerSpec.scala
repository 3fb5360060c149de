package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunker, Sampling}

class ChunkerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def chunks(text: String, size: Int, overlap: Int) =
    Chunker.fixedChunks(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size, overlap)
      .orderBy($"chunk_idx")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))

  test("hand-computed windows: coverage, overlap, short tail, single chunk, empty") {
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4, stride 2: starts 0,2,4,6 (start < max(10-2,1)=8); last full
    assert(chunks(ten, 4, 2).toSeq ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 4L)))
    // 9 tokens, size 4, stride 2: starts 0,2,4,6 — tail chunk short (3)
    val nine = (1 to 9).map(i => s"w$i").mkString(" ")
    assert(chunks(nine, 4, 2).toSeq ===
      Seq((0L, 0L, 4L), (1L, 2L, 4L), (2L, 4L, 4L), (3L, 6L, 3L)))
    // n <= size: exactly one chunk
    assert(chunks("a b c", 10, 3).toSeq === Seq((0L, 0L, 3L)))
    // empty / whitespace-only: no chunks
    assert(chunks("", 4, 1).isEmpty)
    assert(chunks("   ", 4, 1).isEmpty)
  }

  test("fingerprints identify identical windows and separate different ones") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "x y z q r t"))
      .toDF("doc_id", "text")
    val fps = Chunker.fixedChunks(df, "doc_id", "text", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(fps((1L, 0L)) === fps((2L, 0L)))
    assert(fps((1L, 0L)) !== fps((3L, 0L)))
    // overlapping chunks of the same doc differ (different windows)
    assert(fps((1L, 0L)) !== fps((1L, 1L)))
  }

  test("refuses degenerate size/overlap") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunker.fixedChunks(df, "doc_id", "text", 0, 0)
    }
    intercept[IllegalArgumentException] {
      Chunker.fixedChunks(df, "doc_id", "text", 4, 4)
    }
  }

  test("epochShuffle: per-epoch permutation, epochs differ, partition-invariant") {
    val docs = (1L to 200L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val out = Sampling.epochShuffle(docs, "doc_id", epochs = 2, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // every epoch holds every id exactly once
    for (e <- 0L to 1L) {
      val ids = out.filter(_._1 == e).map(_._4)
      assert(ids.sorted.toSeq === (1L to 200L))
    }
    // positions dense within each (epoch, shard)
    for (((e, sh), rows) <- out.groupBy(r => (r._1, r._2)))
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length),
        s"positions not dense in epoch $e shard $sh")
    // the two epochs order differently (md5 re-keys per epoch)
    val o0 = out.filter(_._1 == 0L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    val o1 = out.filter(_._1 == 1L).sortBy(r => (r._2, r._3)).map(_._4).toSeq
    assert(o0 !== o1)
    // pure function of (epoch, id): repartitioning changes nothing
    val again = Sampling.epochShuffle(docs.repartition(13), "doc_id", 2, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(again.sorted.toSeq === out.sorted.toSeq)
  }

  test("epochShuffle: shards above 255 are reachable (16-bit shard key)") {
    // with the old 2-hex-char (8-bit) shard key, shards 256..4095 were
    // permanently empty; 16 bits must populate the high range
    val docs = (1L to 4000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val shards = Sampling.epochShuffle(docs, "doc_id", epochs = 1, shards = 1024)
      .select("shard").distinct().collect().map(_.getLong(0))
    assert(shards.exists(_ >= 256L),
      "no shard >= 256 occupied: shard key is not using 16 bits")
    assert(shards.forall(s => s >= 0L && s < 1024L))
  }
}
