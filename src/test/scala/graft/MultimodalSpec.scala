package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.operators.Multimodal.{FakeCodec, MediaRow}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def blob(kind: String, w: Int, h: Int, frames: Int, seed: Byte) =
    FakeCodec.encode(kind, w, h, frames,
      Array.tabulate(w * h * math.max(1, frames))(i => ((i + seed) % 251).toByte))

  private def mediaDs = {
    import spark.implicits._
    Seq(
      MediaRow(1L, blob("image", 64, 48, 1, 1)),
      MediaRow(2L, blob("audio", 16000, 1, 1, 2)),
      MediaRow(3L, blob("video", 32, 24, 10, 3)),
      MediaRow(4L, blob("image", 64, 48, 1, 1))) // exact dup of 1
      .toDS()
  }

  test("decodeMeta extracts typed metadata and payload size") {
    val rows = Multimodal.decodeMeta(mediaDs).collect().sortBy(_.media_id)
    assert(rows.map(r => (r.media_id, r.kind, r.width, r.height, r.nFrames)) ===
      Array((1L, "image", 64, 48, 1), (2L, "audio", 16000, 1, 1),
        (3L, "video", 32, 24, 10), (4L, "image", 64, 48, 1)))
    assert(rows.forall(_.payload_size > 0))
  }

  test("feature extraction is deterministic and unit-norm; dup blobs -> identical vectors") {
    val f1 = Multimodal.extractFeatures(mediaDs, 16).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(mediaDs, 16).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq) === f2.map(_.features.toSeq))
    assert(f1(0).features.toSeq === f1(3).features.toSeq) // ids 1 and 4 are dups
    val norm = math.sqrt(f1.head.features.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("resize rewrites dimensions and scales payload") {
    val out = Multimodal.resize(mediaDs, 32, 24).collect().sortBy(_.media_id)
    val metas = out.map(r => FakeCodec.decodeMeta(r.bytes))
    assert(metas.forall(m => m.width == 32 && m.height == 24))
    // image payload shrinks ~4x for the 64x48 -> 32x24 case
    val origLen = 64 * 48
    val newLen = FakeCodec.payload(out.head.bytes).length
    assert(newLen === origLen / 4)
  }

  test("frame sampling explodes videos into evenly-spaced image frames, passes others through") {
    val frames = Multimodal.sampleFrames(mediaDs, 4).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(1L).length === 1 && byId(2L).length === 1)
    assert(byId(3L).length === 4)
    assert(byId(3L).map(_.frame_idx).sorted === Array(0, 2, 5, 7))
    byId(3L).foreach(f => assert(FakeCodec.decodeMeta(f.bytes).kind === "image"))
  }

  test("media near-dup via features + cosine pairs finds the planted dup only") {
    val pairs = Multimodal.nearDupMedia(mediaDs, 32, minSim = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs === Array((1L, 4L)))
  }
}
