package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.SketchHash

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators (BASELINE.json north star).
  *
  * The Spark-side design is real and tested — schema, typed Dataset
  * mapPartitions transforms (one decoder instance per partition, the same
  * batch shape a JNI/FFI decoder would want), deterministic outputs.
  * Container HEADER parsing is real since round 6: [[imageMeta]] reads
  * PNG/JPEG/GIF dimensions+channels straight from the public header
  * layouts ([[graft.functions.ImageMeta]], codegen expression — no
  * libraries needed). PAYLOAD decode is real since round 10 for one
  * format per modality: [[graft.functions.AudioPcmStats]] decodes
  * every WAV PCM16 sample (gated as m5), and
  * [[graft.functions.ImagePixelStats]] fully decodes PNG pixels —
  * zlib inflate via the JDK's `java.util.zip.Inflater`, all five
  * scanline filters reconstructed, adler32 verified, zip-bomb guarded
  * (gated as m6); torn blobs quarantine to NULL in both. JPEG (an
  * entropy decoder) and video frame decode remain out: [[FakeCodec]]
  * implements a self-describing synthetic format ("GRFT" magic + kind
  * + dimensions + payload) for those paths, and swapping in a real
  * codec means reimplementing the marked methods of [[FakeCodec]]
  * only; every operator signature and the distribution strategy stay
  * as-is.
  *
  * Scale notes: media blobs are large — operators never shuffle the bytes
  * except where output semantics require new blobs; metadata extraction
  * projects the struct and drops the payload as early as possible so
  * downstream plans shuffle ~100 bytes/row, not megabytes.
  */
object Multimodal {

  /** Container-format detection from magic bytes — the triage step a
    * media pipeline runs before routing blobs to the right parser
    * (`image_meta`/`audio_meta`/`video_meta`). Pure built-in column
    * composition (binary substring equality + one masked-byte check for
    * the MP3 frame sync), fully codegen; recognizes the same containers
    * the typed parsers read: png, gif, jpeg, webp, tiff, wav, avi,
    * mp4, mp3 — and the archive/document families the
    * engine's walks parse: gzip, zstd, zip, tar (ustar at offset 257),
    * warc, pdf, flac, xz, ogg, bzip2, lz4 (all four round 18) — plus
    * two RECOGNIZED-BUT-REFUSED names, 'rar' and '7z' (round 18):
    * both have magic, neither has a decoder here (no public rar
    * decoder exists on this classpath; 7z is out of the decode
    * surface by choice), so triage NAMES them for quarantine routing
    * instead of burying them in 'unknown'.
    * NULL in -> NULL out; anything unrecognized (including truncated
    * magic) -> 'unknown' — triage never throws.
    *
    * BROTLI (named refusal, round 18): a raw brotli stream carries NO
    * magic bytes — RFC 7932 frames start directly with a window-size
    * bitfield, so `Content-Encoding: br` payloads are STRUCTURALLY
    * undetectable by magic triage and land in 'unknown' here by
    * construction (spec-pinned). The engine does not decode brotli:
    * no public decoder ships on the Spark runtime classpath and this
    * build adds no dependencies, so the honest posture is this
    * documented refusal rather than a silent absence — a crawl
    * pipeline must inflate `br` bodies before ingest (or store the
    * declared encoding beside the blob) because no content-sniffing
    * stage can recover it downstream.
    */
  def media_format(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def ascii(s: String) = lit(s.getBytes("ISO-8859-1"))
    val b1 = conv(hex(substring(c, 1, 1)), 16, 10).cast("int")
    val b2 = conv(hex(substring(c, 2, 1)), 16, 10).cast("int")
    val b4 = conv(hex(substring(c, 4, 1)), 16, 10).cast("int")
    when(c.isNull, lit(null).cast("string"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte](0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)), lit("png"))
      .when(substring(c, 1, 4) === ascii("GIF8"), lit("gif"))
      .when(substring(c, 1, 3) ===
        lit(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)), lit("jpeg"))
      .when(substring(c, 1, 4) === ascii("RIFF") &&
        substring(c, 9, 4) === ascii("WAVE"), lit("wav"))
      .when(substring(c, 1, 4) === ascii("RIFF") &&
        substring(c, 9, 4) === ascii("AVI "), lit("avi"))
      .when(substring(c, 1, 4) === ascii("RIFF") &&
        substring(c, 9, 4) === ascii("WEBP"), lit("webp"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte]('I'.toByte, 'I'.toByte, 0x2a.toByte, 0x00.toByte)), lit("tiff"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte]('M'.toByte, 'M'.toByte, 0x00.toByte, 0x2a.toByte)), lit("tiff"))
      .when(substring(c, 5, 4) === ascii("ftyp"), lit("mp4"))
      .when(substring(c, 1, 3) === ascii("ID3"), lit("mp3"))
      .when(substring(c, 1, 2) ===
        lit(Array[Byte](0x1F.toByte, 0x8B.toByte)), lit("gzip"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte](0x28.toByte, 0xB5.toByte, 0x2F.toByte, 0xFD.toByte)), lit("zstd"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte]('P'.toByte, 'K'.toByte, 0x03.toByte, 0x04.toByte)), lit("zip"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte]('P'.toByte, 'K'.toByte, 0x05.toByte, 0x06.toByte)), lit("zip"))
      .when(substring(c, 1, 6) ===
        lit(Array[Byte](0xFD.toByte, '7'.toByte, 'z'.toByte,
          'X'.toByte, 'Z'.toByte, 0x00.toByte)), lit("xz"))
      .when(substring(c, 1, 4) === ascii("OggS"), lit("ogg"))
      .when(substring(c, 1, 3) === ascii("BZh") &&
        b4 >= 0x31 && b4 <= 0x39, lit("bzip2"))
      .when(substring(c, 1, 4) ===
        lit(Array[Byte](0x04.toByte, 0x22.toByte, 0x4D.toByte, 0x18.toByte)),
        lit("lz4"))
      // recognized-but-refused: NAMED at triage (unlike brotli these
      // have magic), not decoded — no public decoder for rar ships
      // anywhere, and 7z is out of the decode surface by choice; a
      // pipeline routes them to quarantine WITH the format named
      // rather than burying them in 'unknown'
      .when(substring(c, 1, 6) ===
        lit(Array[Byte]('R'.toByte, 'a'.toByte, 'r'.toByte, '!'.toByte,
          0x1A.toByte, 0x07.toByte)), lit("rar")) // v4 ..00 and v5 ..01 00 share this prefix
      .when(substring(c, 1, 6) ===
        lit(Array[Byte](0x37.toByte, 0x7A.toByte, 0xBC.toByte,
          0xAF.toByte, 0x27.toByte, 0x1C.toByte)), lit("7z"))
      .when(substring(c, 258, 5) === ascii("ustar"), lit("tar"))
      .when(substring(c, 1, 5) === ascii("WARC/"), lit("warc"))
      .when(substring(c, 1, 5) === ascii("%PDF-"), lit("pdf"))
      .when(substring(c, 1, 4) === ascii("fLaC"), lit("flac"))
      .when(b1 === 255 && b2.bitwiseAND(lit(224)) === 224, lit("mp3"))
      .otherwise(lit("unknown"))
  }

  /** Container-agnostic inflation: triage the magic, route to the
    * matching decoder — gzip, zstd, xz, bzip2, lz4 (the engine's whole
    * decode surface). Real mirrors ship MIXED encodings for the same
    * corpus (a gzip era, a zstd migration, an xz long tail), and the
    * pipeline downstream of inflation shouldn't care. NULL for NULL,
    * for the named refusals (rar/7z/brotli-as-unknown), for plain
    * 'unknown', and for any blob its own decoder refuses (torn/CRC/
    * bomb) — one quarantine contract across all five codecs. CASE
    * branches evaluate lazily per row, so exactly one decoder runs.
    */
  def inflate_any(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    inflate_by(media_format(c), c)

  /** Routing half of [[inflate_any]], keyed on an ALREADY-COMPUTED
    * format column. Callers that can stage `media_format` as a named
    * column should use this form: the inline form repeats the ~19-arm
    * triage CASE in all five branch conditions, and conditionally-
    * evaluated branches are excluded from codegen subexpression
    * elimination — a future interpreted fallback would re-run triage
    * per branch, and the duplicated tree bulks generated code toward
    * the janino 64 KB method ceiling (r18 ADVICE). Here `fmt` appears
    * once in the plan and the CASE stays five cheap string equalities.
    */
  def inflate_by(fmt: org.apache.spark.sql.Column,
      c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import graft.functions.GraftFunctions.{gunzip, zunbz2, zunlz4, zunstd, zunxz}
    when(fmt === "gzip", gunzip(c))
      .when(fmt === "zstd", zunstd(c))
      .when(fmt === "xz", zunxz(c))
      .when(fmt === "bzip2", zunbz2(c))
      .when(fmt === "lz4", zunlz4(c))
      .otherwise(lit(null).cast("binary"))
  }

  case class MediaMeta(kind: String, width: Int, height: Int, nFrames: Int)
  case class MediaRow(media_id: Long, bytes: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, width: Int, height: Int,
      nFrames: Int, payload_size: Int)
  case class FrameRow(media_id: Long, frame_idx: Int, bytes: Array[Byte])
  case class FeatureRow(media_id: Long, features: Array[Float])

  /** STUB codec for the synthetic GRFT container format:
    * magic "GRFT" (4B) | kind (1B: 0=image,1=audio,2=video) |
    * width (4B BE) | height (4B BE) | nFrames (4B BE) | payload.
    */
  object FakeCodec {
    val Magic: Array[Byte] = "GRFT".getBytes("US-ASCII")
    val HeaderLen: Int = 4 + 1 + 4 + 4 + 4
    private val kinds = Array("image", "audio", "video")

    def encode(kind: String, width: Int, height: Int, nFrames: Int,
               payload: Array[Byte]): Array[Byte] = {
      val buf = ByteBuffer.allocate(HeaderLen + payload.length)
      buf.put(Magic).put(kinds.indexOf(kind).toByte)
        .putInt(width).putInt(height).putInt(nFrames).put(payload)
      buf.array()
    }

    /** STUB decode — a real implementation would parse JPEG/WAV/MP4. */
    def decodeMeta(bytes: Array[Byte]): MediaMeta = {
      require(bytes.length >= HeaderLen &&
        bytes.startsWith(Magic), "not a GRFT blob")
      val buf = ByteBuffer.wrap(bytes, 4, HeaderLen - 4)
      MediaMeta(kinds(buf.get().toInt), buf.getInt, buf.getInt, buf.getInt)
    }

    def payload(bytes: Array[Byte]): Array[Byte] = bytes.drop(HeaderLen)

    /** STUB resize — deterministic placeholder for pixel resampling:
      * re-headers with the new dimensions and subsamples the payload
      * proportionally. A real implementation would do bilinear/Lanczos.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val m = decodeMeta(bytes)
      val p = payload(bytes)
      val outLen = math.max(1, (p.length.toLong * w * h /
        math.max(1L, m.width.toLong * m.height)).toInt)
      val out = Array.tabulate(outLen)(i => p((i.toLong * p.length / outLen).toInt))
      encode(m.kind, w, h, m.nFrames, out)
    }

    /** STUB feature extraction — deterministic placeholder for an
      * embedding model: hashes payload chunks into a unit-norm vector.
      */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val p = payload(bytes)
      val raw = Array.tabulate(dim) { i =>
        val h = SketchHash.mix(SketchHash.fnv1a64(p) + SketchHash.Golden * (i + 1))
        (h.toDouble / Long.MaxValue).toFloat
      }
      val norm = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
      if (norm == 0f) raw else raw.map(_ / norm)
    }
  }

  /** REAL-container metadata extraction: PNG/JPEG/GIF headers parsed by
    * the [[graft.functions.ImageMeta]] native expression (no stub — the
    * container formats' own header layouts, public specs). Unlike
    * [[decodeMeta]]'s typed mapPartitions, this is a codegen'd column
    * expression, so it stays inside whole-stage codegen and the payload
    * column drops out of the projection immediately — the 100 TB shape
    * for "scan a media lake, keep 16 bytes per blob". Unknown containers
    * yield NULL metadata (quarantine-friendly).
    */
  def imageMeta(media: DataFrame, idCol: String, bytesCol: String): DataFrame =
    media.select(col(idCol),
      graft.functions.GraftFunctions.image_meta(col(bytesCol)).as("meta"),
      length(col(bytesCol)).as("payload_size"))

  /** Decode metadata and DROP the payload bytes — do this first so later
    * stages shuffle small rows.
    */
  def decodeMeta(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition scope: a real codec would init its native context here
      it.map { r =>
        val m = FakeCodec.decodeMeta(r.bytes)
        DecodedRow(r.media_id, m.kind, m.width, m.height, m.nFrames,
          r.bytes.length - FakeCodec.HeaderLen)
      }
    }
  }

  /** Per-blob embedding vector (batch shape: one codec per partition). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => FeatureRow(r.media_id, FakeCodec.features(r.bytes, dim))))
  }

  /** Resize images/frames to target dimensions (new blobs out). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(r => MediaRow(r.media_id, FakeCodec.resize(r.bytes, w, h))))
  }

  /** Sample up to `n` evenly-spaced frames from each video blob
    * (non-videos pass through as frame 0). Emits one row per frame —
    * a flatMap, no shuffle.
    */
  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val m = FakeCodec.decodeMeta(r.bytes)
      if (m.kind != "video" || m.nFrames <= 1) {
        Seq(FrameRow(r.media_id, 0, r.bytes))
      } else {
        val take = math.min(n, m.nFrames)
        val p = FakeCodec.payload(r.bytes)
        val perFrame = math.max(1, p.length / m.nFrames)
        (0 until take).map { j =>
          val frameIdx = (j.toLong * m.nFrames / take).toInt
          val start = math.min(frameIdx * perFrame, math.max(0, p.length - perFrame))
          val frame = p.slice(start, start + perFrame)
          FrameRow(r.media_id, frameIdx,
            FakeCodec.encode("image", m.width, m.height, 1, frame))
        }
      }
    }
  }

  /** Media-level near-dup: features -> cosine pairs (composes with Knn). */
  def nearDupMedia(media: Dataset[MediaRow], dim: Int, minSim: Double): DataFrame =
    Knn.nearDupPairs(extractFeatures(media, dim).toDF("id", "emb"), "id", "emb", minSim)
}
