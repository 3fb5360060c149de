package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zunstd

/** [[Zunstd]] differentials: the library's own writer (round-trip with
  * and without the xxhash64 checksum), the INDEPENDENT `zstd` CLI
  * binary on this host (the GNU-tar-differential pattern), hand-built
  * RFC 8878 stored frames (the gate's column-arithmetic construction),
  * multi-frame/skippable-frame concatenation, and the refusal matrix.
  */
class ZstdSpec extends AnyFunSuite {

  private def compress(data: Array[Byte], checksum: Boolean): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new com.github.luben.zstd.ZstdOutputStream(bos)
    z.setChecksum(checksum)
    z.write(data); z.close()
    bos.toByteArray
  }

  /** RFC 8878 single-segment frame holding one RAW (stored) block —
    * exactly what the x20b gate assembles in column arithmetic:
    * magic 28B52FFD, FHD 0x20 (single-segment, 1-byte FCS, no
    * checksum), content size, block header LE24 = 1 | size<<3, payload.
    */
  private def storedFrame(payload: Array[Byte]): Array[Byte] = {
    require(payload.length <= 255)
    val hdr = 1 | (payload.length << 3)
    Array[Byte](0x28, 0xB5.toByte, 0x2F, 0xFD.toByte, 0x20,
      payload.length.toByte,
      (hdr & 0xFF).toByte, ((hdr >> 8) & 0xFF).toByte, ((hdr >> 16) & 0xFF).toByte) ++
      payload
  }

  test("library round-trip, with and without the frame checksum") {
    val data = ("zstd frame payload " * 400).getBytes("UTF-8")
    for (ck <- Seq(false, true)) {
      val z = compress(data, ck)
      assert(Zunstd.inflate(z).toSeq === data.toSeq, s"checksum=$ck")
    }
  }

  test("independent CLI differential: frames written by the zstd binary inflate exactly") {
    val cli = new java.io.File("/root/miniconda/bin/zstd")
    if (!cli.canExecute) cancel("zstd binary not present on this host")
    val data = Array.tabulate(100000)(i => ((i * 31 + i / 997) % 251).toByte)
    val src = java.nio.file.Files.createTempFile("graft_zstd", ".bin")
    val dst = java.nio.file.Files.createTempFile("graft_zstd", ".zst")
    try {
      java.nio.file.Files.write(src, data)
      for (level <- Seq("-3", "-19")) {
        val p = new ProcessBuilder(cli.getAbsolutePath, level, "-f", "-q",
          "-o", dst.toString, src.toString).inheritIO().start()
        assert(p.waitFor() === 0, s"zstd CLI failed at $level")
        val z = java.nio.file.Files.readAllBytes(dst)
        assert(Zunstd.inflate(z).toSeq === data.toSeq, s"level $level")
      }
    } finally {
      java.nio.file.Files.deleteIfExists(src)
      java.nio.file.Files.deleteIfExists(dst)
    }
  }

  test("hand-built stored frame (the gate's construction) inflates to its payload") {
    val payload = "stored zstd block, column-arithmetic-constructible".getBytes("UTF-8")
    assert(Zunstd.inflate(storedFrame(payload)).toSeq === payload.toSeq)
    assert(Zunstd.inflate(storedFrame(Array.emptyByteArray)).toSeq === Seq.empty)
  }

  test("concatenated frames inflate to concatenated payloads; skippable frames skip") {
    val a = "first frame ".getBytes("UTF-8")
    val b = "second frame".getBytes("UTF-8")
    val both = storedFrame(a) ++ compress(b, checksum = true)
    assert(new String(Zunstd.inflate(both), "UTF-8") === "first frame second frame")
    // skippable frame (magic 0x184D2A50 LE, 4-byte size, opaque body)
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 3, 0, 0, 0, 9, 9, 9)
    assert(new String(Zunstd.inflate(storedFrame(a) ++ skip ++ storedFrame(b)),
      "UTF-8") === "first frame second frame")
  }

  test("refusals: bad magic, torn frame, checksum flip, content-size lie, bomb") {
    val data = ("payload " * 1000).getBytes("UTF-8")
    val good = compress(data, checksum = true)
    assert(Zunstd.inflate(good) !== null)
    // bad magic
    assert(Zunstd.inflate("not a zstd frame".getBytes) === null)
    assert(Zunstd.inflate(Array[Byte](1, 2, 3)) === null)
    // torn: cut mid-frame
    assert(Zunstd.inflate(good.dropRight(7)) === null)
    // checksum flip: the trailing xxhash64 must be verified
    val flipped = good.clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 0x01).toByte
    assert(Zunstd.inflate(flipped) === null)
    // stored frame whose declared content size lies about the block
    val lie = storedFrame("abcdef".getBytes)
    lie(5) = 99 // FCS says 99, the raw block carries 6
    assert(Zunstd.inflate(lie) === null)
    // bomb: 300 MB of zeros compresses to ~10 KB; inflation must refuse
    val bomb = compress(new Array[Byte](300 * 1024 * 1024), checksum = false)
    assert(bomb.length < (1 << 20), "fixture: the bomb really is tiny")
    assert(Zunstd.inflate(bomb) === null)
  }
}
