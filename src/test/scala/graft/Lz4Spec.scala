package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zunlz4

/** [[Zunlz4]] differentials: the library's own frame writer, the
  * INDEPENDENT `lz4` CLI binary on this host, hand-built frames of
  * uncompressed blocks (the m30 gate's column-arithmetic
  * construction — the descriptor HC byte is a constant for a fixed
  * FLG/BD pair), concatenation with skippable frames, and the
  * refusal matrix.
  */
class Lz4Spec extends AnyFunSuite {

  private def compress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)

  /** Frame of ONE uncompressed block: FLG 0x60 (v1, independent, no
    * checksums/size), BD 0x40 (64 KB max), HC = (xxh32(FLG BD)>>8)&FF.
    */
  private def handBuilt(payload: Array[Byte]): Array[Byte] = {
    require(payload.length > 0 && payload.length <= 65536)
    val flgBd = Array[Byte](0x60, 0x40)
    val hc = ((net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
      .hash(flgBd, 0, 2, 0) >> 8) & 0xFF).toByte
    Array[Byte](0x04, 0x22, 0x4D, 0x18) ++ flgBd ++ Array(hc) ++
      le32(0x80000000L | payload.length) ++ payload ++ le32(0) // EndMark
  }

  test("library frame round-trip") {
    val data = ("lz4 frame payload " * 400).getBytes("UTF-8")
    assert(Zunlz4.inflate(compress(data)).toSeq === data.toSeq)
  }

  test("independent CLI differential: frames written by the lz4 binary inflate exactly") {
    val cli = new java.io.File("/root/miniconda/bin/lz4")
    if (!cli.canExecute) cancel("lz4 binary not present on this host")
    val data = Array.tabulate(100000)(i => ((i * 31 + i / 997) % 251).toByte)
    val src = java.nio.file.Files.createTempFile("graft_lz4", ".bin")
    val dst = java.nio.file.Files.createTempFile("graft_lz4", ".lz4")
    try {
      java.nio.file.Files.write(src, data)
      for (level <- Seq("-1", "-9")) {
        val p = new ProcessBuilder(cli.getAbsolutePath, level, "-f", "-q",
          src.toString, dst.toString).inheritIO().start()
        assert(p.waitFor() === 0, s"lz4 CLI failed at $level")
        val z = java.nio.file.Files.readAllBytes(dst)
        assert(Zunlz4.inflate(z).toSeq === data.toSeq, s"level $level")
      }
    } finally {
      java.nio.file.Files.deleteIfExists(src)
      java.nio.file.Files.deleteIfExists(dst)
    }
  }

  test("hand-built uncompressed-block frame (the gate's construction) inflates") {
    val payload = "uncompressed LZ4 block, column-arithmetic-constructible"
      .getBytes("UTF-8")
    assert(Zunlz4.inflate(handBuilt(payload)).toSeq === payload.toSeq)
  }

  test("concatenated frames inflate to concatenated payloads; skippable frames skip") {
    val a = "first frame ".getBytes("UTF-8")
    val b = "second frame".getBytes("UTF-8")
    val both = handBuilt(a) ++ compress(b)
    assert(new String(Zunlz4.inflate(both), "UTF-8") === "first frame second frame")
    val skip = Array[Byte](0x50, 0x2A, 0x4D, 0x18, 3, 0, 0, 0, 9, 9, 9)
    assert(new String(Zunlz4.inflate(handBuilt(a) ++ skip ++ handBuilt(b)),
      "UTF-8") === "first frame second frame")
  }

  test("refusals: bad magic, HC flip, torn, trailing garbage, bomb") {
    val data = ("payload " * 1000).getBytes("UTF-8")
    val good = compress(data)
    assert(Zunlz4.inflate(good) !== null)
    assert(Zunlz4.inflate("not an lz4 frame".getBytes) === null)
    assert(Zunlz4.inflate(Array[Byte](1, 2, 3)) === null)
    // header-checksum byte flip refuses the whole blob
    val hcFlip = handBuilt("abc".getBytes)
    hcFlip(6) = (hcFlip(6) ^ 0x01).toByte
    assert(Zunlz4.inflate(hcFlip) === null)
    // torn: cut into the last block / cut the EndMark
    assert(Zunlz4.inflate(good.dropRight(5)) === null)
    assert(Zunlz4.inflate(handBuilt("abcdef".getBytes).dropRight(3)) === null)
    // trailing garbage after a complete frame
    assert(Zunlz4.inflate(good ++ Array[Byte](9, 9, 9)) === null)
    // bomb: 300 MB of zeros compresses to ~1.2 MB of frames; must refuse
    val bomb = compress(new Array[Byte](300 * 1024 * 1024))
    assert(bomb.length < (16 << 20), "fixture: the bomb is small")
    assert(Zunlz4.inflate(bomb) === null)
  }

  test("malformed COMPRESSED block behind a valid header quarantines, never throws (r18 ADVICE)") {
    // a block whose size word lacks the high bit claims LZ4-compressed
    // data; garbage there makes lz4-java throw LZ4Exception (a
    // RuntimeException, not IOException) — it must land in the same
    // whole-blob NULL as every other refusal
    val flgBd = Array[Byte](0x60, 0x40)
    val hc = ((net.jpountz.xxhash.XXHashFactory.fastestInstance().hash32()
      .hash(flgBd, 0, 2, 0) >> 8) & 0xFF).toByte
    val garbage = Array.tabulate(32)(i => (0xF0 | (i % 7)).toByte)
    val blob = Array[Byte](0x04, 0x22, 0x4D, 0x18) ++ flgBd ++ Array(hc) ++
      le32(garbage.length.toLong) ++ garbage ++ le32(0) // compressed flag: high bit CLEAR
    assert(Zunlz4.inflate(blob) === null) // and no exception escapes
  }
}
