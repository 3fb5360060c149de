package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Zunxz

/** [[Zunxz]] differentials: the library's own writer (round-trip across
  * check types), the INDEPENDENT `xz` CLI binary on this host (the
  * GNU-tar-differential pattern), hand-built check-none streams holding
  * LZMA2 uncompressed chunks (the gate's column-arithmetic
  * construction — every CRC32 here is zlib's, i.e. Spark's `crc32`),
  * multi-stream concatenation with stream padding, and the refusal
  * matrix including the declared-dictionary memory bomb.
  */
class XzSpec extends AnyFunSuite {

  private def compress(data: Array[Byte], check: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new org.tukaani.xz.XZOutputStream(
      bos, new org.tukaani.xz.LZMA2Options(), check)
    z.write(data); z.close()
    bos.toByteArray
  }

  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(b)
    c.getValue
  }

  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)

  /** Minimal XZ stream, check = None, one block of LZMA2 UNCOMPRESSED
    * chunks — exactly what the m28 gate assembles in column arithmetic:
    * every varint stays single-byte (payload <= 100 B) and every CRC32
    * is the zlib polynomial Spark's `crc32` computes.
    * `dictProp` parameterized so the memory-bomb refusal can declare an
    * absurd dictionary through the same construction.
    */
  private def handBuilt(payload: Array[Byte], dictProp: Int = 0x00): Array[Byte] = {
    require(payload.length <= 100, "single-byte varints only")
    val flags = Array[Byte](0x00, 0x00) // check = None
    val header = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0x00) ++
      flags ++ le32(crc32(flags))
    // block header: size byte 0x02 -> real size 12; flags 0x00 (one
    // filter, no size fields); LZMA2 id 0x21, props size 1, dict prop;
    // 3 padding zeros; CRC32 of the first 8 bytes
    val bh = Array[Byte](0x02, 0x00, 0x21, 0x01, dictProp.toByte, 0, 0, 0)
    val blockHeader = bh ++ le32(crc32(bh))
    // LZMA2: one uncompressed chunk (control 0x01 = dict reset),
    // size-1 BE16, payload, end marker 0x00 — empty payload is just the
    // end marker (a zero-chunk is not representable)
    val lzma2 =
      if (payload.isEmpty) Array[Byte](0x00)
      else Array[Byte](0x01,
        (((payload.length - 1) >> 8) & 0xFF).toByte,
        ((payload.length - 1) & 0xFF).toByte) ++ payload ++ Array[Byte](0x00)
    val unpadded = blockHeader.length + lzma2.length // no check field
    val blockPad = new Array[Byte]((4 - (unpadded % 4)) % 4)
    // index: indicator 0x00, count 1, record (unpadded, uncompressed),
    // pad to 4, CRC32 of everything before the CRC
    val idxBody = Array[Byte](0x00, 0x01, unpadded.toByte, payload.length.toByte)
    val idxPad = new Array[Byte]((4 - (idxBody.length % 4)) % 4)
    val index = idxBody ++ idxPad ++ le32(crc32(idxBody ++ idxPad))
    // footer: CRC32(backward size LE32 ++ flags), backward size, flags, YZ
    val backward = le32(index.length / 4 - 1)
    val footer = le32(crc32(backward ++ flags)) ++ backward ++ flags ++
      Array[Byte]('Y', 'Z')
    header ++ blockHeader ++ lzma2 ++ blockPad ++ index ++ footer
  }

  test("library round-trip across check types (none, CRC32, CRC64, SHA-256)") {
    val data = ("xz stream payload " * 400).getBytes("UTF-8")
    for (check <- Seq(org.tukaani.xz.XZ.CHECK_NONE, org.tukaani.xz.XZ.CHECK_CRC32,
        org.tukaani.xz.XZ.CHECK_CRC64, org.tukaani.xz.XZ.CHECK_SHA256)) {
      assert(Zunxz.inflate(compress(data, check)).toSeq === data.toSeq,
        s"check=$check")
    }
  }

  test("independent CLI differential: streams written by the xz binary inflate exactly") {
    val cli = new java.io.File("/root/miniconda/bin/xz")
    if (!cli.canExecute) cancel("xz binary not present on this host")
    val data = Array.tabulate(100000)(i => ((i * 31 + i / 997) % 251).toByte)
    val src = java.nio.file.Files.createTempFile("graft_xz", ".bin")
    try {
      for (level <- Seq("-1", "-9")) {
        java.nio.file.Files.write(src, data)
        val p = new ProcessBuilder(cli.getAbsolutePath, level, "-f", "-k",
          src.toString).inheritIO().start()
        assert(p.waitFor() === 0, s"xz CLI failed at $level")
        val z = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(src.toString + ".xz"))
        assert(Zunxz.inflate(z).toSeq === data.toSeq, s"level $level")
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(src.toString + ".xz"))
      }
    } finally java.nio.file.Files.deleteIfExists(src)
  }

  test("hand-built check-none stream (the gate's construction) inflates to its payload") {
    val payload = "uncompressed LZMA2 chunk, column-arithmetic-constructible"
      .getBytes("UTF-8")
    assert(Zunxz.inflate(handBuilt(payload)).toSeq === payload.toSeq)
    assert(Zunxz.inflate(handBuilt(Array.emptyByteArray)).toSeq === Seq.empty)
  }

  test("concatenated streams inflate to concatenated payloads; stream padding skips") {
    val a = "first stream ".getBytes("UTF-8")
    val b = "second stream".getBytes("UTF-8")
    val both = handBuilt(a) ++ compress(b, org.tukaani.xz.XZ.CHECK_CRC64)
    assert(new String(Zunxz.inflate(both), "UTF-8") === "first stream second stream")
    // stream padding: 4-byte-aligned zeros between streams (xz(1))
    val padded = handBuilt(a) ++ new Array[Byte](8) ++ handBuilt(b)
    assert(new String(Zunxz.inflate(padded), "UTF-8") === "first stream second stream")
  }

  test("refusals: bad magic, torn, check flip, trailing garbage, bombs (output and dictionary)") {
    val data = ("payload " * 1000).getBytes("UTF-8")
    val good = compress(data, org.tukaani.xz.XZ.CHECK_CRC32)
    assert(Zunxz.inflate(good) !== null)
    // bad magic
    assert(Zunxz.inflate("not an xz stream".getBytes) === null)
    assert(Zunxz.inflate(Array[Byte](1, 2, 3)) === null)
    // torn: cut mid-stream (footer gone) and cut mid-block
    assert(Zunxz.inflate(good.dropRight(7)) === null)
    assert(Zunxz.inflate(good.take(20)) === null)
    // check flip: CRC32-of-payload verified (check bytes sit before the
    // index; flip one by corrupting the compressed payload region is
    // fragile — flip the stored check instead, right after block data)
    val flipped = good.clone()
    flipped(flipped.length - 20) = (flipped(flipped.length - 20) ^ 0x01).toByte
    assert(Zunxz.inflate(flipped) === null)
    // trailing garbage after a complete stream (not stream padding)
    assert(Zunxz.inflate(good ++ Array[Byte](1, 2, 3)) === null)
    // non-4-byte-aligned inter-stream padding is malformed per spec
    assert(Zunxz.inflate(handBuilt("a".getBytes) ++ new Array[Byte](2) ++
      handBuilt("b".getBytes)) === null)
    // output bomb: 300 MB of zeros compresses to ~45 KB; must refuse
    val bomb = compress(new Array[Byte](300 * 1024 * 1024),
      org.tukaani.xz.XZ.CHECK_NONE)
    assert(bomb.length < (1 << 20), "fixture: the bomb really is tiny")
    assert(Zunxz.inflate(bomb) === null)
    // dictionary bomb: same hand-built stream, dict prop 0x27 declares
    // 3 GiB — the decoder must refuse BEFORE allocating (memlimit)
    assert(Zunxz.inflate(handBuilt("tiny".getBytes, dictProp = 0x27)) === null)
  }

  test("column-form xzWrapHex survives payloads past the 2-group varint limit (r18 ADVICE)") {
    // unpadded = 12 + payload + 4 crosses 16384 at payload ~16368; a
    // 2-group varint there emitted odd-length hex and the stream tore
    // silently. Straddle the boundary on both sides, up to the
    // documented 65536-byte single-chunk max.
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions.{col, hex, lit, unhex}
    for (n <- Seq(100, 16367, 16368, 16384, 40000, 65536)) {
      val payload = Array.tabulate(n)(i => ((i * 37 + 11) % 251).toByte)
      val df = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(payload)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p",
            org.apache.spark.sql.types.BinaryType))))
      val z = df.select(unhex(queries.Reference.xzWrapHex(hex(col("p")),
        lit(0L))).as("z")).head.getAs[Array[Byte]]("z")
      assert(Zunxz.inflate(z) != null, s"payload $n: stream refused")
      assert(Zunxz.inflate(z).toSeq === payload.toSeq, s"payload $n")
    }
  }
}
