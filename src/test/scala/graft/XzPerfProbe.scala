package graft

/** Throwaway micro-probe for Zunxz per-blob cost (not a test). */
object XzPerfProbe {
  private def crc32(b: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32(); c.update(b); c.getValue
  }
  private def le32(v: Long): Array[Byte] =
    Array.tabulate(4)(i => ((v >> (8 * i)) & 0xFF).toByte)
  private def varint(v: Long): Array[Byte] =
    if (v < 128) Array(v.toByte)
    else Array(((v & 0x7F) | 0x80).toByte, (v >> 7).toByte)

  /** check-none, one LZMA2 uncompressed chunk — the gate's profile. */
  private def handBuilt(payload: Array[Byte]): Array[Byte] = {
    val flags = Array[Byte](0x00, 0x00)
    val header = Array[Byte](0xFD.toByte, '7', 'z', 'X', 'Z', 0x00) ++
      flags ++ le32(crc32(flags))
    val bh = Array[Byte](0x02, 0x00, 0x21, 0x01, 0x04, 0, 0, 0)
    val blockHeader = bh ++ le32(crc32(bh))
    val lzma2 = Array[Byte](0x01,
      (((payload.length - 1) >> 8) & 0xFF).toByte,
      ((payload.length - 1) & 0xFF).toByte) ++ payload ++ Array[Byte](0x00)
    val unpadded = blockHeader.length + lzma2.length
    val blockPad = new Array[Byte]((4 - (unpadded % 4)) % 4)
    val idxBody = Array[Byte](0x00, 0x01) ++ varint(unpadded) ++ varint(payload.length)
    val idxPad = new Array[Byte]((4 - (idxBody.length % 4)) % 4)
    val index = idxBody ++ idxPad ++ le32(crc32(idxBody ++ idxPad))
    val backward = le32(index.length / 4 - 1)
    val footer = le32(crc32(backward ++ flags)) ++ backward ++ flags ++
      Array[Byte]('Y', 'Z')
    header ++ blockHeader ++ lzma2 ++ blockPad ++ index ++ footer
  }

  def main(args: Array[String]): Unit = {
    for (size <- Seq(35, 5120)) {
      val payload = new Array[Byte](size)
      java.util.Arrays.fill(payload, 'a'.toByte)
      val blob = handBuilt(payload)
      require(graft.functions.Zunxz.inflate(blob) != null, "probe stream refused")
      val torn = blob.clone(); torn(14) = (torn(14) ^ 1).toByte // bh crc bump
      require(graft.functions.Zunxz.inflate(torn) == null, "torn not refused")
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        var i = 0
        while (i < 10000) { graft.functions.Zunxz.inflate(blob); i += 1 }
        val dt = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        i = 0
        while (i < 10000) { graft.functions.Zunxz.inflate(torn); i += 1 }
        val dtT = (System.nanoTime() - t1) / 1e9
        println(f"size $size round $round: ok ${dt / 10000 * 1e6}%.1f us/blob, torn ${dtT / 10000 * 1e6}%.1f us/blob")
      }
    }
  }
}
