package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZipEntries

class ZipSpec extends AnyFunSuite {

  /** Real archive via the JDK (deflate by default; stored on request). */
  private def jdkZip(entries: Seq[(String, Array[Byte], Boolean)],
                     comment: Option[String] = None): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    comment.foreach(z.setComment)
    entries.foreach { case (name, data, stored) =>
      val e = new java.util.zip.ZipEntry(name)
      if (stored) {
        e.setMethod(java.util.zip.ZipEntry.STORED)
        e.setSize(data.length.toLong)
        e.setCompressedSize(data.length.toLong)
        val crc = new java.util.zip.CRC32(); crc.update(data)
        e.setCrc(crc.getValue)
      }
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def listNames(b: Array[Byte]): Seq[(String, Int, Long)] = {
    val arr = ZipEntries.list(b)
    assert(arr !== null, "listing refused a well-formed archive")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getInt(1), r.getLong(3))
    }
  }

  test("JDK differential: listing and CRC-verified extraction agree with ZipFile on real archives") {
    val data = Seq(
      ("word/document.xml", ("<doc>" + "hello spark " * 40 + "</doc>").getBytes("UTF-8"), false),
      ("meta/plain.txt", "stored exactly as written".getBytes("UTF-8"), true),
      ("a/b/c.bin", Array.tabulate(1024)(i => (i * 31 % 251).toByte), false))
    val bytes = jdkZip(data)
    val got = listNames(bytes)
    assert(got.map(_._1) === data.map(_._1))
    assert(got.map(_._3) === data.map(_._2.length.toLong), "usize mismatch")
    assert(got.map(_._2) === Seq(8, 0, 8), "methods (deflate, stored, deflate)")
    for ((name, content, _) <- data) {
      val ours = ZipEntries.extract(bytes, name)
      assert(ours !== null, s"refused entry $name")
      assert(ours.toSeq === content.toSeq, s"bytes differ for $name")
    }
    assert(ZipEntries.extract(bytes, "missing.txt") === null)
  }

  test("strict refusals: truncation, comments, encryption flag, ZIP64 markers, corrupt members") {
    val good = jdkZip(Seq(("x.txt", "twelve bytes".getBytes, true)))
    assert(listNames(good).map(_._1) === Seq("x.txt"))
    // torn tail
    assert(ZipEntries.list(good.dropRight(3)) === null)
    // archive comment breaks the EOCD-at-tail contract
    assert(ZipEntries.list(jdkZip(Seq(("x.txt", "b".getBytes, false)),
      comment = Some("hi"))) === null)
    // encryption flag in the central directory
    val enc = good.clone()
    val cd = findCd(enc); enc(cd + 8) = 0x01
    assert(ZipEntries.list(enc) === null)
    // ZIP64 escape in usize
    val z64 = good.clone()
    for (k <- 0 until 4) z64(findCd(z64) + 24 + k) = 0xFF.toByte
    assert(ZipEntries.list(z64) === null)
    // a flipped data byte: listing still fine, extraction refuses on CRC
    val corrupt = good.clone()
    val dataOff = 30 + "x.txt".length // stored entry data right after local header
    corrupt(dataOff) = (corrupt(dataOff) ^ 0x5A).toByte
    assert(listNames(corrupt).nonEmpty)
    assert(ZipEntries.extract(corrupt, "x.txt") === null)
    // an unknown method refuses extraction but lists
    val meth = good.clone()
    meth(findCd(meth) + 10) = 99.toByte
    assert(ZipEntries.extract(meth, "x.txt") === null)
    // garbage is not a zip
    assert(ZipEntries.list("PK but not really a zip".getBytes) === null)
    assert(ZipEntries.list(Array[Byte]()) === null)
  }

  /** Offset of the first central-directory entry (scan for its sig). */
  private def findCd(b: Array[Byte]): Int =
    (0 until b.length - 4).find(i =>
      (b(i) & 0xFF) == 0x50 && (b(i + 1) & 0xFF) == 0x4B &&
        (b(i + 2) & 0xFF) == 0x01 && (b(i + 3) & 0xFF) == 0x02).get

  test("JDK differential: a real ZIP64 archive (>65535 entries) lists identically to ZipFile") {
    // the JDK writer switches to ZIP64 EOCD + locator exactly when the
    // entry count escapes the 16-bit field
    val n = 65600
    val bos = new java.io.ByteArrayOutputStream(8 << 20)
    val z = new java.util.zip.ZipOutputStream(bos)
    (0 until n).foreach { i =>
      z.putNextEntry(new java.util.zip.ZipEntry(s"e$i")); z.closeEntry()
    }
    z.close()
    val bytes = bos.toByteArray
    // confirm the fixture really is ZIP64: EOCD total-entries field escaped
    val eocd = bytes.length - 22
    assert((bytes(eocd + 10) & 0xFF) == 0xFF && (bytes(eocd + 11) & 0xFF) == 0xFF)
    val got = listNames(bytes)
    assert(got.size === n)
    // differential against the JDK's own reader on the same bytes
    val tmp = java.nio.file.Files.createTempFile("graft_zip64", ".zip")
    try {
      java.nio.file.Files.write(tmp, bytes)
      val zf = new java.util.zip.ZipFile(tmp.toFile)
      try {
        val jdk = {
          val e = zf.entries()
          val buf = scala.collection.mutable.ArrayBuffer.empty[String]
          while (e.hasMoreElements) buf += e.nextElement().getName
          buf.toSeq
        }
        assert(got.map(_._1) === jdk)
      } finally zf.close()
    } finally java.nio.file.Files.delete(tmp)
  }

  /** Hand-built single-entry STORED archive with per-entry ZIP64 escapes
    * (usize/csize/offset all 0xFFFFFFFF in the CD, real values in the
    * 0x0001 extra) + ZIP64 EOCD record, locator, and escaped EOCD.
    */
  private def handZip64(data: Array[Byte], name: String,
                        totalDisks: Int = 1, recordGap: Int = 0): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    val nameB = name.getBytes("UTF-8")
    val crc = new java.util.zip.CRC32(); crc.update(data)
    val local = ByteBuffer.allocate(30 + nameB.length).order(ByteOrder.LITTLE_ENDIAN)
    local.putInt(0x04034b50).putShort(45).putShort(0).putShort(0)
      .putShort(0).putShort(0).putInt(crc.getValue.toInt)
      .putInt(data.length).putInt(data.length)
      .putShort(nameB.length.toShort).putShort(0).put(nameB)
    val cdOff = 30 + nameB.length + data.length
    val extra = ByteBuffer.allocate(28).order(ByteOrder.LITTLE_ENDIAN)
    extra.putShort(0x0001).putShort(24)
      .putLong(data.length.toLong).putLong(data.length.toLong).putLong(0L)
    val cd = ByteBuffer.allocate(46 + nameB.length + 28).order(ByteOrder.LITTLE_ENDIAN)
    cd.putInt(0x02014b50).putShort(45).putShort(45).putShort(0).putShort(0)
      .putShort(0).putShort(0).putInt(crc.getValue.toInt)
      .putInt(0xFFFFFFFF).putInt(0xFFFFFFFF) // csize/usize escaped
      .putShort(nameB.length.toShort).putShort(28).putShort(0)
      .putShort(0).putShort(0).putInt(0)
      .putInt(0xFFFFFFFF) // local offset escaped
      .put(nameB).put(extra.array())
    val cdSize = 46 + nameB.length + 28
    val z64Off = cdOff + cdSize + recordGap
    val z64 = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    z64.putInt(0x06064b50).putLong(44L).putShort(45).putShort(45)
      .putInt(0).putInt(0).putLong(1L).putLong(1L)
      .putLong(cdSize.toLong).putLong(cdOff.toLong)
    val loc = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    loc.putInt(0x07064b50).putInt(0).putLong(z64Off.toLong).putInt(totalDisks)
    val eocd = ByteBuffer.allocate(22).order(ByteOrder.LITTLE_ENDIAN)
    eocd.putInt(0x06054b50).putShort(0).putShort(0)
      .putShort(0xFFFF.toShort).putShort(0xFFFF.toShort)
      .putInt(0xFFFFFFFF).putInt(0xFFFFFFFF).putShort(0)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(local.array()); bos.write(data); bos.write(cd.array())
    bos.write(new Array[Byte](recordGap))
    bos.write(z64.array()); bos.write(loc.array()); bos.write(eocd.array())
    bos.toByteArray
  }

  test("per-entry ZIP64 escapes: real values come from the 0x0001 extra; structural lies refuse") {
    val data = "zip64 member contents".getBytes("UTF-8")
    val good = handZip64(data, "big.bin")
    val got = listNames(good)
    assert(got === Seq(("big.bin", 0, data.length.toLong)))
    assert(ZipEntries.extract(good, "big.bin").toSeq === data.toSeq)
    // multi-disk locator refuses
    assert(ZipEntries.list(handZip64(data, "big.bin", totalDisks = 2)) === null)
    // ZIP64 EOCD record not abutting the directory/locator refuses
    assert(ZipEntries.list(handZip64(data, "big.bin", recordGap = 8)) === null)
    // escaped EOCD without a locator refuses (strip locator + zip64 record)
    val noLoc = good.dropRight(98) ++ good.takeRight(22)
    assert(ZipEntries.list(noLoc) === null)
  }

  test("overflow-hostile ZIP64 offsets and sizes quarantine to NULL, never throw") {
    import java.nio.{ByteBuffer, ByteOrder}
    def patch(b: Array[Byte], pos: Int, v: Long): Array[Byte] = {
      val c = b.clone()
      ByteBuffer.wrap(c, pos, 8).order(ByteOrder.LITTLE_ENDIAN).putLong(v)
      c
    }
    val data = "zip64 member contents".getBytes("UTF-8")
    val name = "big.bin"
    val good = handZip64(data, name)
    assert(listNames(good).map(_._1) === Seq(name)) // fixture sanity
    // locator's ZIP64-EOCD offset near Long.MAX: the additive bound
    // (z64 + 56) would wrap negative and pass, then z64.toInt indexes
    // negative — must be a clean NULL, not an ArrayIndexOutOfBounds
    assert(ZipEntries.list(patch(good, good.length - 34, Long.MaxValue - 40L)) === null)
    // the 0x0001 extra's values sit at cd + 46 + nameLen + 4, in
    // APPNOTE order (usize, csize, localOff)
    val extraVals = (30 + name.length + data.length) + 46 + name.length + 4
    // per-entry local-header offset near Long.MAX (same wrap, same crash)
    assert(ZipEntries.list(patch(good, extraVals + 16, Long.MaxValue - 20L)) === null)
    // csize near Long.MAX: the data-fits sum wraps past b.length and the
    // listing would report a structurally absurd size instead of refusing
    assert(ZipEntries.list(patch(good, extraVals + 8, Long.MaxValue - 100L)) === null)
    // usize past the 1 TiB single-blob bound refuses (tar's posture)
    assert(ZipEntries.list(patch(good, extraVals, 1L << 41)) === null)
  }
}
