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
}
