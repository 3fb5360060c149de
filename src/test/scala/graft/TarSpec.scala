package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Gunzip, TarEntries}

class TarSpec extends AnyFunSuite {

  private val tarBin = new java.io.File("/usr/bin/tar")

  /** Real archive via the system GNU tar (differential reference). */
  private def systemTar(entries: Seq[(String, Array[Byte])], format: String): Array[Byte] = {
    val dir = Files.createTempDirectory("graft_tar")
    try {
      entries.foreach { case (name, data) =>
        val f = dir.resolve(name)
        Files.createDirectories(f.getParent)
        Files.write(f, data)
      }
      val out = dir.resolve("__out.tar")
      val cmd = Seq("/usr/bin/tar", s"--format=$format", "-cf", out.toString,
        "-C", dir.toString) ++ entries.map(_._1)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val rc = p.waitFor()
      assert(rc === 0, s"tar failed: rc=$rc")
      Files.readAllBytes(out)
    } finally {
      def rm(p: Path): Unit = {
        if (Files.isDirectory(p)) Files.list(p).forEach(rm)
        Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  private def listed(b: Array[Byte]): Seq[(String, String, Long, Long)] = {
    val arr = TarEntries.list(b)
    assert(arr !== null, "listing refused a well-formed archive")
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4)
      (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getLong(2), r.getLong(3))
    }
  }

  /** Independent minimal ustar writer (test-side; the reader must invert it). */
  private def handHeader(name: String, size: Long, typeflag: Char,
                         prefix: String = ""): Array[Byte] = {
    val h = new Array[Byte](512)
    def put(s: String, off: Int): Unit =
      s.getBytes("UTF-8").zipWithIndex.foreach { case (c, i) => h(off + i) = c }
    put(name, 0)
    put("0000644", 100); put("0000000", 108); put("0000000", 116)
    put(f"$size%011o", 124)
    put("00000000000", 136)
    h(156) = typeflag.toByte
    put("ustar", 257); h(262) = 0; put("00", 263)
    put(prefix, 345)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    h.foreach(c => sum += (c & 0xFF))
    put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '.toByte
    h
  }
  private def handTar(entries: Seq[(String, Array[Byte], Char, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data, tf, prefix) =>
      bos.write(handHeader(name, data.length.toLong, tf, prefix))
      bos.write(data)
      val pad = (512 - data.length % 512) % 512
      bos.write(new Array[Byte](pad))
    }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  test("GNU-tar differential: ustar listing and extraction agree with the real tool") {
    assume(tarBin.canExecute)
    val data = Seq(
      "a.txt" -> "alpha contents".getBytes("UTF-8"),
      "sub/dir/b.bin" -> Array.tabulate(1500)(i => (i * 37 + 11).toByte),
      "empty.txt" -> Array.emptyByteArray)
    val tar = systemTar(data, "ustar")
    val es = listed(tar)
    val files = es.filter(_._2 == "0").map(e => e._1 -> e._3).toMap
    assert(files === data.map(e => e._1 -> e._2.length.toLong).toMap)
    // directories the tool recorded walk as typeflag 5 with size 0
    assert(es.filter(_._2 == "5").forall(_._3 == 0L))
    for ((name, bytes) <- data) {
      val got = TarEntries.extract(tar, name)
      assert(got !== null, name)
      assert(got.toSeq === bytes.toSeq, name)
    }
    assert(TarEntries.extract(tar, "absent.txt") === null)
  }

  test("tar.gz composition: gunzip then list (the corpus-mirror wire format)") {
    assume(tarBin.canExecute)
    val tar = systemTar(Seq("x/y.txt" -> "payload".getBytes("UTF-8")), "ustar")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(tar); gz.close()
    val back = Gunzip.inflate(bos.toByteArray)
    assert(back.toSeq === tar.toSeq)
    assert(listed(back).exists(e => e._1 == "x/y.txt" && e._3 == 7L))
  }

  test("hand-built archives: prefix joins, NUL typeflag is a regular file, offsets are exact") {
    val t = handTar(Seq(
      ("deep.txt", "abc".getBytes, '0', "some/long/prefix"),
      ("plain.txt", "defg".getBytes, '\u0000', "")))
    val es = listed(t)
    assert(es.map(_._1) === Seq("some/long/prefix/deep.txt", "plain.txt"))
    assert(es.map(_._2) === Seq("0", "0"))
    assert(es.map(_._3) === Seq(3L, 4L))
    assert(es.map(_._4) === Seq(512L, 1536L))
    assert(TarEntries.extract(t, "plain.txt").toSeq === "defg".getBytes.toSeq)
  }

  test("strict refusals: checksum, truncation, terminator, trailing garbage, bad octal, out-of-scope entries") {
    val good = handTar(Seq(("a.txt", "abc".getBytes, '0', "")))
    assert(TarEntries.list(good) !== null)
    // flipped content byte breaks the checksum
    val flip = good.clone(); flip(0) = 'z'.toByte
    assert(TarEntries.list(flip) === null)
    // truncated data
    assert(TarEntries.list(good.take(512)) === null)
    // missing terminator (header+data only)
    assert(TarEntries.list(good.take(1024)) === null)
    // garbage after the terminator
    val garbage = good ++ new Array[Byte](511) ++ Array('x'.toByte)
    assert(TarEntries.list(garbage) === null)
    // non-octal size field (checksum recomputed so only the size is bad)
    val badSize = handTar(Seq(("a.txt", "abc".getBytes, '0', "")))
    badSize(124) = '9'.toByte
    var sum = 0L
    (0 until 512).foreach { i =>
      sum += (if (i >= 148 && i < 156) 0x20 else badSize(i) & 0xFF)
    }
    f"$sum%06o".getBytes.zipWithIndex.foreach { case (c, i) => badSize(148 + i) = c }
    badSize(154) = 0; badSize(155) = ' '.toByte
    assert(TarEntries.list(badSize) === null)
    // GNU longname / pax extended headers refuse rather than mis-list
    val gnuLong = handTar(Seq(("././@LongLink", "x".getBytes, 'L', "")))
    assert(TarEntries.list(gnuLong) === null)
    val pax = handTar(Seq(("pax_header", "x".getBytes, 'x', "")))
    assert(TarEntries.list(pax) === null)
    // non-block-multiple and sub-minimum blobs
    assert(TarEntries.list(good.take(1000)) === null)
    assert(TarEntries.list(new Array[Byte](512)) === null)
    assert(TarEntries.list(null) === null)
  }

  test("real-tool long names (>100 chars) produce out-of-scope entries that refuse loudly") {
    assume(tarBin.canExecute)
    val longName = ("d" * 60) + "/" + ("f" * 60) + ".txt"
    val tar = systemTar(Seq(longName -> "x".getBytes), "gnu") // GNU emits an 'L' longname entry
    assert(TarEntries.list(tar) === null)
  }
}
