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
    // a meta entry (longname / pax) with no following real entry is torn
    val gnuLong = handTar(Seq(("././@LongLink", "x".getBytes, 'L', "")))
    assert(TarEntries.list(gnuLong) === null)
    // malformed pax records (no "len " framing) refuse the whole blob
    val pax = handTar(Seq(
      ("pax_header", "x".getBytes, 'x', ""),
      ("a.txt", "abc".getBytes, '0', "")))
    assert(TarEntries.list(pax) === null)
    // non-block-multiple and sub-minimum blobs
    assert(TarEntries.list(good.take(1000)) === null)
    assert(TarEntries.list(new Array[Byte](512)) === null)
    assert(TarEntries.list(null) === null)
  }

  test("GNU-tar differential: 'L' longname entries list and extract the full >100-char name") {
    assume(tarBin.canExecute)
    val longName = ("d" * 60) + "/" + ("f" * 60) + ".txt"
    val tar = systemTar(Seq(longName -> "long payload".getBytes), "gnu") // GNU emits an 'L' entry
    val es = listed(tar)
    assert(es.filter(_._2 == "0").map(_._1) === Seq(longName))
    assert(TarEntries.extract(tar, longName).toSeq === "long payload".getBytes.toSeq)
  }

  test("GNU-tar differential: pax archives (x extended headers) list and extract correctly") {
    assume(tarBin.canExecute)
    // pax format emits an 'x' header per member (mtime/atime records at
    // minimum; a path record for the >100-char name)
    val longName = ("p" * 70) + "/" + ("q" * 70) + ".bin"
    val data = Seq(
      "short.txt" -> "hello pax".getBytes("UTF-8"),
      longName -> Array.tabulate(700)(i => (i * 13 + 5).toByte))
    val tar = systemTar(data, "pax")
    val es = listed(tar)
    val files = es.filter(_._2 == "0").map(e => e._1 -> e._3).toMap
    assert(files === data.map(e => e._1 -> e._2.length.toLong).toMap)
    for ((name, bytes) <- data)
      assert(TarEntries.extract(tar, name).toSeq === bytes.toSeq, name)
  }

  test("hand-built pax: path and size records override the header fields; 'g' defaults apply") {
    def paxData(records: (String, String)*): Array[Byte] = {
      val sb = new StringBuilder
      records.foreach { case (k, v) =>
        val body = s" $k=$v\n"
        // record length counts its own digits
        var len = body.length + 1
        while ((len.toString.length + body.length) != len) len = len.toString.length + body.length
        sb.append(len).append(body)
      }
      sb.toString.getBytes("UTF-8")
    }
    // 'x' path override: header says x.txt, pax says the real (long) name
    val realName = "very/long/replacement/name.txt"
    val t1 = handTar(Seq(
      ("pax_header", paxData("path" -> realName, "mtime" -> "1700000000.5"), 'x', ""),
      ("x.txt", "abcd".getBytes, '0', "")))
    val es1 = listed(t1)
    assert(es1.map(e => (e._1, e._2, e._3)) === Seq((realName, "0", 4L)))
    assert(TarEntries.extract(t1, realName).toSeq === "abcd".getBytes.toSeq)
    // 'x' size override: pax size 3 beats the octal field's 4 (and data
    // consumption follows the override: 3 bytes still pad to one block)
    val t2 = handTar(Seq(
      ("pax_header", paxData("size" -> "3"), 'x', ""),
      ("s.txt", "abcd".getBytes, '0', "")))
    assert(listed(t2).map(_._3) === Seq(3L))
    assert(TarEntries.extract(t2, "s.txt").toSeq === "abc".getBytes.toSeq)
    // 'g' global default applies to entries with no per-file override
    val t3 = handTar(Seq(
      ("pax_global", paxData("size" -> "2"), 'g', ""),
      ("a.txt", "abcd".getBytes, '0', ""),
      ("b.txt", "efgh".getBytes, '0', "")))
    assert(listed(t3).map(_._3) === Seq(2L, 2L))
    // malformed record framing refuses: length that does not cover the newline
    val bad = "7 path=abc\n".getBytes("UTF-8") // says 7, record is 11
    val t4 = handTar(Seq(
      ("pax_header", bad, 'x', ""),
      ("a.txt", "abcd".getBytes, '0', "")))
    assert(TarEntries.list(t4) === null)
  }

  test("duplicate member names: extract returns the LAST occurrence (tar overwrite semantics)") {
    val t = handTar(Seq(
      ("dup.txt", "old contents".getBytes, '0', ""),
      ("dup.txt", "new contents".getBytes, '0', "")))
    assert(listed(t).size === 2)
    assert(TarEntries.extract(t, "dup.txt").toSeq === "new contents".getBytes.toSeq)
  }
}
