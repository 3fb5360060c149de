package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bzip2Deflate, Zunbz2}

/** [[Zunbz2]]/[[Bzip2Deflate]] differentials: library round-trip, the
  * INDEPENDENT `bzip2` binary on this host in BOTH directions (CLI
  * compresses -> engine inflates; engine compresses -> CLI inflates —
  * the two-sided differential that breaks encode/decode symmetry,
  * which matters here because bzip2 has no stored mode and the m29
  * gate fixture rides the engine's own encoder), concatenated
  * streams, and the refusal matrix.
  */
class Bzip2Spec extends AnyFunSuite {

  private def cli = new java.io.File("/root/miniconda/bin/bzip2")

  test("library round-trip; deterministic encode (the fixture contract)") {
    val data = ("bzip2 stream payload " * 400).getBytes("UTF-8")
    val z1 = Bzip2Deflate.deflate(data)
    val z2 = Bzip2Deflate.deflate(data)
    assert(z1.toSeq === z2.toSeq, "encoder must be deterministic")
    // block size is the smallest that holds the input (8.4 KB -> '1');
    // the digit is part of the deterministic-fixture contract
    assert(z1(0) === 'B' && z1(1) === 'Z' && z1(2) === 'h' && z1(3) === '1')
    assert(Zunbz2.inflate(z1).toSeq === data.toSeq)
    assert(Zunbz2.inflate(Bzip2Deflate.deflate(Array.emptyByteArray)).toSeq
      === Seq.empty)
  }

  test("two-sided CLI differential: CLI->engine and engine->CLI") {
    if (!cli.canExecute) cancel("bzip2 binary not present on this host")
    val data = Array.tabulate(100000)(i => ((i * 31 + i / 997) % 251).toByte)
    val src = java.nio.file.Files.createTempFile("graft_bz2", ".bin")
    try {
      // CLI compresses at two block sizes -> engine inflates
      for (level <- Seq("-1", "-9")) {
        java.nio.file.Files.write(src, data)
        val p = new ProcessBuilder(cli.getAbsolutePath, level, "-f", "-k",
          src.toString).inheritIO().start()
        assert(p.waitFor() === 0, s"bzip2 CLI failed at $level")
        val z = java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(src.toString + ".bz2"))
        assert(Zunbz2.inflate(z).toSeq === data.toSeq, s"level $level")
        java.nio.file.Files.deleteIfExists(
          java.nio.file.Paths.get(src.toString + ".bz2"))
      }
      // engine compresses -> CLI inflates (breaks library symmetry)
      val bz = java.nio.file.Paths.get(src.toString + ".bz2")
      java.nio.file.Files.write(bz, Bzip2Deflate.deflate(data))
      java.nio.file.Files.deleteIfExists(src)
      val p2 = new ProcessBuilder(cli.getAbsolutePath, "-d", "-f", "-k",
        bz.toString).inheritIO().start()
      assert(p2.waitFor() === 0, "bzip2 CLI refused the engine's stream")
      assert(java.nio.file.Files.readAllBytes(src).toSeq === data.toSeq)
      java.nio.file.Files.deleteIfExists(bz)
    } finally java.nio.file.Files.deleteIfExists(src)
  }

  test("concatenated streams inflate to concatenated payloads") {
    val a = "first stream ".getBytes("UTF-8")
    val b = "second stream".getBytes("UTF-8")
    val both = Bzip2Deflate.deflate(a) ++ Bzip2Deflate.deflate(b)
    assert(new String(Zunbz2.inflate(both), "UTF-8") === "first stream second stream")
  }

  test("refusals: bad magic, torn, CRC flip, trailing garbage, bomb; deflate cap") {
    val data = ("payload " * 1000).getBytes("UTF-8")
    val good = Bzip2Deflate.deflate(data)
    assert(Zunbz2.inflate(good) !== null)
    assert(Zunbz2.inflate("not a bzip2 stream".getBytes) === null)
    assert(Zunbz2.inflate("BZh0junk".getBytes) === null) // digit out of range
    assert(Zunbz2.inflate(Array[Byte]('B', 'Z')) === null)
    assert(Zunbz2.inflate(good.dropRight(5)) === null) // torn
    // flip one payload-region byte: the block CRC must refuse
    val flipped = good.clone()
    flipped(good.length / 2) = (flipped(good.length / 2) ^ 0x10).toByte
    assert(Zunbz2.inflate(flipped) === null)
    assert(Zunbz2.inflate(good ++ Array[Byte](9, 9, 9)) === null) // garbage
    // bomb: 300 MB of zeros compresses tiny; inflation must refuse
    val bomb = Bzip2Deflate.deflate(new Array[Byte](300 * 1024 * 1024))
    assert(bomb === null, "deflate must refuse inputs past the inflation cap")
    // a real inflation bomb built from a capped-size input still refuses
    val big = Bzip2Deflate.deflate(new Array[Byte](200 * 1024 * 1024))
    assert(big.length < (1 << 20), "fixture: the bomb really is tiny")
    val double = big ++ big // 400 MB declared across two streams
    assert(Zunbz2.inflate(double) === null)
  }
}
