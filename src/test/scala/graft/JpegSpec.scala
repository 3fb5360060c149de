package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JpegPixelStats

class JpegSpec extends AnyFunSuite {

  // ---- hand-built DC-only baseline JPEG (the gate's fixture shape) ----

  /** Single-component baseline JPEG with one 4-bit DC code (category 4)
    * and one 8-bit AC code (EOB), so every block encodes as exactly two
    * bytes [0b0000dddd, 0x00] — byte-aligned, 0xFF-free, no stuffing.
    * diffs must be in [-15,-8] or [8,15] (category 4).
    */
  def dcOnlyJpeg(wBlocks: Int, hBlocks: Int, q0: Int, diffs: Seq[Int]): Array[Byte] = {
    require(diffs.length == wBlocks * hBlocks)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8) // SOI
    b(0xFF, 0xDB, 0x00, 0x43, 0x00) // DQT, 8-bit table 0
    b(q0); (1 until 64).foreach(_ => b(1))
    val w = wBlocks * 8; val h = hBlocks * 8
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF,
      0x01, 0x01, 0x11, 0x00) // SOF0, 1 comp, 4:4:4, qtable 0
    // DC table: one code of length 4, symbol = category 4
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    // AC table: one code of length 8, symbol = 0x00 (EOB)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00) // SOS
    diffs.foreach { d =>
      require(math.abs(d) >= 8 && math.abs(d) <= 15, s"category-4 diff needed, got $d")
      val bits = if (d > 0) d else d + 15 // T.81 receive/extend, s = 4
      b(bits, 0x00)
    }
    b(0xFF, 0xD9) // EOI
    out.toByteArray
  }

  test("DC-only fixture: exact per-block values, stats arithmetic inverts") {
    // 2x1 blocks, q0 = 16, diffs +9 then -9: dc = 9 -> block value
    // 128 + round(9*16/8) = 146; dc back to 0 -> 128
    val bytes = dcOnlyJpeg(2, 1, 16, Seq(9, -9))
    val r = JpegPixelStats.decodeStats(bytes)
    assert(r !== null)
    assert((r.getInt(0), r.getInt(1), r.getLong(2)) === ((16, 8, 128L)))
    assert(r.getLong(3) === 64L * 146 + 64L * 128)
    assert((r.getInt(4), r.getInt(5)) === ((128, 146)))
  }

  test("DC prediction chains across blocks; rounding is half-up on the exact .5") {
    // q0 = 4: dc=9 -> 128 + round(36/8 = 4.5) = 133 (half-up)
    val one = JpegPixelStats.decodeStats(dcOnlyJpeg(1, 1, 4, Seq(9)))
    assert((one.getInt(4), one.getInt(5)) === ((133, 133)))
    // diffs +8, +8: second block dc = 16 -> 128 + 16*16/8 = 160
    val two = JpegPixelStats.decodeStats(dcOnlyJpeg(2, 1, 16, Seq(8, 8)))
    assert((two.getInt(4), two.getInt(5)) === ((144, 160)))
  }

  test("quarantine: torn entropy data, truncated header, progressive, color all NULL") {
    val good = dcOnlyJpeg(2, 2, 16, Seq(9, -9, 9, -9))
    assert(JpegPixelStats.decodeStats(good) !== null)
    // torn: drop the EOI AND one entropy byte -> block decode runs dry
    assert(JpegPixelStats.decodeStats(good.dropRight(3)) === null)
    // truncated header
    assert(JpegPixelStats.decodeStats(good.take(6)) === null)
    assert(JpegPixelStats.decodeStats("notajpeg".getBytes) === null)
    assert(JpegPixelStats.decodeStats(Array[Byte]()) === null)
    // a baseline stream relabeled SOF2 is a LYING progressive file (its
    // scan declares the 0..63 band with Ss=0, illegal outside baseline)
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegPixelStats.decodeStats(prog) === null)
  }

  /** [[dcOnlyJpeg]] with a DRI segment (restart interval `ri` MCUs) and
    * the cycling RSTn markers between intervals. Because every block is
    * byte-aligned 2 bytes, restart markers slot in without re-padding.
    */
  def dcOnlyJpegDri(wBlocks: Int, hBlocks: Int, q0: Int, ri: Int,
                    diffs: Seq[Int]): Array[Byte] = {
    require(diffs.length == wBlocks * hBlocks)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(q0); (1 until 64).foreach(_ => b(1))
    val w = wBlocks * 8; val h = hBlocks * 8
    b(0xFF, 0xC0, 0x00, 0x0B, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF,
      0x01, 0x01, 0x11, 0x00)
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDD, 0x00, 0x04, ri >> 8, ri & 0xFF) // DRI
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x3F, 0x00)
    var rst = 0
    diffs.zipWithIndex.foreach { case (d, k) =>
      if (k > 0 && k % ri == 0) { // RSTn between intervals
        b(0xFF, 0xD0 | (rst & 7)); rst += 1
      }
      require(math.abs(d) >= 8 && math.abs(d) <= 15, s"category-4 diff needed, got $d")
      b(if (d > 0) d else d + 15, 0x00)
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("restart markers: DC predictors reset per interval, marker index cycles, wrong marker torn") {
    // ri = 1: every block's diff stands alone — values 128 + 2*d_k,
    // which the UN-reset chain would read as a running sum instead
    val diffs = Seq(9, 10, 11, 12, 13, 14, 15, 8, 9, 10) // 10 blocks -> RST0..D7,D0
    val bytes = dcOnlyJpegDri(5, 2, 16, 1, diffs)
    val r = JpegPixelStats.decodeStats(bytes)
    assert(r !== null, "restart-marker stream refused")
    assert(r.getLong(3) === diffs.map(d => 64L * (128 + 2 * d)).sum)
    assert((r.getInt(4), r.getInt(5)) === ((128 + 16, 128 + 30)))
    // ri = 2 with alternating pairs: predictor resets where a pair ends,
    // so values match the non-DRI m11 pattern — the two encodings of the
    // same image must decode identically
    val paired = Seq(9, -9, 12, -12, 15, -15)
    val withDri = JpegPixelStats.decodeStats(dcOnlyJpegDri(3, 2, 16, 2, paired))
    val without = JpegPixelStats.decodeStats(dcOnlyJpeg(3, 2, 16, paired))
    assert(withDri.getLong(3) === without.getLong(3))
    assert((withDri.getInt(4), withDri.getInt(5)) ===
      ((without.getInt(4), without.getInt(5))))
    // a wrong restart index is a torn stream, not a silent resync
    val bad = bytes.clone()
    val firstRst = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xFF) == 0xFF && (bad(i + 1) & 0xFF) == 0xD0).get
    bad(firstRst + 1) = 0xD5.toByte
    assert(JpegPixelStats.decodeStats(bad) === null)
    // a MISSING restart marker is torn too
    val missing = bytes.take(firstRst) ++ bytes.drop(firstRst + 2)
    assert(JpegPixelStats.decodeStats(missing) === null)
  }

  test("JDK differential (restart markers): ImageIO agrees on our DRI files exactly") {
    // DC-only blocks decode to exact integers in both decoders — the
    // differential pins marker consumption, byte re-alignment, and the
    // predictor reset against an independent implementation
    val rnd = new scala.util.Random(59)
    for (ri <- Seq(1, 2, 3, 7)) {
      val wB = 4; val hB = 3
      val diffs = IndexedSeq.fill(wB * hB)(8 + rnd.nextInt(8))
      val bytes = dcOnlyJpegDri(wB, hB, 16, ri, diffs)
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk !== null, s"ImageIO refused our DRI=$ri file")
      val ours = JpegPixelStats.decodePixels(bytes)
      assert(ours !== null, s"we refused our own DRI=$ri file")
      for (y <- 0 until hB * 8; x <- 0 until wB * 8)
        assert(ours(y)(x) === jdk.getRaster.getSample(x, y, 0),
          s"ri=$ri sample ($y,$x)")
    }
  }

  /** 3-component 4:4:4 variant of [[dcOnlyJpeg]] — shared tables,
    * per-component diffs, Y/Cb/Cr blocks interleaved per MCU.
    */
  def dcOnlyColorJpeg(wBlocks: Int, hBlocks: Int, q0: Int,
                      dy: Seq[Int], dcb: Seq[Int], dcr: Seq[Int]): Array[Byte] = {
    val n = wBlocks * hBlocks
    require(dy.length == n && dcb.length == n && dcr.length == n)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(q0); (1 until 64).foreach(_ => b(1))
    val w = wBlocks * 8; val h = hBlocks * 8
    b(0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x03,
      0x01, 0x11, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x00, 0x03, 0x00,
      0x00, 0x3F, 0x00)
    (0 until n).foreach { i =>
      Seq(dy(i), dcb(i), dcr(i)).foreach { d =>
        require(math.abs(d) >= 8 && math.abs(d) <= 15, s"category-4 diff needed, got $d")
        b(if (d > 0) d else d + 15, 0x00)
      }
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("color fixture: exact per-channel values through the fixed-point CCIR 601 convert") {
    // one block: dc Y=9, Cb=10, Cr=12 at q0=16 -> Y=146, Cb'=20, Cr'=24
    val bytes = dcOnlyColorJpeg(1, 1, 16, Seq(9), Seq(10), Seq(12))
    val r = JpegPixelStats.decodeRgbStats(bytes)
    assert(r !== null)
    val expR = 146 + ((91881 * 24 + 32768) >> 16)           // 146 + 34 = 180
    val expG = 146 - ((22554 * 20 + 46802 * 24 + 32768) >> 16) // 146 - 24 = 122
    val expB = 146 + ((116130 * 20 + 32768) >> 16)          // 146 + 35 = 181
    assert((r.getLong(3), r.getLong(4), r.getLong(5)) ===
      ((64L * expR, 64L * expG, 64L * expB)))
    assert((r.getInt(6), r.getInt(7)) === ((expG, expB)))
    // grayscale input passes through the RGB surface as R = G = B
    val gray = JpegPixelStats.decodeRgbStats(dcOnlyJpeg(1, 1, 16, Seq(9)))
    assert((gray.getLong(3), gray.getLong(4), gray.getLong(5)) ===
      ((64L * 146, 64L * 146, 64L * 146)))
    // and a color file under the GRAY surface refuses (no silent luma)
    assert(JpegPixelStats.decodeStats(bytes) === null)
    // sampling factors above 2 (4:1:1) stay out of scope: quarantine
    val sub = bytes.clone()
    val sofAt = (0 until sub.length - 1).find(i =>
      (sub(i) & 0xFF) == 0xFF && (sub(i + 1) & 0xFF) == 0xC0).get
    sub(sofAt + 11) = 0x41.toByte // Y sampling 4x1
    assert(JpegPixelStats.decodeRgbStats(sub) === null)
  }

  /** 4:2:0 variant: Y at 2x2, Cb/Cr at 1x1 — each MCU covers 16x16
    * pixels and carries 4 Y blocks (u fastest, then v) + 1 Cb + 1 Cr.
    * dy has 4 diffs per MCU in stream order; dcb/dcr one per MCU.
    */
  def dcOnly420Jpeg(wMcu: Int, hMcu: Int, q0: Int,
                    dy: Seq[Int], dcb: Seq[Int], dcr: Seq[Int]): Array[Byte] = {
    val n = wMcu * hMcu
    require(dy.length == 4 * n && dcb.length == n && dcr.length == n)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(q0); (1 until 64).foreach(_ => b(1))
    val w = wMcu * 16; val h = hMcu * 16
    b(0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x03,
      0x01, 0x22, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00)
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x00, 0x03, 0x00,
      0x00, 0x3F, 0x00)
    def blk(d: Int): Unit = {
      require(math.abs(d) >= 8 && math.abs(d) <= 15, s"category-4 diff needed, got $d")
      b(if (d > 0) d else d + 15, 0x00)
    }
    (0 until n).foreach { j =>
      (0 until 4).foreach(t => blk(dy(4 * j + t)))
      blk(dcb(j)); blk(dcr(j))
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("4:2:0 fixture: MCU block order, per-quadrant luma, box-replicated chroma — every sample exact") {
    // one 16x16 MCU at q0=16: Y quadrants 146/128/144/128, Cb'=20, Cr'=24
    val bytes = dcOnly420Jpeg(1, 1, 16, Seq(9, -9, 8, -8), Seq(10), Seq(12))
    val rgb = JpegPixelStats.decodeRgb(bytes)
    assert(rgb !== null)
    assert(rgb(0).length === 16 && rgb(0)(0).length === 16)
    def expect(yv: Int): (Int, Int, Int) = (
      yv + ((91881 * 24 + 32768) >> 16),
      yv - ((22554 * 20 + 46802 * 24 + 32768) >> 16),
      yv + ((116130 * 20 + 32768) >> 16))
    // quadrant Y values: (0,0)->146 (dc 9), (0,8)->128, (8,0)->144 (dc 8), (8,8)->128
    for (((py, px), yv) <- Seq(((0, 0), 146), ((0, 8), 128), ((7, 7), 146),
                               ((8, 0), 144), ((8, 8), 128), ((15, 15), 128))) {
      val (er, eg, eb) = expect(yv)
      assert((rgb(0)(py)(px), rgb(1)(py)(px), rgb(2)(py)(px)) === ((er, eg, eb)),
        s"pixel ($py,$px)")
    }
    // stats invert: each quadrant contributes 64 samples
    val r = JpegPixelStats.decodeRgbStats(bytes)
    val ys = Seq(146, 128, 144, 128)
    assert(r.getLong(3) === ys.map(y => 64L * expect(y)._1).sum)
    assert(r.getLong(4) === ys.map(y => 64L * expect(y)._2).sum)
    assert(r.getLong(5) === ys.map(y => 64L * expect(y)._3).sum)
    // two MCUs across: chroma alternates per MCU (predictor +10 then -10)
    val two = dcOnly420Jpeg(2, 1, 16,
      Seq(9, -9, 8, -8, 9, -9, 8, -8), Seq(10, -10), Seq(12, -12))
    val rgb2 = JpegPixelStats.decodeRgb(two)
    assert(rgb2 !== null)
    val (er0, _, _) = expect(146)
    assert(rgb2(0)(0)(0) === er0, "MCU 0 keeps its chroma")
    assert(rgb2(0)(0)(16) === 146, "MCU 1 chroma back to neutral: R = Y")
    // torn: drop one entropy byte
    assert(JpegPixelStats.decodeRgbStats(bytes.dropRight(3)) === null)
  }

  /** 4:2:2 variant (Y 2x1, chroma 1x1): MCUs are 16x8, carrying 2 Y
    * blocks + 1 Cb + 1 Cr — pins the generic walk on a NON-square
    * sampling geometry where only the horizontal axis subsamples.
    */
  def dcOnly422Jpeg(wMcu: Int, hMcu: Int, q0: Int,
                    dy: Seq[Int], dcb: Seq[Int], dcr: Seq[Int]): Array[Byte] = {
    val n = wMcu * hMcu
    require(dy.length == 2 * n && dcb.length == n && dcr.length == n)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(q0); (1 until 64).foreach(_ => b(1))
    val w = wMcu * 16; val h = hMcu * 8
    b(0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x03,
      0x01, 0x21, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00) // Y 2x1
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x00, 0x03, 0x00,
      0x00, 0x3F, 0x00)
    def blk(d: Int): Unit = {
      require(math.abs(d) >= 8 && math.abs(d) <= 15)
      b(if (d > 0) d else d + 15, 0x00)
    }
    (0 until n).foreach { j =>
      blk(dy(2 * j)); blk(dy(2 * j + 1)); blk(dcb(j)); blk(dcr(j))
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("4:2:2 fixture: horizontal-only subsampling decodes exactly; ImageIO agrees") {
    // one 16x8 MCU: Y halves 146/128, Cb'=20, Cr'=24 replicated across
    val bytes = dcOnly422Jpeg(1, 1, 16, Seq(9, -9), Seq(10), Seq(12))
    val rgb = JpegPixelStats.decodeRgb(bytes)
    assert(rgb !== null)
    assert(rgb(0).length === 8 && rgb(0)(0).length === 16)
    def expect(yv: Int): (Int, Int, Int) = (
      yv + ((91881 * 24 + 32768) >> 16),
      yv - ((22554 * 20 + 46802 * 24 + 32768) >> 16),
      yv + ((116130 * 20 + 32768) >> 16))
    for (((py, px), yv) <- Seq(((0, 0), 146), ((7, 7), 146), ((0, 8), 128), ((7, 15), 128))) {
      val (er, eg, eb) = expect(yv)
      assert((rgb(0)(py)(px), rgb(1)(py)(px), rgb(2)(py)(px)) === ((er, eg, eb)),
        s"pixel ($py,$px)")
    }
    // independent implementation: ImageIO decodes the same 4:2:2 file
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk !== null, "ImageIO refused our 4:2:2 file")
    var maxDelta = 0
    for (y <- 0 until 8; x <- 0 until 16) {
      val p = jdk.getRGB(x, y)
      maxDelta = math.max(maxDelta, Seq(
        math.abs(rgb(0)(y)(x) - ((p >> 16) & 0xFF)),
        math.abs(rgb(1)(y)(x) - ((p >> 8) & 0xFF)),
        math.abs(rgb(2)(y)(x) - (p & 0xFF))).max)
    }
    assert(maxDelta <= 2, s"4:2:2 delta $maxDelta vs ImageIO")
  }

  def dcOnly411Jpeg(wMcu: Int, hMcu: Int, q0: Int,
                    dy: Seq[Int], dcb: Seq[Int], dcr: Seq[Int]): Array[Byte] = {
    val n = wMcu * hMcu
    require(dy.length == 4 * n && dcb.length == n && dcr.length == n)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(q0); (1 until 64).foreach(_ => b(1))
    val w = wMcu * 32; val h = hMcu * 8
    b(0xFF, 0xC0, 0x00, 0x11, 0x08, h >> 8, h & 0xFF, w >> 8, w & 0xFF, 0x03,
      0x01, 0x41, 0x00, 0x02, 0x11, 0x00, 0x03, 0x11, 0x00) // Y 4x1 (4:1:1)
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x0C, 0x03, 0x01, 0x00, 0x02, 0x00, 0x03, 0x00,
      0x00, 0x3F, 0x00)
    def blk(d: Int): Unit = {
      require(math.abs(d) >= 8 && math.abs(d) <= 15)
      b(if (d > 0) d else d + 15, 0x00)
    }
    (0 until n).foreach { j =>
      (0 until 4).foreach(u => blk(dy(4 * j + u)))
      blk(dcb(j)); blk(dcr(j))
    }
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("4:1:1 fixture (factor 4): four Y blocks per MCU decode exactly; ImageIO agrees") {
    // one 32x8 MCU: Y quarters via the prediction chain 146/128/148/128,
    // Cb'=20, Cr'=24 replicated across the whole MCU
    val bytes = dcOnly411Jpeg(1, 1, 16, Seq(9, -9, 10, -10), Seq(10), Seq(12))
    val rgb = JpegPixelStats.decodeRgb(bytes)
    assert(rgb !== null)
    assert(rgb(0).length === 8 && rgb(0)(0).length === 32)
    def expect(yv: Int): (Int, Int, Int) = (
      yv + ((91881 * 24 + 32768) >> 16),
      yv - ((22554 * 20 + 46802 * 24 + 32768) >> 16),
      yv + ((116130 * 20 + 32768) >> 16))
    for (((py, px), yv) <- Seq(((0, 0), 146), ((7, 7), 146), ((0, 8), 128),
        ((3, 16), 148), ((7, 23), 148), ((0, 24), 128), ((7, 31), 128))) {
      val (er, eg, eb) = expect(yv)
      assert((rgb(0)(py)(px), rgb(1)(py)(px), rgb(2)(py)(px)) === ((er, eg, eb)),
        s"pixel ($py,$px)")
    }
    // independent implementation: ImageIO decodes the same 4:1:1 file
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(jdk !== null, "ImageIO refused our 4:1:1 file")
    var maxDelta = 0
    for (y <- 0 until 8; x <- 0 until 32) {
      val p = jdk.getRGB(x, y)
      maxDelta = math.max(maxDelta, Seq(
        math.abs(rgb(0)(y)(x) - ((p >> 16) & 0xFF)),
        math.abs(rgb(1)(y)(x) - ((p >> 8) & 0xFF)),
        math.abs(rgb(2)(y)(x) - (p & 0xFF))).max)
    }
    assert(maxDelta <= 2, s"4:1:1 delta $maxDelta vs ImageIO")
    // a multi-MCU 4:1:1 file exercises the raster placement too
    val two = dcOnly411Jpeg(2, 1, 16,
      Seq(9, -9, 10, -10, 11, -11, 12, -12), Seq(10, 8), Seq(12, 9))
    val rgb2 = JpegPixelStats.decodeRgb(two)
    assert(rgb2 !== null)
    assert(rgb2(0)(0).length === 64)
    // factor 5 and other illegal values still quarantine
    val bad = bytes.clone()
    val sofAt = (0 until bad.length - 1).find(i =>
      (bad(i) & 0xFF) == 0xFF && (bad(i + 1) & 0xFF) == 0xC0).get
    bad(sofAt + 11) = 0x51.toByte // H=5
    assert(JpegPixelStats.decodeRgbStats(bad) === null)
  }

  test("JDK differential (4:2:0): ImageIO-encoded color JPEGs — the encoder's native subsampling — decode within +-2") {
    // the JDK JPEG encoder emits 4:2:0 (Y 2x2) for RGB at every quality;
    // gray-valued RGB keeps both chroma planes CONSTANT (exactly 128), so
    // box and triangular upsamplers agree sample-for-sample and the
    // differential pins the subsampled MCU walk + upsampling geometry,
    // including non-multiple-of-16 croppings
    val rnd = new scala.util.Random(37)
    for ((w, h, quality) <- Seq((32, 24, 0.75f), (17, 9, 0.9f), (16, 16, 0.5f), (41, 35, 0.85f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (96 + 64 * math.sin(x * 0.7) + 48 * math.cos(y * 0.5) + rnd.nextInt(32)).toInt
          .max(0).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // the fixture must actually be subsampled, or this test pins nothing
      val sofAt = (0 until bytes.length - 1).find(i =>
        (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC0).get
      assert((bytes(sofAt + 11) & 0xFF) === 0x22,
        "JDK encoder stopped emitting 4:2:0 — fixture no longer subsampled")
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val ours = JpegPixelStats.decodeRgb(bytes)
      assert(ours !== null, s"refused a well-formed 4:2:0 ${w}x$h q=$quality JPEG")
      assert(ours(0).length === h && ours(0)(0).length === w)
      var maxDelta = 0
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = jdk.getRGB(x, y)
        maxDelta = math.max(maxDelta, Seq(
          math.abs(ours(0)(y)(x) - ((rgb >> 16) & 0xFF)),
          math.abs(ours(1)(y)(x) - ((rgb >> 8) & 0xFF)),
          math.abs(ours(2)(y)(x) - (rgb & 0xFF))).max)
      }
      assert(maxDelta <= 2,
        s"${w}x$h q=$quality: max per-channel delta $maxDelta vs ImageIO on 4:2:0")
    }
  }

  test("JDK differential (color): ImageIO decodes our 4:4:4 files within +-2 per channel") {
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 4) {
      val wB = 1 + rnd.nextInt(3); val hB = 1 + rnd.nextInt(3)
      val n = wB * hB
      // exact +m,-m pairs per component keep every DC chain in {0, m}
      // (category-4 reachable, non-negative — the gate's pattern)
      def alt(): Seq[Int] = {
        val mags = IndexedSeq.fill((n + 1) / 2)(8 + rnd.nextInt(8))
        (0 until n).map(i => if (i % 2 == 0) mags(i / 2) else -mags(i / 2))
      }
      val bytes = dcOnlyColorJpeg(wB, hB, 16, alt(), alt(), alt())
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk !== null, "ImageIO refused our 4:4:4 color file")
      val ours = JpegPixelStats.decodeRgb(bytes)
      assert(ours !== null)
      var maxDelta = 0
      for (y <- 0 until hB * 8; x <- 0 until wB * 8) {
        val rgb = jdk.getRGB(x, y)
        maxDelta = math.max(maxDelta, Seq(
          math.abs(ours(0)(y)(x) - ((rgb >> 16) & 0xFF)),
          math.abs(ours(1)(y)(x) - ((rgb >> 8) & 0xFF)),
          math.abs(ours(2)(y)(x) - (rgb & 0xFF))).max)
      }
      assert(maxDelta <= 2,
        s"${wB}x$hB blocks: max per-channel delta $maxDelta vs ImageIO")
    }
  }

  test("JDK differential: ImageIO-encoded grayscale JPEGs decode within the IEEE-1180 +-1 envelope") {
    val rnd = new scala.util.Random(11)
    for ((w, h, quality) <- Seq((24, 16, 0.9f), (17, 9, 0.75f), (8, 8, 1.0f), (40, 33, 0.5f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          (96 + 64 * math.sin(x * 0.7) + 48 * math.cos(y * 0.5) + rnd.nextInt(32)).toInt
            .max(0).min(255))
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(jdk.getType === java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
        "fixture must stay single-component")
      val ours = JpegPixelStats.decodePixels(bytes)
      assert(ours !== null, s"refused a well-formed ${w}x$h q=$quality JPEG")
      assert(ours.length === h && ours(0).length === w)
      var maxDelta = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ours(y)(x) - jdk.getRaster.getSample(x, y, 0))
        if (d > maxDelta) maxDelta = d
      }
      assert(maxDelta <= 1,
        s"${w}x$h q=$quality: max per-sample delta $maxDelta vs ImageIO (IEEE-1180 grants 1)")
    }
  }

  // ---- progressive (SOF2) ----

  /** Hand-built 3-scan progressive grayscale file (the m19 gate shape):
    * DC first at Al=1 (one byte per block: category-4 code + 4 magnitude
    * bits), DC refine to Al=0 (two bits + 1-padding), then an AC-first
    * scan of the full 1..63 band that is all-EOB (one 0x00 byte per
    * block). Pixels land on exact integers: 128 + 2*((pred<<1)|bit)
    * at q0=16.
    */
  def progressiveJpeg(d0: Int, d1: Int, b0: Int, b1: Int): Array[Byte] = {
    require(d0 >= 8 && d0 <= 15 && d1 >= 8 && d1 <= 15)
    val out = new java.io.ByteArrayOutputStream()
    def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xFF))
    b(0xFF, 0xD8)
    b(0xFF, 0xDB, 0x00, 0x43, 0x00); b(16); (1 until 64).foreach(_ => b(1))
    b(0xFF, 0xC2, 0x00, 0x0B, 0x08, 0x00, 0x08, 0x00, 0x10, 0x01, 0x01, 0x11, 0x00)
    b(0xFF, 0xC4, 0x00, 0x14, 0x00,
      0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0x04)
    b(0xFF, 0xC4, 0x00, 0x14, 0x10,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0x00)
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x01) // DC first, Al=1
    b(d0, d1)
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x00, 0x00, 0x10) // DC refine, Ah=1
    b(b0 * 128 + b1 * 64) // zero padding bits: keeps the byte 0xFF-free
    b(0xFF, 0xDA, 0x00, 0x08, 0x01, 0x01, 0x00, 0x01, 0x3F, 0x00) // AC first, all-EOB
    b(0x00, 0x00)
    b(0xFF, 0xD9)
    out.toByteArray
  }

  test("progressive fixture: DC first + refine compose exactly; AC band walk runs") {
    for ((d0, d1, b0, b1) <- Seq((9, 8, 1, 0), (15, 15, 0, 1), (8, 12, 1, 1))) {
      val r = JpegPixelStats.decodeStats(progressiveJpeg(d0, d1, b0, b1))
      assert(r !== null, s"refused ($d0,$d1,$b0,$b1)")
      val p0 = 128 + 2 * ((d0 << 1) | b0)
      val p1 = 128 + 2 * (((d0 + d1) << 1) | b1)
      assert((r.getInt(0), r.getInt(1), r.getLong(2)) === ((16, 8, 128L)))
      assert(r.getLong(3) === 64L * p0 + 64L * p1, s"sum ($d0,$d1,$b0,$b1)")
      assert((r.getInt(4), r.getInt(5)) === ((p0 min p1, p0 max p1)))
    }
  }

  test("progressive sequencing refusals: AC before DC, bad Ah chain, missing DC at EOI, truncation") {
    val good = progressiveJpeg(9, 8, 1, 0)
    assert(JpegPixelStats.decodeStats(good) !== null)
    // truncated mid-scan
    assert(JpegPixelStats.decodeStats(good.dropRight(3)) === null)
    // AC-only file: drop both DC scans (SOS1 data is 2 bytes, SOS2 is 1)
    def findSos(b: Array[Byte], n: Int): Int = {
      var c = 0
      (0 until b.length - 1).find { i =>
        if ((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0xDA) { c += 1; c == n }
        else false
      }.get
    }
    val s1 = findSos(good, 1); val s3 = findSos(good, 3)
    val acOnly = good.take(s1) ++ good.drop(s3)
    assert(JpegPixelStats.decodeStats(acOnly) === null)
    // refine without a first scan: keep only the refine DC scan
    val s2 = findSos(good, 2)
    val refineFirst = good.take(s1) ++ good.slice(s2, s3) ++ good.drop(s3)
    assert(JpegPixelStats.decodeStats(refineFirst) === null)
    // skipping the refine (Al=1 then AC at Al=0) is LEGAL per band: the
    // AC band's own first scan carries its own Ah=0
    val noRefine = good.take(s2) ++ good.drop(s3)
    assert(JpegPixelStats.decodeStats(noRefine) !== null)
    // DC-only progressive (no AC scan at all) is legal too
    val dcOnly = good.take(s3) ++ good.drop(good.length - 2)
    assert(JpegPixelStats.decodeStats(dcOnly) !== null)
  }

  test("JDK differential (progressive grayscale): ImageIO's own multi-scan files decode within +-1") {
    val rnd = new scala.util.Random(23)
    for ((w, h, quality) <- Seq((24, 16, 0.9f), (17, 9, 0.75f), (40, 33, 0.5f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0,
          (96 + 64 * math.sin(x * 0.7) + 48 * math.cos(y * 0.5) + rnd.nextInt(32)).toInt
            .max(0).min(255))
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      // the file must really be progressive (SOF2), else this test is vacuous
      assert((0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
        "encoder did not emit SOF2")
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val ours = JpegPixelStats.decodePixels(bytes)
      assert(ours !== null, s"refused a well-formed progressive ${w}x$h q=$quality")
      var maxDelta = 0
      for (y <- 0 until h; x <- 0 until w) {
        val d = math.abs(ours(y)(x) - jdk.getRaster.getSample(x, y, 0))
        if (d > maxDelta) maxDelta = d
      }
      assert(maxDelta <= 1,
        s"progressive ${w}x$h q=$quality: max delta $maxDelta vs ImageIO")
    }
  }

  test("JDK differential (progressive color): the encoder's native subsampled multi-scan files decode within +-2") {
    val rnd = new scala.util.Random(31)
    for ((w, h, quality) <- Seq((32, 24, 0.8f), (19, 13, 0.6f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (96 + 64 * math.sin(x * 0.5) + 48 * math.cos(y * 0.4) + rnd.nextInt(24)).toInt
          .max(0).min(255)
        img.setRGB(x, y, (g << 16) | (g << 8) | g) // gray-valued RGB: constant chroma
      }
      val bos = new java.io.ByteArrayOutputStream()
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val params = writer.getDefaultWriteParam
      params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
      params.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
      ios.close(); writer.dispose()
      val bytes = bos.toByteArray
      assert((0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC2),
        "encoder did not emit SOF2")
      val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val rgb = JpegPixelStats.decodeRgb(bytes)
      assert(rgb !== null, s"refused a progressive color ${w}x$h q=$quality")
      var maxDelta = 0
      for (y <- 0 until h; x <- 0 until w) {
        val px = jdk.getRGB(x, y)
        val deltas = Seq(
          math.abs(rgb(0)(y)(x) - ((px >> 16) & 0xFF)),
          math.abs(rgb(1)(y)(x) - ((px >> 8) & 0xFF)),
          math.abs(rgb(2)(y)(x) - (px & 0xFF)))
        if (deltas.max > maxDelta) maxDelta = deltas.max
      }
      assert(maxDelta <= 2,
        s"progressive color ${w}x$h q=$quality: max delta $maxDelta vs ImageIO")
    }
  }
}
