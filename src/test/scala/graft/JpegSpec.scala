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

  test("quarantine: torn entropy data, truncated header, progressive, color, DRI all NULL") {
    val good = dcOnlyJpeg(2, 2, 16, Seq(9, -9, 9, -9))
    assert(JpegPixelStats.decodeStats(good) !== null)
    // torn: drop the EOI AND one entropy byte -> block decode runs dry
    assert(JpegPixelStats.decodeStats(good.dropRight(3)) === null)
    // truncated header
    assert(JpegPixelStats.decodeStats(good.take(6)) === null)
    assert(JpegPixelStats.decodeStats("notajpeg".getBytes) === null)
    assert(JpegPixelStats.decodeStats(Array[Byte]()) === null)
    // progressive (SOF2): flip the SOF marker
    val prog = good.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sofAt + 1) = 0xC2.toByte
    assert(JpegPixelStats.decodeStats(prog) === null)
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
    // chroma subsampling (4:2:0) is out of scope: quarantine, not garble
    val sub = bytes.clone()
    val sofAt = (0 until sub.length - 1).find(i =>
      (sub(i) & 0xFF) == 0xFF && (sub(i + 1) & 0xFF) == 0xC0).get
    sub(sofAt + 11) = 0x22.toByte // Y sampling 2x2
    assert(JpegPixelStats.decodeRgbStats(sub) === null)
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
}
