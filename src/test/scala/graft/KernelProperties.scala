package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.{Geo, PgVectorCodec, SketchHash}
import graft.operators.{Embed, Knn}

/** Property-based tests (SURVEY.md §5.3) over the driver-callable kernels.
  * `Knn.cosineDist` is bit-identical to the CosineDistance expression
  * (asserted in VectorSpec), so properties here cover the expression's
  * math as well.
  */
object KernelProperties extends Properties("graft.kernels") {

  private val nonZeroVec: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.chooseNum(-5f, 5f)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  property("cosine(a, a) ~ 0") = forAll(nonZeroVec) { a =>
    math.abs(Knn.cosineDist(a, a)) < 1e-9
  }

  property("cosine symmetry") = forAll(nonZeroVec, nonZeroVec) { (a, b) =>
    Knn.cosineDist(a, b) == Knn.cosineDist(b, a)
  }

  property("cosine range [0, 2]") = forAll(nonZeroVec, nonZeroVec) { (a, b) =>
    val d = Knn.cosineDist(a, b)
    d >= -1e-9 && d <= 2.0 + 1e-9
  }

  property("cosine scale invariance") = forAll(nonZeroVec,
    Gen.chooseNum(0.1f, 10f)) { (a, s) =>
    val scaled = a.map(_ * s)
    math.abs(Knn.cosineDist(a, scaled)) < 1e-6
  }

  private val lonLat: Gen[(Double, Double)] = for {
    lon <- Gen.chooseNum(-179.9, 179.9)
    lat <- Gen.chooseNum(-84.9, 84.9) // web mercator's defined band
  } yield (lon, lat)

  property("CRS 4326->3857->4326 round trip ~ identity") = forAll(lonLat) {
    case (lon, lat) =>
      val (x, y) = Geo.transformPoint(lon, lat, 4326, 3857)
      val (lon2, lat2) = Geo.transformPoint(x, y, 3857, 4326)
      math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9
  }

  /** Domain-restricted round trips for the projected CRS registry: each
    * code over its area of use (TM series accuracy degrades far outside
    * the zone; these bands are the codes' published domains).
    */
  private def crsRoundTrip(code: Int, lonR: (Double, Double), latR: (Double, Double)): Prop =
    forAll(Gen.chooseNum(lonR._1, lonR._2), Gen.chooseNum(latR._1, latR._2)) {
      (lon, lat) =>
        val (x, y) = Geo.transformPoint(lon, lat, 4326, code)
        val (lon2, lat2) = Geo.transformPoint(x, y, code, 4326)
        math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7
    }

  property("CRS 4326<->32633 (UTM 33N) round trip") =
    crsRoundTrip(32633, (12.0, 18.0), (0.0, 80.0)) // zone 33's actual extent
  property("CRS 4326<->27700 (British National Grid, Helmert datum) round trip") =
    crsRoundTrip(27700, (-8.0, 2.0), (49.5, 61.0))
  property("CRS 4326<->2154 (Lambert-93) round trip") =
    crsRoundTrip(2154, (-5.0, 10.0), (41.0, 51.0))
  property("CRS 4326<->32717 (UTM 17S, southern hemisphere) round trip") =
    crsRoundTrip(32717, (-84.0, -78.0), (-56.0, 0.0)) // zone 17's actual extent
  property("CRS 4326<->28355 (GDA94 / MGA zone 55) round trip") =
    crsRoundTrip(28355, (144.0, 150.0), (-45.0, -10.0))
  property("CRS 4326<->2056 (Swiss LV95, oblique Mercator + datum shift) round trip") =
    crsRoundTrip(2056, (5.9, 10.5), (45.8, 47.8))

  private val asciiText: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
      .map(_.mkString)

  property("rolling hash concat recurrence: h(a++b) from h(a), h(b)") =
    forAll(asciiText, asciiText) { (a, b) =>
      val M = 1L << 55
      def h(s: String): Long =
        s.getBytes("UTF-8").foldLeft(0L)((acc, c) => (acc * 131 + (c & 0xff)) % M)
      def powMod(base: Long, e: Int): Long =
        (0 until e).foldLeft(1L)((acc, _) => (acc * base) % M)
      // h matches the native expression's recurrence (asserted in
      // TextDedupSpec); the algebra must compose:
      val combined = (bigMulMod(h(a), powMod(131, b.getBytes("UTF-8").length), M) + h(b)) % M
      h(a + b) == combined
    }

  /** (a*b) mod m without overflow, for m = 2^55 (a, b < 2^55). */
  private def bigMulMod(a: Long, b: Long, m: Long): Long =
    (BigInt(a) * BigInt(b) % BigInt(m)).toLong

  property("minhash slots estimate jaccard of identical/disjoint sets exactly") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { tokens =>
      val base = tokens.map(t => SketchHash.fnv1a64(t.getBytes("UTF-8")))
      // per-slot minima of identical token sets agree on every slot
      val sig1 = (1 to 16).map(i => base.map(h => SketchHash.mix(h + SketchHash.Golden * i)).min)
      val sig2 = (1 to 16).map(i => base.map(h => SketchHash.mix(h + SketchHash.Golden * i)).min)
      sig1 == sig2
    }

  property("pgvector literal round trip") = forAll(nonZeroVec) { v =>
    val parsed = PgVectorCodec.fromLiteral(PgVectorCodec.toLiteral(v))
    parsed.length == v.length &&
      parsed.zip(v).forall { case (p, o) =>
        math.abs(p - o) <= math.abs(o) * 1e-5 + 1e-6 // 6 significant digits
      }
  }

  property("hashing encoder: deterministic, unit-norm when tokens exist") = forAll(asciiText) { t =>
    val enc = new Embed.HashingEncoder(16, normalize = true)
    val a = enc.encode(t)
    val b = enc.encode(t)
    val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
    a.sameElements(b) &&
      (t.trim.isEmpty || norm == 0.0 || math.abs(norm - 1.0) < 1e-5)
  }

  property("hashing encoder: raw components are signed token counts") = forAll(asciiText) { t =>
    val enc = new Embed.HashingEncoder(16, normalize = false)
    val v = enc.encode(t)
    val nTokens = if (t.trim.isEmpty) 0 else t.trim.split("\\s+").length
    // every component integral, and |sum of |components|| <= token count
    v.forall(x => x == math.rint(x)) &&
      v.map(x => math.abs(x.toDouble)).sum <= nTokens.toDouble
  }

  property("pgvector formatG matches python format(x, 'g') on knowns") = Prop {
    PgVectorCodec.formatG(0.05) == "0.05" &&
      PgVectorCodec.formatG(1.0) == "1" &&
      PgVectorCodec.formatG(-0.12345678) == "-0.123457" &&
      PgVectorCodec.formatG(1e-5) == "1e-05" &&
      PgVectorCodec.formatG(1234567.0) == "1.23457e+06" &&
      PgVectorCodec.formatG(0.0) == "0"
  }

  property("cdc chunks tile the token stream exactly, cuts end chunks") = forAll(asciiText, Gen.choose(2, 16)) { (t, div) =>
    import org.apache.spark.unsafe.types.UTF8String
    val chunks = graft.functions.CdcChunksExpr
      .compute(UTF8String.fromString(t), div)
    val toks = if (t.trim.isEmpty) Array.empty[String] else t.trim.split("\\s+")
    val rows = (0 until chunks.numElements()).map(chunks.getStruct(_, 3))
    val total = rows.map(_.getInt(1)).sum
    val starts = rows.map(_.getInt(0))
    val rebuilt = rows.map(_.getUTF8String(2).toString).mkString(" ")
    total == toks.length &&
      starts == rows.indices.map(i => 1 + rows.take(i).map(_.getInt(1)).sum) &&
      rebuilt == toks.mkString(" ")
  }

  property("fnv64 mixed = splitmix64(plain); plain matches the byte kernel") = forAll(asciiText) { t =>
    import org.apache.spark.unsafe.types.UTF8String
    val u = UTF8String.fromString(t)
    val plain = graft.functions.Fnv64.compute(u, false)
    val mixed = graft.functions.Fnv64.compute(u, true)
    plain == SketchHash.fnv1a64(t.getBytes("UTF-8")) &&
      mixed == SketchHash.mix(plain)
  }

  // next-fit packing bound (Johnson 1973): over the ENGINE's own fold
  // (Packing.NextFitState is the mapPartitions state machine), items
  // <= capacity always pack into <= 2*ceil(total/capacity) - 1 bins
  // (<= 2*OPT - 1), via the proof invariant that any two consecutive
  // bins hold > capacity together.
  property("next-fit fold: consecutive-bin invariant and the 2*OPT-1 waste bound") =
    forAll(Gen.choose(8L, 64L), Gen.nonEmptyListOf(Gen.choose(1L, 64L))) {
      (capacity, raw) =>
        val sizes = raw.map(n => math.min(n, capacity)) // items fit capacity
          .sorted(Ordering[Long].reverse) // the shard's NFD order upstream
        val st = new graft.operators.Packing.NextFitState(capacity)
        val bins = sizes.map(n => st.assign(0, n))
        val loads = bins.zip(sizes).groupBy(_._1).view
          .mapValues(_.map(_._2).sum).toMap
        val nBins = loads.size.toLong
        val total = sizes.sum
        val bound = math.max(1L, 2L * ((total + capacity - 1) / capacity) - 1L)
        val capOk = loads.values.forall(_ <= capacity)
        val adjacentOk = (0L until nBins - 1).forall(b =>
          loads(b) + loads(b + 1) > capacity)
        capOk && adjacentOk && nBins <= bound
    }

  // Count-Min bucket kernel (t44/e23): deterministic, range-valid, and
  // exactly the documented recurrence mix(fnv ^ (r+1)*Golden) >>> 1 % w
  property("cm_buckets: deterministic, in-range, matches the seeded recurrence") =
    forAll(asciiText, Gen.choose(1, 8), Gen.choose(2, 1024)) { (t, depth, width) =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val a = graft.functions.CmBuckets.compute(u, depth, width).toIntArray()
      val b = graft.functions.CmBuckets.compute(u, depth, width).toIntArray()
      val h = SketchHash.fnv1a64(t.getBytes("UTF-8"))
      val want = Array.tabulate(depth)(r =>
        ((SketchHash.mix(h ^ ((r + 1).toLong * SketchHash.Golden)) >>> 1) % width).toInt)
      a.sameElements(b) && a.sameElements(want) &&
        a.forall(x => x >= 0 && x < width)
    }

  // fixed-window chunk rule (t45): starts tile [0, n) with the promised
  // coverage — every token index falls in >= 1 chunk, consecutive FULL
  // chunks share exactly `overlap` indices, and chunk count is the
  // closed form ceil(max(n - overlap, 1) / stride)
  property("chunk rule: full coverage, exact overlap, closed-form count") =
    forAll(Gen.choose(1, 200), Gen.choose(2, 20), Gen.choose(0, 19)) {
      (n, size, rawOv) =>
        val overlap = math.min(rawOv, size - 1)
        val stride = size - overlap
        val nChunks = ((math.max(n - overlap, 1) + stride - 1) / stride)
        val spans = (0 until nChunks.toInt).map { ci =>
          val s = ci * stride
          (s, math.min(s + size, n)) // [s, e)
        }
        val covered = Array.fill(n)(0)
        spans.foreach { case (s, e) => (s until e).foreach(covered(_) += 1) }
        val coverOk = covered.forall(_ >= 1)
        val overlapOk = spans.sliding(2).forall {
          case Seq((s1, e1), (s2, _)) =>
            // shared indices between consecutive chunks = e1 - s2, which
            // equals `overlap` whenever the first chunk is full
            e1 - s1 < size || e1 - s2 == overlap
          case _ => true
        }
        val lastOk = spans.last._1 < n // every chunk holds >= 1 token
        coverOk && overlapOk && lastOk
    }
}
