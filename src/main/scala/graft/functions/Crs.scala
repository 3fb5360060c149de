package graft.functions

/** Native CRS point transforms for the common EPSG codes (reference F6:
  * pyproj `Transformer.from_proj(src, dst, always_xy=True)`,
  * `backend/models.py:37-42`). No projection library ships in this
  * environment, so the math is implemented directly from the public
  * formulas:
  *
  *  - Transverse Mercator: the series in EPSG Guidance Note 7-2 §3.2.2 /
  *    the Ordnance Survey "A guide to coordinate systems in Great Britain"
  *    Annex C (mm-level inside a UTM zone width);
  *  - Lambert Conformal Conic 2SP: EPSG Guidance Note 7-2 §3.1.1;
  *  - Web Mercator: the spherical formulas from the EPSG:3857 definition;
  *  - Datum shifts: geodetic -> geocentric -> 7-parameter Helmert
  *    (position-vector convention, EPSG method 9606) -> geodetic.
  *
  * Accuracy contract: projection series are ~mm; Helmert datum shifts are
  * the published single-transformation parameters (EPSG:1314 for OSGB36,
  * EPSG:1133 for ED50, EPSG:1173 for NAD27) and carry their published
  * ~2-10 m uncertainty — identical behavior to pyproj WITHOUT datum grids
  * (the reference container installs no NTv2/OSTN/NADCON grids either).
  * ETRS89 / NAD83 / RGF93 are treated as coincident with WGS84 (sub-metre
  * plate drift ignored, the standard null-transformation assumption).
  */
private[graft] object Crs {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val b: Double = a * (1.0 - f)
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    val n: Double = (a - b) / (a + b)
  }

  val Wgs84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val Grs80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)
  val Airy1830: Ellipsoid = Ellipsoid(6377563.396, 299.3249646)
  val Intl1924: Ellipsoid = Ellipsoid(6378388.0, 297.0)
  val Bessel1841: Ellipsoid = Ellipsoid(6377397.155, 299.1528128)
  val Clarke1866: Ellipsoid = Ellipsoid(6378206.4, 294.978698214)

  /** 7-parameter Helmert to WGS84, position-vector convention (EPSG 9606):
    * rotations in arc-seconds, scale in ppm.
    */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
                           rxSec: Double, rySec: Double, rzSec: Double,
                           ppm: Double) {
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    private val s = 1.0 + ppm * 1e-6

    def forward(p: (Double, Double, Double)): (Double, Double, Double) = {
      val (x, y, z) = p
      (tx + s * (x - rz * y + ry * z),
       ty + s * (rz * x + y - rx * z),
       tz + s * (-ry * x + rx * y + z))
    }
    /** Exact inverse of the forward rotation matrix application is a full
      * matrix inverse; for the small angles involved the transpose form
      * below is exact to well below the parameters' own uncertainty AND
      * makes forward/inverse round-trips close to ~1e-9 m (it inverts the
      * same linearized operator).
      */
    def inverse(p: (Double, Double, Double)): (Double, Double, Double) = {
      val x = (p._1 - tx) / s; val y = (p._2 - ty) / s; val z = (p._3 - tz) / s
      // solve the 3x3 rotation system R v = (x,y,z) with R as in forward
      val det = 1.0 + rx * rx + ry * ry + rz * rz
      ((x * (1 + rx * rx) + y * (rz + rx * ry) + z * (rx * rz - ry)) / det,
       (x * (rx * ry - rz) + y * (1 + ry * ry) + z * (rx + ry * rz)) / det,
       (x * (ry + rx * rz) + y * (ry * rz - rx) + z * (1 + rz * rz)) / det)
    }
  }

  /** geodetic (deg, h=0) -> geocentric XYZ on `ell`. */
  private def toGeocentric(lonDeg: Double, latDeg: Double, ell: Ellipsoid): (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val nu = ell.a / math.sqrt(1.0 - ell.e2 * math.sin(lat) * math.sin(lat))
    (nu * math.cos(lat) * math.cos(lon),
     nu * math.cos(lat) * math.sin(lon),
     nu * (1.0 - ell.e2) * math.sin(lat))
  }

  /** geocentric XYZ -> geodetic (deg) on `ell`, iterative (h discarded). */
  private def toGeodetic(p: (Double, Double, Double), ell: Ellipsoid): (Double, Double) = {
    val (x, y, z) = p
    val lon = math.atan2(y, x)
    val pr = math.hypot(x, y)
    var lat = math.atan2(z, pr * (1.0 - ell.e2))
    var i = 0
    while (i < 8) { // converges to <1e-12 rad in ~4 iterations
      val sinLat = math.sin(lat)
      val nu = ell.a / math.sqrt(1.0 - ell.e2 * sinLat * sinLat)
      lat = math.atan2(z + ell.e2 * nu * sinLat, pr)
      i += 1
    }
    (math.toDegrees(lon), math.toDegrees(lat))
  }

  sealed trait Projection {
    def ell: Ellipsoid
    /** geographic degrees -> projected units */
    def forward(lon: Double, lat: Double): (Double, Double)
    /** projected units -> geographic degrees */
    def inverse(x: Double, y: Double): (Double, Double)
  }

  final case class Geographic(ell: Ellipsoid) extends Projection {
    def forward(lon: Double, lat: Double): (Double, Double) = (lon, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  /** EPSG:3857 spherical Web Mercator (sphere radius = WGS84 a). */
  final case class WebMercator(ell: Ellipsoid) extends Projection {
    private val R = ell.a
    def forward(lon: Double, lat: Double): (Double, Double) =
      (math.toRadians(lon) * R,
       math.log(math.tan(math.Pi / 4.0 + math.toRadians(lat) / 2.0)) * R)
    def inverse(x: Double, y: Double): (Double, Double) =
      (math.toDegrees(x / R),
       math.toDegrees(2.0 * math.atan(math.exp(y / R)) - math.Pi / 2.0))
  }

  /** EPSG method 9807 via the Guidance Note 7-2 / OS Annex C series. */
  final case class TransverseMercator(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
                                      k0: Double, e0: Double, n0: Double) extends Projection {
    private val lat0 = math.toRadians(lat0Deg)
    private val lon0 = math.toRadians(lon0Deg)
    private val aF = ell.a * k0
    private val bF = ell.b * k0
    private val e2 = ell.e2
    private val n = ell.n
    private val n2 = n * n
    private val n3 = n2 * n

    /** developed meridian arc from lat0, scaled (OS guide eq. "M"). */
    private def arc(lat: Double): Double = {
      val dp = lat - lat0; val sp = lat + lat0
      bF * ((1 + n + 1.25 * n2 + 1.25 * n3) * dp
        - (3 * n + 3 * n2 + 2.625 * n3) * math.sin(dp) * math.cos(sp)
        + (1.875 * n2 + 1.875 * n3) * math.sin(2 * dp) * math.cos(2 * sp)
        - (35.0 / 24.0) * n3 * math.sin(3 * dp) * math.cos(3 * sp))
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.toRadians(latDeg)
      val dl = math.toRadians(lonDeg) - lon0
      val sinLat = math.sin(lat); val cosLat = math.cos(lat); val tanLat = math.tan(lat)
      val nu = aF / math.sqrt(1 - e2 * sinLat * sinLat)
      val rho = aF * (1 - e2) / math.pow(1 - e2 * sinLat * sinLat, 1.5)
      val eta2 = nu / rho - 1
      val t2 = tanLat * tanLat
      val i = arc(lat) + n0
      val ii = nu / 2.0 * sinLat * cosLat
      val iii = nu / 24.0 * sinLat * math.pow(cosLat, 3) * (5 - t2 + 9 * eta2)
      val iiia = nu / 720.0 * sinLat * math.pow(cosLat, 5) * (61 - 58 * t2 + t2 * t2)
      val iv = nu * cosLat
      val v = nu / 6.0 * math.pow(cosLat, 3) * (nu / rho - t2)
      val vi = nu / 120.0 * math.pow(cosLat, 5) *
        (5 - 18 * t2 + t2 * t2 + 14 * eta2 - 58 * t2 * eta2)
      (e0 + iv * dl + v * math.pow(dl, 3) + vi * math.pow(dl, 5),
       i + ii * dl * dl + iii * math.pow(dl, 4) + iiia * math.pow(dl, 6))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val de = x - e0
      var latP = lat0 + (y - n0) / aF
      var m = arc(latP)
      var iter = 0
      while (math.abs(y - n0 - m) >= 1e-11 && iter < 20) {
        latP += (y - n0 - m) / aF
        m = arc(latP)
        iter += 1
      }
      val sinLat = math.sin(latP); val tanLat = math.tan(latP)
      val secLat = 1.0 / math.cos(latP)
      val nu = aF / math.sqrt(1 - e2 * sinLat * sinLat)
      val rho = aF * (1 - e2) / math.pow(1 - e2 * sinLat * sinLat, 1.5)
      val eta2 = nu / rho - 1
      val t2 = tanLat * tanLat
      val vii = tanLat / (2 * rho * nu)
      val viii = tanLat / (24 * rho * math.pow(nu, 3)) *
        (5 + 3 * t2 + eta2 - 9 * t2 * eta2)
      val ix = tanLat / (720 * rho * math.pow(nu, 5)) * (61 + 90 * t2 + 45 * t2 * t2)
      val xc = secLat / nu
      val xi = secLat / (6 * math.pow(nu, 3)) * (nu / rho + 2 * t2)
      val xii = secLat / (120 * math.pow(nu, 5)) * (5 + 28 * t2 + 24 * t2 * t2)
      val xiia = secLat / (5040 * math.pow(nu, 7)) *
        (61 + 662 * t2 + 1320 * t2 * t2 + 720 * math.pow(t2, 3))
      val lat = latP - vii * de * de + viii * math.pow(de, 4) - ix * math.pow(de, 6)
      val lon = lon0 + xc * de - xi * math.pow(de, 3) + xii * math.pow(de, 5) -
        xiia * math.pow(de, 7)
      (math.toDegrees(lon), math.toDegrees(lat))
    }
  }

  /** EPSG method 9802, Lambert Conformal Conic (2SP). */
  final case class LambertConformal2SP(ell: Ellipsoid, latFDeg: Double, lon0Deg: Double,
                                       sp1Deg: Double, sp2Deg: Double,
                                       eF: Double, nF: Double) extends Projection {
    private val e = ell.e
    private val lon0 = math.toRadians(lon0Deg)

    private def m(lat: Double): Double =
      math.cos(lat) / math.sqrt(1 - ell.e2 * math.sin(lat) * math.sin(lat))
    private def t(lat: Double): Double =
      math.tan(math.Pi / 4 - lat / 2) /
        math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2)

    private val sp1 = math.toRadians(sp1Deg)
    private val sp2 = math.toRadians(sp2Deg)
    private val latF = math.toRadians(latFDeg)
    private val nC = (math.log(m(sp1)) - math.log(m(sp2))) / (math.log(t(sp1)) - math.log(t(sp2)))
    private val fC = m(sp1) / (nC * math.pow(t(sp1), nC))
    private def r(lat: Double): Double = ell.a * fC * math.pow(t(lat), nC)
    private val rF = r(latF)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val theta = nC * (math.toRadians(lonDeg) - lon0)
      val rr = r(math.toRadians(latDeg))
      (eF + rr * math.sin(theta), nF + rF - rr * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val de = x - eF; val dn = rF - (y - nF)
      val rP = math.signum(nC) * math.hypot(de, dn)
      val tP = math.pow(rP / (ell.a * fC), 1.0 / nC)
      val theta = math.atan2(de, dn)
      var lat = math.Pi / 2 - 2 * math.atan(tP)
      var i = 0
      while (i < 8) {
        lat = math.Pi / 2 - 2 * math.atan(
          tP * math.pow((1 - e * math.sin(lat)) / (1 + e * math.sin(lat)), e / 2))
        i += 1
      }
      (math.toDegrees(theta / nC + lon0), math.toDegrees(lat))
    }
  }

  /** Authalic-latitude helper q(phi) shared by the equal-area projections
    * (EPSG GN 7-2 §1.3.3.1 / methods 9820, 9822).
    */
  private def authalicQ(ell: Ellipsoid, sinPhi: Double): Double = {
    val e = ell.e; val e2 = ell.e2
    (1 - e2) * (sinPhi / (1 - e2 * sinPhi * sinPhi) -
      (1 / (2 * e)) * math.log((1 - e * sinPhi) / (1 + e * sinPhi)))
  }

  /** Inverse of authalicQ: geodetic latitude from q, the GN 7-2 fixed-point
    * iteration (converges to <1e-12 rad in a handful of steps).
    */
  private def phiFromQ(ell: Ellipsoid, q: Double): Double = {
    val e = ell.e; val e2 = ell.e2
    var phi = math.asin(math.max(-1.0, math.min(1.0, q / 2)))
    var i = 0
    while (i < 12) {
      val s = math.sin(phi)
      phi += math.pow(1 - e2 * s * s, 2) / (2 * math.cos(phi)) *
        (q / (1 - e2) - s / (1 - e2 * s * s) +
          1 / (2 * e) * math.log((1 - e * s) / (1 + e * s)))
      i += 1
    }
    phi
  }

  /** Lambert Azimuthal Equal Area, oblique aspect (EPSG method 9820) —
    * the ETRS89-LAEA Europe (EPSG:3035) instantiation used for EU
    * statistical grids. Formulas from GN 7-2 §3.1.2.
    */
  final case class LambertAzimuthalEqualArea(ell: Ellipsoid, lat0Deg: Double,
      lon0Deg: Double, fe: Double, fn: Double) extends Projection {
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val qP = authalicQ(ell, 1.0)
    private val q0 = authalicQ(ell, math.sin(phi0))
    private val beta0 = math.asin(q0 / qP)
    private val rQ = ell.a * math.sqrt(qP / 2)
    private val d = ell.a * (math.cos(phi0) /
      math.sqrt(1 - ell.e2 * math.sin(phi0) * math.sin(phi0))) / (rQ * math.cos(beta0))
    private val sinB0 = math.sin(beta0); private val cosB0 = math.cos(beta0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val lam = math.toRadians(lonDeg) - lam0
      val beta = math.asin(authalicQ(ell, math.sin(math.toRadians(latDeg))) / qP)
      val sinB = math.sin(beta); val cosB = math.cos(beta)
      val b = rQ * math.sqrt(2 / (1 + sinB0 * sinB + cosB0 * cosB * math.cos(lam)))
      (fe + b * d * cosB * math.sin(lam),
       fn + (b / d) * (cosB0 * sinB - sinB0 * cosB * math.cos(lam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val ex = (x - fe) / d
      val ny = d * (y - fn)
      val rho = math.hypot(ex, ny)
      if (rho < 1e-12) return (math.toDegrees(lam0), math.toDegrees(phi0))
      val c = 2 * math.asin(rho / (2 * rQ))
      val q = qP * (math.cos(c) * sinB0 + ny * math.sin(c) * cosB0 / rho)
      val lam = lam0 + math.atan2(ex * math.sin(c),
        rho * cosB0 * math.cos(c) - ny * sinB0 * math.sin(c))
      (math.toDegrees(lam), math.toDegrees(phiFromQ(ell, q)))
    }
  }

  /** Albers Equal Area conic, 2SP (EPSG method 9822) — the NAD83 / Conus
    * Albers (EPSG:5070) instantiation. Formulas from GN 7-2 §3.1.3.
    */
  final case class AlbersEqualArea(ell: Ellipsoid, lat0Deg: Double, lon0Deg: Double,
      sp1Deg: Double, sp2Deg: Double, fe: Double, fn: Double) extends Projection {
    private val lam0 = math.toRadians(lon0Deg)
    private def m(phi: Double): Double =
      math.cos(phi) / math.sqrt(1 - ell.e2 * math.sin(phi) * math.sin(phi))
    private val sp1 = math.toRadians(sp1Deg)
    private val sp2 = math.toRadians(sp2Deg)
    private val q1 = authalicQ(ell, math.sin(sp1))
    private val q2 = authalicQ(ell, math.sin(sp2))
    private val n = (m(sp1) * m(sp1) - m(sp2) * m(sp2)) / (q2 - q1)
    private val cC = m(sp1) * m(sp1) + n * q1
    private def rho(q: Double): Double = ell.a * math.sqrt(cC - n * q) / n
    private val rho0 = rho(authalicQ(ell, math.sin(math.toRadians(lat0Deg))))

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val theta = n * (math.toRadians(lonDeg) - lam0)
      val r = rho(authalicQ(ell, math.sin(math.toRadians(latDeg))))
      (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val ex = x - fe
      val ny = rho0 - (y - fn)
      // for n<0 (southern-parallel instantiations) the atan2 arguments flip
      // sign with rho'; Conus-style n>0 keeps the plain form
      val rhoP = math.signum(n) * math.hypot(ex, ny)
      val theta = math.atan2(math.signum(n) * ex, math.signum(n) * ny)
      val q = (cC - rhoP * rhoP * n * n / (ell.a * ell.a)) / n
      (math.toDegrees(lam0 + theta / n), math.toDegrees(phiFromQ(ell, q)))
    }
  }

  /** Swiss Oblique Mercator (EPSG method 9815 as instantiated by
    * CH1903 / CH1903+): the rigorous sphere-intermediate formulas from the
    * public swisstopo projection document ("Formulas and constants for the
    * calculation of the Swiss conformal cylindrical projection"). The
    * ellipsoid is conformally mapped to a sphere, the sphere rotated so
    * the projection centre (Bern old observatory) sits on the pseudo-
    * equator, then a normal Mercator is applied. Exact (no series
    * truncation); the only iteration is the conformal-latitude inverse.
    */
  final case class SwissObliqueMercator(ell: Ellipsoid, e0: Double, n0: Double)
      extends Projection {
    private val phi0 = math.toRadians(46.0 + 57.0 / 60 + 8.66 / 3600)   // 46deg57'08.66"N
    private val lam0 = math.toRadians(7.0 + 26.0 / 60 + 22.50 / 3600)   // 7deg26'22.50"E
    private val e = ell.e
    private val sin0 = math.sin(phi0)
    private val cos0 = math.cos(phi0)
    private val R = ell.a * math.sqrt(1 - ell.e2) / (1 - ell.e2 * sin0 * sin0)
    private val alpha = math.sqrt(1 + ell.e2 / (1 - ell.e2) * math.pow(cos0, 4))
    private val b0 = math.asin(sin0 / alpha)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
      alpha * e / 2 * math.log((1 + e * sin0) / (1 - e * sin0))
    private val sinB0 = math.sin(b0)
    private val cosB0 = math.cos(b0)

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinPhi = math.sin(phi)
      // ellipsoid -> conformal sphere
      val s = alpha * math.log(math.tan(math.Pi / 4 + phi / 2)) -
        alpha * e / 2 * math.log((1 + e * sinPhi) / (1 - e * sinPhi)) + bigK
      val b = 2 * (math.atan(math.exp(s)) - math.Pi / 4)
      val l = alpha * (math.toRadians(lonDeg) - lam0)
      // rotate the sphere: projection centre -> pseudo-equator origin
      val sinB = math.sin(b); val cosB = math.cos(b); val cosL = math.cos(l)
      val lBar = math.atan2(cosB * math.sin(l), sinB0 * sinB + cosB0 * cosB * cosL)
      val sinBBar = cosB0 * sinB - sinB0 * cosB * cosL
      // normal Mercator on the rotated sphere
      (e0 + R * lBar, n0 + R / 2 * math.log((1 + sinBBar) / (1 - sinBBar)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val lBar = (x - e0) / R
      val bBar = 2 * (math.atan(math.exp((y - n0) / R)) - math.Pi / 4)
      // rotate back
      val sinBB = math.sin(bBar); val cosBB = math.cos(bBar); val cosLB = math.cos(lBar)
      val b = math.asin(cosB0 * sinBB + sinB0 * cosBB * cosLB)
      val l = math.atan2(cosBB * math.sin(lBar), cosB0 * cosBB * cosLB - sinB0 * sinBB)
      val lon = lam0 + l / alpha
      // conformal sphere -> ellipsoid latitude, fixed-point iteration
      val s = math.log(math.tan(math.Pi / 4 + b / 2))
      var phi = b
      var i = 0
      while (i < 10) { // converges to <1e-13 rad in ~5 iterations
        val sinPhi = math.sin(phi)
        phi = 2 * math.atan(math.exp((s - bigK) / alpha +
          e / 2 * math.log((1 + e * sinPhi) / (1 - e * sinPhi)))) - math.Pi / 2
        i += 1
      }
      (math.toDegrees(lon), math.toDegrees(phi))
    }
  }

  /** A CRS: its projection (carrying the ellipsoid) plus the datum's
    * Helmert transformation to WGS84 (None = datum coincident with WGS84).
    */
  final case class CrsDef(proj: Projection, toWgs84: Option[Helmert])

  // published single-transformation Helmert parameters (position vector):
  // OSGB36 -> WGS84: EPSG:1314 (~2 m); ED50 -> WGS84: EPSG:1133 (~10 m)
  private val Osgb36ToWgs84 = Helmert(446.448, -125.157, 542.060,
    0.1502, 0.2470, 0.8421, -20.4894)
  private val Ed50ToWgs84 = Helmert(-87.0, -96.0, -120.0, 0, 0, 0, 0)
  // CH1903+ -> ETRS89 is the published pure translation (EPSG:1676); the
  // same parameters serve CH1903 (EPSG:1753, ~1 m stated accuracy)
  private val Ch1903ToWgs84 = Helmert(674.374, 15.056, 405.346, 0, 0, 0, 0)
  // NAD27 -> WGS84: the published CONUS geocentric translation (EPSG:1173).
  // NAD27 is properly a GRID datum (NADCON/NTv2 — per-point shift tables
  // the reference's pyproj would download); this single Helmert is the
  // EPSG-published approximation with ~10 m stated accuracy over CONUS,
  // the standard fallback when no grids are installed.
  private val Nad27ToWgs84 = Helmert(-8.0, 160.0, 176.0, 0, 0, 0, 0)
  // Tokyo datum -> WGS84: the published geocentric translation
  // ("Tokyo to WGS 84 (1)", ~10 m class). Like NAD27, exact Tokyo-datum
  // work uses grid files (GSI's TKY2JGD); the single Helmert carries the
  // famous ~400-500 m Tokyo-vs-WGS84 offset to datum-level accuracy.
  private val TokyoToWgs84 = Helmert(-148.0, 507.0, 685.0, 0, 0, 0, 0)

  private def utm(ell: Ellipsoid, zone: Int, south: Boolean): Projection =
    TransverseMercator(ell, 0.0, zone * 6.0 - 183.0, 0.9996,
      500000.0, if (south) 10000000.0 else 0.0)

  /** EPSG code -> CRS definition. Raises (with the supported list) on
    * codes we do not model — notably grid-shift-only datums like NAD27.
    */
  def lookup(epsg: Int): CrsDef = epsg match {
    case 4326 => CrsDef(Geographic(Wgs84), None)
    case 4258 | 4269 | 4171 => CrsDef(Geographic(Grs80), None) // ETRS89 / NAD83 / RGF93
    case 4277 => CrsDef(Geographic(Airy1830), Some(Osgb36ToWgs84)) // OSGB36
    case 4230 => CrsDef(Geographic(Intl1924), Some(Ed50ToWgs84))   // ED50
    case 3857 => CrsDef(WebMercator(Wgs84), None)
    case z if z >= 32601 && z <= 32660 => CrsDef(utm(Wgs84, z - 32600, south = false), None)
    case z if z >= 32701 && z <= 32760 => CrsDef(utm(Wgs84, z - 32700, south = true), None)
    case z if z >= 25828 && z <= 25838 => CrsDef(utm(Grs80, z - 25800, south = false), None) // ETRS89 UTM
    case z if z >= 26901 && z <= 26923 => CrsDef(utm(Grs80, z - 26900, south = false), None) // NAD83 UTM
    case 27700 => CrsDef( // OSGB36 / British National Grid
      TransverseMercator(Airy1830, 49.0, -2.0, 0.9996012717, 400000.0, -100000.0),
      Some(Osgb36ToWgs84))
    case 2157 => CrsDef( // IRENET95 / Irish Transverse Mercator
      TransverseMercator(Grs80, 53.5, -8.0, 0.99982, 600000.0, 750000.0), None)
    case 2154 => CrsDef( // RGF93 / Lambert-93
      LambertConformal2SP(Grs80, 46.5, 3.0, 44.0, 49.0, 700000.0, 6600000.0), None)
    // GDA94 / GDA2020: EPSG's own published WGS84 transformations for both
    // are null (EPSG:1150, EPSG:8450 — 3 m stated accuracy, which absorbs
    // the ~1.8 m GDA94/GDA2020 plate-motion offset). MGA zones are plain
    // UTM-south on GRS80.
    case 4283 | 7844 => CrsDef(Geographic(Grs80), None) // GDA94 / GDA2020 geographic
    case z if z >= 28348 && z <= 28358 => CrsDef(utm(Grs80, z - 28300, south = true), None) // GDA94 / MGA
    case z if z >= 7846 && z <= 7859 => CrsDef(utm(Grs80, z - 7800, south = true), None) // GDA2020 / MGA
    case 4149 | 4150 => CrsDef(Geographic(Bessel1841), Some(Ch1903ToWgs84)) // CH1903 / CH1903+
    case 2193 => CrsDef( // NZGD2000 / New Zealand Transverse Mercator
      TransverseMercator(Grs80, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0), None)
    case 3035 => CrsDef( // ETRS89-extended / LAEA Europe
      LambertAzimuthalEqualArea(Grs80, 52.0, 10.0, 4321000.0, 3210000.0), None)
    case 5070 => CrsDef( // NAD83 / Conus Albers
      AlbersEqualArea(Grs80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0), None)
    case 2056 => CrsDef( // CH1903+ / LV95
      SwissObliqueMercator(Bessel1841, 2600000.0, 1200000.0), Some(Ch1903ToWgs84))
    case 21781 => CrsDef( // CH1903 / LV03
      SwissObliqueMercator(Bessel1841, 600000.0, 200000.0), Some(Ch1903ToWgs84))
    // NAD27: Helmert-approximated (EPSG:1173, ~10 m over CONUS — exact
    // NAD27 needs NADCON grid files, see Nad27ToWgs84)
    case 4267 => CrsDef(Geographic(Clarke1866), Some(Nad27ToWgs84))
    case z if z >= 26701 && z <= 26722 => // NAD27 / UTM zones 1N-22N
      CrsDef(utm(Clarke1866, z - 26700, south = false), Some(Nad27ToWgs84))
    // Japan: Tokyo datum (Helmert-approximated, see TokyoToWgs84) and the
    // modern JGD2000/JGD2011 (GRS80, WGS84-coincident to sub-metre)
    case 4301 => CrsDef(Geographic(Bessel1841), Some(TokyoToWgs84))
    case 4612 | 6668 => CrsDef(Geographic(Grs80), None) // JGD2000 / JGD2011
    case other => throw new IllegalArgumentException(
      s"unsupported CRS: EPSG:$other (supported: 4326, 4258, 4269, 4171, 4277, 4230, " +
        "4283, 7844, 4149, 4150, 4267, 4301, 4612, 6668, 3857, 27700, 2154, 2157, 2056, " +
        "21781, 2193, 3035, 5070, " +
        "UTM 32601-32660/32701-32760/25828-25838/26901-26923/26701-26722, " +
        "MGA 28348-28358/7846-7859)")
  }

  /** Point transform src EPSG -> dst EPSG (always_xy axis order, matching
    * the reference's pyproj usage).
    */
  def transform(x: Double, y: Double, srcEpsg: Int, dstEpsg: Int): (Double, Double) = {
    if (srcEpsg == dstEpsg) return (x, y)
    val src = lookup(srcEpsg)
    val dst = lookup(dstEpsg)
    var (lon, lat) = src.proj.inverse(x, y)
    // datum pipeline only when the datums differ
    if (src.toWgs84 != dst.toWgs84) {
      val wgs = src.toWgs84 match {
        case Some(h) => toGeodetic(h.forward(toGeocentric(lon, lat, src.proj.ell)), Wgs84)
        case None    => (lon, lat)
      }
      val onDst = dst.toWgs84 match {
        case Some(h) => toGeodetic(h.inverse(toGeocentric(wgs._1, wgs._2, Wgs84)), dst.proj.ell)
        case None    => wgs
      }
      lon = onDst._1; lat = onDst._2
    }
    dst.proj.forward(lon, lat)
  }
}
