package graft.geom

/** Coordinate reference systems and transforms, implemented as pure Scala
  * math (the JVM has no bundled PROJ; the build is offline).
  *
  * Scope matches the CRS families exercised by the reference's tests
  * (reference: tests/test_reproject.py:21-257 uses EPSG:32632 and
  * EPSG:3035; tests/sampledata.py:211-292 a custom transverse mercator;
  * everything else is geographic WGS84/CRS84):
  *
  *  - geographic lon/lat (EPSG:4326, OGC:CRS84 — treated as equal, like
  *    `_is_equal_crs` counts both-geographic as equal,
  *    reference: xcube_resampling/utils.py:181-189)
  *  - Transverse Mercator / UTM (EPSG:326xx / 327xx) via the
  *    Krueger-Karney flattening series (6th order in n) — forward error
  *    well under 1 mm inside a UTM zone, far below the sub-pixel
  *    tolerance the golden tests need.
  *  - Lambert Azimuthal Equal Area (EPSG:3035, ETRS89-extended LAEA
  *    Europe) via Snyder's ellipsoidal formulas with authalic latitude.
  *
  * All projections are plain `Double => Double` math suitable for use
  * inside tight per-tile kernels (no allocation on the hot path).
  */
sealed trait Crs extends Serializable {
  def name: String
  def isGeographic: Boolean
  /** projected/geographic coords -> lon/lat degrees */
  def toLonLat(x: Double, y: Double): (Double, Double)
  /** lon/lat degrees -> projected/geographic coords */
  def fromLonLat(lon: Double, lat: Double): (Double, Double)

  /** Structural equality: two parameterized CRSs are equal only when
    * every projection parameter matches (case-class equality), never by
    * display name alone — CF-parsed CRSs share a generic name, so name
    * equality would elide real coordinate transforms.
    */
  def equalsCrs(other: Crs): Boolean =
    (this eq other) || (isGeographic && other.isGeographic) || this == other
}

object Crs {
  /** GRS80 / WGS84 share a to 0.1 mm in b; keep both for exactness. */
  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2.0 - f)
    val e: Double = math.sqrt(e2)
    val n: Double = f / (2.0 - f)
  }
  val WGS84: Ellipsoid = Ellipsoid(6378137.0, 298.257223563)
  val GRS80: Ellipsoid = Ellipsoid(6378137.0, 298.257222101)

  case object Geographic extends Crs {
    val name = "EPSG:4326"
    val isGeographic = true
    def toLonLat(x: Double, y: Double): (Double, Double) = (x, y)
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = (lon, lat)
  }

  /** Transverse Mercator via Krueger series (public-domain formulas; see
    * Karney 2011 "Transverse Mercator with an accuracy of a few
    * nanometers", arXiv:1002.1417, and the standard series on the
    * Wikipedia "Transverse Mercator: flattening series" page).
    */
  final case class TransverseMercator(
      lon0Deg: Double, lat0Deg: Double, k0: Double,
      falseEasting: Double, falseNorthing: Double,
      ell: Ellipsoid, override val name: String) extends Crs {
    val isGeographic = false

    private val n = ell.n
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val n5 = n4 * n; private val n6 = n5 * n
    private val bigA =
      ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)
    private val alpha = Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180 - 127 * n5 / 288 + 7891 * n6 / 37800,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440 + 281 * n5 / 630 - 1983433 * n6 / 1935360,
      61 * n3 / 240 - 103 * n4 / 140 + 15061 * n5 / 26880 + 167603 * n6 / 181440,
      49561 * n4 / 161280 - 179 * n5 / 168 + 6601661 * n6 / 7257600,
      34729 * n5 / 80640 - 3418889 * n6 / 1995840,
      212378941 * n6 / 319334400)
    private val beta = Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360 - 81 * n5 / 512 + 96199 * n6 / 604800,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440 + 46 * n5 / 105 - 1118711 * n6 / 3870720,
      17 * n3 / 480 - 37 * n4 / 840 - 209 * n5 / 4480 + 5569 * n6 / 90720,
      4397 * n4 / 161280 - 11 * n5 / 504 - 830251 * n6 / 7257600,
      4583 * n5 / 161280 - 108847 * n6 / 3991680,
      20648693 * n6 / 638668800)
    private val lon0 = math.toRadians(lon0Deg)
    private val e = ell.e
    // meridian arc from equator to lat0 (= forward northing of (lon0, lat0))
    private val m0 = if (lat0Deg == 0.0) 0.0 else rawNorthing(math.toRadians(lat0Deg))

    private def rawNorthing(phi: Double): Double = {
      val (xi, _) = xiEta(phi, 0.0)
      bigA * xi
    }

    /** conformal (xi', eta') -> series-summed (xi, eta) */
    private def xiEta(phi: Double, dLon: Double): (Double, Double) = {
      val sinPhi = math.sin(phi)
      val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
      val xiP = math.atan2(t, math.cos(dLon))
      val etaP = atanh(math.sin(dLon) / math.sqrt(1 + t * t))
      var xi = xiP; var eta = etaP
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xi += alpha(j) * math.sin(k * xiP) * math.cosh(k * etaP)
        eta += alpha(j) * math.cos(k * xiP) * math.sinh(k * etaP)
        j += 1
      }
      (xi, eta)
    }

    @inline private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      var dLon = math.toRadians(lonDeg) - lon0
      if (dLon > math.Pi) dLon -= 2 * math.Pi
      if (dLon < -math.Pi) dLon += 2 * math.Pi
      val (xi, eta) = xiEta(phi, dLon)
      (falseEasting + k0 * bigA * eta, falseNorthing + k0 * (bigA * xi - m0))
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xi = (y - falseNorthing + k0 * m0) / (k0 * bigA)
      val eta = (x - falseEasting) / (k0 * bigA)
      var xiP = xi; var etaP = eta
      var j = 0
      while (j < 6) {
        val k = 2.0 * (j + 1)
        xiP -= beta(j) * math.sin(k * xi) * math.cosh(k * eta)
        etaP -= beta(j) * math.cos(k * xi) * math.sinh(k * eta)
        j += 1
      }
      val sinhEtaP = math.sinh(etaP)
      val cosXiP = math.cos(xiP)
      val tauP = math.sin(xiP) / math.sqrt(sinhEtaP * sinhEtaP + cosXiP * cosXiP)
      val lon = lon0 + math.atan2(sinhEtaP, cosXiP)
      // Newton-invert the conformal latitude (Karney 2011 eq. 19-21)
      var tau = tauP
      var i = 0
      var delta = 1.0
      while (i < 8 && math.abs(delta) > 1e-14 * (1 + math.abs(tauP))) {
        val sigma = math.sinh(e * atanh(e * tau / math.sqrt(1 + tau * tau)))
        val tauPi = tau * math.sqrt(1 + sigma * sigma) - sigma * math.sqrt(1 + tau * tau)
        val dTau = (tauP - tauPi) * (1 + (1 - ell.e2) * tau * tau) /
          ((1 - ell.e2) * math.sqrt((1 + tauPi * tauPi) * (1 + tau * tau)))
        tau += dTau
        delta = dTau
        i += 1
      }
      (math.toDegrees(lon), math.toDegrees(math.atan(tau)))
    }
  }

  /** Lambert Azimuthal Equal Area on the ellipsoid (Snyder 1987, "Map
    * Projections: A Working Manual", USGS PP 1395, pp. 187-190).
    */
  final case class LambertAzimuthalEqualArea(
      lon0Deg: Double, lat0Deg: Double,
      falseEasting: Double, falseNorthing: Double,
      ell: Ellipsoid, override val name: String) extends Crs {
    val isGeographic = false

    private val e = ell.e
    private val e2 = ell.e2
    private val lon0 = math.toRadians(lon0Deg)
    private val phi1 = math.toRadians(lat0Deg)

    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s) - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private val rq = ell.a * math.sqrt(qp / 2)
    private val beta1 = math.asin(q(phi1) / qp)
    private val sinB1 = math.sin(beta1)
    private val cosB1 = math.cos(beta1)
    private val m1 = math.cos(phi1) / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
    private val dd = ell.a * m1 / (rq * cosB1)

    def fromLonLat(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      var dLon = math.toRadians(lonDeg) - lon0
      if (dLon > math.Pi) dLon -= 2 * math.Pi
      if (dLon < -math.Pi) dLon += 2 * math.Pi
      val beta = math.asin(math.min(1.0, math.max(-1.0, q(phi) / qp)))
      val sinB = math.sin(beta); val cosB = math.cos(beta)
      val b = rq * math.sqrt(2.0 / (1 + sinB1 * sinB + cosB1 * cosB * math.cos(dLon)))
      val x = falseEasting + b * dd * cosB * math.sin(dLon)
      val y = falseNorthing + (b / dd) * (cosB1 * sinB - sinB1 * cosB * math.cos(dLon))
      (x, y)
    }

    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val xr = x - falseEasting
      val yr = y - falseNorthing
      val rho = math.sqrt((xr / dd) * (xr / dd) + (dd * yr) * (dd * yr))
      if (rho < 1e-12) return (lon0Deg, lat0Deg)
      val ce = 2 * math.asin(math.min(1.0, rho / (2 * rq)))
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val qv = qp * (cosCe * sinB1 + (dd * yr * sinCe * cosB1) / rho)
      val lon = lon0 + math.atan2(
        xr * sinCe,
        dd * rho * cosB1 * cosCe - dd * dd * yr * sinB1 * sinCe)
      // iterate phi from q (Snyder eq. 3-16)
      var phi = math.asin(math.min(1.0, math.max(-1.0, qv / 2)))
      var i = 0
      while (i < 10) {
        val s = math.sin(phi)
        val oneMinus = 1 - e2 * s * s
        val corr = (oneMinus * oneMinus) / (2 * math.cos(phi)) *
          (qv / (1 - e2) - s / oneMinus + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        phi += corr
        if (math.abs(corr) < 1e-13) i = 10 else i += 1
      }
      (math.toDegrees(lon), math.toDegrees(phi))
    }
  }

  /** CF `rotated_latitude_longitude`: a geographic system whose north
    * pole sits at (grid_north_pole_latitude, grid_north_pole_longitude)
    * of the true sphere, with an optional extra rotation
    * `north_pole_grid_longitude` about the new axis. Spherical rotation
    * formulas as in PROJ's `+proj=ob_tran +o_proj=longlat` with
    * `o_lat_p = poleLat`, `lon_0 = poleLon + 180`, `o_lon_p = axisLon`
    * (the standard CORDEX/COSMO transformation; reference parses the CF
    * params via pyproj at cfconv.py:215-221,
    * tests/gridmapping/test_cfconv.py:239-285).
    *
    * `x`/`y` are rotated lon/lat DEGREES. Modeled with
    * `isGeographic = false`: although the axes are angular, treating a
    * rotated grid as interchangeable with WGS84 (the both-geographic
    * equality shortcut) would silently skip the pole rotation.
    */
  final case class RotatedPole(
      poleLatDeg: Double, poleLonDeg: Double, axisLonDeg: Double,
      override val name: String) extends Crs {
    val isGeographic = false

    private val theta = math.toRadians(poleLatDeg)
    private val sinT = math.sin(theta); private val cosT = math.cos(theta)
    private val lon0Deg = poleLonDeg + 180.0

    /** rotated (rlon, rlat) degrees -> true (lon, lat) degrees */
    def toLonLat(x: Double, y: Double): (Double, Double) = {
      val lr = math.toRadians(x + axisLonDeg)
      val pr = math.toRadians(y)
      val cosPr = math.cos(pr); val sinPr = math.sin(pr)
      val sinPhi = sinPr * sinT + cosPr * cosT * math.cos(lr)
      val phi = math.asin(math.min(1.0, math.max(-1.0, sinPhi)))
      val lon = lon0Deg + math.toDegrees(math.atan2(
        cosPr * math.sin(lr), sinT * cosPr * math.cos(lr) - sinPr * cosT))
      (normLon(lon), math.toDegrees(phi))
    }

    /** true (lon, lat) degrees -> rotated (rlon, rlat) degrees */
    def fromLonLat(lon: Double, lat: Double): (Double, Double) = {
      val dl = math.toRadians(lon - lon0Deg)
      val phi = math.toRadians(lat)
      val cosPhi = math.cos(phi); val sinPhi = math.sin(phi)
      val sinPr = sinT * sinPhi - cosT * cosPhi * math.cos(dl)
      val pr = math.asin(math.min(1.0, math.max(-1.0, sinPr)))
      val lr = math.atan2(cosPhi * math.sin(dl), sinT * cosPhi * math.cos(dl) + cosT * sinPhi)
      (normLon(math.toDegrees(lr) - axisLonDeg), math.toDegrees(pr))
    }

    @inline private def normLon(l: Double): Double =
      if (l > 180.0) l - 360.0 else if (l < -180.0) l + 360.0 else l
  }

  def utm(zone: Int, north: Boolean): Crs = TransverseMercator(
    lon0Deg = zone * 6.0 - 183.0, lat0Deg = 0.0, k0 = 0.9996,
    falseEasting = 500000.0, falseNorthing = if (north) 0.0 else 10000000.0,
    ell = WGS84, name = s"EPSG:${if (north) 32600 + zone else 32700 + zone}")

  val laea3035: Crs = LambertAzimuthalEqualArea(
    lon0Deg = 10.0, lat0Deg = 52.0,
    falseEasting = 4321000.0, falseNorthing = 3210000.0,
    ell = GRS80, name = "EPSG:3035")

  /** Parse the EPSG identifiers the engine supports. */
  def fromString(s: String): Crs = s.trim.toUpperCase match {
    case "EPSG:4326" | "OGC:CRS84" | "CRS84" | "WGS84" | "EPSG:4979" => Geographic
    case "EPSG:3035" => laea3035
    case c if c.startsWith("EPSG:326") && c.length == 10 => utm(c.drop(8).toInt, north = true)
    case c if c.startsWith("EPSG:327") && c.length == 10 => utm(c.drop(8).toInt, north = false)
    case other => throw new IllegalArgumentException(s"unsupported CRS: $other")
  }
}

/** A reusable transformer between two CRSes (composes through lon/lat),
  * the analog of the reference's `pyproj.Transformer` usage
  * (reference: xcube_resampling/reproject.py:124-126).
  */
final case class CrsTransformer(src: Crs, dst: Crs) extends Serializable {
  val isIdentity: Boolean = src.equalsCrs(dst)

  def transformPoint(x: Double, y: Double): (Double, Double) =
    if (isIdentity) (x, y)
    else {
      val (lon, lat) = src.toLonLat(x, y)
      dst.fromLonLat(lon, lat)
    }

  /** In-place transform of parallel coordinate arrays (hot path). */
  def transformArrays(xs: Array[Double], ys: Array[Double]): Unit =
    if (!isIdentity) {
      var i = 0
      while (i < xs.length) {
        val (px, py) = transformPoint(xs(i), ys(i))
        xs(i) = px; ys(i) = py
        i += 1
      }
    }

  /** Transform a bbox by densifying its edges (same idea as pyproj's
    * `transform_bounds`; reference uses it at
    * xcube_resampling/gridmapping/transform.py:100-106).
    */
  def transformBounds(
      xMin: Double, yMin: Double, xMax: Double, yMax: Double,
      densify: Int = 21): (Double, Double, Double, Double) = {
    if (isIdentity) return (xMin, yMin, xMax, yMax)
    var oxMin = Double.PositiveInfinity; var oyMin = Double.PositiveInfinity
    var oxMax = Double.NegativeInfinity; var oyMax = Double.NegativeInfinity
    val n = math.max(densify, 2)
    var i = 0
    while (i <= n) {
      val t = i.toDouble / n
      val xi = xMin + t * (xMax - xMin)
      val yi = yMin + t * (yMax - yMin)
      val pts = Array(
        transformPoint(xi, yMin), transformPoint(xi, yMax),
        transformPoint(xMin, yi), transformPoint(xMax, yi))
      pts.foreach { case (px, py) =>
        if (px < oxMin) oxMin = px; if (px > oxMax) oxMax = px
        if (py < oyMin) oyMin = py; if (py > oyMax) oyMax = py
      }
      i += 1
    }
    (oxMin, oyMin, oxMax, oyMax)
  }
}
