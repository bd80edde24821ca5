package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Grid CRS transform golden parity
  * (reference: tests/gridmapping/test_transform.py:36-106) — the
  * expected UTM coordinate images are pyproj outputs printed to ~1e-6,
  * directly validating the Krueger-Karney TM implementation.
  */
class TransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("transform 3x3 CRS84 grid to UTM 32N matches pyproj goldens") {
    val gm = GridMapping.regular(3, 3, 10.0, 53.0, 0.1, 0.1, Crs.Geographic)
    val (gmT, coords) = GridMappingOps.transform(spark, gm, None, Crs.utm(32, north = true))
    assert(!gmT.isRegular)
    assert(gmT.crs.name == "EPSG:32632")
    val xs = TestSpark.toArray(coords.collect().toSeq, gm, "x")
    val ys = TestSpark.toArray(coords.collect().toSeq, gm, "y")
    val wantX = Array(
      Array(570057.076286, 576728.9360228, 583400.7295284),
      Array(570220.3304187, 576907.7404859, 583595.0849538),
      Array(570383.3684844, 577086.3083212, 583789.1831954))
    val wantY = Array(
      Array(5900595.928991, 5900698.5746648, 5900810.5532744),
      Array(5889471.9033896, 5889574.6540572, 5889686.7472201),
      Array(5878348.0594403, 5878450.9138481, 5878563.1201969))
    TestSpark.assertImage(xs, wantX, tol = 1e-5)
    TestSpark.assertImage(ys, wantY, tol = 1e-5)
  }

  test("transform is a no-op for an equal CRS") {
    val gm = GridMapping.regular(3, 3, 10.0, 53.0, 0.1, 0.1, Crs.Geographic)
    val (gmT, _) = GridMappingOps.transform(spark, gm, None, Crs.Geographic)
    assert(gmT == gm)
  }

  /** Local scale factors of a projection by central finite differences:
    * (along-meridian k, along-parallel h) at (lon, lat).
    */
  private def scaleFactors(crs: Crs, lon: Double, lat: Double): (Double, Double) = {
    val dDeg = 1e-6
    val ell = Crs.WGS84 // close enough for radius-of-curvature normalization at 1e-6 tol
    val phi = math.toRadians(lat)
    val s2 = math.sin(phi) * math.sin(phi)
    val a = 6378137.0
    val e2 = crs match {
      case t: Crs.TransverseMercator => t.ell.e2
      case l: Crs.LambertConformalConic => l.ell.e2
      case p: Crs.PolarStereographic => p.ell.e2
      case _ => ell.e2
    }
    val m = a * (1 - e2) / math.pow(1 - e2 * s2, 1.5) // meridian radius
    val n = a / math.sqrt(1 - e2 * s2) // prime vertical radius
    val (x0, y0) = crs.fromLonLat(lon, lat - dDeg)
    val (x1, y1) = crs.fromLonLat(lon, lat + dDeg)
    val dMer = math.hypot(x1 - x0, y1 - y0) / (2 * math.toRadians(dDeg) * m)
    val (x2, y2) = crs.fromLonLat(lon - dDeg, lat)
    val (x3, y3) = crs.fromLonLat(lon + dDeg, lat)
    val dPar = math.hypot(x3 - x2, y3 - y2) / (2 * math.toRadians(dDeg) * n * math.cos(phi))
    (dMer, dPar)
  }

  test("Lambert conformal conic (Lambert-93): unit scale on both standard parallels, conformal, exact roundtrip") {
    val lcc = Crs.lambert93
    // defining property: scale factor 1 on each standard parallel
    for (lat <- Seq(44.0, 49.0); lon <- Seq(-1.0, 3.0, 7.5)) {
      val (kM, kP) = scaleFactors(lcc, lon, lat)
      assert(math.abs(kM - 1.0) < 1e-6 && math.abs(kP - 1.0) < 1e-6,
        s"scale at ($lon,$lat): $kM/$kP")
    }
    // conformality: meridian and parallel scales agree everywhere
    for (lat <- Seq(42.3, 46.5, 50.7); lon <- Seq(-4.2, 3.0, 8.9)) {
      val (kM, kP) = scaleFactors(lcc, lon, lat)
      assert(math.abs(kM - kP) < 1e-6, s"anisotropy at ($lon,$lat): $kM vs $kP")
    }
    // central meridian maps to x = false easting; origin to (FE, FN)
    assert(math.abs(lcc.fromLonLat(3.0, 44.2)._1 - 700000.0) < 1e-6)
    val (ox, oy) = lcc.fromLonLat(3.0, 46.5)
    assert(math.abs(ox - 700000.0) < 1e-6 && math.abs(oy - 6600000.0) < 1e-6)
    // roundtrip to sub-nanodegree
    for (lat <- Seq(41.0, 46.5, 51.0); lon <- Seq(-5.0, 3.0, 9.6)) {
      val (x, y) = lcc.fromLonLat(lon, lat)
      val (lon2, lat2) = lcc.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("polar stereographic: unit scale at the standard parallel, pole at origin, exact roundtrip (N and S)") {
    for ((crs, latTs, south) <- Seq(
        (Crs.npsPolarStereo, 70.0, false), (Crs.antarcticPolarStereo, -71.0, true))) {
      for (lon <- Seq(-120.0, -45.0, 0.0, 60.0)) {
        val (kM, kP) = scaleFactors(crs, lon, latTs)
        assert(math.abs(kM - 1.0) < 1e-6 && math.abs(kP - 1.0) < 1e-6,
          s"scale at ($lon,$latTs): $kM/$kP")
      }
      val pole = if (south) -90.0 else 90.0
      val (px, py) = crs.fromLonLat(12.0, pole)
      assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6, s"pole -> ($px,$py)")
      for (lat <- Seq(pole * 0.95, pole * 0.75); lon <- Seq(-170.0, -45.0, 33.0)) {
        val (x, y) = crs.fromLonLat(lon, lat)
        val (lon2, lat2) = crs.toLonLat(x, y)
        assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
          s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
      }
    }
  }

  test("web mercator: equator scale 1 in x, known y identity, roundtrip") {
    val wm = Crs.WebMercator
    val (x, y) = wm.fromLonLat(180.0, 0.0)
    assert(math.abs(x - math.Pi * 6378137.0) < 1e-6 && math.abs(y) < 1e-9)
    for (lat <- Seq(-75.0, -20.0, 0.0, 40.0, 85.0); lon <- Seq(-179.0, 0.0, 66.6)) {
      val (px, py) = wm.fromLonLat(lon, lat)
      val (lon2, lat2) = wm.toLonLat(px, py)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9)
    }
  }

  test("roundtrip transform preserves geometry within tolerance") {
    val gm = GridMapping.regular(4, 4, 9.0, 52.0, 0.5, 0.5, Crs.Geographic)
    val (gmUtm, coordsUtm) = GridMappingOps.transform(spark, gm, None, Crs.utm(32, north = true))
    val (gmBack, coordsBack) = GridMappingOps.transform(
      spark, gmUtm, Some(coordsUtm), Crs.Geographic)
    val xs = TestSpark.toArray(coordsBack.collect().toSeq, gm, "x")
    for (j <- 0 until 4; i <- 0 until 4)
      assert(math.abs(xs(j)(i) - gm.xCoord(i)) < 1e-9)
  }
}
