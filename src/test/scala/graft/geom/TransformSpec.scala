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

  test("Albers equal-area conic: area scale 1 everywhere, unit parallel scale on standard parallels, exact roundtrip") {
    val aea = Crs.conusAlbers // EPSG:5070
    // defining property: the product of meridian and parallel scales is
    // 1 EVERYWHERE (equal-area), and the parallel scale alone is 1 on
    // each standard parallel
    for (lat <- Seq(29.5, 45.5); lon <- Seq(-120.0, -96.0, -75.0)) {
      val (kM, kP) = scaleFactors(aea, lon, lat)
      assert(math.abs(kP - 1.0) < 1e-6 && math.abs(kM * kP - 1.0) < 1e-6,
        s"scale at ($lon,$lat): $kM/$kP")
    }
    for (lat <- Seq(24.0, 37.5, 48.9); lon <- Seq(-123.4, -96.0, -67.1)) {
      val (kM, kP) = scaleFactors(aea, lon, lat)
      assert(math.abs(kM * kP - 1.0) < 1e-6, s"area distortion at ($lon,$lat): ${kM * kP}")
    }
    // projection origin maps to (FE, FN) = (0, 0); central meridian to x = 0
    val (ox, oy) = aea.fromLonLat(-96.0, 23.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6, s"origin -> ($ox,$oy)")
    assert(math.abs(aea.fromLonLat(-96.0, 41.3)._1) < 1e-6)
    // roundtrip to sub-nanodegree over CONUS
    for (lat <- Seq(25.0, 37.5, 49.0); lon <- Seq(-124.0, -96.0, -66.9)) {
      val (x, y) = aea.fromLonLat(lon, lat)
      val (lon2, lat2) = aea.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // single-parallel degenerate form stays finite and roundtrips
    val one = Crs.AlbersEqualAreaConic(40.0, 40.0, 35.0, -100.0, 0.0, 0.0, Crs.WGS84, "aea1")
    val (x1, y1) = one.fromLonLat(-97.0, 42.0)
    val (l1, p1) = one.toLonLat(x1, y1)
    assert(math.abs(l1 + 97.0) < 1e-9 && math.abs(p1 - 42.0) < 1e-9)
  }

  test("Equal Earth: equal-area everywhere, published aspect ratio, exact roundtrip, all parse routes") {
    val ee = Crs.fromString("EPSG:8857").asInstanceOf[Crs.EqualEarth]
    // the defining property is the JACOBIAN DETERMINANT equal to the
    // ellipsoidal area element (kM*kP = 1 would be wrong here: a
    // pseudocylindrical's meridians are not orthogonal to parallels
    // away from the central meridian, unlike the conic families)
    for (lat <- Seq(-66.5, -20.0, 0.0, 37.5, 71.0); lon <- Seq(-150.0, -30.0, 0.0, 111.0)) {
      val h = 1e-6 // degrees
      def pt(lo: Double, la: Double) = ee.fromLonLat(lo, la)
      val (x0, y0) = pt(lon - h, lat); val (x1, y1) = pt(lon + h, lat)
      val (x2, y2) = pt(lon, lat - h); val (x3, y3) = pt(lon, lat + h)
      val dRad = math.toRadians(2 * h)
      val dxdl = (x1 - x0) / dRad; val dydl = (y1 - y0) / dRad
      val dxdp = (x3 - x2) / dRad; val dydp = (y3 - y2) / dRad
      val det = dxdl * dydp - dxdp * dydl
      val s = math.sin(math.toRadians(lat))
      val a = Crs.WGS84.a; val e2 = Crs.WGS84.e2
      val areaElem = a * a * (1 - e2) * math.cos(math.toRadians(lat)) /
        math.pow(1 - e2 * s * s, 2)
      assert(math.abs(det / areaElem - 1.0) < 1e-5,
        s"area distortion at ($lon,$lat): ${det / areaElem}")
    }
    // published shape: width/height ratio 2.0546 (Savric et al. 2018)
    val xMax = ee.fromLonLat(180.0, 0.0)._1
    val yMax = ee.fromLonLat(0.0, 90.0)._2
    assert(math.abs(xMax / yMax - 2.0546) < 1e-3, s"aspect ${xMax / yMax}")
    // equator/central-meridian anchors and sub-nanodegree roundtrips
    assert(math.abs(ee.fromLonLat(0.0, 0.0)._1) < 1e-9 && math.abs(ee.fromLonLat(0.0, 0.0)._2) < 1e-9)
    for (lat <- Seq(-89.9, -45.0, 0.0, 33.3, 84.0); lon <- Seq(-179.5, -97.0, 0.0, 10.0, 179.5)) {
      val (x, y) = ee.fromLonLat(lon, lat)
      val (lon2, lat2) = ee.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // pole roundtrips through the authalic short-circuit
    val (px, py) = ee.fromLonLat(12.0, 90.0)
    assert(math.abs(ee.toLonLat(px, py)._2 - 90.0) < 1e-9)
    // proj-string and WKT routes build the same projection
    val viaProj = Crs.fromProjString("+proj=eqearth +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
    assert(viaProj.asInstanceOf[Crs.EqualEarth].copy(name = ee.name) == ee)
    val viaWkt = Crs.fromWkt(
      """PROJCRS["WGS 84 / Equal Earth Greenwich",
        |  BASEGEOGCRS["WGS 84", ELLIPSOID["WGS 84",6378137,298.257223563]],
        |  CONVERSION["Equal Earth Greenwich", METHOD["Equal Earth"],
        |    PARAMETER["Longitude of natural origin",0],
        |    PARAMETER["False easting",0], PARAMETER["False northing",0]]]""".stripMargin)
    assert(viaWkt.asInstanceOf[Crs.EqualEarth].copy(name = ee.name) == ee)
  }

  test("EPSG registry: 5070/102003/27700/25832/3995/3976/5069 parse to correctly-parameterized families") {
    import Crs._
    assert(fromString("EPSG:5070") == conusAlbers)
    assert(fromString("ESRI:102003") == usaContiguousAlbers)
    // 27700 is served datum-shifted; the projection math lives in base
    val bng = fromString("EPSG:27700").asInstanceOf[DatumShifted].base.asInstanceOf[TransverseMercator]
    assert(bng.ell == Airy1830 && bng.lon0Deg == -2.0 && bng.falseNorthing == -100000.0)
    // BNG true origin (2W, 49N) maps to (400000, -100000)
    val (bx, by) = bng.fromLonLat(-2.0, 49.0)
    assert(math.abs(bx - 400000.0) < 1e-6 && math.abs(by + 100000.0) < 1e-6)
    val etrs = fromString("EPSG:25832").asInstanceOf[TransverseMercator]
    assert(etrs.ell == GRS80 && etrs.lon0Deg == 9.0)
    assert(fromString("EPSG:3995").asInstanceOf[PolarStereographic].latTsDeg == 71.0)
    assert(fromString("EPSG:3976").asInstanceOf[PolarStereographic].south)
    assert(fromString("EPSG:5069").isInstanceOf[LambertConformalConic])
    // proj-string and WKT routes build the same Albers parameters
    val viaProj = fromProjString(
      "+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 +x_0=0 +y_0=0 +ellps=GRS80")
      .asInstanceOf[AlbersEqualAreaConic]
    assert(viaProj.copy(name = conusAlbers.name) == conusAlbers)
    val viaWkt = fromWkt(
      """PROJCS["NAD83 / Conus Albers",GEOGCS["NAD83",DATUM["North_American_Datum_1983",
        |SPHEROID["GRS 1980",6378137,298.257222101]]],
        |PROJECTION["Albers_Conic_Equal_Area"],
        |PARAMETER["standard_parallel_1",29.5],PARAMETER["standard_parallel_2",45.5],
        |PARAMETER["latitude_of_center",23],PARAMETER["longitude_of_center",-96],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0]]""".stripMargin)
      .asInstanceOf[AlbersEqualAreaConic]
    assert(viaWkt.copy(name = conusAlbers.name, ell = GRS80) == conusAlbers)
    assert(math.abs(viaWkt.ell.a - GRS80.a) < 1e-9 && math.abs(viaWkt.ell.invF - GRS80.invF) < 1e-9)
  }

  test("EPSG registry growth: NZTM, LCC Europe, Hughes polar stereo, Equal Earth aspects, sphere sinusoidal, UTM ranges") {
    import Crs._
    // NZTM2000: true-origin anchor (173E, 0N) -> (FE, FN); Wellington
    // lands in the published coordinate neighborhood
    val nztm = fromString("EPSG:2193").asInstanceOf[TransverseMercator]
    assert(nztm.ell == GRS80 && nztm.lon0Deg == 173.0)
    val (ox, oy) = nztm.fromLonLat(173.0, 0.0)
    assert(math.abs(ox - 1600000.0) < 1e-6 && math.abs(oy - 10000000.0) < 1e-6)
    val (wx, wy) = nztm.fromLonLat(174.7762, -41.2865) // Wellington
    assert(math.abs(wx - 1749000.0) < 5000 && math.abs(wy - 5428000.0) < 5000,
      s"Wellington NZTM ($wx,$wy)")
    // ETRS89-LCC Europe: grid origin (10E, 52N) -> (FE, FN), exact roundtrip
    val lcc = fromString("EPSG:3034").asInstanceOf[LambertConformalConic]
    val (gx, gy) = lcc.fromLonLat(10.0, 52.0)
    assert(math.abs(gx - 4000000.0) < 1e-6 && math.abs(gy - 2800000.0) < 1e-6)
    // legacy NSIDC grids carry the Hughes 1980 ellipsoid, pole at origin
    val n3411 = fromString("EPSG:3411").asInstanceOf[PolarStereographic]
    assert(n3411.ell == Hughes1980 && !n3411.south && n3411.lon0Deg == -45.0)
    val (px, py) = n3411.fromLonLat(0.0, 90.0)
    assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
    assert(fromString("EPSG:3412").asInstanceOf[PolarStereographic].south)
    // Equal Earth aspects differ only in the central meridian: the
    // Americas/Asia-Pacific grids map their own lon0 like Greenwich maps 0
    val ee0 = fromString("EPSG:8857"); val eeA = fromString("EPSG:8858")
    val eeP = fromString("EPSG:8859")
    for (lat <- Seq(-48.7, 0.0, 33.9)) {
      val want = ee0.fromLonLat(0.0, lat)
      for ((crs, lon0) <- Seq((eeA, -90.0), (eeP, 150.0))) {
        val got = crs.fromLonLat(lon0, lat)
        assert(math.abs(got._1 - want._1) < 1e-9 && math.abs(got._2 - want._2) < 1e-9)
      }
    }
    // sphere sinusoidal: x(180, 0) = pi * R on the 6371000 sphere
    val s53008 = fromString("ESRI:53008").asInstanceOf[Sinusoidal]
    assert(math.abs(s53008.fromLonLat(180.0, 0.0)._1 - math.Pi * 6371000.0) < 1e-6)
    // parametric UTM families: ETRS89 zones 28-38, NAD83 zones 1-23
    for (z <- 28 to 38) {
      val c = fromString(f"EPSG:258$z%02d").asInstanceOf[TransverseMercator]
      assert(c.ell == GRS80 && c.lon0Deg == z * 6.0 - 183.0 && c.falseNorthing == 0.0)
    }
    for (z <- Seq(1, 10, 17, 23)) {
      val c = fromString(f"EPSG:269$z%02d").asInstanceOf[TransverseMercator]
      assert(c.ell == GRS80 && c.lon0Deg == z * 6.0 - 183.0)
    }
    // out-of-range zones fail loudly instead of inventing a grid
    intercept[IllegalArgumentException](fromString("EPSG:25839"))
    intercept[IllegalArgumentException](fromString("EPSG:26924"))
    // round-6 registry growth: national TM zones, Austria's Bessel LCC,
    // EASE-Grid 2.0 and pan-Arctic LAEA aspects
    val tm35 = fromString("EPSG:3067").asInstanceOf[TransverseMercator]
    assert(tm35.ell == GRS80 && tm35.lon0Deg == 27.0 && tm35.k0 == 0.9996)
    val cs92 = fromString("EPSG:2180").asInstanceOf[TransverseMercator]
    assert(cs92.lon0Deg == 19.0 && cs92.falseNorthing == -5300000.0)
    val austria = fromString("EPSG:31287").asInstanceOf[DatumShifted].base.asInstanceOf[LambertConformalConic]
    assert(austria.ell == Bessel1841 && austria.lat1Deg == 49.0 && austria.lat2Deg == 46.0)
    // Vienna lands near the published MGI/Lambert neighborhood
    val (vx, vy) = austria.fromLonLat(16.3738, 48.2082)
    assert(math.abs(vx - 625000.0) < 15000 && math.abs(vy - 483000.0) < 15000,
      s"Vienna EPSG:31287 ($vx,$vy)")
    for (code <- Seq("EPSG:6931", "EPSG:3574", "EPSG:3575")) {
      val l = fromString(code).asInstanceOf[LambertAzimuthalEqualArea]
      assert(l.lat0Deg == 90.0 && l.falseEasting == 0.0)
      val (px2, py2) = l.fromLonLat(0.0, 90.0)
      assert(math.abs(px2) < 1e-6 && math.abs(py2) < 1e-6, s"$code pole not origin")
    }
    assert(fromString("EPSG:6932").asInstanceOf[LambertAzimuthalEqualArea].lat0Deg == -90.0)
    // UPS: the registry's lat_ts must reproduce the DEFINING k0 = 0.994
    // pole scale on WGS84 (Variant A <-> Variant B equivalence):
    // k_pole = m/(2t) * sqrt((1+e)^(1+e) (1-e)^(1-e)) at lat_ts
    val ups = fromString("EPSG:5041").asInstanceOf[PolarStereographic]
    locally {
      val f = 1 / 298.257223563; val e2u = f * (2 - f); val eu = math.sqrt(e2u)
      val phi = math.toRadians(ups.latTsDeg)
      val tU = math.tan(math.Pi / 4 - phi / 2) *
        math.pow((1 + eu * math.sin(phi)) / (1 - eu * math.sin(phi)), eu / 2)
      val mU = math.cos(phi) / math.sqrt(1 - e2u * math.sin(phi) * math.sin(phi))
      val kPole = mU / (2 * tU) *
        math.sqrt(math.pow(1 + eu, 1 + eu) * math.pow(1 - eu, 1 - eu))
      assert(math.abs(kPole - 0.994) < 1e-9, s"UPS pole scale $kPole")
    }
    // pole at the false origin, both hemispheres; legacy aliases agree
    val (ux, uy) = ups.fromLonLat(77.0, 90.0)
    assert(math.abs(ux - 2000000.0) < 1e-6 && math.abs(uy - 2000000.0) < 1e-6)
    val upsS = fromString("EPSG:5042")
    val (sx, sy) = upsS.fromLonLat(-12.0, -90.0)
    assert(math.abs(sx - 2000000.0) < 1e-6 && math.abs(sy - 2000000.0) < 1e-6)
    assert(fromString("EPSG:32661") eq ups)
    assert(fromString("EPSG:32761") eq upsS)
    for ((lon, lat) <- Seq((0.0, 85.0), (120.0, 80.5), (-45.0, 88.0))) {
      val (x, y) = ups.fromLonLat(lon, lat)
      val (lon2, lat2) = ups.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
        s"UPS roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // every new registry code roundtrips exactly at spread test points
    for (code <- Seq("EPSG:2193", "EPSG:3034", "EPSG:3411", "EPSG:3412",
        "EPSG:8858", "EPSG:8859", "ESRI:53008", "EPSG:25828", "EPSG:26910",
        "EPSG:3067", "EPSG:2180", "EPSG:31287", "EPSG:6931", "EPSG:6932",
        "EPSG:3574", "EPSG:3575")) {
      val crs = fromString(code)
      val pts = code match {
        case "EPSG:2193" => Seq((168.0, -46.5), (174.8, -41.3), (178.0, -37.0))
        case "EPSG:3034" => Seq((-10.0, 35.0), (10.0, 52.0), (30.0, 65.0))
        case "EPSG:3411" => Seq((-45.0, 70.0), (10.0, 80.0), (-120.0, 55.0))
        case "EPSG:3412" => Seq((0.0, -70.0), (90.0, -80.0), (-150.0, -55.0))
        case "EPSG:25828" => Seq((-15.0, 28.0), (-9.0, 39.0), (-13.0, 55.0))
        case "EPSG:26910" => Seq((-123.0, 38.0), (-126.0, 49.0), (-120.0, 32.0))
        case "EPSG:3067" => Seq((21.0, 60.2), (27.0, 65.0), (30.5, 69.5))
        case "EPSG:2180" => Seq((15.0, 49.5), (19.0, 52.0), (23.8, 54.8))
        case "EPSG:31287" => Seq((10.0, 47.0), (13.33, 47.5), (16.9, 48.6))
        case "EPSG:6931" | "EPSG:3574" | "EPSG:3575" =>
          Seq((-40.0, 45.0), (10.0, 89.0), (135.0, 60.0))
        case "EPSG:6932" => Seq((0.0, -89.0), (80.0, -50.0), (-150.0, -70.0))
        case _ => Seq((-170.0, -60.0), (0.0, 0.0), (77.7, 44.4))
      }
      for ((lon, lat) <- pts) {
        val (x, y) = crs.fromLonLat(lon, lat)
        val (lon2, lat2) = crs.toLonLat(x, y)
        assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7,
          s"$code roundtrip ($lon,$lat) -> ($lon2,$lat2)")
      }
    }
  }

  test("Swiss oblique mercator: Bern origin exact, city anchors, conformal scale, LV95 offset, parse routes") {
    import Crs._
    // native-datum projection math (the registry serves the
    // datum-shifted wrapper; its own goldens live in the datum test)
    val lv03 = fromString("EPSG:21781").asInstanceOf[DatumShifted].base
    // the projection center maps to the false origin EXACTLY (l = 0,
    // b = b0 by construction of K)
    val (bx, by) = lv03.fromLonLat(7.0 + 26.0 / 60 + 22.5 / 3600, 46.0 + 57.0 / 60 + 8.66 / 3600)
    assert(math.abs(bx - 600000.0) < 1e-6 && math.abs(by - 200000.0) < 1e-6)
    // well-known city coordinates in LV03 (km-scale sanity anchors)
    val (zx, zy) = lv03.fromLonLat(8.5417, 47.3769) // Zurich
    assert(math.abs(zx - 683500.0) < 2000 && math.abs(zy - 248000.0) < 2000,
      s"Zurich LV03 ($zx,$zy)")
    val (gx, gy) = lv03.fromLonLat(6.1432, 46.2044) // Geneva
    assert(math.abs(gx - 500000.0) < 3000 && math.abs(gy - 117500.0) < 3000,
      s"Geneva LV03 ($gx,$gy)")
    // conformality: finite-difference scale is direction-independent
    // and ~1 near the center (k0 = 1 at the origin)
    val h = 1e-4
    val (x0, y0) = lv03.fromLonLat(7.44, 46.95)
    val (xe, ye) = lv03.fromLonLat(7.44 + h, 46.95)
    val (xn, yn) = lv03.fromLonLat(7.44, 46.95 + h)
    val mPerDegLat = 111132.95  // approx at 47N on Bessel; only ratios matter
    val se = math.hypot(xe - x0, ye - y0) / (h * mPerDegLat * math.cos(math.toRadians(46.95)))
    val sn = math.hypot(xn - x0, yn - y0) / (h * 111132.95)
    assert(math.abs(se / sn - 1.0) < 5e-3, s"anisotropy se=$se sn=$sn")
    assert(math.abs(sn - 1.0) < 5e-3, s"scale at center $sn")
    // LV95 is LV03 shifted by exactly (+2 000 000, +1 000 000)
    val lv95 = fromString("EPSG:2056").asInstanceOf[DatumShifted].base
    for ((lon, lat) <- Seq((7.0, 46.0), (8.5417, 47.3769), (9.8, 46.5))) {
      val (a3, b3) = lv03.fromLonLat(lon, lat)
      val (a5, b5) = lv95.fromLonLat(lon, lat)
      assert(math.abs(a5 - a3 - 2000000.0) < 1e-6 && math.abs(b5 - b3 - 1000000.0) < 1e-6)
    }
    // exact roundtrip across the country
    for (lon <- Seq(6.0, 7.44, 8.5, 10.4); lat <- Seq(45.9, 46.95, 47.8)) {
      val (x, y) = lv03.fromLonLat(lon, lat)
      val (lon2, lat2) = lv03.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // proj-string route builds the same projection
    val viaProj = fromProjString(
      "+proj=somerc +lat_0=46.95240555555556 +lon_0=7.439583333333333 +k_0=1 " +
        "+x_0=600000 +y_0=200000 +ellps=bessel").asInstanceOf[SwissObliqueMercator]
    val (px, py) = viaProj.fromLonLat(8.5417, 47.3769)
    assert(math.abs(px - zx) < 1e-6 && math.abs(py - zy) < 1e-6)
    // WKT route: Hotine azimuth-90 form is the Swiss projection;
    // a genuinely oblique azimuth fails loudly instead of guessing
    val viaWkt = fromWkt(
      """PROJCS["CH1903 / LV03",GEOGCS["CH1903",DATUM["CH1903",
        |SPHEROID["Bessel 1841",6377397.155,299.1528128]]],
        |PROJECTION["Hotine_Oblique_Mercator_Azimuth_Center"],
        |PARAMETER["latitude_of_center",46.95240555555556],
        |PARAMETER["longitude_of_center",7.439583333333333],
        |PARAMETER["azimuth",90],PARAMETER["rectified_grid_angle",90],
        |PARAMETER["scale_factor",1],
        |PARAMETER["false_easting",600000],PARAMETER["false_northing",200000]]""".stripMargin)
    val (wx, wy) = viaWkt.fromLonLat(8.5417, 47.3769)
    assert(math.abs(wx - zx) < 1e-6 && math.abs(wy - zy) < 1e-6)
    intercept[IllegalArgumentException](fromWkt(
      """PROJCS["x",GEOGCS["y",DATUM["z",SPHEROID["WGS 84",6378137,298.257223563]]],
        |PROJECTION["Hotine_Oblique_Mercator"],PARAMETER["azimuth",53.31582],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0]]""".stripMargin))
  }

  test("Krovak East North: Prague anchor, negative axes, conformal scale, exact roundtrip, parse routes") {
    import Crs._
    val kr = fromString("EPSG:5514").asInstanceOf[DatumShifted].base
    // Prague city centre in S-JTSK East North: approx (-743 km, -1043 km)
    val (px, py) = kr.fromLonLat(14.4208, 50.0875)
    assert(math.abs(px - -743000.0) < 5000 && math.abs(py - -1043500.0) < 5000,
      s"Prague EPSG:5514 ($px,$py)")
    // the whole country maps to negative coordinates (westing/southing)
    for ((lon, lat) <- Seq((12.1, 50.2), (14.42, 50.09), (17.2, 49.2), (21.9, 48.6))) {
      val (x, y) = kr.fromLonLat(lon, lat)
      assert(x < 0 && y < 0, s"($lon,$lat) -> ($x,$y) not in the negative quadrant")
    }
    // Brno lies ~185 km ESE of Prague: direction and distance sanity
    val (bx, by) = kr.fromLonLat(16.6068, 49.1951)
    assert(bx > px && by < py)
    val distKm = math.hypot(bx - px, by - py) / 1000
    assert(math.abs(distKm - 185.0) < 15.0, s"Prague-Brno $distKm km")
    // conformal: finite-difference scale direction-independent near the
    // pseudo-standard parallel region, magnitude ~kP
    val h = 1e-4
    val (x0, y0) = kr.fromLonLat(15.0, 49.7)
    val (xe, ye) = kr.fromLonLat(15.0 + h, 49.7)
    val (xn, yn) = kr.fromLonLat(15.0, 49.7 + h)
    val se = math.hypot(xe - x0, ye - y0) / (h * 111132.95 * math.cos(math.toRadians(49.7)))
    val sn = math.hypot(xn - x0, yn - y0) / (h * 111132.95)
    assert(math.abs(se / sn - 1.0) < 5e-3, s"anisotropy se=$se sn=$sn")
    assert(math.abs(sn - 1.0) < 2e-2, s"scale $sn far from kP")
    // exact roundtrip across the Czech and Slovak territory
    for (lon <- Seq(12.5, 14.42, 17.0, 20.5); lat <- Seq(47.9, 49.0, 50.8)) {
      val (x, y) = kr.fromLonLat(lon, lat)
      val (lon2, lat2) = kr.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // proj-string and WKT routes build the same projection
    val viaProj = fromProjString("+proj=krovak +ellps=bessel").asInstanceOf[Krovak]
    val (vx, vy) = viaProj.fromLonLat(14.4208, 50.0875)
    assert(math.abs(vx - px) < 1e-6 && math.abs(vy - py) < 1e-6)
    intercept[IllegalArgumentException](fromProjString("+proj=krovak +czech +ellps=bessel"))
    val viaWkt = fromWkt(
      """PROJCS["S-JTSK / Krovak East North",GEOGCS["S-JTSK",DATUM["S_JTSK",
        |SPHEROID["Bessel 1841",6377397.155,299.1528128]]],
        |PROJECTION["Krovak"],
        |PARAMETER["latitude_of_center",49.5],
        |PARAMETER["longitude_of_center",24.83333333333333],
        |PARAMETER["azimuth",30.28813972222222],
        |PARAMETER["pseudo_standard_parallel_1",78.5],
        |PARAMETER["scale_factor",0.9999],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0]]""".stripMargin)
    val (wx, wy) = viaWkt.fromLonLat(14.4208, 50.0875)
    assert(math.abs(wx - px) < 0.1 && math.abs(wy - py) < 0.1)
  }

  test("NZMG: origin exact, isometric series exact, design scale profile, conformal, roundtrip, parse routes") {
    import Crs._
    val nz = fromString("EPSG:27200").asInstanceOf[DatumShifted].base
    // the false origin IS the projection center (z = 0 -> zeta = 0)
    val (ox, oy) = nz.fromLonLat(173.0, -41.0)
    assert(math.abs(ox - 2510000.0) < 1e-6 && math.abs(oy - 6023150.0) < 1e-6,
      s"origin ($ox,$oy)")
    // the published A series must BE the isometric-latitude difference
    // on International 1924 (a=6378388, 1/f=297) — checked against the
    // closed form at 1e-9, which pins the coefficients and the
    // 10^5-arc-second unit convention
    val aa = 6378388.0; val ff = 1.0 / 297.0; val ee2 = ff * (2 - ff)
    val ee = math.sqrt(ee2)
    def iso(phi: Double): Double = {
      val s = math.sin(phi)
      math.log(math.tan(math.Pi / 4 + phi / 2)) -
        (ee / 2) * math.log((1 + ee * s) / (1 - ee * s))
    }
    val A = Array(0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
      0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
    for (latDeg <- Seq(-34.0, -38.0, -44.0, -47.0)) {
      val dphi = math.toRadians(latDeg + 41.0) * math.toDegrees(1.0) * 3600.0 * 1e-5
      var psi = A(A.length - 1)
      var i = A.length - 2
      while (i >= 0) { psi = A(i) + dphi * psi; i -= 1 }
      psi *= dphi
      val exact = iso(math.toRadians(latDeg)) - iso(math.toRadians(-41.0))
      assert(math.abs(psi - exact) < 1e-9, s"A-series at $latDeg: $psi vs $exact")
    }
    // NZMG's defining property is MINIMUM scale error over the country
    // (Reilly 1973): |k - 1| stays inside 2e-4 over the whole NZ
    // landmass lattice, far tighter than any single-k0 TM could do.
    // Golden point scales (finite difference along the meridian):
    def kAt(lon: Double, lat: Double): Double = {
      val d = 1e-6
      val (x1, y1) = nz.fromLonLat(lon, lat - d / 2)
      val (x2, y2) = nz.fromLonLat(lon, lat + d / 2)
      val phi = math.toRadians(lat)
      val s2 = math.sin(phi) * math.sin(phi)
      val m = aa * (1 - ee2) / math.pow(1 - ee2 * s2, 1.5)
      math.hypot(x2 - x1, y2 - y1) / (m * math.toRadians(d))
    }
    val golden = Seq( // city, lon, lat, point scale (engine golden)
      ("NorthCape", 173.0, -34.4, 0.999923), ("Auckland", 174.76, -36.85, 0.999980),
      ("Gisborne", 178.02, -38.66, 1.000074), ("Wellington", 174.78, -41.29, 0.999952),
      ("Christchurch", 172.63, -43.53, 0.999998), ("Dunedin", 170.50, -45.87, 1.000074),
      ("Invercargill", 168.35, -46.41, 0.999923))
    golden.foreach { case (nm, lon, lat, k) =>
      val got = kAt(lon, lat)
      assert(math.abs(got - k) < 1e-5, s"$nm scale $got vs golden $k")
      assert(math.abs(got - 1.0) < 2e-4, s"$nm outside the design bound: $got")
    }
    // conformal: scale direction-independent
    for ((lon, lat) <- Seq((174.76, -36.85), (170.5, -45.87))) {
      val d = 1e-6
      val (x1, y1) = nz.fromLonLat(lon - d / 2, lat)
      val (x2, y2) = nz.fromLonLat(lon + d / 2, lat)
      val phi = math.toRadians(lat)
      val s2 = math.sin(phi) * math.sin(phi)
      val nR = aa / math.sqrt(1 - ee2 * s2)
      val kp = math.hypot(x2 - x1, y2 - y1) / (nR * math.cos(phi) * math.toRadians(d))
      assert(math.abs(kp - kAt(lon, lat)) < 1e-6, s"anisotropy at ($lon,$lat)")
    }
    // Auckland-Wellington grid distance matches the ~493 km meridional
    // separation (scale ~1 everywhere makes grid distance ~ true distance)
    val (ax, ay) = nz.fromLonLat(174.76, -36.85)
    val (wx2, wy2) = nz.fromLonLat(174.78, -41.29)
    val dAw = math.hypot(ax - wx2, ay - wy2) / 1000
    assert(math.abs(dAw - 493.0) < 8.0, s"Auckland-Wellington $dAw km")
    // exact roundtrip over the NZ lattice (inverse series + 2 Newton steps)
    for (lon <- Seq(166.5, 170.0, 173.0, 176.0, 178.5); lat <- Seq(-34.5, -38.0, -41.0, -44.0, -47.0)) {
      val (x, y) = nz.fromLonLat(lon, lat)
      val (lon2, lat2) = nz.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // parse routes agree; unknown params still fail loudly elsewhere
    val viaProj = fromProjString("+proj=nzmg +ellps=intl")
    val (px, py) = viaProj.fromLonLat(174.76, -36.85)
    assert(math.abs(px - ax) < 1e-9 && math.abs(py - ay) < 1e-9)
  }

  test("MODIS sinusoidal: grid-edge anchors, equator identity, exact roundtrip, spherical-only parse") {
    val sinu = Crs.modisSinusoidal
    val R = 6371007.181
    // the MODIS grid's outer edge: x(180, 0) = pi * R
    val (xe, ye) = sinu.fromLonLat(180.0, 0.0)
    assert(math.abs(xe - math.Pi * R) < 1e-6 && math.abs(ye) < 1e-9)
    // y is linear in latitude; poles at +-pi*R/2
    assert(math.abs(sinu.fromLonLat(0.0, 90.0)._2 - math.Pi * R / 2) < 1e-6)
    assert(math.abs(sinu.fromLonLat(77.0, 90.0)._1) < 1e-6) // pole: x collapses
    for (lat <- Seq(-60.0, 0.0, 23.5, 70.0); lon <- Seq(-170.0, -96.0, 0.0, 45.3)) {
      val (x, y) = sinu.fromLonLat(lon, lat)
      val (lon2, lat2) = sinu.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // proj-string, WKT, and registry routes agree
    val viaProj = Crs.fromProjString("+proj=sinu +lon_0=0 +x_0=0 +y_0=0 +R=6371007.181")
      .asInstanceOf[Crs.Sinusoidal]
    assert(viaProj.copy(name = sinu.name) == sinu)
    val viaWkt = Crs.fromWkt(
      """PROJCS["MODIS Sinusoidal",GEOGCS["Custom",DATUM["Custom",
        |SPHEROID["Custom spheroid",6371007.181,0]]],PROJECTION["Sinusoidal"],
        |PARAMETER["central_meridian",0],PARAMETER["false_easting",0],
        |PARAMETER["false_northing",0]]""".stripMargin).asInstanceOf[Crs.Sinusoidal]
    assert(viaWkt.copy(name = sinu.name) == sinu)
    assert(Crs.fromString("SR-ORG:6974") == sinu)
    // the ellipsoidal form is rejected loudly, never silently spherical
    intercept[IllegalArgumentException](
      Crs.fromProjString("+proj=sinu +lon_0=0 +ellps=WGS84"))
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

  test("US State Plane (metre) + Alaska Albers registry entries: defining properties, city anchors, roundtrips") {
    import Crs._
    // LCC zones: the DEFINING property is unit scale on each standard
    // parallel — wrong registry parameters cannot pass this
    for ((code, sp1, sp2, lons) <- Seq(
        ("EPSG:32118", 40.0 + 40.0 / 60, 41.0 + 2.0 / 60, Seq(-74.5, -73.5)),
        ("EPSG:26985", 38.3, 39.45, Seq(-77.8, -76.2)),
        ("EPSG:32133", 32.5, 34.0 + 50.0 / 60, Seq(-82.0, -80.0)),
        ("EPSG:32139", 30.0 + 7.0 / 60, 31.0 + 53.0 / 60, Seq(-101.5, -99.0)),
        ("EPSG:26943", 37.0 + 4.0 / 60, 38.0 + 26.0 / 60, Seq(-122.0, -119.5)))) {
      val crs = fromString(code)
      for (lat <- Seq(sp1, sp2); lon <- lons) {
        val (kM, kP) = scaleFactors(crs, lon, lat)
        assert(math.abs(kM - 1.0) < 1e-6 && math.abs(kP - 1.0) < 1e-6,
          s"$code scale at ($lon,$lat): $kM/$kP")
      }
    }
    // NY Long Island: the central meridian is 74W with FE 300 km;
    // lower Manhattan sits ~0.5 km west of it and ~61 km north of the
    // 40°10' origin parallel
    val nyli = fromString("EPSG:32118")
    val (mx, my) = nyli.fromLonLat(-74.006, 40.7128)
    assert(math.abs(mx - 299500.0) < 1500 && math.abs(my - 60600.0) < 1500,
      s"Manhattan EPSG:32118 ($mx,$my)")
    // Arizona Central TM: central meridian 111°55'W maps to FE exactly
    val azc = fromString("EPSG:26949")
    val (ax, ay) = azc.fromLonLat(-(111.0 + 55.0 / 60), 31.0)
    assert(math.abs(ax - 213360.0) < 1e-6 && math.abs(ay) < 1e-6)
    // Phoenix lands in the published neighborhood (~207 km E, ~265 km N)
    val (px, py) = azc.fromLonLat(-112.074, 33.4484)
    assert(math.abs(px - 213360.0) < 20000 && math.abs(py - 271000.0) < 8000,
      s"Phoenix EPSG:26949 ($px,$py)")
    // Texas Central: grid origin anchors at (FE, FN) exactly; Austin
    // sits ~249 km east of the 100°20'W meridian, ~67 km north of 29°40'
    val txc = fromString("EPSG:32139")
    val (tox, toy) = txc.fromLonLat(-(100.0 + 20.0 / 60), 29.0 + 40.0 / 60)
    assert(math.abs(tox - 700000.0) < 1e-6 && math.abs(toy - 3000000.0) < 1e-6)
    val (aux, auy) = txc.fromLonLat(-97.7431, 30.2672)
    assert(math.abs(aux - 949000.0) < 10000 && math.abs(auy - 3067000.0) < 10000,
      s"Austin EPSG:32139 ($aux,$auy)")
    // California zone 3: Fresno ~64 km east of 120.5°W, ~26 km north of 36.5°
    val ca3 = fromString("EPSG:26943")
    val (fx, fy) = ca3.fromLonLat(-119.787, 36.7378)
    assert(math.abs(fx - 2063600.0) < 8000 && math.abs(fy - 526400.0) < 8000,
      s"Fresno EPSG:26943 ($fx,$fy)")
    // Alabama East TM: central meridian 85°50'W maps to FE exactly;
    // Montgomery ~44 km west of it, ~208 km north of the 30.5° origin
    val ale = fromString("EPSG:26929")
    val (aox, aoy) = ale.fromLonLat(-(85.0 + 50.0 / 60), 30.5)
    assert(math.abs(aox - 200000.0) < 1e-6 && math.abs(aoy) < 1e-6)
    val (mgx, mgy) = ale.fromLonLat(-86.3, 32.38)
    assert(math.abs(mgx - 156100.0) < 6000 && math.abs(mgy - 208400.0) < 6000,
      s"Montgomery EPSG:26929 ($mgx,$mgy)")
    // Alaska Albers: origin anchor and Anchorage neighborhood
    val ak = fromString("EPSG:3338")
    val (ox, oy) = ak.fromLonLat(-154.0, 50.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6)
    val (anx, any2) = ak.fromLonLat(-149.9003, 61.2181)
    assert(math.abs(anx - 220000.0) < 10000 && math.abs(any2 - 1254000.0) < 10000,
      s"Anchorage EPSG:3338 ($anx,$any2)")
    // exact roundtrips across each zone
    for ((code, pts) <- Seq(
        ("EPSG:32118", Seq((-74.0, 40.7), (-72.7, 41.05))),
        ("EPSG:26985", Seq((-77.0, 39.0), (-76.0, 38.4))),
        ("EPSG:32133", Seq((-81.0, 33.8), (-79.9, 32.8))),
        ("EPSG:26949", Seq((-111.9, 33.4), (-112.3, 34.6))),
        ("EPSG:32139", Seq((-97.74, 30.27), (-99.5, 31.2))),
        ("EPSG:26943", Seq((-119.79, 36.74), (-121.5, 37.5))),
        ("EPSG:26929", Seq((-86.3, 32.38), (-85.4, 31.5))),
        ("EPSG:3338", Seq((-154.0, 60.0), (-135.0, 58.0), (-165.0, 65.0))))) {
      val crs = fromString(code)
      for ((lon, lat) <- pts) {
        val (x, y) = crs.fromLonLat(lon, lat)
        val (lon2, lat2) = crs.toLonLat(x, y)
        assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
          s"$code roundtrip ($lon,$lat) -> ($lon2,$lat2)")
      }
    }
  }

  test("ftUS State Plane zones: published false origins, metre-twin identity, roundtrips") {
    import Crs._
    // the published ftUS false origins are the EPSG-registry defining
    // values; hitting them EXACTLY pins both the unit constant
    // (1200/3937) and the underlying metre parameters at once
    for ((code, lon0, lat0, feFt, fnFt) <- Seq(
        ("EPSG:2263", -74.0, 40.0 + 10.0 / 60, 984250.0, 0.0),
        ("EPSG:2229", -118.0, 33.5, 6561666.0 + 2.0 / 3, 1640416.0 + 2.0 / 3),
        ("EPSG:2274", -86.0, 34.0 + 20.0 / 60, 1968500.0, 0.0))) {
      val crs = fromString(code)
      val (x, y) = crs.fromLonLat(lon0, lat0)
      assert(math.abs(x - feFt) < 1e-6 && math.abs(y - fnFt) < 1e-6,
        s"$code false origin: ($x,$y) vs ($feFt,$fnFt)")
      assert(crs.axisUnit == "US survey foot")
    }
    // a ftUS zone IS its metre twin rescaled: same point, exact ratio
    val ftZone = fromString("EPSG:2263")
    val mZone = fromString("EPSG:32118")
    for ((lon, lat) <- Seq((-74.006, 40.7128), (-72.7, 41.05))) {
      val (xf, yf) = ftZone.fromLonLat(lon, lat)
      val (xm, ym) = mZone.fromLonLat(lon, lat)
      assert(math.abs(xf * UsSurveyFoot - xm) < 1e-9 * math.abs(xm) + 1e-9 &&
        math.abs(yf * UsSurveyFoot - ym) < 1e-9 * math.abs(ym) + 1e-9,
        s"EPSG:2263 vs 32118 at ($lon,$lat): ($xf,$yf) ftUS vs ($xm,$ym) m")
    }
    // exact roundtrips across each ftUS zone
    for ((code, pts) <- Seq(
        ("EPSG:2263", Seq((-74.0, 40.7), (-72.7, 41.05))),
        ("EPSG:2229", Seq((-118.24, 34.05), (-119.7, 34.42))),
        ("EPSG:2274", Seq((-86.78, 36.17), (-84.0, 35.2))))) {
      val crs = fromString(code)
      for ((lon, lat) <- pts) {
        val (x, y) = crs.fromLonLat(lon, lat)
        val (lon2, lat2) = crs.toLonLat(x, y)
        assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
          s"$code roundtrip ($lon,$lat) -> ($lon2,$lat2)")
      }
    }
    // CF grid_mapping has no linear-unit slot: serializing a ftUS grid
    // must fail loudly, not silently claim metres
    intercept[IllegalArgumentException](
      graft.geom.CfConv.crsToAttrs(ftZone))
  }

  test("proj-string and WKT linear units: honored, never silently dropped") {
    import Crs._
    // PROJ semantics: +x_0/+y_0 stay metres, +units converts the
    // OUTPUT grid — so this string IS EPSG:2263 and must hit the
    // published ftUS false origin exactly
    val ps = fromProjString("+proj=lcc +lat_1=40.666666666666664 +lat_2=41.03333333333333 " +
      "+lat_0=40.166666666666664 +lon_0=-74 +x_0=300000 +y_0=0 +ellps=GRS80 +units=us-ft")
    val (px, py) = ps.fromLonLat(-74.0, 40.0 + 10.0 / 60)
    assert(math.abs(px - 984250.0) < 1e-5 && math.abs(py) < 1e-5,
      s"proj-string ftUS false origin: ($px,$py)")
    assert(ps.axisUnit == "US survey foot")
    // unknown unit token: loud failure, not metre fallback
    intercept[IllegalArgumentException](
      fromProjString("+proj=lcc +lat_1=40 +lat_0=40 +lon_0=-74 +units=link"))
    // +to_meter generic route
    val tm = fromProjString("+proj=tmerc +lon_0=-111.91666666666667 +lat_0=31 " +
      "+k=0.9999 +x_0=213360 +y_0=0 +ellps=GRS80 +to_meter=0.3048006096012192")
    val (tx, ty) = tm.fromLonLat(-(111.0 + 55.0 / 60), 31.0)
    assert(math.abs(tx - 213360.0 / 0.3048006096012192) < 1e-5 && math.abs(ty) < 1e-5,
      s"to_meter false origin: ($tx,$ty)")

    // WKT semantics: false_easting/false_northing are IN the CS unit —
    // this is EPSG:2263's published WKT1 shape
    val wkt = """PROJCS["NAD83 / New York Long Island (ftUS)",
      |  GEOGCS["NAD83", DATUM["North_American_Datum_1983",
      |    SPHEROID["GRS 1980",6378137,298.257222101]],
      |    UNIT["degree",0.0174532925199433]],
      |  PROJECTION["Lambert_Conformal_Conic_2SP"],
      |  PARAMETER["standard_parallel_1",41.0333333333333],
      |  PARAMETER["standard_parallel_2",40.6666666666667],
      |  PARAMETER["latitude_of_origin",40.1666666666667],
      |  PARAMETER["central_meridian",-74],
      |  PARAMETER["false_easting",984250],
      |  PARAMETER["false_northing",0],
      |  UNIT["US survey foot",0.304800609601219]]""".stripMargin
    val wz = fromWkt(wkt)
    val (wx, wy) = wz.fromLonLat(-74.0, 40.0 + 10.0 / 60)
    assert(math.abs(wx - 984250.0) < 1e-4 && math.abs(wy) < 1e-4,
      s"WKT ftUS false origin: ($wx,$wy)")
    // agreement with the registry zone away from the origin too
    val reg = fromString("EPSG:2263")
    for ((lon, lat) <- Seq((-74.006, 40.7128), (-72.7, 41.05))) {
      val (ax, ay) = wz.fromLonLat(lon, lat)
      val (bx, by) = reg.fromLonLat(lon, lat)
      assert(math.abs(ax - bx) < 1e-4 && math.abs(ay - by) < 1e-4,
        s"WKT vs registry EPSG:2263 at ($lon,$lat): ($ax,$ay) vs ($bx,$by)")
    }
  }

  test("Helmert datum shifts: convention pins, cross-check goldens, wrapped registry grids, parse routes") {
    import Crs._
    // ---- convention pins (closed form) -------------------------------
    // translation-only: ECEF moves by exactly (dx,dy,dz); exact inverse
    val tr = Helmert(589.0, 76.0, 480.0, 0, 0, 0, 0)
    val (ex, ey, ez) = Helmert.geodeticToEcef(Bessel1841, 14.5, 50.0)
    val (fx, fy, fz) = tr.forward(ex, ey, ez)
    assert(fx - ex == 589.0 && fy - ey == 76.0 && fz - ez == 480.0)
    val (bx, by, bz) = tr.inverse(fx, fy, fz)
    assert(math.abs(bx - ex) < 1e-9 && math.abs(by - ey) < 1e-9 && math.abs(bz - ez) < 1e-9)
    // position-vector rotation: +rz INCREASES longitude by rz (this is
    // the PROJ +towgs84 / EPSG 9606 convention; the coordinate-frame
    // convention would decrease it — the classic sign trap)
    val rot = Helmert(0, 0, 0, 0, 0, 1.0, 0)
    val (rl, rp) = rot.toWgs84(WGS84, 10.0, 0.0)
    assert(math.abs(rl - (10.0 + 1.0 / 3600.0)) < 1e-10, s"rz=+1sec moved lon to $rl")
    assert(math.abs(rp - 0.0) < 1e-10)
    // scale-only: +1 ppm scales the ECEF radius by 1e-6
    val sc = Helmert(0, 0, 0, 0, 0, 0, 1.0)
    val (sx, sy, sz) = sc.forward(ex, ey, ez)
    val r0 = math.sqrt(ex * ex + ey * ey + ez * ez)
    val r1 = math.sqrt(sx * sx + sy * sy + sz * sz)
    assert(math.abs(r1 / r0 - (1 + 1e-6)) < 1e-12)
    // geodetic <-> ECEF closes to machine precision on ellipsoid and sphere
    for ((ell, lon, lat) <- Seq((WGS84, -0.1276, 51.5072), (Bessel1841, 16.37, 48.21),
        (Ellipsoid(6371007.181, Double.PositiveInfinity), 45.3, -23.0))) {
      val (gx, gy, gz) = Helmert.geodeticToEcef(ell, lon, lat)
      val (lon2, lat2) = Helmert.ecefToGeodetic(ell, gx, gy, gz)
      assert(math.abs(lon2 - lon) < 1e-12 && math.abs(lat2 - lat) < 1e-12)
    }

    // ---- cross-implementation goldens --------------------------------
    // native-datum lon/lat -> WGS84 lon/lat, verified against an
    // independent Python implementation of the same published EPSG
    // chain (geodetic->ECEF->Bursa-Wolf->geodetic); the ground-shift
    // magnitudes match the published figures for each datum (NZGD49 ~
    // 200 m, CH1903 ~ 165-175 m, S-JTSK ~ 107 m, OSGB36 ~ 125 m)
    val intl = Ellipsoid(6378388.0, 297.0)
    val golden = Seq(
      (SJtskToWgs84, Bessel1841, 14.4208, 50.0875, 14.419778861, 50.086793367),
      (Ch1903ToWgs84, Bessel1841, 7.439583333333333, 46.95240555555556, 7.438632421, 46.951082772),
      (Ch1903ToWgs84, Bessel1841, 8.5417, 47.3769, 8.540570856, 47.375536516),
      (Nzgd49ToWgs84, intl, 174.76, -36.85, 174.760181153, -36.848198098),
      (Nzgd49ToWgs84, intl, 174.78, -41.29, 174.780164156, -41.288287704),
      (MgiToWgs84, Bessel1841, 16.37, 48.21, 16.368795838, 48.209499092),
      (Osgb36ToWgs84, Airy1830, -0.1276, 51.5072, -0.129206316, 51.507710347))
    for ((h, ell, lon, lat, wantLon, wantLat) <- golden) {
      val (gotLon, gotLat) = h.toWgs84(ell, lon, lat)
      assert(math.abs(gotLon - wantLon) < 1e-8 && math.abs(gotLat - wantLat) < 1e-8,
        s"toWgs84($lon,$lat) -> ($gotLon,$gotLat) want ($wantLon,$wantLat)")
      // OSGB36's longitude shift is the famous "the WGS84 zero meridian
      // is ~100 m east of the Airy meridian" fact: WGS84 lon is WEST of
      // the native lon by ~5.5 arc-sec everywhere in Britain
      // the 2D chain pins h = 0 on each side's own ellipsoid, so the
      // roundtrip closes to ~1 mm (the height discarded between datums
      // re-enters scaled by e^2), not machine epsilon — same behavior
      // as a 2D pyproj transformer
      val (backLon, backLat) = h.fromWgs84(ell, gotLon, gotLat)
      assert(math.abs(backLon - lon) < 1e-7 && math.abs(backLat - lat) < 1e-7,
        s"datum roundtrip ($lon,$lat) -> ($backLon,$backLat)")
    }

    // ---- wrapped registry grids --------------------------------------
    // every non-WGS84 grid is served datum-shifted; projected coords are
    // unchanged native values, lon/lat is WGS84; shift magnitude at a
    // city anchor sits in the documented band for that datum
    val cases = Seq(
      ("EPSG:5514", 14.4208, 50.0875, 60.0, 160.0),
      ("EPSG:21781", 8.5417, 47.3769, 120.0, 220.0),
      ("EPSG:2056", 8.5417, 47.3769, 120.0, 220.0),
      ("EPSG:27200", 174.76, -36.85, 150.0, 250.0),
      ("EPSG:31287", 16.37, 48.21, 60.0, 160.0),
      ("EPSG:27700", -0.1276, 51.5072, 80.0, 170.0))
    for ((code, nLon, nLat, loM, hiM) <- cases) {
      val wrapped = fromString(code).asInstanceOf[DatumShifted]
      val base = wrapped.base
      // projected coords of the native-datum anchor are the native math
      val (pxW, pyW) = base.fromLonLat(nLon, nLat)
      // the wrapper's toLonLat must equal base.toLonLat pushed through
      // the Helmert chain
      val (wLon, wLat) = wrapped.toLonLat(pxW, pyW)
      val (eLon, eLat) = wrapped.helmert.toWgs84(base.ellipsoid, nLon, nLat)
      assert(math.abs(wLon - eLon) < 1e-9 && math.abs(wLat - eLat) < 1e-9, s"$code chain")
      // ground displacement in the documented band
      val dM = math.hypot((wLat - nLat) * 111132.95,
        (wLon - nLon) * 111319.49 * math.cos(math.toRadians(nLat)))
      assert(dM > loM && dM < hiM, s"$code datum shift $dM m outside [$loM,$hiM]")
      // full wrapped roundtrip closes to mm (the 2D chain discards
      // ellipsoidal height between datums — see the geodetic goldens)
      val (rx2, ry2) = wrapped.fromLonLat(wLon, wLat)
      assert(math.abs(rx2 - pxW) < 5e-3 && math.abs(ry2 - pyW) < 5e-3, s"$code xy roundtrip")
      // the wrapper is NOT crs-equal to its native form (a ~100-200 m
      // coordinate difference must never be elided as identity)
      assert(!wrapped.equalsCrs(base) && !base.equalsCrs(wrapped))
    }

    // ---- cross-datum chained transform -------------------------------
    // S-JTSK grid -> WGS84 UTM33N must include the datum leg: it differs
    // from the naive (datum-less) chain by the documented ~100 m skew
    val tf = CrsTransformer(fromString("EPSG:5514"), utm(33, north = true))
    val naive = CrsTransformer(krovakEastNorth, utm(33, north = true))
    val (kx, ky) = krovakEastNorth.fromLonLat(14.4208, 50.0875)
    val (ux, uy) = tf.transformPoint(kx, ky)
    val (nx, ny) = naive.transformPoint(kx, ky)
    val skew = math.hypot(ux - nx, uy - ny)
    assert(skew > 60 && skew < 160, s"datum leg moved UTM point by $skew m")
    // and the datum-aware UTM position is the Helmert-shifted lon/lat
    val (wgsLon, wgsLat) = SJtskToWgs84.toWgs84(Bessel1841, 14.4208, 50.0875)
    val (wantX, wantY) = utm(33, north = true).fromLonLat(wgsLon, wgsLat)
    assert(math.abs(ux - wantX) < 1e-6 && math.abs(uy - wantY) < 1e-6)

    // ---- parse routes ------------------------------------------------
    // +towgs84 wraps; all-zero spec stays unwrapped
    val viaProj = fromProjString(
      "+proj=krovak +ellps=bessel +towgs84=589,76,480").asInstanceOf[DatumShifted]
    assert(viaProj.helmert == SJtskToWgs84)
    val (vLon, vLat) = viaProj.toLonLat(kx, ky)
    val (gLon, gLat) = fromString("EPSG:5514").toLonLat(kx, ky)
    assert(math.abs(vLon - gLon) < 1e-9 && math.abs(vLat - gLat) < 1e-9)
    assert(!fromProjString("+proj=krovak +ellps=bessel +towgs84=0,0,0")
      .isInstanceOf[DatumShifted])
    // WKT TOWGS84[...] wraps with the same semantics
    val viaWkt = fromWkt(
      """PROJCS["S-JTSK / Krovak East North",GEOGCS["S-JTSK",DATUM["S_JTSK",
        |SPHEROID["Bessel 1841",6377397.155,299.1528128],
        |TOWGS84[589,76,480,0,0,0,0]]],
        |PROJECTION["Krovak"],
        |PARAMETER["latitude_of_center",49.5],
        |PARAMETER["longitude_of_center",24.83333333333333],
        |PARAMETER["azimuth",30.28813972222222],
        |PARAMETER["pseudo_standard_parallel_1",78.5],
        |PARAMETER["scale_factor",0.9999],
        |PARAMETER["false_easting",0],PARAMETER["false_northing",0]]""".stripMargin)
      .asInstanceOf[DatumShifted]
    assert(viaWkt.helmert == SJtskToWgs84)
    val (wkLon, wkLat) = viaWkt.toLonLat(kx, ky)
    assert(math.abs(wkLon - gLon) < 1e-7 && math.abs(wkLat - gLat) < 1e-7)
  }

  test("cylindrical equal-area (EASE grids): published EASE-2 extents, area scale 1, exact roundtrip") {
    val cea = Crs.fromString("EPSG:6933")
    // published NSIDC EASE-Grid 2.0 global constants (Brodzik et al.
    // 2012, doi:10.3390/ijgi1010032): map x extent at lon=180 and the
    // y of the grid-boundary latitude 85.0445664 — external anchors
    // for both forward axes
    val (xMax, _) = cea.fromLonLat(180.0, 0.0)
    assert(math.abs(xMax - 17367530.445161) < 1e-3, s"x extent: $xMax")
    val (_, yBound) = cea.fromLonLat(0.0, 85.0445664)
    assert(math.abs(yBound - 7314540.8306) < 1e-2, s"y at 85.0445664: $yBound")
    // defining property: area scale 1 everywhere; parallel scale 1 on
    // the standard parallels +-30
    for (lat <- Seq(-30.0, 30.0); lon <- Seq(-120.0, 0.0, 77.0)) {
      val (kM, kP) = scaleFactors(cea, lon, lat)
      assert(math.abs(kP - 1.0) < 1e-6 && math.abs(kM * kP - 1.0) < 1e-6,
        s"scale at ($lon,$lat): $kM/$kP")
    }
    for (lat <- Seq(-67.0, 0.0, 48.9, 82.0); lon <- Seq(-179.0, 13.0))
      assert(math.abs(scaleFactors(cea, lon, lat)._1 * scaleFactors(cea, lon, lat)._2 - 1.0) < 1e-6,
        s"area distortion at ($lon,$lat)")
    // roundtrip to sub-nanodegree globally
    for (lat <- Seq(-85.0, -12.5, 0.0, 37.5, 85.0); lon <- Seq(-179.9, -96.0, 0.0, 66.9, 179.9)) {
      val (x, y) = cea.fromLonLat(lon, lat)
      val (lon2, lat2) = cea.toLonLat(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9,
        s"roundtrip ($lon,$lat) -> ($lon2,$lat2)")
    }
    // EASE v1 sphere (EPSG:3410): closed-form x = R cos30 dlam,
    // y = R sin(lat)/cos30 — the e -> 0 limit of the same class
    val sph = Crs.fromString("EPSG:3410")
    val r = 6371228.0
    val (sx, sy) = sph.fromLonLat(45.0, 52.0)
    assert(math.abs(sx - r * math.cos(math.toRadians(30)) * math.toRadians(45)) < 1e-6)
    assert(math.abs(sy - r * math.sin(math.toRadians(52)) / math.cos(math.toRadians(30))) < 1e-6)
    val (sl, sp) = sph.toLonLat(sx, sy)
    assert(math.abs(sl - 45.0) < 1e-9 && math.abs(sp - 52.0) < 1e-9)
    // proj-string route builds the same EASE-2 parameters
    val viaProj = Crs.fromString("+proj=cea +lat_ts=30 +lon_0=0 +x_0=0 +y_0=0 +ellps=WGS84")
      .asInstanceOf[Crs.CylindricalEqualArea]
    assert(viaProj.latTsDeg == 30.0 && viaProj.ell == Crs.WGS84)
    val (px, py) = viaProj.fromLonLat(180.0, 85.0445664)
    assert(math.abs(px - xMax) < 1e-9 && math.abs(py - yBound) < 1e-9)
    // CF grid-mapping attrs roundtrip through CfConv
    val attrs = CfConv.crsToAttrs(cea)
    assert(attrs("grid_mapping_name") == "lambert_cylindrical_equal_area")
    val back = CfConv.crsFromAttrs(attrs).get
    val (bx, by) = back.fromLonLat(100.0, -45.0)
    val (ox, oy) = cea.fromLonLat(100.0, -45.0)
    assert(bx == ox && by == oy, "CF roundtrip changed the projection")
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
