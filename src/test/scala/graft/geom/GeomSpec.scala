package graft.geom

import org.scalatest.funsuite.AnyFunSuite

class GeomSpec extends AnyFunSuite {

  test("affine compose and invert") {
    val s = Affine.scaleTranslate(2.0, 3.0, 1.0, -1.0)
    val t = Affine(0.5, 0, 4, 0, 0.25, 5)
    val c = t * s // apply s first, then t
    val (x, y) = c(2.0, 2.0)
    // s(2,2) = (5, 5); t(5,5) = (6.5, 6.25)
    assert(x == 6.5 && y == 6.25)
    val inv = c.invert
    val (x2, y2) = inv(x, y)
    assert(math.abs(x2 - 2.0) < 1e-12 && math.abs(y2 - 2.0) < 1e-12)
  }

  test("regular grid mapping fields (8x6 fixture geometry)") {
    // reference: tests/sampledata.py:60-83 — lon 50.05..50.75 step .1,
    // lat 10.55 down to 10.05 step .1
    val gm = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    assert(gm.xMax === 50.8 +- 1e-9)
    assert(gm.yMax === 10.6 +- 1e-9)
    assert(gm.xCoord(0) === 50.05 +- 1e-9)
    assert(gm.xCoord(7) === 50.75 +- 1e-9)
    assert(gm.yCoord(0) === 10.55 +- 1e-9)
    assert(gm.yCoord(5) === 10.05 +- 1e-9)
    assert(!gm.isLon360)
  }

  implicit class DoubleOps(val d: Double) {
    def ===(other: ApproxEq): Boolean = math.abs(d - other.v) <= other.tol
  }
  case class ApproxEq(v: Double, tol: Double)
  implicit class Approx(val v: Double) { def +-(tol: Double) = ApproxEq(v, tol) }

  test("ij transform between grids") {
    val src = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    val dst = GridMapping.regular(3, 3, 50.2, 10.1, 0.2, 0.2, Crs.Geographic)
    // dst image -> src image: dst pixel (0,0) center = (50.3, 10.6)... in
    // dst ij (0.5,0.5) -> xy via dst, then xy -> src ij.
    val m = dst.ijTransformTo(src)
    val (si, sj) = m(0.5, 0.5)
    // dst (0.5,0.5) -> xy (50.3, 10.6) -> src ij ((50.3-50)/0.1, (10.6-10.6)/0.1) = (3, 0)
    assert(si === 3.0 +- 1e-9)
    assert(sj === 0.0 +- 1e-9)
  }

  test("ijBboxFromXyBbox selects pixel centers inside the grown bbox") {
    val gm = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    // centers x: 50.05..50.75; y (rows top-down): 10.55..10.05
    val (i0, j0, i1, j1) = gm.ijBboxFromXyBbox(50.1, 10.1, 50.4, 10.4)
    assert((i0, j0, i1, j1) == (1, 2, 4, 5))
    assert(gm.ijBboxFromXyBbox(60.0, 20.0, 61.0, 21.0) == (-1, -1, -1, -1))
    // border grows coverage
    val grown = gm.ijBboxFromXyBbox(50.1, 10.1, 50.4, 10.4, xyBorder = 0.1)
    assert(grown == (0, 1, 5, 6))
  }

  test("isClose tolerances") {
    val a = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    val b = GridMapping.regular(8, 6, 50.0 + 1e-7, 10.0, 0.1, 0.1, Crs.Geographic)
    val c = GridMapping.regular(8, 6, 50.5, 10.0, 0.1, 0.1, Crs.Geographic)
    assert(a.isClose(b))
    assert(!a.isClose(c))
  }

  test("UTM 32N anchors and roundtrip") {
    val utm = Crs.utm(32, north = true)
    // central meridian, equator -> false easting exactly
    val (e0, n0) = utm.fromLonLat(9.0, 0.0)
    assert(e0 === 500000.0 +- 1e-6)
    assert(n0 === 0.0 +- 1e-6)
    // scale at central meridian == k0
    val (_, n1) = utm.fromLonLat(9.0, 45.0)
    val (_, n2) = utm.fromLonLat(9.0, 45.0 + 1e-5)
    val dPhiMeters = 1e-5 * math.Pi / 180 *
      (6378137.0 * (1 - 0.00669437999014) /
        math.pow(1 - 0.00669437999014 * math.sin(math.toRadians(45)) * math.sin(math.toRadians(45)), 1.5))
    assert(((n2 - n1) / dPhiMeters) === 0.9996 +- 1e-6)
    // roundtrip across the zone
    for (lon <- Seq(6.01, 9.0, 11.99); lat <- Seq(-79.0, 0.0, 47.3, 83.0)) {
      val (x, y) = utm.fromLonLat(lon, lat)
      val (lon2, lat2) = utm.toLonLat(x, y)
      assert(lon2 === lon +- 1e-9, s"lon roundtrip $lon,$lat")
      assert(lat2 === lat +- 1e-9, s"lat roundtrip $lon,$lat")
    }
  }

  test("isTiled / spatialUnitName / lon-360 helpers") {
    val gm = graft.geom.GridMapping.regular(8, 6, 0.0, 50.0, 1.0, 1.0, Crs.Geographic)
    assert(!gm.isTiled)
    assert(gm.derive(tileSize = Some((4, 4))).isTiled)
    assert(gm.spatialUnitName == "degree")
    assert(graft.geom.GridMapping.regular(8, 6, 0.0, 0.0, 100.0, 100.0,
      Crs.utm(32, north = true)).spatialUnitName == "metre")
    val s = graft.TestSpark.spark
    import s.implicits._
    val lons = Seq(-170.0, -1.0, 0.0, 179.0, 181.0, 359.0).toDF("lon")
    val to360 = lons.select(graft.ops.SpatialOps.toLon360($"lon")).as[Double].collect().toSeq
    assert(to360 == Seq(190.0, 359.0, 0.0, 179.0, 181.0, 359.0))
    val from360 = lons.select(graft.ops.SpatialOps.fromLon360($"lon")).as[Double].collect().toSeq
    assert(from360 == Seq(-170.0, -1.0, 0.0, 179.0, -179.0, -1.0))
  }

  test("rotated pole anchors and roundtrip") {
    // CORDEX EUR pole: rotated origin lands at 18E 50.75N, the rotated
    // north pole at the grid_north_pole position
    val rp = Crs.RotatedPole(39.25, -162.0, 0.0, "CF:rotated_pole")
    val (lon0, lat0) = rp.toLonLat(0.0, 0.0)
    assert(lon0 === 18.0 +- 1e-9)
    assert(lat0 === 50.75 +- 1e-9)
    val (lonP, latP) = rp.toLonLat(0.0, 90.0)
    assert(latP === 39.25 +- 1e-9)
    assert(math.abs((lonP - -162.0 + 540.0) % 360.0 - 180.0) < 1e-9, s"pole lon $lonP")
    for (rlon <- Seq(-15.0, -2.0, 3.5, 12.0); rlat <- Seq(-10.0, 0.0, 7.0, 20.0)) {
      val (lon, lat) = rp.toLonLat(rlon, rlat)
      val (rl2, rp2) = rp.fromLonLat(lon, lat)
      assert(rl2 === rlon +- 1e-9, s"rlon roundtrip $rlon,$rlat")
      assert(rp2 === rlat +- 1e-9, s"rlat roundtrip $rlon,$rlat")
    }
    // axis rotation (north_pole_grid_longitude) shifts rotated longitude
    val rpAxis = Crs.RotatedPole(39.25, -162.0, 10.0, "CF:rotated_pole")
    val (lonA, latA) = rpAxis.toLonLat(-10.0, 0.0)
    val (lonB, latB) = rp.toLonLat(0.0, 0.0)
    assert(lonA === lonB +- 1e-9)
    assert(latA === latB +- 1e-9)
    // identity pole (90N, lon -180 => lon_0 = 0) degenerates to plain lon/lat
    val ident = Crs.RotatedPole(90.0, -180.0, 0.0, "ident")
    val (li, pi) = ident.toLonLat(12.25, 47.5)
    assert(li === 12.25 +- 1e-9)
    assert(pi === 47.5 +- 1e-9)
  }

  test("LAEA EPSG:3035 anchors and roundtrip") {
    val laea = Crs.laea3035
    // projection center by definition of the false origin
    val (x0, y0) = laea.fromLonLat(10.0, 52.0)
    assert(x0 === 4321000.0 +- 1e-6)
    assert(y0 === 3210000.0 +- 1e-6)
    for (lon <- Seq(-10.0, 5.0, 10.0, 30.0); lat <- Seq(35.0, 46.0, 57.0, 70.0)) {
      val (x, y) = laea.fromLonLat(lon, lat)
      val (lon2, lat2) = laea.toLonLat(x, y)
      assert(lon2 === lon +- 1e-8, s"lon roundtrip $lon,$lat")
      assert(lat2 === lat +- 1e-8, s"lat roundtrip $lon,$lat")
    }
    // equal-area property: a small quad keeps its area through projection
    val d = 1e-4
    val quad = Seq((10.0, 52.0), (10.0 + d, 52.0), (10.0 + d, 52.0 + d), (10.0, 52.0 + d))
    val proj = quad.map { case (lo, la) => laea.fromLonLat(lo, la) }
    val area = math.abs(
      (proj(1)._1 - proj(0)._1) * (proj(3)._2 - proj(0)._2) -
      (proj(3)._1 - proj(0)._1) * (proj(1)._2 - proj(0)._2))
    val aEll = 6378137.0
    val e2 = 0.00669438002290 // GRS80
    val phi = math.toRadians(52.0)
    val mRad = aEll * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    val nRad = aEll / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    val trueArea = (math.toRadians(d) * nRad * math.cos(phi)) * (math.toRadians(d) * mRad)
    assert((area / trueArea) === 1.0 +- 1e-6)
  }

  test("CrsTransformer composes and transformBounds densifies") {
    val t = CrsTransformer(Crs.utm(32, north = true), Crs.laea3035)
    val (x, y) = t.transformPoint(500000.0, 0.0) // lon 9 lat 0
    val direct = Crs.laea3035.fromLonLat(9.0, 0.0)
    assert(x === direct._1 +- 1e-6 && y === direct._2 +- 1e-6)
    val inv = CrsTransformer(Crs.laea3035, Crs.utm(32, north = true))
    val (bx0, by0, bx1, by1) = inv.transformBounds(4300000, 3100000, 4400000, 3300000)
    assert(bx0 < bx1 && by0 < by1)
  }

  test("roundToFraction matches reference discretization") {
    // reference: helpers.py:203-239 (exponent = floor(log10 v) - digits
    // - resolution_digits, then snap scaled value to `resolution`)
    assert(GridMapping.roundToFraction(0.000123456, 2) === 0.00012 +- 1e-15)
    assert(GridMapping.roundToFraction(0.000123456, 3) === 0.000123 +- 1e-15)
    assert(GridMapping.roundToFraction(123456.0, 2) === 120000.0 +- 1e-6)
    assert(GridMapping.roundToFraction(-0.000123456, 2) === -0.00012 +- 1e-15)
    assert(GridMapping.roundToFraction(0.000123456, 2, 0.5) === 0.000125 +- 1e-15)
  }
}
