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
