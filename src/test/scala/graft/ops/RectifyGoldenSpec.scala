package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}

/** Rectify golden parity for the interpolating methods, antimeridian,
  * tiled targets and j-axis-up (reference: tests/test_rectify.py).
  */
class RectifyGoldenSpec extends AnyFunSuite {
  val nan = Double.NaN

  val srcLon = Array(Array(1.0, 6.0), Array(0.0, 2.0))
  val srcLat = Array(Array(56.0, 53.0), Array(52.0, 50.0))
  val srcGm = GridMapping(2, 2, 2, 2, 0.0, 50.0, 6.0, 56.0, 3.0, 2.0,
    Crs.Geographic, isRegular = false)
  // rad + offset [[0,0],[0,1]] so values don't lie on a plane
  val radOff = Array(Array(1.0, 2.0), Array(3.0, 5.0))
  val rad = Array(Array(1.0, 2.0), Array(3.0, 4.0))

  def coordTiles(lon: Array[Array[Double]] = srcLon) =
    toDs(tilesFrom("x", lon, srcGm) ++ tilesFrom("y", srcLat, srcGm))

  def run(data: Array[Array[Double]], dstGm: GridMapping, interp: Int,
      lon: Array[Array[Double]] = srcLon): Array[Array[Double]] = {
    val out = RectifyOp.rectify(
      toDs(tilesFrom("rad", data, srcGm)), coordTiles(lon), srcGm, dstGm,
      Map("rad" -> VarPolicy(interp, Reducers.Mean, false, nan, F64)))
    toArray(out.collect().toSeq, dstGm, "rad")
  }

  test("7x7 triangular (test_rectify.py:144-181)") {
    val dst = GridMapping.regular(7, 7, -0.5, 49.5, 1.0, 1.0, Crs.Geographic)
    assertImage(run(radOff, dst, Interp.TRIANGULAR), Array(
      Array(nan, 1.000, nan, nan, nan, nan, nan),
      Array(nan, 1.478, 1.391, nan, nan, nan, nan),
      Array(nan, 1.957, 1.870, 1.784, 1.697, nan, nan),
      Array(nan, 2.435, 2.348, 2.261, 2.174, 2.087, 2.000),
      Array(3.000, 3.000, 3.000, 3.000, 3.000, nan, nan),
      Array(nan, 4.000, 4.000, 4.000, nan, nan, nan),
      Array(nan, nan, 5.000, nan, nan, nan, nan)), tol = 1.5e-3)
  }

  test("7x7 bilinear (test_rectify.py:183-219)") {
    val dst = GridMapping.regular(7, 7, -0.5, 49.5, 1.0, 1.0, Crs.Geographic)
    assertImage(run(radOff, dst, Interp.BILINEAR), Array(
      Array(nan, 1.000, nan, nan, nan, nan, nan),
      Array(nan, 1.488, 1.410, nan, nan, nan, nan),
      Array(nan, 1.994, 1.949, 1.858, 1.722, nan, nan),
      Array(nan, 2.520, 2.506, 2.448, 2.344, 2.195, 2.000),
      Array(3.000, 3.112, 3.163, 3.153, 3.082, nan, nan),
      Array(nan, 4.000, 4.041, 4.020, nan, nan, nan),
      Array(nan, nan, 5.000, nan, nan, nan, nan)), tol = 1.5e-3)
  }

  test("7x7 subset nearest (test_rectify.py:221-259)") {
    val dst = GridMapping.regular(7, 7, 1.5, 50.5, 1.0, 1.0, Crs.Geographic)
    assertImage(run(rad, dst, Interp.NEAREST), Array(
      Array(nan, nan, nan, nan, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan),
      Array(1.0, nan, nan, nan, nan, nan, nan),
      Array(1.0, 1.0, 2.0, nan, nan, nan, nan),
      Array(3.0, 1.0, 2.0, 2.0, 2.0, nan, nan),
      Array(3.0, 4.0, 2.0, nan, nan, nan, nan),
      Array(4.0, 4.0, nan, nan, nan, nan, nan)))
  }

  val expected13: Array[Array[Double]] = Array(
    Array(nan, nan, 1.0, nan, nan, nan, nan, nan, nan, nan, nan, nan, nan),
    Array(nan, nan, 1.0, 1.0, nan, nan, nan, nan, nan, nan, nan, nan, nan),
    Array(nan, nan, 1.0, 1.0, 1.0, 1.0, nan, nan, nan, nan, nan, nan, nan),
    Array(nan, nan, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, nan, nan, nan, nan, nan),
    Array(nan, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, nan, nan, nan, nan),
    Array(nan, 3.0, 3.0, 1.0, 1.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, nan, nan),
    Array(nan, 3.0, 3.0, 3.0, 3.0, 1.0, 1.0, 2.0, 2.0, 2.0, 2.0, 2.0, 2.0),
    Array(nan, 3.0, 3.0, 3.0, 3.0, 3.0, 1.0, 2.0, 2.0, 2.0, 2.0, nan, nan),
    Array(3.0, 3.0, 3.0, 3.0, 3.0, 4.0, 4.0, 2.0, 2.0, 2.0, nan, nan, nan),
    Array(nan, 3.0, 3.0, 3.0, 4.0, 4.0, 4.0, 4.0, 2.0, nan, nan, nan, nan),
    Array(nan, nan, 3.0, 4.0, 4.0, 4.0, 4.0, nan, nan, nan, nan, nan, nan),
    Array(nan, nan, nan, 4.0, 4.0, 4.0, nan, nan, nan, nan, nan, nan, nan),
    Array(nan, nan, nan, nan, 4.0, nan, nan, nan, nan, nan, nan, nan, nan))

  test("13x13 nearest (test_rectify.py:261-273)") {
    val dst = GridMapping.regular(13, 13, -0.25, 49.75, 0.5, 0.5, Crs.Geographic)
    assertImage(run(rad, dst, Interp.NEAREST), expected13)
  }

  test("13x13 tiled targets give identical values (test_rectify.py:295-388)") {
    for (ts <- Seq((5, 5), (7, 7), (3, 13), (13, 3))) {
      val dst = GridMapping.regular(13, 13, -0.25, 49.75, 0.5, 0.5, Crs.Geographic,
        tileSize = Some(ts))
      assertImage(run(rad, dst, Interp.NEAREST), expected13)
    }
  }

  test("13x13 j-axis-up flips rows (test_rectify.py:275-292)") {
    val dst = GridMapping.regular(13, 13, -0.25, 49.75, 0.5, 0.5, Crs.Geographic,
      isJAxisUp = true)
    assertImage(run(rad, dst, Interp.NEAREST), expected13.reverse)
  }

  test("13x13 antimeridian (test_rectify.py:389-424)") {
    // reference fixture: sampledata.py:160-172; coords normalized to
    // lon-360 by inference before rectification
    val lonAnti = Array(Array(179.0, -176.0), Array(178.0, 180.0))
    val lon360 = lonAnti.map(_.map(x => if (x >= 0) x else x + 360.0))
    val dst = GridMapping.regular(13, 13, 177.75, 49.75, 0.5, 0.5, Crs.Geographic)
    assert(dst.isLon360)
    assertImage(run(rad, dst, Interp.NEAREST, lon = lon360), expected13)
  }

  test("invalid interp method raises (test_rectify.py:221-230)") {
    intercept[Exception] {
      graft.kernel.Interp.methodFromName("cubic")
    }
  }

  test("irregular 1D axes route through meshgrid + rectify (coords.py:74-96)") {
    // non-uniform steps in both axes; y descending (j-down image)
    val xs = Array(0.0, 1.0, 2.5, 4.5)
    val ys = Array(10.0, 9.0, 7.5, 5.5)
    val gm1d = graft.geom.GridMappingInference.fromCoords1D(
      xs, ys, Crs.Geographic, Some((2, 2)))
    assert(!gm1d.isRegular)

    // meshgrid property: x repeats per row, y per column
    val ct = graft.geom.GridMappingOps.meshgridCoordTiles(spark, xs, ys, 2, 2)
      .collect().toSeq
    val xImg = toArray(ct, gm1d, "x"); val yImg = toArray(ct, gm1d, "y")
    for (j <- 0 until 4; i <- 0 until 4) {
      assert(xImg(j)(i) == xs(i)); assert(yImg(j)(i) == ys(j))
    }

    val data = Array.tabulate(4, 4)((j, i) => (j * 4 + i).toDouble)
    val dst = GridMapping.regular(8, 8, 0.05, 5.55, 0.5, 0.5, Crs.Geographic)
    val (outTiles, outGm) = ResampleInSpace.from1DCoords(
      toDs(tilesFrom("rad", data, gm1d)), xs, ys, Crs.Geographic, Some((2, 2)),
      Some(dst), Map("rad" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, nan, F64)))
    assert(outGm == dst)
    val got = toArray(outTiles.collect().toSeq, dst, "rad")

    // independent oracle: the separable mesh makes the rasterizer's
    // barycentric lookup a per-axis piecewise-linear inverse; nearest
    // uses the kernel's frac > 0.5 step
    def axisFrac(axis: Array[Double], v: Double, ascending: Boolean): Double = {
      var k = 0
      while (k < axis.length - 2 &&
        (if (ascending) v > axis(k + 1) else v < axis(k + 1))) k += 1
      k + (v - axis(k)) / (axis(k + 1) - axis(k))
    }
    for (j <- 0 until 8; i <- 0 until 8) {
      val x = dst.xMin + (i + 0.5) * dst.xRes
      val y = dst.yMax - (j + 0.5) * dst.yRes
      val fi = axisFrac(xs, x, ascending = true)
      val fj = axisFrac(ys, y, ascending = false)
      val si = fi.toInt + (if (fi - fi.toInt > 0.5) 1 else 0)
      val sj = fj.toInt + (if (fj - fj.toInt > 0.5) 1 else 0)
      assert(got(j)(i) == data(sj)(si), s"at ($j,$i): fi=$fi fj=$fj")
    }
  }
}
