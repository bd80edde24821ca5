package graft.geom

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark._
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}
import graft.ops.RectifyOp

class InferenceSpec extends AnyFunSuite {
  val nan = Double.NaN

  test("fromCoords1D detects the regular 8x6 fixture grid") {
    // reference: tests/sampledata.py:60-83
    val xs = Array.tabulate(8)(i => 50.0 + 0.1 * i + 0.05)
    val ys = Array.tabulate(6)(j => 10.6 - 0.1 * j - 0.05)
    val gm = GridMappingInference.fromCoords1D(xs, ys, Crs.Geographic)
    assert(gm.isRegular)
    assert(!gm.isJAxisUp)
    assert(math.abs(gm.xRes - 0.1) < 1e-9 && math.abs(gm.yRes - 0.1) < 1e-9)
    assert(math.abs(gm.xMin - 50.0) < 1e-9 && math.abs(gm.yMax - 10.6) < 1e-9)
    assert(gm.width == 8 && gm.height == 6)
  }

  test("fromCoords1D ascending y -> j axis up") {
    val xs = Array(0.5, 1.5, 2.5)
    val ys = Array(10.5, 11.5, 12.5)
    val gm = GridMappingInference.fromCoords1D(xs, ys, Crs.Geographic)
    assert(gm.isJAxisUp && gm.isRegular)
  }

  test("fromCoords1D antimeridian crossing normalizes to lon-360") {
    val xs = Array(179.5, -179.5, -178.5)
    val ys = Array(2.5, 1.5, 0.5)
    val gm = GridMappingInference.fromCoords1D(xs, ys, Crs.Geographic)
    assert(gm.isLon360 && gm.isRegular)
    assert(math.abs(gm.xRes - 1.0) < 1e-9)
    assert(math.abs(gm.xMin - 179.0) < 1e-9 && math.abs(gm.xMax - 182.0) < 1e-9)
  }

  // reference fixture: tests/sampledata.py:29-39
  val srcLon = Array(Array(1.0, 6.0), Array(0.0, 2.0))
  val srcLat = Array(Array(56.0, 53.0), Array(52.0, 50.0))

  test("fromCoords2D estimates the irregular 2x2 swath grid") {
    val gmT = GridMapping(2, 2, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val coords = toDs(tilesFrom("x", srcLon, gmT) ++ tilesFrom("y", srcLat, gmT))
    val gm = GridMappingInference.fromCoords2D(coords, 2, 2, 2, 2, Crs.Geographic)
    assert(!gm.isRegular && !gm.isJAxisUp && !gm.isLon360)
    // area-blend estimate (reference formulas) -> 4.0 deg
    assert(math.abs(gm.xRes - 4.0) < 1e-9, s"res was ${gm.xRes}")
    assert(math.abs(gm.xMin - -2.0) < 1e-9 && math.abs(gm.xMax - 8.0) < 1e-9)
    assert(math.abs(gm.yMin - 48.0) < 1e-9 && math.abs(gm.yMax - 58.0) < 1e-9)
    // to_regular: 4x4 @ res 4 from (-2,48) (reference: regular.py:132-166)
    val reg = gm.toRegular()
    assert(reg.width == 4 && reg.height == 4)
    assert(math.abs(reg.xRes - 4.0) < 1e-9)
    assert(math.abs(reg.xMin - -2.0) < 1e-9 && math.abs(reg.yMin - 48.0) < 1e-9)
  }

  test("fromCoords2D detects a regular multi-tile grid without collecting slices") {
    // 6x4 regular grid tiled 2x2 -> 6 tiles; seam diffs must fold
    // correctly across tile borders
    val gmT = GridMapping(6, 4, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val xs2d = Array.tabulate(4, 6)((_, i) => 20.05 + 0.1 * i)
    val ys2d = Array.tabulate(4, 6)((j, _) => 49.95 - 0.1 * j)
    val coords = toDs(tilesFrom("x", xs2d, gmT) ++ tilesFrom("y", ys2d, gmT))
    val gm = GridMappingInference.fromCoords2D(coords, 6, 4, 2, 2, Crs.Geographic)
    assert(gm.isRegular && !gm.isJAxisUp && !gm.isLon360)
    assert(math.abs(gm.xRes - 0.1) < 1e-9 && math.abs(gm.yRes - 0.1) < 1e-9)
    assert(math.abs(gm.xMin - 20.0) < 1e-9 && math.abs(gm.xMax - 20.6) < 1e-9)
    assert(math.abs(gm.yMin - 49.6) < 1e-9 && math.abs(gm.yMax - 50.0) < 1e-9)
  }

  test("fromCoords2D: ascending y -> j axis up (pointwise distributed check)") {
    val gmT = GridMapping(4, 4, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val xs2d = Array.tabulate(4, 4)((_, i) => 10.5 + 1.0 * i)
    val ys2d = Array.tabulate(4, 4)((j, _) => 40.5 + 1.0 * j)
    val coords = toDs(tilesFrom("x", xs2d, gmT) ++ tilesFrom("y", ys2d, gmT))
    val gm = GridMappingInference.fromCoords2D(coords, 4, 4, 2, 2, Crs.Geographic)
    assert(gm.isJAxisUp && gm.isRegular)
    assert(math.abs(gm.yMin - 40.0) < 1e-9 && math.abs(gm.yMax - 44.0) < 1e-9)
  }

  test("fromCoords2D antimeridian crossing normalizes to lon-360 (re-folded x stats)") {
    val gmT = GridMapping(4, 2, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    // lons 179.5, -179.5 (=180.5), -178.5, -177.5 -> regular once shifted
    val lonRow = Array(179.5, -179.5, -178.5, -177.5)
    val xs2d = Array.fill(2)(lonRow)
    val ys2d = Array.tabulate(2, 4)((j, _) => 1.5 - 1.0 * j)
    val coords = toDs(tilesFrom("x", xs2d, gmT) ++ tilesFrom("y", ys2d, gmT))
    val gm = GridMappingInference.fromCoords2D(coords, 4, 2, 2, 2, Crs.Geographic)
    assert(gm.isLon360 && gm.isRegular)
    assert(math.abs(gm.xRes - 1.0) < 1e-9)
    assert(math.abs(gm.xMin - 179.0) < 1e-9 && math.abs(gm.xMax - 183.0) < 1e-9)
  }

  test("rectify to inferred default target matches reference golden") {
    // reference: test_rectify.py:66-78 (rectify_dataset with no target)
    val gmT = GridMapping(2, 2, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val coords = toDs(tilesFrom("x", srcLon, gmT) ++ tilesFrom("y", srcLat, gmT))
    val srcGm = GridMappingInference.fromCoords2D(coords, 2, 2, 2, 2, Crs.Geographic)
    val dstGm = srcGm.toRegular()
    val rad = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val out = RectifyOp.rectify(
      toDs(tilesFrom("rad", rad, srcGm)), coords, srcGm, dstGm,
      Map("rad" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, nan, F64)))
    assertImage(toArray(out.collect().toSeq, dstGm, "rad"), Array(
      Array(nan, nan, nan, nan),
      Array(nan, nan, nan, nan),
      Array(nan, 2.0, nan, nan),
      Array(nan, nan, nan, nan)))
  }

  test("toCoordsDf materializes axis coords with CF bounds") {
    val gm = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    val df = GridMappingInference.toCoordsDf(TestSpark.spark, gm).collect()
    val x0 = df.find(r => r.getString(0) == "x" && r.getLong(1) == 0L).get
    assert(math.abs(x0.getDouble(2) - 50.05) < 1e-9)
    assert(math.abs(x0.getDouble(3) - 50.0) < 1e-9 && math.abs(x0.getDouble(4) - 50.1) < 1e-9)
    val y0 = df.find(r => r.getString(0) == "y" && r.getLong(1) == 0L).get
    // j-down: bounds upper edge first
    assert(math.abs(y0.getDouble(2) - 10.55) < 1e-9)
    assert(math.abs(y0.getDouble(3) - 10.6) < 1e-9 && math.abs(y0.getDouble(4) - 10.5) < 1e-9)
  }

  test("toCoordsDf on an IRREGULAR mapping prints the reference's linspace axes and bounds") {
    // the 2x2 swath fixture infers bbox (-2,48)-(8,58) at res 4 — an
    // ESTIMATE inconsistent with w*res, where the endpoint (linspace)
    // form diverges from the stride form; expected arrays are the
    // reference's grid_mapping_to_coords on exact binary values:
    //   x:      linspace(0, 6, 2)  = [0, 6]
    //   x_bnds: [(-2, 2), (4, 8)]
    //   y:      linspace(56, 50, 2) = [56, 50]   (j-down: descending)
    //   y_bnds: [(58, 54), (52, 48)]
    val gmT = GridMapping(2, 2, 2, 2, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val coords = toDs(tilesFrom("x", srcLon, gmT) ++ tilesFrom("y", srcLat, gmT))
    val gm = GridMappingInference.fromCoords2D(coords, 2, 2, 2, 2, Crs.Geographic)
    assert(!gm.isRegular)
    val rows = GridMappingInference.toCoordsDf(TestSpark.spark, gm).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(("x", 0L)) == ((0.0, -2.0, 2.0)))
    assert(rows(("x", 1L)) == ((6.0, 4.0, 8.0)))
    assert(rows(("y", 0L)) == ((56.0, 58.0, 54.0)))
    assert(rows(("y", 1L)) == ((50.0, 52.0, 48.0)))
  }

  test("toCoordsDf folds lon-360 coords AND bounds back to [-180, 180]") {
    // 4 cells at res 1 from x 179..183 (antimeridian crossing, stored
    // lon-360); the reference folds where > 180 — note cell 1's lower
    // bound 180 stays while its center 180.5 and upper bound 181 fold
    val gm = GridMapping(4, 2, 4, 2, 179.0, 0.0, 183.0, 2.0, 1.0, 1.0,
      Crs.Geographic, isRegular = true, isJAxisUp = false, isLon360 = true)
    val rows = GridMappingInference.toCoordsDf(TestSpark.spark, gm).collect()
      .filter(_.getString(0) == "x")
      .map(r => r.getLong(1) -> ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows(0L) == ((179.5, 179.0, 180.0)))
    assert(rows(1L) == ((-179.5, 180.0, -179.0)))
    assert(rows(2L) == ((-178.5, -179.0, -178.0)))
    assert(rows(3L) == ((-177.5, -178.0, -177.0)))
  }

  test("xyCoordsDf: irregular 2D coords equal the coord tiles; 1D-irregular equals the meshgrid broadcast; regular path agrees") {
    val spark = TestSpark.spark
    // irregular 1D axes (uneven spacing) -> meshgrid broadcast, like
    // the reference's Coords1DGridMapping._new_xy_coords
    val xs = Array(50.0, 50.1, 50.3, 50.8)
    val ys = Array(10.0, 10.2, 10.3)
    val tiles = GridMappingOps.meshgridCoordTiles(spark, xs, ys, 2, 2)
    val gmIrr = GridMapping(4, 3, 2, 2, 49.95, 9.95, 50.85, 10.35, 0.1, 0.1,
      Crs.Geographic, isRegular = false, isJAxisUp = false, isLon360 = false)
    val rows = GridMappingInference.xyCoordsDf(spark, gmIrr, Some(tiles))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(rows.size == 12)
    for (j <- 0 until 3; i <- 0 until 4)
      assert(rows((j, i)) == ((xs(i), ys(j))), s"($j,$i) -> ${rows((j, i))}")
    // regular distributed synthesis matches the per-axis definition
    val gmReg = GridMapping.regular(5, 4, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    val reg = GridMappingInference.xyCoordsDf(spark, gmReg)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(2), r.getDouble(3)))).toMap
    assert(reg.size == 20)
    for (j <- 0 until 4; i <- 0 until 5)
      assert(reg((j, i)) == ((gmReg.xCoord(i), gmReg.yCoord(j))))
    // missing coord tiles on an irregular mapping fail loudly
    intercept[IllegalArgumentException](GridMappingInference.xyCoordsDf(spark, gmIrr, None))
  }
}
