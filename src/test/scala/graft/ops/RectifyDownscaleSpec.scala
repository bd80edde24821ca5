package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping, GridMappingInference}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}

/** Dispatcher rectify+downscale golden parity
  * (reference: tests/test_spatial.py:51-77 on the 4x4 diagonal swath
  * fixture sampledata.py:175-208): source res is estimated finer than
  * the target, so the downscale prepass (reference: rectify.py:234-260)
  * shrinks data AND coord images before rasterization.
  */
class RectifyDownscaleSpec extends AnyFunSuite {
  val nan = Double.NaN

  val lon = Array(
    Array(1.0, 2.0, 3.0, 4.0),
    Array(0.0, 1.0, 2.0, 3.0),
    Array(-1.0, 0.0, 1.0, 2.0),
    Array(-2.0, -1.0, 0.0, 1.0))
  val lat = Array(
    Array(56.0, 55.0, 54.0, 53.0),
    Array(55.0, 54.0, 53.0, 52.0),
    Array(54.0, 53.0, 52.0, 51.0),
    Array(53.0, 52.0, 51.0, 50.0))
  val rad = Array(
    Array(1.0, 2.0, 3.0, 4.0),
    Array(5.0, 6.0, 7.0, 8.0),
    Array(9.0, 10.0, 11.0, 12.0),
    Array(13.0, 14.0, 15.0, 16.0))

  def run(interp: Int): Array[Array[Double]] = {
    val gmT = GridMapping(4, 4, 4, 4, 0, 0, 1, 1, 1, 1, Crs.Geographic, isRegular = false)
    val coords = toDs(tilesFrom("x", lon, gmT) ++ tilesFrom("y", lat, gmT))
    val srcGm = GridMappingInference.fromCoords2D(coords, 4, 4, 4, 4, Crs.Geographic)
    assert(!srcGm.isRegular)
    val dstGm = GridMapping.regular(2, 2, -1.0, 51.0, 2.0, 2.0, Crs.Geographic)
    val (out, _) = ResampleInSpace(
      toDs(tilesFrom("rad", rad, gmT)), Some(coords), srcGm, Some(dstGm),
      Map("rad" -> VarPolicy(interp, Reducers.Mean, false, nan, F64)))
    toArray(out.collect().toSeq, dstGm, "rad")
  }

  test("rectify + downscale nearest (test_spatial.py:51-66)") {
    assertImage(run(Interp.NEAREST), Array(
      Array(5.0, 2.0), Array(14.0, 8.0)))
  }

  test("rectify + downscale bilinear (test_spatial.py:67-77)") {
    assertImage(run(Interp.BILINEAR), Array(
      Array(7.5, 4.5), Array(12.5, 9.5)))
  }
}
