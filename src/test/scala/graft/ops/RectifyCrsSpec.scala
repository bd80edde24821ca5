package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}

/** Rectify with a target CRS different from the swath coords — the
  * dispatcher transforms the coordinate images forward and re-infers
  * the source mapping (reference: rectify.py:127-129, 182-231).
  */
class RectifyCrsSpec extends AnyFunSuite {
  val nan = Double.NaN

  test("swath lon/lat rectified onto a UTM target covers the scene") {
    // small swath near the UTM32 central meridian
    val lon = Array(Array(8.9, 9.1), Array(8.9, 9.1))
    val lat = Array(Array(50.1, 50.1), Array(49.9, 49.9))
    val rad = Array(Array(1.0, 2.0), Array(3.0, 4.0))
    val srcGm = GridMapping(2, 2, 2, 2, 8.9, 49.9, 9.1, 50.1, 0.2, 0.2,
      Crs.Geographic, isRegular = false)
    val utm = Crs.utm(32, north = true)
    // target grid around the transformed footprint (~(492.8k..507.2k, 5.528M..5.551M))
    val dstGm = GridMapping.regular(16, 16, 490000.0, 5525000.0, 1200.0, 1800.0, utm)
    val (out, gmOut) = ResampleInSpace(
      toDs(tilesFrom("rad", rad, srcGm)),
      Some(toDs(tilesFrom("x", lon, srcGm) ++ tilesFrom("y", lat, srcGm))),
      srcGm, Some(dstGm),
      Map("rad" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, nan, F64)))
    assert(gmOut == dstGm)
    val img = toArray(out.collect().toSeq, dstGm, "rad")
    val vals = img.flatten.filterNot(_.isNaN)
    assert(vals.nonEmpty)
    // all four source values appear; nothing outside the value range
    assert(Set(1.0, 2.0, 3.0, 4.0).subsetOf(vals.toSet), s"got ${vals.toSet}")
  }
}
