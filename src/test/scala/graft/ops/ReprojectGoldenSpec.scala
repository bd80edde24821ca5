package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{I64, VarPolicy}

/** Reproject golden parity for resolution changes (downscale prepass)
  * and geographic targets (reference: tests/test_reproject.py:123-201).
  */
class ReprojectGoldenSpec extends AnyFunSuite {
  val nan = Double.NaN

  // reference: sampledata.py:95-109 — UTM32 5x5, band_1 = 0..24
  val utmGm = GridMapping.regular(5, 5, 565250.0, 5933850.0, 100.0, 100.0,
    Crs.utm(32, north = true))
  val band1 = Array.tabulate(5, 5)((j, i) => (j * 5 + i).toDouble)
  val pol: Map[String, VarPolicy] =
    Map("band_1" -> VarPolicy(Interp.NEAREST, Reducers.Center, recoverNan = false,
      fill = -1.0, dtype = I64))

  def run(dstGm: GridMapping): Array[Array[Double]] = {
    val out = ReprojectOp.reproject(toDs(tilesFrom("band_1", band1, utmGm)),
      utmGm, dstGm, pol)
    toArray(out.collect().toSeq, dstGm, "band_1")
  }

  test("finer target res (test_reproject.py:123-141)") {
    val dst = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 20.0, 20.0, Crs.laea3035)
    assertImage(run(dst), Array(
      Array(15, 16, 16, 16, 16),
      Array(15, 16, 16, 16, 16),
      Array(15, 16, 16, 16, 16),
      Array(20, 21, 21, 21, 21),
      Array(20, 21, 21, 21, 21)).map(_.map(_.toDouble)))
  }

  test("coarser target res triggers downscale prepass (test_reproject.py:143-159)") {
    val dst = GridMapping.regular(3, 3, 4320050.0, 3382500.0, 120.0, 120.0, Crs.laea3035)
    assertImage(run(dst), Array(
      Array(0, 1, 2),
      Array(5, 6, 7),
      Array(15, 16, 17)).map(_.map(_.toDouble)))
  }

  test("geographic target (test_reproject.py:161-179)") {
    val dst = GridMapping.regular(5, 5, 9.9886, 53.5499, 0.0006, 0.0006, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(7, 8, 8, 8, 9),
      Array(12, 13, 13, 13, 14),
      Array(12, 13, 13, 13, 14),
      Array(17, 18, 18, 18, 19),
      Array(22, 23, 23, 23, 24)).map(_.map(_.toDouble)))
  }

  test("reproject onto LCC / polar stereographic / web mercator targets (new CRS families e2e)") {
    // end-to-end through the real pipeline (plan, gather, kernel,
    // fill) for each new projection family: build a target grid around
    // the forward-projected source center, reproject, and check every
    // output pixel against the inverse-transform of its center — the
    // same arithmetic path the kernel takes, so comparisons are exact.
    // Target res 60 m keeps the transformed scale above SCALE_LIMIT
    // for every family (rotated envelopes inflate the transformed
    // bbox: LCC ~4°, polar stereo 55° of meridian convergence), so the
    // downscale prepass — which would rewrite the source grid and
    // invalidate the mirror — never triggers
    val (clon, clat) = utmGm.crs.toLonLat(565500.0, 5934100.0)
    for (crs <- Seq(Crs.lambert93, Crs.npsPolarStereo, Crs.WebMercator)) {
      val (cx, cy) = crs.fromLonLat(clon, clat)
      val dst = GridMapping.regular(10, 10, cx - 300.0, cy - 300.0, 60.0, 60.0, crs)
      val img = run(dst)
      assert(img.flatten.exists(_ != -1.0), s"${crs.name}: no coverage")
      // (web mercator's shrunken ground footprint keeps its grid fully
      // inside the source; LCC / polar stereo grids overhang and
      // exercise the fill path — validated by the per-pixel mirror)
      val tr = graft.geom.CrsTransformer(crs, utmGm.crs)
      for (j <- 0 until 10; i <- 0 until 10) {
        val x = dst.xMin + (i + 0.5) * dst.xRes
        val y = dst.yMax - (j + 0.5) * dst.yRes
        val (sx, sy) = tr.transformPoint(x, y)
        val fi = math.rint((sx - utmGm.xMin) / utmGm.xRes - 0.5).toInt
        val fj = math.rint((utmGm.yMax - sy) / utmGm.yRes - 0.5).toInt
        val want = if (fi < 0 || fi > 4 || fj < 0 || fj > 4) -1.0 else band1(fj)(fi)
        assert(img(j)(i) == want, s"${crs.name} ($j,$i): got ${img(j)(i)} want $want")
      }
    }
  }

  test("geographic target finer res (test_reproject.py:181-201)") {
    val dst = GridMapping.regular(5, 5, 9.9886, 53.5499, 0.0003, 0.0003, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(12, 12, 12, 13, 13),
      Array(17, 17, 17, 18, 18),
      Array(17, 17, 17, 18, 18),
      Array(22, 17, 17, 18, 18),
      Array(22, 22, 22, 23, 23)).map(_.map(_.toDouble)))
  }
}
