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
