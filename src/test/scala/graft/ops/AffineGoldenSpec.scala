package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F64, VarPolicy}

/** Affine golden parity vs reference: tests/test_affine.py:46-497 on
  * the 8x6 checkerboard fixture (tests/sampledata.py:60-83).
  */
class AffineGoldenSpec extends AnyFunSuite {
  val nan = Double.NaN

  // reference: sampledata.py:60-83 — NaN at [2,3]
  val refl = Array(
    Array(0.0, 1, 0, 2, 0, 3, 0, 4),
    Array(2.0, 0, 3, 0, 4, 0, 1, 0),
    Array(0.0, 4, 0, nan, 0, 2, 0, 3),
    Array(1.0, 0, 2, 0, 3, 0, 4, 0),
    Array(0.0, 3, 0, 4, 0, 1, 0, 2),
    Array(4.0, 0, 1, 0, 2, 0, 3, 0))
  val srcGm = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)

  def run(dstGm: GridMapping, interp: Int = Interp.BILINEAR,
      recoverNan: Boolean = false, tiled: Option[(Int, Int)] = None): Array[Array[Double]] = {
    val gm = tiled.fold(srcGm)(ts => srcGm.derive(tileSize = Some(ts)))
    val pol = Map("refl" -> VarPolicy(interp, Reducers.Mean, recoverNan, nan, F64))
    val out = AffineOp.affineTransform(toDs(tilesFrom("refl", refl, gm)), gm, dstGm, pol)
    toArray(out.collect().toSeq, dstGm, "refl")
  }

  test("subset at source-aligned origin (test_affine.py:46-70)") {
    val dst = GridMapping.regular(3, 3, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(1.0, 0, 2), Array(0.0, 3, 0), Array(4.0, 0, 1)))
  }

  test("subset shifted one pixel: NaN poisons zero-weight neighbors (test_affine.py:72-92)") {
    val dst = GridMapping.regular(3, 3, 50.1, 10.1, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(4.0, nan, nan), Array(0.0, 2, 0), Array(3.0, 0, 4)))
  }

  test("half-pixel shift bilinear (test_affine.py:94-115)") {
    val dst = GridMapping.regular(3, 3, 50.05, 10.05, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(1.25, 1.5, nan), Array(1.0, 1.25, 1.5), Array(1.75, 1.0, 1.25)))
  }

  test("half-pixel shift with NaN recovery (test_affine.py:117-140)") {
    val dst = GridMapping.regular(3, 3, 50.05, 10.05, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst, recoverNan = true), Array(
      Array(1.25, 1.5, 0.6666667), Array(1.0, 1.25, 1.5), Array(1.75, 1.0, 1.25)),
      tol = 1e-6)
  }

  test("3D bands resample identically (test_affine.py:142-174)") {
    val dst = GridMapping.regular(3, 3, 50.0, 10.0, 0.1, 0.1, Crs.Geographic)
    val pol = Map("refl" -> VarPolicy(Interp.BILINEAR, Reducers.Mean, false, nan, F64))
    val tiles = toDs(tilesFrom("refl", refl, srcGm, band = 0) ++
      tilesFrom("refl", refl, srcGm, band = 1))
    val out = AffineOp.affineTransform(tiles, srcGm, dst, pol).collect().toSeq
    val want = Array(Array(1.0, 0, 2), Array(0.0, 3, 0), Array(4.0, 0, 1))
    assertImage(toArray(out, dst, "refl", band = 0), want)
    assertImage(toArray(out, dst, "refl", band = 1), want)
  }

  test("downscale x2 (test_affine.py:295-324)") {
    val dst = GridMapping.regular(8, 6, 50.0, 10.0, 0.2, 0.2, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(0.75, 1.0, 1.75, 1.25, nan, nan, nan, nan),
      Array(1.25, 1.0, 1.25, 1.75, nan, nan, nan, nan),
      Array(1.75, 1.25, 0.75, 1.25, nan, nan, nan, nan)))
  }

  test("downscale x2 with shift (test_affine.py:326-356)") {
    val dst = GridMapping.regular(8, 6, 49.8, 9.8, 0.2, 0.2, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(nan, 0.75, 1.0, 1.75, 1.25, nan, nan, nan),
      Array(nan, 1.25, 1.0, 1.25, 1.75, nan, nan, nan),
      Array(nan, 1.75, 1.25, 0.75, 1.25, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan, nan)))
  }

  test("upscale x2 (test_affine.py:358-388)") {
    val dst = GridMapping.regular(8, 6, 50.0, 10.0, 0.05, 0.05, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(1.0, 0.5, 0.0, 1.0, 2.0, 1.0, 0.0, 1.5),
      Array(0.5, 1.0, 1.5, 1.25, 1.0, 1.5, 2.0, 1.75),
      Array(0.0, 1.5, 3.0, 1.5, 0.0, 2.0, 4.0, 2.0),
      Array(2.0, 1.75, 1.5, 1.0, 0.5, 1.25, 2.0, 1.5),
      Array(4.0, 2.0, 0.0, 0.5, 1.0, 0.5, 0.0, 1.0),
      Array(nan, nan, nan, nan, nan, nan, nan, nan)))
  }

  test("upscale x2 with shift (test_affine.py:390-420)") {
    val dst = GridMapping.regular(8, 6, 49.9, 9.95, 0.05, 0.05, Crs.Geographic)
    assertImage(run(dst), Array(
      Array(nan, nan, 0.5, 1.0, 1.5, 1.25, 1.0, 1.5),
      Array(nan, nan, 0.0, 1.5, 3.0, 1.5, 0.0, 2.0),
      Array(nan, nan, 2.0, 1.75, 1.5, 1.0, 0.5, 1.25),
      Array(nan, nan, 4.0, 2.0, 0.0, 0.5, 1.0, 0.5),
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(nan, nan, nan, nan, nan, nan, nan, nan)))
  }

  test("integer shifts with out-of-coverage fill (test_affine.py:422-480)") {
    val dst1 = GridMapping.regular(8, 6, 50.2, 10.1, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst1), Array(
      Array(nan, nan, nan, nan, nan, nan, nan, nan),
      Array(0.0, 2.0, 0.0, 3.0, 0.0, 4.0, nan, nan),
      Array(nan, nan, 4.0, 0.0, 1.0, 0.0, nan, nan),
      Array(nan, nan, 0.0, 2.0, 0.0, 3.0, nan, nan),
      Array(2.0, 0.0, 3.0, 0.0, 4.0, 0.0, nan, nan),
      Array(0.0, 4.0, 0.0, 1.0, 0.0, 2.0, nan, nan)))
    val dst2 = GridMapping.regular(8, 6, 49.8, 9.9, 0.1, 0.1, Crs.Geographic)
    assertImage(run(dst2), Array(
      Array(nan, nan, 2.0, 0.0, nan, nan, 4.0, 0.0),
      Array(nan, nan, 0.0, 4.0, nan, nan, 0.0, 2.0),
      Array(nan, nan, 1.0, 0.0, 2.0, 0.0, 3.0, 0.0),
      Array(nan, nan, 0.0, 3.0, 0.0, 4.0, 0.0, 1.0),
      Array(nan, nan, 4.0, 0.0, 1.0, 0.0, 2.0, 0.0),
      Array(nan, nan, nan, nan, nan, nan, nan, nan)))
  }

  test("chunked source matches unchunked goldens") {
    val dst = GridMapping.regular(8, 6, 50.0, 10.0, 0.05, 0.05, Crs.Geographic)
    val want = run(dst)
    assertImage(run(dst, tiled = Some((3, 2))), want)
    assertImage(run(dst, tiled = Some((5, 5))), want)
  }

  test("invalid interp method raises (test_affine.py:481-497)") {
    val dst = GridMapping.regular(8, 6, 50.2, 10.1, 0.1, 0.1, Crs.Geographic)
    val e = intercept[Exception] { run(dst, interp = Interp.TRIANGULAR) }
    def rootMsg(t: Throwable): String =
      if (t.getCause != null) rootMsg(t.getCause) else String.valueOf(t.getMessage)
    assert((e.getMessage + rootMsg(e)).contains("interp_methods must be one of"))
  }
}
