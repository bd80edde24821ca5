package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark._
import graft.geom.{Crs, GridMapping, GridMappingInference}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies.{F32, VarPolicy}

/** The reference's "complex dask array" reproject case
  * (reference: tests/test_reproject.py:203-245,
  * fixture sampledata.py:131-157): 10x100x100 float32 stack, chunked
  * 25x25, j-axis-up source, LAEA -> geographic target with a coarser
  * resolution (downscale prepass), triangular and bilinear.
  *
  * Tolerance note: the reference computes this case in float32 (its
  * transformed coordinate grids are float32, reproject.py:427-428, 490),
  * while this engine computes in float64 — corner goldens are asserted
  * to 0.02 (f32 noise at 1e4-scale values), plus exact chunked-vs-
  * unchunked and band-vs-band self-consistency.
  */
class ReprojectLargeSpec extends AnyFunSuite {

  val xs = Array.tabulate(100)(i => 3900000.0 + i * (600000.0 / 99))
  val ys = Array.tabulate(100)(j => 2600000.0 + j * (600000.0 / 99))

  def srcGm(tile: Int): GridMapping =
    GridMappingInference.fromCoords1D(xs, ys, Crs.laea3035, Some((tile, tile)))

  def temp(t: Int): Array[Array[Double]] =
    Array.tabulate(100, 100)((j, i) => (t * 10000 + j * 100 + i).toDouble)

  def run(interp: Int, tile: Int, bands: Int): Seq[graft.model.Tile] = {
    val gm = srcGm(tile)
    val pol = Map("temperature" -> VarPolicy(interp, Reducers.Mean, false, Double.NaN, F32))
    val tiles = toDs((0 until bands).flatMap(t => tilesFrom("temperature", temp(t), gm, band = t)))
    val dst = GridMapping.regular(10, 10, 6.0, 48.0, 0.2, 0.2, Crs.Geographic,
      tileSize = Some((5, 5)))
    ReprojectOp.reproject(tiles, gm, dst, pol).collect().toSeq
  }

  val dstGm = GridMapping.regular(10, 10, 6.0, 48.0, 0.2, 0.2, Crs.Geographic,
    tileSize = Some((5, 5)))

  test("triangular corners match reference within f32 noise") {
    val img = toArray(run(Interp.TRIANGULAR, 25, 1), dstGm, "temperature")
    assert(math.abs(img(0)(0) - 6353.582) < 0.02, s"got ${img(0)(0)}")
    assert(math.abs(img(9)(9) - 3007.1228) < 0.02, s"got ${img(9)(9)}")
  }

  test("bilinear corners match reference within f32 noise") {
    val img = toArray(run(Interp.BILINEAR, 25, 1), dstGm, "temperature")
    assert(math.abs(img(0)(0) - 6353.5823) < 0.02, s"got ${img(0)(0)}")
    assert(math.abs(img(9)(9) - 3007.1228) < 0.02, s"got ${img(9)(9)}")
  }

  test("chunked == unchunked, bands resample identically") {
    val a = toArray(run(Interp.TRIANGULAR, 25, 1), dstGm, "temperature")
    val b = toArray(run(Interp.TRIANGULAR, 100, 1), dstGm, "temperature")
    assertImage(a, b, tol = 1e-9)
    val multi = run(Interp.TRIANGULAR, 25, 2)
    val b0 = toArray(multi, dstGm, "temperature", band = 0)
    val b1 = toArray(multi, dstGm, "temperature", band = 1)
    for (j <- 0 until 10; i <- 0 until 10)
      if (!b0(j)(i).isNaN)
        assert(math.abs(b1(j)(i) - b0(j)(i) - 10000.0) < 1e-6)
  }
}
