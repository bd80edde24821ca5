package graft.kernel

import graft.geom.Affine

/** Per-tile affine warp kernel — the Spark analog of
  * `dask_image.ndinterp.affine_transform` with a diagonal scale matrix,
  * spline order 0/1 and constant fill (reference:
  * xcube_resampling/affine.py:316-362).
  *
  * The matrix maps TARGET pixel index -> SOURCE pixel index (the
  * reference computes it as `target_gm.ij_transform_to(source_gm)`,
  * reference: affine.py:121). Order 0 ("nearest") uses scipy's
  * order-0 convention `floor(x + 0.5)`; order 1 blends the 4
  * neighbors, with samples beyond the source extent reading the
  * constant fill value.
  */
object AffineWarp {

  /** Warp one target tile.
    *
    * @param win       source window (global pixel coords) holding every
    *                  source pixel the tile can touch
    * @param srcW,srcH full source image size — bounds for constant fill
    * @param dstI0,dstJ0 global pixel coords of the tile's top-left
    * @param dstW,dstH tile shape
    * @param m         target-index -> source-index affine
    * @param order     0 = nearest, 1 = bilinear
    * @param fill      constant fill value (cval)
    * @param recoverNan 3-pass NaN recovery (reference: affine.py:344-360)
    */
  def warpTile(
      win: Window, srcW: Int, srcH: Int,
      dstI0: Int, dstJ0: Int, dstW: Int, dstH: Int,
      m: Affine, order: Int, fill: Double, recoverNan: Boolean): Array[Double] = {
    val out = new Array[Double](dstW * dstH)
    val doRecover = recoverNan && order > 0 && hasNaN(win.data)
    var j = 0
    while (j < dstH) {
      val gj = dstJ0 + j
      var i = 0
      while (i < dstW) {
        val gi = dstI0 + i
        val fx = m.applyX(gi, gj)
        val fy = m.applyY(gi, gj)
        out(j * dstW + i) =
          if (doRecover) sampleRecover(win, srcW, srcH, fx, fy, fill)
          else sampleConstant(win, srcW, srcH, fx, fy, order, fill)
        i += 1
      }
      j += 1
    }
    out
  }

  @inline private def hasNaN(a: Array[Double]): Boolean = {
    var k = 0
    while (k < a.length) { if (a(k).isNaN) return true; k += 1 }
    false
  }

  /** Sample with scipy `mode="constant"` semantics: any neighbor beyond
    * the FULL source extent contributes `fill`.
    */
  @inline private def sampleConstant(
      win: Window, srcW: Int, srcH: Int,
      fx: Double, fy: Double, order: Int, fill: Double): Double = {
    @inline def at(i: Int, j: Int): Double =
      if (i < 0 || i >= srcW || j < 0 || j >= srcH) fill
      else win.get(i, j, fill)
    if (order == 0) {
      // scipy order-0: round half up via floor(x + 0.5)
      at(math.floor(fx + 0.5).toInt, math.floor(fy + 0.5).toInt)
    } else {
      // scipy spline base: at the exact right/bottom boundary the
      // stencil shifts inward (weights [0,1]) instead of reading the
      // cval neighbor — golden tests prove v[n-1] stays finite there
      // while interior exact-integer samples DO blend (and NaN-poison)
      // through their zero-weight right neighbor
      var iF = math.floor(fx).toInt; var jF = math.floor(fy).toInt
      if (iF >= srcW - 1 && fx <= srcW - 1) iF = srcW - 2
      if (jF >= srcH - 1 && fy <= srcH - 1) jF = srcH - 2
      val u = fx - iF; val v = fy - jF
      val v00 = at(iF, jF); val v01 = at(iF + 1, jF)
      val v10 = at(iF, jF + 1); val v11 = at(iF + 1, jF + 1)
      val vu0 = v00 + u * (v01 - v00)
      val vu1 = v10 + u * (v11 - v10)
      vu0 + v * (vu1 - vu0)
    }
  }

  /** NaN recovery for order-1: warp a zero-filled image and the inverted
    * NaN mask, renormalize, NaN where the mask-weight ~ 0
    * (reference: affine.py:344-360). Done per-sample: weights and
    * filled values use the same bilinear weights, so the per-pixel
    * result equals the reference's whole-image formulation.
    */
  @inline private def sampleRecover(
      win: Window, srcW: Int, srcH: Int, fx: Double, fy: Double,
      fill: Double): Double = {
    // Both warps use mode="constant" with cval=fill_value — an
    // out-of-extent neighbor contributes `fill` to BOTH the zero-filled
    // image and the inverted-mask norm (reference: affine.py:336-355).
    @inline def filled(i: Int, j: Int): Double =
      if (i < 0 || i >= srcW || j < 0 || j >= srcH) fill
      else { val v = win.get(i, j, fill); if (v.isNaN) 0.0 else v }
    @inline def weight(i: Int, j: Int): Double =
      if (i < 0 || i >= srcW || j < 0 || j >= srcH) fill
      else { val v = win.get(i, j, Double.NaN); if (v.isNaN) 0.0 else 1.0 }
    var iF = math.floor(fx).toInt; var jF = math.floor(fy).toInt
    if (iF >= srcW - 1 && fx <= srcW - 1) iF = srcW - 2
    if (jF >= srcH - 1 && fy <= srcH - 1) jF = srcH - 2
    val u = fx - iF; val v = fy - jF
    @inline def blend(f: (Int, Int) => Double): Double = {
      val v00 = f(iF, jF); val v01 = f(iF + 1, jF)
      val v10 = f(iF, jF + 1); val v11 = f(iF + 1, jF + 1)
      val vu0 = v00 + u * (v01 - v00)
      val vu1 = v10 + u * (v11 - v10)
      vu0 + v * (vu1 - vu0)
    }
    val im = blend(filled)
    val norm = blend(weight)
    // np.isclose(norm, 0.0): atol=1e-8
    if (math.abs(norm) <= 1e-8) Double.NaN else im / norm
  }
}
