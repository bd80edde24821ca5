package graft.kernel

/** Inverse-lookup construction for rectification: rasterize each source
  * QUAD (2x2 neighboring pixels of the irregular source grid, split
  * into two triangles) onto the regular target grid, solving barycentric
  * (u, v) per covered target pixel and writing fractional source
  * (i, j) — first-writer-wins.
  *
  * Line-by-line port of the numba kernel
  * (reference: xcube_resampling/rectify.py:425-576 and the inlined
  * helpers rectify.py:737-773); `uvDelta` is `UV_DELTA = 1e-3`
  * (reference: constants.py:80).
  */
object TriangleRasterizer {

  @inline private def fdet(px0: Double, py0: Double, px1: Double, py1: Double,
      px2: Double, py2: Double): Double =
    (px0 - px1) * (py0 - py2) - (px0 - px2) * (py0 - py1)

  @inline private def fu(px: Double, py: Double, px0: Double, py0: Double,
      px2: Double, py2: Double): Double =
    (px0 - px) * (py0 - py2) - (py0 - py) * (px0 - px2)

  @inline private def fv(px: Double, py: Double, px0: Double, py0: Double,
      px1: Double, py1: Double): Double =
    (py0 - py) * (px0 - px1) - (px0 - px) * (py0 - py1)

  @inline private def fclamp(x: Double, lo: Double, hi: Double): Double =
    if (x < lo) lo else if (x > hi) hi else x

  /** Rasterize the source quads of a coordinate window onto one target
    * tile.
    *
    * @param srcX,srcY  source coordinate window images (row-major
    *                   winH x winW), GLOBAL source pixel offset
    *                   (srcIMin, srcJMin)
    * @param dstXOffset x of the LEFT EDGE of the tile's first pixel
    * @param dstYOffset y edge of the tile's first pixel (top edge for
    *                   j-down, bottom for j-up)
    * @param dstXScale,dstYScale pixel size; dstYScale NEGATIVE for
    *                   j-down (reference: rectify.py:416)
    * @param dstSrcI,dstSrcJ output fractional source index images
    *                   (pre-filled NaN), shape dstH x dstW
    */
  def rasterize(
      srcX: Array[Double], srcY: Array[Double], winW: Int, winH: Int,
      srcIMin: Int, srcJMin: Int,
      dstXOffset: Double, dstYOffset: Double,
      dstXScale: Double, dstYScale: Double,
      dstW: Int, dstH: Int,
      uvDelta: Double,
      dstSrcI: Array[Double], dstSrcJ: Array[Double]): Unit = {
    val uMin = -uvDelta
    val vMin = -uvDelta
    val uvMax = 1.0 + 2 * uvDelta

    var srcJ0 = 0
    while (srcJ0 < winH - 1) {
      val srcJ1 = srcJ0 + 1
      var srcI0 = 0
      while (srcI0 < winW - 1) {
        val srcI1 = srcI0 + 1
        val p0x = srcX(srcJ0 * winW + srcI0); val p0y = srcY(srcJ0 * winW + srcI0)
        val p1x = srcX(srcJ0 * winW + srcI1); val p1y = srcY(srcJ0 * winW + srcI1)
        val p2x = srcX(srcJ1 * winW + srcI0); val p2y = srcY(srcJ1 * winW + srcI0)
        val p3x = srcX(srcJ1 * winW + srcI1); val p3y = srcY(srcJ1 * winW + srcI1)

        val pi0 = math.floor((p0x - dstXOffset) / dstXScale)
        val pi1 = math.floor((p1x - dstXOffset) / dstXScale)
        val pi2 = math.floor((p2x - dstXOffset) / dstXScale)
        val pi3 = math.floor((p3x - dstXOffset) / dstXScale)
        val pj0 = math.floor((p0y - dstYOffset) / dstYScale)
        val pj1 = math.floor((p1y - dstYOffset) / dstYScale)
        val pj2 = math.floor((p2y - dstYOffset) / dstYScale)
        val pj3 = math.floor((p3y - dstYOffset) / dstYScale)

        var dstIMin = math.min(math.min(pi0, pi1), math.min(pi2, pi3)).toInt
        var dstIMax = math.max(math.max(pi0, pi1), math.max(pi2, pi3)).toInt
        var dstJMin = math.min(math.min(pj0, pj1), math.min(pj2, pj3)).toInt
        var dstJMax = math.max(math.max(pj0, pj1), math.max(pj2, pj3)).toInt

        val skip = dstIMax < 0 || dstJMax < 0 || dstIMin >= dstW || dstJMin >= dstH
        if (!skip) {
          if (dstIMin < 0) dstIMin = 0
          if (dstIMax >= dstW) dstIMax = dstW - 1
          if (dstJMin < 0) dstJMin = 0
          if (dstJMax >= dstH) dstJMax = dstH - 1

          // u from p0 right to p1, v from p0 down to p2
          var detA = fdet(p0x, p0y, p1x, p1y, p2x, p2y)
          if (detA.isNaN) detA = 0.0
          // u from p3 left to p2, v from p3 up to p1
          var detB = fdet(p3x, p3y, p2x, p2y, p1x, p1y)
          if (detB.isNaN) detB = 0.0

          if (detA != 0.0 || detB != 0.0) {
            var dstJ = dstJMin
            while (dstJ <= dstJMax) {
              val dstY = dstYOffset + (dstJ + 0.5) * dstYScale
              var dstI = dstIMin
              while (dstI <= dstIMax) {
                // first-writer-wins (reference: rectify.py:547-552)
                if (dstSrcI(dstJ * dstW + dstI).isNaN) {
                  val dstX = dstXOffset + (dstI + 0.5) * dstXScale
                  var srcI = -1.0
                  var srcJ = -1.0
                  if (detA != 0.0) {
                    val u = fu(dstX, dstY, p0x, p0y, p2x, p2y) / detA
                    val v = fv(dstX, dstY, p0x, p0y, p1x, p1y) / detA
                    if (u >= uMin && v >= vMin && u + v <= uvMax) {
                      srcI = srcI0 + fclamp(u, 0.0, 1.0)
                      srcJ = srcJ0 + fclamp(v, 0.0, 1.0)
                    }
                  }
                  if (srcI == -1.0 && detB != 0.0) {
                    val u = fu(dstX, dstY, p3x, p3y, p1x, p1y) / detB
                    val v = fv(dstX, dstY, p3x, p3y, p2x, p2y) / detB
                    if (u >= uMin && v >= vMin && u + v <= uvMax) {
                      srcI = srcI1 - fclamp(u, 0.0, 1.0)
                      srcJ = srcJ1 - fclamp(v, 0.0, 1.0)
                    }
                  }
                  if (srcI != -1.0) {
                    dstSrcI(dstJ * dstW + dstI) = srcIMin + srcI
                    dstSrcJ(dstJ * dstW + dstI) = srcJMin + srcJ
                  }
                }
                dstI += 1
              }
              dstJ += 1
            }
          }
        }
        srcI0 += 1
      }
      srcJ0 += 1
    }
  }

  /** Sample a source window at the fractional index looked up during
    * rasterization — the rectify gather kernel
    * (reference: rectify.py:663-734). Differs from the reproject kernel:
    * nearest uses `u > 0.5` stepping and indices are CLAMPED to the
    * source extent instead of reading fill.
    */
  def gatherValue(
      win: Window, srcW: Int, srcH: Int,
      fi: Double, fj: Double, method: Int, fill: Double): Double = {
    if (fi.isNaN || fj.isNaN) return fill
    @inline def iclamp(x: Int, lo: Int, hi: Int): Int =
      if (x < lo) lo else if (x > hi) hi else x
    var i0 = fi.toInt // int() truncation; fi >= 0 by construction
    var j0 = fj.toInt
    val u = fi - i0
    val v = fj - j0
    method match {
      case Interp.NEAREST =>
        if (u > 0.5) i0 = iclamp(i0 + 1, 0, srcW - 1)
        if (v > 0.5) j0 = iclamp(j0 + 1, 0, srcH - 1)
        win.get(i0, j0, fill)
      case Interp.TRIANGULAR =>
        val i1 = iclamp(i0 + 1, 0, srcW - 1)
        val j1 = iclamp(j0 + 1, 0, srcH - 1)
        val v01 = win.get(i1, j0, fill)
        val v10 = win.get(i0, j1, fill)
        if (u + v < 1.0) {
          val v00 = win.get(i0, j0, fill)
          v00 + u * (v01 - v00) + v * (v10 - v00)
        } else {
          val v11 = win.get(i1, j1, fill)
          v11 + (1.0 - u) * (v10 - v11) + (1.0 - v) * (v01 - v11)
        }
      case Interp.BILINEAR =>
        val i1 = iclamp(i0 + 1, 0, srcW - 1)
        val j1 = iclamp(j0 + 1, 0, srcH - 1)
        val v00 = win.get(i0, j0, fill)
        val v01 = win.get(i1, j0, fill)
        val v10 = win.get(i0, j1, fill)
        val v11 = win.get(i1, j1, fill)
        val vu0 = v00 + u * (v01 - v00)
        val vu1 = v10 + u * (v11 - v10)
        vu0 + v * (vu1 - vu0)
      case other => throw new IllegalArgumentException(s"unknown interp method id $other")
    }
  }
}
