package graft.geom

/** Metadata describing a raster grid: size, tiling, bbox, resolution, CRS
  * and axis orientation. The Spark engine carries this on the driver and
  * broadcasts it into kernels — it is O(1) metadata, never a DataFrame.
  *
  * Mirrors the semantics of the reference's `GridMapping`
  * (reference: xcube_resampling/gridmapping/base.py:59-913 and
  * regular.py:87-166), restricted to the regular case; irregular grids
  * are represented by [[GridMapping]] metadata with `isRegular = false`
  * plus a coordinate tile table holding the 2D per-pixel lon/lat images.
  *
  * Convention (j-axis down, the default): pixel (i, j) has center
  * {{{ x = xMin + (i + 0.5) * xRes ;  y = yMax - (j + 0.5) * yRes }}}
  * With `isJAxisUp`: `y = yMin + (j + 0.5) * yRes`.
  */
final case class GridMapping(
    width: Int, height: Int,
    tileWidth: Int, tileHeight: Int,
    xMin: Double, yMin: Double, xMax: Double, yMax: Double,
    xRes: Double, yRes: Double,
    crs: Crs,
    isRegular: Boolean = true,
    isJAxisUp: Boolean = false,
    isLon360: Boolean = false) extends Serializable {

  def size: (Int, Int) = (width, height)
  def tileSize: (Int, Int) = (tileWidth, tileHeight)
  def xyBbox: (Double, Double, Double, Double) = (xMin, yMin, xMax, yMax)
  def xyRes: (Double, Double) = (xRes, yRes)

  def numTilesX: Int = (width + tileWidth - 1) / tileWidth
  def numTilesY: Int = (height + tileHeight - 1) / tileHeight
  def numTiles: Int = numTilesX * numTilesY

  /** Actual width of tile column `ti` (edge tiles may be smaller). */
  def tileW(ti: Int): Int = math.min(tileWidth, width - ti * tileWidth)
  def tileH(tj: Int): Int = math.min(tileHeight, height - tj * tileHeight)

  private def assertRegular(): Unit =
    require(isRegular, "operation requires a regular grid mapping")

  /** Affine image->CRS (reference: base.py:437-451). */
  def ijToXyTransform: Affine = {
    assertRegular()
    if (isJAxisUp) Affine.scaleTranslate(xRes, yRes, xMin, yMin)
    else Affine(xRes, 0, xMin, 0, -yRes, yMax)
  }

  /** Affine CRS->image (reference: base.py:453-459). */
  def xyToIjTransform: Affine = ijToXyTransform.invert

  /** Matrix mapping *other*'s image coords into this grid's image coords
    * (reference: base.py:461-478 — note the reference name reads
    * inverted; kept for parity: `a.ij_transform_to(b)` maps a-image ->
    * b-image).
    */
  def ijTransformTo(other: GridMapping): Affine = {
    assertRegular(); other.assertRegular()
    other.xyToIjTransform * ijToXyTransform
  }

  def ijTransformFrom(other: GridMapping): Affine = ijTransformTo(other).invert

  /** Pixel-center x coordinate of column i / y of row j. */
  @inline def xCoord(i: Int): Double = xMin + (i + 0.5) * xRes
  @inline def yCoord(j: Int): Double =
    if (isJAxisUp) yMin + (j + 0.5) * yRes else yMax - (j + 0.5) * yRes

  /** 1D axis coordinate arrays (reference: regular.py:44-63). */
  def xCoords: Array[Double] = Array.tabulate(width)(xCoord)
  def yCoords: Array[Double] = Array.tabulate(height)(yCoord)

  /** Per-tile pixel bboxes (iMin, jMin, iMax, jMax), exclusive max
    * (reference: base.py:503-519).
    */
  def ijBboxes: Array[(Int, Int, Int, Int, Int, Int)] = {
    val out = Array.newBuilder[(Int, Int, Int, Int, Int, Int)]
    var tj = 0
    while (tj < numTilesY) {
      var ti = 0
      while (ti < numTilesX) {
        val i0 = ti * tileWidth; val j0 = tj * tileHeight
        out += ((tj, ti, i0, j0, math.min(i0 + tileWidth, width), math.min(j0 + tileHeight, height)))
        ti += 1
      }
      tj += 1
    }
    out.result()
  }

  /** Per-tile bboxes in CRS coords (xMin, yMin, xMax, yMax)
    * (reference: base.py:521-533).
    */
  def xyBboxOfTile(tj: Int, ti: Int): (Double, Double, Double, Double) = {
    val i0 = ti * tileWidth; val j0 = tj * tileHeight
    val i1 = math.min(i0 + tileWidth, width); val j1 = math.min(j0 + tileHeight, height)
    val x0 = xMin + i0 * xRes; val x1 = xMin + i1 * xRes
    if (isJAxisUp) (x0, yMin + j0 * yRes, x1, yMin + j1 * yRes)
    else (x0, yMax - j1 * yRes, x1, yMax - j0 * yRes)
  }

  /** Pixel bbox of an xy bbox on a REGULAR grid, computed analytically
    * (i_min..i_max inclusive-exclusive, as array slices); returns
    * (-1,-1,-1,-1) when not intersecting — same contract as the
    * reference's coordinate-scanning version (reference: base.py:535-606,
    * gridmapping/bboxes.py:28-106) which compares pixel CENTERS against
    * the grown bbox.
    */
  def ijBboxFromXyBbox(
      bx0: Double, by0: Double, bx1: Double, by1: Double,
      xyBorder: Double = 0.0, ijBorder: Int = 0): (Int, Int, Int, Int) = {
    assertRegular()
    val gx0 = bx0 - xyBorder; val gx1 = bx1 + xyBorder
    val gy0 = by0 - xyBorder; val gy1 = by1 + xyBorder
    // pixel centers within [gx0, gx1]: i s.t. xMin+(i+0.5)*xRes in range
    var iMin = math.ceil((gx0 - xMin) / xRes - 0.5).toInt
    var iMax = math.floor((gx1 - xMin) / xRes - 0.5).toInt
    var (jLo, jHi) =
      if (isJAxisUp)
        (math.ceil((gy0 - yMin) / yRes - 0.5).toInt,
         math.floor((gy1 - yMin) / yRes - 0.5).toInt)
      else
        (math.ceil((yMax - gy1) / yRes - 0.5).toInt,
         math.floor((yMax - gy0) / yRes - 0.5).toInt)
    iMin = math.max(0, iMin - ijBorder); iMax = math.min(width - 1, iMax + ijBorder)
    jLo = math.max(0, jLo - ijBorder); jHi = math.min(height - 1, jHi + ijBorder)
    if (iMin > iMax || jLo > jHi) (-1, -1, -1, -1)
    else (iMin, jLo, iMax + 1, jHi + 1)
  }

  /** Whether the image is tiled (reference: base.py:269-271). */
  def isTiled: Boolean = tileWidth != width || tileHeight != height

  /** Unit of the spatial axes (reference: base.py:403-404 reads the
    * CRS axis info): angular systems — including rotated-pole, whose
    * axes are degrees even though it is not interchangeable with
    * WGS84 — report degree, projected ones metre.
    */
  def spatialUnitName: String = crs.axisUnit

  /** Derive a copy with a new tile size and/or flipped j axis
    * (reference: base.py:145-205).
    */
  def derive(
      tileSize: Option[(Int, Int)] = None,
      isJAxisUp: Boolean = this.isJAxisUp): GridMapping = {
    val (tw, th) = tileSize.getOrElse((tileWidth, tileHeight))
    copy(
      tileWidth = math.min(tw, width), tileHeight = math.min(th, height),
      isJAxisUp = isJAxisUp)
  }

  /** Scale size/res by factors, min size 2 (reference: base.py:207-246,
    * helpers.py:242-255).
    */
  def scale(xScale: Double, yScale: Double): GridMapping = {
    assertRegular()
    val w = math.max(2, math.round(xScale * width).toInt)
    val h = math.max(2, math.round(yScale * height).toInt)
    GridMapping.regular(
      w, h, xMin, yMin, xRes / xScale, yRes / yScale, crs,
      tileSize = Some((tileWidth, tileHeight)), isJAxisUp = isJAxisUp)
  }

  /** Irregular -> regular derivation (reference: regular.py:132-166). */
  def toRegular(tileSize: Option[(Int, Int)] = None): GridMapping = {
    if (isRegular) return tileSize.fold(this)(ts => derive(tileSize = Some(ts)))
    val res = if (math.min(xRes, yRes) > 0) math.min(xRes, yRes) else math.max(xRes, yRes)
    val w = math.max(2, math.round((xMax - xMin + res) / res).toInt)
    val h = math.max(2, math.round((yMax - yMin + res) / res).toInt)
    GridMapping.regular(w, h, xMin, yMin, res, res, crs,
      tileSize = tileSize.orElse(Some((tileWidth, tileHeight))))
  }

  /** Structural closeness (reference: base.py:839-876). */
  def isClose(other: GridMapping, tolerance: Double = 1e-5): Boolean = {
    @inline def cl(a: Double, b: Double) = math.abs(a - b) <= tolerance
    (this eq other) || (
      isJAxisUp == other.isJAxisUp &&
      isLon360 == other.isLon360 &&
      isRegular == other.isRegular &&
      size == other.size &&
      tileSize == other.tileSize &&
      crs.equalsCrs(other.crs) &&
      cl(xRes, other.xRes) && cl(yRes, other.yRes) &&
      cl(xMin, other.xMin) && cl(yMin, other.yMin) &&
      cl(xMax, other.xMax) && cl(yMax, other.yMax))
  }
}

object GridMapping {

  /** Round x to an int when within rel 1e-5 of one
    * (reference: helpers.py:39-48) — used to keep bbox math exact.
    */
  def toIntOrFloat(x: Double): Double = {
    val xi = math.round(x).toDouble
    if (math.abs(xi - x) <= 1e-5 * math.max(math.abs(xi), math.abs(x))) xi else x
  }

  /** Regular grid factory (reference: regular.py:87-129). */
  def regular(
      width: Int, height: Int,
      xMin: Double, yMin: Double,
      xRes: Double, yRes: Double,
      crs: Crs,
      tileSize: Option[(Int, Int)] = None,
      isJAxisUp: Boolean = false): GridMapping = {
    require(width > 1 && height > 1, "invalid size")
    require(xRes > 0 && yRes > 0, "invalid xy_res")
    val x0 = toIntOrFloat(xMin)
    val y0 = toIntOrFloat(yMin)
    val x1 = toIntOrFloat(x0 + xRes * width)
    val y1 = toIntOrFloat(y0 + yRes * height)
    if (crs.isGeographic) {
      require(y0 >= -90, "invalid y_min")
      require(y1 <= 90, "invalid size, y_min combination")
    }
    val (tw, th) = tileSize.getOrElse((width, height))
    GridMapping(
      width, height, math.min(tw, width), math.min(th, height),
      x0, y0, x1, y1, xRes, yRes, crs,
      isRegular = true, isJAxisUp = isJAxisUp,
      isLon360 = x1 > 180 && crs.isGeographic)
  }

  /** Round value at `digits` significant digits with least-digit
    * resolution one of {0.1,0.2,0.25,0.5,1}
    * (reference: helpers.py:203-239). Returned as Double (the reference
    * returns a Fraction; Double is exact enough for res estimation and
    * all downstream comparisons are tolerance-based).
    */
  def roundToFraction(value: Double, digits: Int = 2, resolution: Double = 1.0): Double = {
    require(digits >= 1, "digits must be a positive integer")
    val resolutions = Map(10 -> (1.0, 0), 20 -> (2.0, 0), 25 -> (25.0, 1), 50 -> (5.0, 0), 100 -> (1.0, -1))
    val key = math.round(100 * resolution).toInt
    require(resolutions.contains(key) && math.abs(100 * resolution - key) < 1e-9,
      s"resolution must be one of ${resolutions.keys.map(_ / 100.0).toSeq.sorted}")
    if (value == 0) return 0.0
    val sign = if (value < 0) -1.0 else 1.0
    val v = math.abs(value)
    val (res, resDigits) = resolutions(key)
    val exponent = math.floor(math.log10(v)).toInt - digits - resDigits
    val magnitude = math.pow(10.0, exponent)
    val scaled = v / magnitude
    val discrete = res * math.round(scaled / res)
    sign * discrete * magnitude
  }
}
