package graft.geom

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tile

/** Grid-mapping detection from coordinate data — the Spark build of
  * `GridMapping.from_coords` (reference:
  * xcube_resampling/gridmapping/coords.py:99-327).
  *
  * 1D analysis runs on driver arrays (axis coords are O(width+height)
  * doubles — exactly what the reference holds in memory). 2D analysis
  * runs over the coordinate tile table: boundary slices are collected
  * (O(width+height)), and the irregular-resolution estimation is a
  * per-tile kernel + global min/max aggregate — the reference's
  * full-image `da.diff` pass, tile-localized (neighbor diffs at tile
  * seams use the reference's own last-row/column duplication trick,
  * applied per tile).
  */
object GridMappingInference {

  val ER = 6371000.0 // sphere radius used by the reference (coords.py)
  val DefaultTolerance = 1e-5

  private def absNoZero(a: Array[Double]): Array[Double] =
    a.map(v => { val x = math.abs(v); if (x < 1e-8) Double.NaN else x })

  private def diffs(a: Array[Double]): Array[Double] =
    Array.tabulate(a.length - 1)(k => a(k + 1) - a(k))

  /** 1D coords -> grid mapping (regular iff deltas are constant within
    * tolerance; res snapped by round_to_fraction like the reference).
    */
  def fromCoords1D(
      xs0: Array[Double], ys: Array[Double], crs: Crs,
      tileSize: Option[(Int, Int)] = None,
      tolerance: Double = DefaultTolerance): GridMapping = {
    require(xs0.length >= 2 && ys.length >= 2,
      "sizes of x_coords and y_coords 1D arrays must be >= 2")
    var xs = xs0
    var isLon360 = crs.isGeographic && xs.exists(_ > 180)
    var xDiff = absNoZero(diffs(xs))
    val yDiff = absNoZero(diffs(ys))

    if (!isLon360 && crs.isGeographic && xDiff.filterNot(_.isNaN).foldLeft(0.0)(math.max) > 180) {
      // antimeridian crossing -> normalize to [0, 360)
      xs = xs.map(x => if (x >= 0) x else x + 360.0)
      xDiff = absNoZero(diffs(xs))
      isLon360 = true
    }

    var xRes = xDiff(0)
    var yRes = yDiff(0)
    val isRegular =
      xDiff.forall(d => !d.isNaN && math.abs(d - xRes) <= tolerance) &&
      yDiff.forall(d => !d.isNaN && math.abs(d - yRes) <= tolerance)
    if (isRegular) {
      xRes = GridMapping.roundToFraction(xRes, 5, 0.25)
      yRes = GridMapping.roundToFraction(yRes, 5, 0.25)
    } else {
      xRes = GridMapping.roundToFraction(median(xDiff), 2, 0.5)
      yRes = GridMapping.roundToFraction(median(yDiff), 2, 0.5)
    }

    val isJAxisUp = ys(0) < ys(ys.length - 1)
    val xMin = GridMapping.toIntOrFloat(xs(0).min(xs(xs.length - 1)) - xRes / 2)
    val xMax = GridMapping.toIntOrFloat(xs(0).max(xs(xs.length - 1)) + xRes / 2)
    val yMin = GridMapping.toIntOrFloat(math.min(ys(0), ys(ys.length - 1)) - yRes / 2)
    val yMax = GridMapping.toIntOrFloat(math.max(ys(0), ys(ys.length - 1)) + yRes / 2)
    val (tw, th) = tileSize.getOrElse((xs.length, ys.length))
    GridMapping(
      xs.length, ys.length, math.min(tw, xs.length), math.min(th, ys.length),
      xMin, yMin, xMax, yMax, xRes, yRes, crs,
      isRegular = isRegular, isJAxisUp = isJAxisUp, isLon360 = isLon360)
  }

  private def median(a0: Array[Double]): Double = {
    val a = a0.filterNot(_.isNaN).sorted
    if (a.isEmpty) Double.NaN
    else if (a.length % 2 == 1) a(a.length / 2)
    else (a(a.length / 2 - 1) + a(a.length / 2)) / 2
  }

  /** 2D coord images (vars "x"/"y" in `coordTiles`, tiled per
    * (tileW, tileH)) -> grid mapping. Returns an irregular mapping with
    * the reference's area-blend resolution estimate
    * (reference: coords.py:226-264).
    */
  def fromCoords2D(
      coordTiles: Dataset[Tile],
      width: Int, height: Int, tileW: Int, tileH: Int,
      crs: Crs, tolerance: Double = DefaultTolerance): GridMapping = {
    val spark = coordTiles.sparkSession
    import spark.implicits._

    // ONE job collects every boundary slice (first/last rows/columns,
    // O(w+h) values) plus the lon>180 flag — at scale this is a single
    // narrow pass instead of 6 sequential jobs
    val nTy = (height + tileH - 1) / tileH
    val nTx = (width + tileW - 1) / tileW
    val boundary = coordTiles.flatMap { t =>
      val isX = t.varName == "x"
      val out = Seq.newBuilder[(String, Int, Double)]
      if (t.tj == 0)
        (0 until t.w).foreach(i => out += ((if (isX) "r0x" else "r0y", t.ti * tileW + i, t.data(i))))
      if (t.ti == 0)
        (0 until t.h).foreach(j => out += ((if (isX) "c0x" else "c0y", t.tj * tileH + j, t.data(j * t.w))))
      if (!isX && t.tj == nTy - 1)
        (0 until t.w).foreach(i => out += (("lrY", t.ti * tileW + i, t.data((t.h - 1) * t.w + i))))
      if (isX && t.ti == nTx - 1)
        (0 until t.h).foreach(j => out += (("lcX", t.tj * tileH + j, t.data(j * t.w + t.w - 1))))
      if (isX && t.data.exists(_ > 180)) out += (("l360", 0, 1.0))
      out.result()
    }.collect()
    def slice(tag: String): Map[Int, Double] =
      boundary.iterator.filter(_._1 == tag).map(r => r._2 -> r._3).toMap
    val row0X = slice("r0x"); val row0Y = slice("r0y")
    val col0X = slice("c0x"); val col0Y = slice("c0y")
    val lastRowY = slice("lrY"); val lastColX0 = slice("lcX")

    val xs0 = Array.tabulate(width)(row0X)
    val ys0 = Array.tabulate(width)(row0Y)
    val xsC = Array.tabulate(height)(col0X)
    val ysC = Array.tabulate(height)(col0Y)

    var isLon360 = crs.isGeographic && boundary.exists(_._1 == "l360")
    var tiles = coordTiles
    val crossesAnti = !isLon360 && crs.isGeographic && (
      absNoZero(diffs(xs0)).exists(d => !d.isNaN && d > 180) ||
      absNoZero(diffs(xsC)).exists(d => !d.isNaN && d > 180))
    if (crossesAnti) {
      tiles = coordTiles.map { t =>
        if (t.varName == "x") t.copy(data = t.data.map(x => if (x >= 0) x else x + 360.0)) else t
      }
      isLon360 = true
    }
    def lon360(a: Array[Double]) =
      if (crossesAnti) a.map(x => if (x >= 0) x else x + 360.0) else a
    val xs = lon360(xs0); val xc = lon360(xsC)

    val xxDiff = diffs(xs).map(math.abs)
    val yyDiff = diffs(ysC).map(math.abs)
    val xyDiff = diffs(xc).map(math.abs)
    val yxDiff = diffs(ys0).map(math.abs)
    var xRes = xxDiff(0)
    var yRes = yyDiff(0)
    val isRegular =
      xxDiff.forall(d => math.abs(d - xRes) <= tolerance) &&
      yyDiff.forall(d => math.abs(d - yRes) <= tolerance) &&
      xyDiff.forall(_ <= tolerance) && yxDiff.forall(_ <= tolerance)

    if (!isRegular) {
      // area-based estimation (reference: coords.py:226-264), per tile
      // with the last-row/column duplication applied tile-locally
      val geographic = crs.isGeographic
      val (amin, amax) = tiles.groupByKey(t => (t.tj, t.ti))
        .mapGroups { (_: (Int, Int), ts: Iterator[Tile]) =>
          val arr = ts.toArray
          val xt = arr.find(_.varName == "x").get
          val yt = arr.find(_.varName == "y").get
          val h = xt.h; val w = xt.w
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          // diff arrays extended by duplicating the LAST DIFF row/col
          // (reference: coords.py:231-238) -> clamp the diff BASE index
          @inline def dx(a: Array[Double], j: Int, i: Int): Double = {
            val i0 = math.min(i, w - 2)
            val v = math.abs(a(j * w + i0 + 1) - a(j * w + i0))
            if (v.isNaN || v < 1e-8) 0.0 else v
          }
          @inline def dy(a: Array[Double], j: Int, i: Int): Double = {
            val j0 = math.min(j, h - 2)
            val v = math.abs(a((j0 + 1) * w + i) - a(j0 * w + i))
            if (v.isNaN || v < 1e-8) 0.0 else v
          }
          var j = 0
          while (j < h) {
            var i = 0
            while (i < w) {
              val xxd = dx(xt.data, j, i); val xyd = dy(xt.data, j, i)
              val yxd = dx(yt.data, j, i); val yyd = dy(yt.data, j, i)
              var xAbs = math.sqrt(xxd * xxd + xyd * xyd)
              var yAbs = math.sqrt(yxd * yxd + yyd * yyd)
              if (geographic) {
                val xr = math.toRadians(xAbs); val yr = math.toRadians(yAbs)
                xAbs = ER * math.cos(xr) * yr // verbatim reference formula
                yAbs = ER * yr
              }
              val area = xAbs * yAbs
              if (area > 0) {
                if (area < mn) mn = area
                if (area > mx) mx = area
              }
              i += 1
            }
            j += 1
          }
          (mn, mx)
        }
        .reduce((a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
      var res = 0.7 * math.sqrt(amin) + 0.3 * math.sqrt(amax)
      if (geographic) res = math.toDegrees(res / ER)
      res = GridMapping.roundToFraction(res, 1, 0.5)
      xRes = res; yRes = res
    }

    val isJAxisUp = ys0.zip(Array.tabulate(width)(lastRowY)).forall { case (a, b) => a < b }
    // bbox: first/last column x extremes, first/last row y extremes
    val lastColX = lon360(Array.tabulate(height)(lastColX0))
    val xMin = GridMapping.toIntOrFloat(lastColX.min.min(xc.min) - xRes / 2)
    val xMax = GridMapping.toIntOrFloat(lastColX.max.max(xc.max) + xRes / 2)
    val lastY = Array.tabulate(width)(i => lastRowY(i))
    val (yMin, yMax) =
      if (isJAxisUp)
        (GridMapping.toIntOrFloat(ys0.min - yRes / 2), GridMapping.toIntOrFloat(lastY.max + yRes / 2))
      else
        (GridMapping.toIntOrFloat(lastY.min - yRes / 2), GridMapping.toIntOrFloat(ys0.max + yRes / 2))

    GridMapping(
      width, height, math.min(tileW, width), math.min(tileH, height),
      xMin, yMin, xMax, yMax, xRes, yRes, crs,
      isRegular = isRegular, isJAxisUp = isJAxisUp, isLon360 = isLon360)
  }

  /** CF-style axis coordinates + 2-column cell bounds for a regular
    * grid (reference: coords.py:340-472, base.py:631-665). Returned as
    * a DataFrame (axis, idx, coord, bnd_lo, bnd_hi) for SQL-friendly
    * consumption.
    */
  def toCoordsDf(spark: SparkSession, gm: GridMapping): DataFrame = {
    require(gm.isRegular, "to_coords requires a regular grid mapping")
    import spark.implicits._
    val xRows = (0 until gm.width).map { i =>
      val c = gm.xCoord(i)
      ("x", i.toLong, c, c - gm.xRes / 2, c + gm.xRes / 2)
    }
    val yRows = (0 until gm.height).map { j =>
      val c = gm.yCoord(j)
      // bounds follow axis direction (descending y -> upper first)
      if (gm.isJAxisUp) ("y", j.toLong, c, c - gm.yRes / 2, c + gm.yRes / 2)
      else ("y", j.toLong, c, c + gm.yRes / 2, c - gm.yRes / 2)
    }
    (xRows ++ yRows).toDF("axis", "idx", "coord", "bnd_lo", "bnd_hi")
  }
}
