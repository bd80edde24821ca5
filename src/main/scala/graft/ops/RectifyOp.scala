package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.broadcast
import graft.geom.{CrsTransformer, GridMapping}
import graft.kernel.{TriangleRasterizer, Window}
import graft.model.Tile
import graft.model.Policies.VarPolicy

/** Rectification of an irregular (swath) source grid — with 2D per-pixel
  * coordinate images — onto a regular target grid. The Spark build of
  * `rectify_dataset` (reference: xcube_resampling/rectify.py:54-179).
  *
  * Stages (SURVEY.md §3.3):
  *  1. (optional, different CRS) forward-transform the 2D coord images
  *     into the target CRS (reference: rectify.py:182-231)
  *  2. driver plan: per-target-tile source ij bbox by scanning the
  *     coord images — a filter + min/max aggregate over the coord pixel
  *     table, batched into ONE Spark job for all tiles
  *     (reference: rectify.py:329-344, base.py:535-629)
  *  3. lookup-image stage: per target tile, rasterize source quads
  *     (two triangles each) writing fractional source (i, j) —
  *     `TriangleRasterizer` (reference: rectify.py:373-576)
  *  4. per-variable gather through the lookup image
  *     (reference: rectify.py:579-734)
  *
  * The lookup tiles are computed once and reused by every variable
  * (the reference shares them across vars too, rectify.py:146-174);
  * callers resampling many variables should `.cache()` the lookup.
  */
object RectifyOp {

  val UvDelta = 1e-3 // reference: constants.py:80

  /** A lookup tile: fractional source (i, j) per target pixel. */
  final case class LookupTile(
      tj: Int, ti: Int, h: Int, w: Int,
      srcI: Array[Double], srcJ: Array[Double])

  /** Rectify `tiles` (vars on the irregular source grid) given coord
    * tiles holding 2D x/y images (varName "x" and "y" on the SAME
    * tiling). Returns target tiles.
    */
  def rectify(
      tiles: Dataset[Tile],
      coordTiles: Dataset[Tile],
      srcGm: GridMapping,
      dstGm: GridMapping,
      policies: Map[String, VarPolicy]): Dataset[Tile] = {
    val (tiles2, coords2, srcGm2) =
      downscaleSource(tiles, coordTiles, srcGm, dstGm, policies)
    val lookup = computeLookup(coords2, srcGm2, dstGm).cache()
    gatherVars(tiles2, lookup, srcGm2, dstGm, policies)
  }

  val ScaleLimit = 0.95 // reference: constants.py:79

  /** Pre-aggregation rewrite: when the (estimated) source resolution is
    * finer than the target's, affine-downscale the source — INCLUDING
    * its 2D coordinate images — in pure index space, then re-infer the
    * source mapping (reference: rectify.py:234-260).
    */
  def downscaleSource(
      tiles: Dataset[Tile],
      coordTiles: Dataset[Tile],
      srcGm: GridMapping,
      dstGm: GridMapping,
      policies: Map[String, VarPolicy]): (Dataset[Tile], Dataset[Tile], GridMapping) = {
    val xScale = srcGm.xRes / dstGm.xRes
    val yScale = srcGm.yRes / dstGm.yRes
    if (xScale >= ScaleLimit && yScale >= ScaleLimit) (tiles, coordTiles, srcGm)
    else {
      val w = math.max(2, math.round(xScale * srcGm.width).toInt)
      val h = math.max(2, math.round(yScale * srcGm.height).toInt)
      val m = graft.geom.Affine.scaleTranslate(1.0 / xScale, 1.0 / yScale, 0.0, 0.0)
      val gmSmall = srcGm.copy(
        width = w, height = h,
        tileWidth = math.min(srcGm.tileWidth, w), tileHeight = math.min(srcGm.tileHeight, h),
        xRes = srcGm.xRes / xScale, yRes = srcGm.yRes / yScale)
      // triangular -> bilinear for the prepass (reference: utils.py:239-251)
      val dataPolicies = policies.view.mapValues(p =>
        if (p.interp == graft.kernel.Interp.TRIANGULAR)
          p.copy(interp = graft.kernel.Interp.BILINEAR) else p).toMap
      // coords resolve from the same option set as the data vars
      // (reference passes the one interp_methods to resample_dataset)
      val coordInterp = dataPolicies.values.map(_.interp).toSet.toList match {
        case one :: Nil => one
        case _ => graft.kernel.Interp.BILINEAR
      }
      val coordPolicies = Map(
        "x" -> VarPolicy(coordInterp, graft.kernel.Reducers.Mean, false, Double.NaN,
          graft.model.Policies.F64),
        "y" -> VarPolicy(coordInterp, graft.kernel.Reducers.Mean, false, Double.NaN,
          graft.model.Policies.F64))
      val tiles2 = AffineOp.resampleWithMatrix(tiles, srcGm, gmSmall, m, dataPolicies)
      val coords2 = AffineOp.resampleWithMatrix(coordTiles, srcGm, gmSmall, m, coordPolicies)
      val srcGm2 = graft.geom.GridMappingInference.fromCoords2D(
        coords2, w, h, gmSmall.tileWidth, gmSmall.tileHeight, srcGm.crs)
      (tiles2, coords2, srcGm2)
    }
  }

  /** Transform 2D coordinate images into another CRS
    * (reference: rectify.py:182-231) — a narrow per-tile map over the
    * paired x/y coord tiles.
    */
  def transformCoords(
      coordTiles: Dataset[Tile], from: graft.geom.Crs, to: graft.geom.Crs): Dataset[Tile] = {
    val spark = coordTiles.sparkSession
    import spark.implicits._
    val t = CrsTransformer(from, to)
    if (t.isIdentity) coordTiles
    else coordTiles
      .groupByKey(c => (c.band, c.tj, c.ti))
      .flatMapGroups { (key: (Int, Int, Int), ts: Iterator[Tile]) =>
        val arr = ts.toArray
        val xs = arr.find(_.varName == "x").get
        val ys = arr.find(_.varName == "y").get
        val nx = xs.data.clone(); val ny = ys.data.clone()
        var k = 0
        while (k < nx.length) {
          val (px, py) = t.transformPoint(nx(k), ny(k))
          nx(k) = px; ny(k) = py
          k += 1
        }
        Seq(xs.copy(data = nx), ys.copy(data = ny))
      }
  }

  /** Stage 2+3: per-target-tile source bbox plan (one aggregate job over
    * the coord tiles), then the rasterization gather.
    */
  def computeLookup(
      coordTiles: Dataset[Tile],
      srcGm: GridMapping,
      dstGm: GridMapping): Dataset[LookupTile] = {
    val spark = coordTiles.sparkSession
    import spark.implicits._

    // empirical xy border growing with tile count
    // (reference: rectify.py:329-344)
    val numTilesX = dstGm.width.toDouble / dstGm.tileWidth
    val numTilesY = dstGm.height.toDouble / dstGm.tileHeight
    val xyBorder = math.min(
      math.min(2 * numTilesX * dstGm.xRes, 2 * numTilesY * dstGm.yRes),
      math.min(0.5 * (dstGm.xMax - dstGm.xMin), 0.5 * (dstGm.yMax - dstGm.yMin)))

    // target tile xy bboxes, grown by xyBorder (driver-side, tiny)
    val dstBoxes = dstGm.ijBboxes.toSeq.map { case (dtj, dti, _, _, _, _) =>
      val (x0, y0, x1, y1) = dstGm.xyBboxOfTile(dtj, dti)
      (dtj, dti, x0 - xyBorder, y0 - xyBorder, x1 + xyBorder, y1 + xyBorder)
    }
    val boxesB = spark.sparkContext.broadcast(dstBoxes)

    // ONE scan of the coord tiles: each coord pixel votes min/max into
    // every target bbox containing it (reference numba scan:
    // gridmapping/bboxes.py:28-106 — same contract: pixel centers
    // against grown bboxes)
    val srcTw = srcGm.tileWidth; val srcTh = srcGm.tileHeight
    val partial = coordTiles
      .groupByKey(c => (c.tj, c.ti))
      .flatMapGroups { (_: (Int, Int), ts: Iterator[Tile]) =>
        val arr = ts.toArray
        val xs = arr.find(_.varName == "x").get
        val ys = arr.find(_.varName == "y").get
        val boxes = boxesB.value
        val n = boxes.size
        val iMin = Array.fill(n)(Int.MaxValue); val jMin = Array.fill(n)(Int.MaxValue)
        val iMax = Array.fill(n)(Int.MinValue); val jMax = Array.fill(n)(Int.MinValue)
        var j = 0
        while (j < xs.h) {
          var i = 0
          while (i < xs.w) {
            val x = xs.data(j * xs.w + i); val y = ys.data(j * xs.w + i)
            if (!x.isNaN && !y.isNaN) {
              val gi = xs.ti * srcTw + i; val gj = xs.tj * srcTh + j
              var b = 0
              while (b < n) {
                val (_, _, bx0, by0, bx1, by1) = boxes(b)
                if (x >= bx0 && x <= bx1 && y >= by0 && y <= by1) {
                  if (gi < iMin(b)) iMin(b) = gi
                  if (gi > iMax(b)) iMax(b) = gi
                  if (gj < jMin(b)) jMin(b) = gj
                  if (gj > jMax(b)) jMax(b) = gj
                }
                b += 1
              }
            }
            i += 1
          }
          j += 1
        }
        (0 until n).iterator.filter(b => iMax(b) >= 0).map(b =>
          (b, iMin(b), jMin(b), iMax(b), jMax(b)))
      }
      .groupByKey(_._1)
      .mapGroups { (b: Int, rows: Iterator[(Int, Int, Int, Int, Int)]) =>
        var i0 = Int.MaxValue; var j0 = Int.MaxValue; var i1 = Int.MinValue; var j1 = Int.MinValue
        rows.foreach { r =>
          i0 = math.min(i0, r._2); j0 = math.min(j0, r._3)
          i1 = math.max(i1, r._4); j1 = math.max(j1, r._5)
        }
        (b, i0, j0, i1, j1)
      }
      .collect()
      .map { case (b, i0, j0, i1, j1) => b -> (i0, j0, i1, j1) }
      .toMap

    // ij_border = 1, clip to size (reference: rectify.py:343-344 with
    // ij_bboxes_from_xy_bboxes(ij_border=1)); window max made inclusive
    // +1 like the reference's slice j_min:j_max+1 (rectify.py:397-399)
    val windows = dstBoxes.zipWithIndex.map { case ((dtj, dti, _, _, _, _), b) =>
      val win = partial.get(b) match {
        case Some((i0, j0, i1, j1)) =>
          val gi0 = math.max(0, i0 - 1); val gj0 = math.max(0, j0 - 1)
          val gi1 = math.min(srcGm.width, i1 + 1 + 1); val gj1 = math.min(srcGm.height, j1 + 1 + 1)
          (gi0, gj0, gi1, gj1)
        case None => (-1, -1, -1, -1)
      }
      (dtj, dti, win)
    }
    val plan = TileGather.planFromWindows(srcGm, windows)
    val planDs = spark.createDataset(plan)

    val dtw = dstGm.tileWidth; val dth = dstGm.tileHeight
    val dW = dstGm.width; val dH = dstGm.height
    val dXMin = dstGm.xMin; val dYMin = dstGm.yMin; val dYMax = dstGm.yMax
    val dXRes = dstGm.xRes; val dYRes = dstGm.yRes
    val jUp = dstGm.isJAxisUp

    val covered = coordTiles.joinWith(
        broadcast(planDs),
        coordTiles("tj") === planDs("srcTj") && coordTiles("ti") === planDs("srcTi"),
        "inner")
      .groupByKey { case (_, p) => (p.dtj, p.dti) }
      .mapGroups { (key: (Int, Int), rows: Iterator[(Tile, TileGather.PlanRow)]) =>
        val (dtj, dti) = key
        val buf = rows.toArray
        val p = buf.head._2
        val xWin = TileGather.assembleWindow(p, buf.map(_._1).filter(_.varName == "x"), srcTw, srcTh)
        val yWin = TileGather.assembleWindow(p, buf.map(_._1).filter(_.varName == "y"), srcTw, srcTh)
        val h = math.min(dth, dH - dtj * dth)
        val w = math.min(dtw, dW - dti * dtw)
        val srcI = Array.fill(h * w)(Double.NaN)
        val srcJ = Array.fill(h * w)(Double.NaN)
        if (p.i0 >= 0) {
          val dstXOffset = dXMin + dti * dtw * dXRes
          val (dstYOffset, dstYScale) =
            if (jUp) (dYMin + dtj * dth * dYRes, dYRes)
            else (dYMax - dtj * dth * dYRes, -dYRes)
          TriangleRasterizer.rasterize(
            xWin.data, yWin.data, xWin.w, xWin.h, xWin.i0, xWin.j0,
            dstXOffset, dstYOffset, dXRes, dstYScale,
            w, h, UvDelta, srcI, srcJ)
        }
        LookupTile(dtj, dti, h, w, srcI, srcJ)
      }

    // target tiles with NO source coverage never match the inner join —
    // emit all-NaN lookup tiles for them so gatherVars produces fill
    // tiles, like the reference's -1-bbox all-NaN lookup blocks
    // (reference: rectify.py:393-396)
    val uncovered = windows.collect { case (dtj, dti, (i0, _, _, _)) if i0 < 0 =>
      val h = math.min(dth, dH - dtj * dth)
      val w = math.min(dtw, dW - dti * dtw)
      LookupTile(dtj, dti, h, w,
        Array.fill(h * w)(Double.NaN), Array.fill(h * w)(Double.NaN))
    }
    if (uncovered.isEmpty) covered
    else covered.union(spark.createDataset(uncovered))
  }

  /** Stage 4: sample every variable through the lookup image. The source
    * window for a target tile is the lookup's own (i, j) extent
    * (reference: rectify.py:622-630), so the plan derives from the
    * lookup tiles (driver-collected min/max — numTiles rows).
    */
  def gatherVars(
      tiles: Dataset[Tile],
      lookup: Dataset[LookupTile],
      srcGm: GridMapping,
      dstGm: GridMapping,
      policies: Map[String, VarPolicy]): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    // per-target-tile source windows from the lookup extents
    val windows = lookup.map { lt =>
      var i0 = Double.MaxValue; var j0 = Double.MaxValue
      var i1 = Double.MinValue; var j1 = Double.MinValue
      var k = 0
      while (k < lt.srcI.length) {
        val fi = lt.srcI(k); val fj = lt.srcJ(k)
        if (!fi.isNaN) {
          if (fi < i0) i0 = fi; if (fi > i1) i1 = fi
          if (fj < j0) j0 = fj; if (fj > j1) j1 = fj
        }
        k += 1
      }
      if (i1 < i0) (lt.tj, lt.ti, -1, -1, -1, -1)
      else (lt.tj, lt.ti,
        i0.toInt, j0.toInt,
        math.min(i1.toInt + 2, srcGm.width), math.min(j1.toInt + 2, srcGm.height))
    }.collect().toSeq.map { case (tj, ti, a, b, c, d) => (tj, ti, (a, b, c, d)) }

    val plan = TileGather.planFromWindows(srcGm, windows)
    val planDs = spark.createDataset(plan)

    val srcW = srcGm.width; val srcH = srcGm.height
    val srcTw = srcGm.tileWidth; val srcTh = srcGm.tileHeight

    // (var, band) inventory — tiny metadata; the lookup tile is shipped
    // once per (var, band, target tile), which is exactly the data each
    // kernel needs. NO driver-side collection of pixel data.
    val varsBands = tiles.map(t => (t.varName, t.band)).distinct().collect().toSeq
    val vbDs = spark.createDataset(varsBands)
    val lookupExpanded = lookup.crossJoin(broadcast(vbDs.toDF("v", "b")))
      .as[(Int, Int, Int, Int, Array[Double], Array[Double], String, Int)]

    val srcKeyed = tiles.joinWith(
        broadcast(planDs),
        tiles("tj") === planDs("srcTj") && tiles("ti") === planDs("srcTi"),
        "inner")
      .groupByKey { case (t, p) => (t.varName, t.band, p.dtj, p.dti) }
    val lookupKeyed = lookupExpanded
      .groupByKey { case (tj, ti, _, _, _, _, v, b) => (v, b, tj, ti) }

    lookupKeyed.cogroup(srcKeyed) {
      (key: (String, Int, Int, Int),
       lts: Iterator[(Int, Int, Int, Int, Array[Double], Array[Double], String, Int)],
       rows: Iterator[(Tile, TileGather.PlanRow)]) =>
        val (v, b, dtj, dti) = key
        if (lts.isEmpty) Iterator.empty
        else {
          val (_, _, h, w, srcI, srcJ, _, _) = lts.next()
          val pol = policies(v)
          val out = new Array[Double](h * w)
          val buf = rows.toArray
          val win =
            if (buf.isEmpty) new Window(0, 0, 0, 0, Array.empty)
            else TileGather.assembleWindow(buf.head._2, buf.map(_._1), srcTw, srcTh)
          var k = 0
          while (k < out.length) {
            out(k) = TriangleRasterizer.gatherValue(
              win, srcW, srcH, srcI(k), srcJ(k), pol.interp, pol.fill)
            k += 1
          }
          Iterator.single(Tile(v, b, dtj, dti, h, w, out))
        }
    }
  }
}
