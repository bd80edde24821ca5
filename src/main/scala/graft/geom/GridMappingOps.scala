package graft.geom

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.Tile

/** Grid-mapping CRS transformation — `GridMapping.transform`
  * (reference: xcube_resampling/gridmapping/transform.py:57-125):
  * transform the per-pixel coordinate images into another CRS, yielding
  * an irregular 2D-coords mapping (named transformed_x/y in the
  * reference) whose bbox comes from densified `transform_bounds` and
  * whose resolution is re-estimated from the transformed coords.
  */
object GridMappingOps {

  /** Materialize the 2D per-pixel coordinate images of a grid mapping
    * as coord tiles (vars "x"/"y") — the `xy_coords` array of shape
    * (2, h, w) (reference: base.py:310-321, regular.py:65-84),
    * distributed: one row per tile, generated without reading data.
    */
  def coordImageTiles(spark: SparkSession, gm: GridMapping): Dataset[Tile] = {
    import spark.implicits._
    val tilesMeta = for {
      tj <- 0 until gm.numTilesY
      ti <- 0 until gm.numTilesX
    } yield (tj, ti)
    spark.createDataset(tilesMeta).flatMap { case (tj, ti) =>
      val h = gm.tileH(tj); val w = gm.tileW(ti)
      val xs = new Array[Double](h * w)
      val ys = new Array[Double](h * w)
      var j = 0
      while (j < h) {
        var i = 0
        while (i < w) {
          xs(j * w + i) = gm.xCoord(ti * gm.tileWidth + i)
          ys(j * w + i) = gm.yCoord(tj * gm.tileHeight + j)
          i += 1
        }
        j += 1
      }
      Seq(Tile("x", 0, tj, ti, h, w, xs), Tile("y", 0, tj, ti, h, w, ys))
    }
  }

  /** Meshgrid 1D irregular axes into 2D coord tiles (vars "x"/"y") —
    * the `Coords1DGridMapping.xy_coords` meshgrid
    * (reference: gridmapping/coords.py:74-96, meshgridded at 83-88):
    * row j of "x" repeats the x axis, column i of "y" repeats the y
    * axis. The axes are broadcast (O(width+height) doubles) and the
    * tiles are generated distributed.
    */
  def meshgridCoordTiles(
      spark: SparkSession, xs: Array[Double], ys: Array[Double],
      tileWidth: Int, tileHeight: Int): Dataset[Tile] = {
    import spark.implicits._
    val width = xs.length; val height = ys.length
    val nTx = (width + tileWidth - 1) / tileWidth
    val nTy = (height + tileHeight - 1) / tileHeight
    val xsB = spark.sparkContext.broadcast(xs)
    val ysB = spark.sparkContext.broadcast(ys)
    spark.range(nTx.toLong * nTy).flatMap { id =>
      val tj = (id / nTx).toInt; val ti = (id % nTx).toInt
      val h = math.min(tileHeight, height - tj * tileHeight)
      val w = math.min(tileWidth, width - ti * tileWidth)
      val xv = new Array[Double](h * w)
      val yv = new Array[Double](h * w)
      val xa = xsB.value; val ya = ysB.value
      var j = 0
      while (j < h) {
        var i = 0
        while (i < w) {
          xv(j * w + i) = xa(ti * tileWidth + i)
          yv(j * w + i) = ya(tj * tileHeight + j)
          i += 1
        }
        j += 1
      }
      Seq(Tile("x", 0, tj, ti, h, w, xv), Tile("y", 0, tj, ti, h, w, yv))
    }
  }

  /** Transform `gm` into another CRS. Returns the new (irregular) grid
    * mapping plus its transformed coordinate tiles. No-op when the CRS
    * already matches (reference: transform.py:63-67).
    */
  def transform(
      spark: SparkSession,
      gm: GridMapping,
      coordTiles: Option[Dataset[Tile]],
      toCrs: Crs,
      xyRes: Option[(Double, Double)] = None): (GridMapping, Dataset[Tile]) = {
    val coords = coordTiles.getOrElse {
      require(gm.isRegular, "transform without coord tiles requires a regular grid")
      coordImageTiles(spark, gm)
    }
    if (gm.crs.equalsCrs(toCrs)) return (gm, coords)

    val transformed = graft.ops.RectifyOp.transformCoords(coords, gm.crs, toCrs)
    val inferred = GridMappingInference.fromCoords2D(
      transformed, gm.width, gm.height, gm.tileWidth, gm.tileHeight, toCrs)
    // bbox via densified transform_bounds of the source bbox
    // (reference: transform.py:100-106)
    val t = CrsTransformer(gm.crs, toCrs)
    val (bx0, by0, bx1, by1) = t.transformBounds(gm.xMin, gm.yMin, gm.xMax, gm.yMax)
    val (rx, ry) = xyRes.getOrElse((inferred.xRes, inferred.yRes))
    val out = inferred.copy(
      xMin = bx0, yMin = by0, xMax = bx1, yMax = by1, xRes = rx, yRes = ry)
    (out, transformed)
  }
}
