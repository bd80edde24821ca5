package graft.ops

import org.apache.spark.sql.Dataset
import graft.geom.GridMapping
import graft.model.Tile
import graft.model.Policies.VarPolicy

/** The universal entry point: route to rectify / affine / reproject by
  * grid regularity and CRS equality, with the identity short-circuit
  * (reference: xcube_resampling/spatial.py:40-168).
  *
  * Dispatch rules (reference: spatial.py:121-168):
  *  - irregular source           -> rectify
  *  - both regular, no target    -> return input unchanged
  *  - grids close                -> return input unchanged
  *  - equal/compatible CRS (both geographic counts as equal,
  *    reference: utils.py:187-189) -> affine
  *  - otherwise                  -> reproject
  */
object ResampleInSpace {

  def apply(
      tiles: Dataset[Tile],
      coordTiles: Option[Dataset[Tile]],
      srcGm: GridMapping,
      dstGmOpt: Option[GridMapping],
      policies: Map[String, VarPolicy]): (Dataset[Tile], GridMapping) = {

    if (!srcGm.isRegular) {
      val coords = coordTiles.getOrElse(
        throw new IllegalArgumentException("irregular source requires coord tiles"))
      val dstGm = dstGmOpt.getOrElse(srcGm.toRegular())
      // different CRS: forward-transform the coord images then re-infer
      // the source mapping in the target CRS (reference:
      // rectify.py:127-129)
      val (coords2, srcGm2) =
        if (srcGm.crs.equalsCrs(dstGm.crs)) (coords, srcGm)
        else {
          val c = RectifyOp.transformCoords(coords, srcGm.crs, dstGm.crs)
          (c, graft.geom.GridMappingInference.fromCoords2D(
            c, srcGm.width, srcGm.height, srcGm.tileWidth, srcGm.tileHeight, dstGm.crs))
        }
      (RectifyOp.rectify(tiles, coords2, srcGm2, dstGm, policies), dstGm)
    } else dstGmOpt match {
      case None =>
        // both regular, no target: nothing to do; warn like the
        // reference (spatial.py:137-142)
        org.apache.log4j.Logger.getLogger(getClass)
          .warn("Source grid mapping is already regular and no target grid mapping given; returning source dataset unchanged")
        (tiles, srcGm)
      case Some(dstGm) if srcGm.isClose(dstGm) =>
        (tiles, srcGm) // identity elision (reference: spatial.py:144-145)
      case Some(dstGm) if srcGm.crs.equalsCrs(dstGm.crs) =>
        (AffineOp.affineTransform(tiles, srcGm, dstGm, policies), dstGm)
      case Some(dstGm) =>
        (ReprojectOp.reproject(tiles, srcGm, dstGm, policies), dstGm)
    }
  }

  /** Dataset-level dispatch with the reference's variable contract
    * (reference: affine.py:226-233, reproject.py:179-188,
    * rectify.py:172-180): variables carrying BOTH spatial dims are
    * resampled; variables carrying NEITHER are copied through
    * unchanged; variables carrying exactly ONE spatial dim are DROPPED
    * with a warning. The split is pure metadata (`varDims`), so the
    * passthrough costs nothing at any scale — the non-spatial table is
    * returned as-is and the tile/row filters are narrow.
    */
  def resampleDataset(
      ds: graft.model.RasterDataset,
      coordTiles: Option[Dataset[Tile]],
      srcGm: GridMapping,
      dstGmOpt: Option[GridMapping],
      policies: Map[String, VarPolicy],
      xDim: String = "x", yDim: String = "y"): (graft.model.RasterDataset, GridMapping) = {
    import org.apache.spark.sql.functions.col
    val (spatial2d, rest) = ds.varDims.partition(v =>
      v.dims.contains(xDim) && v.dims.contains(yDim))
    val (oneDim, nonSpatial) = rest.partition(v =>
      v.dims.contains(xDim) || v.dims.contains(yDim))
    if (oneDim.nonEmpty)
      org.apache.log4j.Logger.getLogger(getClass).warn(
        s"Dropping variables with exactly one spatial dimension: ${oneDim.map(_.varName).mkString(", ")}")
    val spatialNames = spatial2d.map(_.varName)
    val keepNames = nonSpatial.map(_.varName)
    val (outTiles, gmOut) = apply(
      ds.tiles.filter(col("varName").isin(spatialNames: _*)),
      coordTiles, srcGm, dstGmOpt, policies)
    val outNonSpatial = ds.nonSpatial.filter(col("varName").isin(keepNames: _*))
    (graft.model.RasterDataset(outTiles, spatial2d ++ nonSpatial, outNonSpatial), gmOut)
  }

  /** Resample a source described by 1D coordinate AXES (the reference's
    * `Coords1DGridMapping`, gridmapping/coords.py:74-96): infer the
    * grid mapping from the axes; if they are regular this is the
    * ordinary affine/reproject dispatch, otherwise the axes are
    * meshgridded into 2D coord tiles and routed through rectify.
    */
  def from1DCoords(
      tiles: Dataset[Tile],
      xs: Array[Double], ys: Array[Double],
      crs: graft.geom.Crs,
      tileSize: Option[(Int, Int)],
      dstGmOpt: Option[GridMapping],
      policies: Map[String, VarPolicy]): (Dataset[Tile], GridMapping) = {
    val srcGm = graft.geom.GridMappingInference.fromCoords1D(xs, ys, crs, tileSize)
    val coordTiles =
      if (srcGm.isRegular) None
      else Some(graft.geom.GridMappingOps.meshgridCoordTiles(
        tiles.sparkSession, xs, ys, srcGm.tileWidth, srcGm.tileHeight))
    apply(tiles, coordTiles, srcGm, dstGmOpt, policies)
  }
}
