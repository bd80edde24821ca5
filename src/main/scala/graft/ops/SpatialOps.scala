package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.GridMapping
import graft.model.Pixel

/** Dataset utility operators (reference: xcube_resampling/utils.py).
  * These are the join/filter/agg-shaped ops that map 1:1 onto Spark
  * relational operators — predicate pushdown and partition pruning come
  * free from Catalyst.
  */
object SpatialOps {

  /** Longitudes -> [0, 360): negative values shift up
    * (reference: gridmapping/helpers.py:97-102). Codegen'd Column form
    * for antimeridian-crossing grids.
    */
  def toLon360(lon: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(lon >= 0.0, lon).otherwise(lon + 360.0)

  /** [0, 360) -> [-180, 180]: values above 180 shift down
    * (reference: gridmapping/helpers.py:105-110).
    */
  def fromLon360(lon: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(lon <= 180.0, lon).otherwise(lon - 360.0)

  /** Clip by xy bbox — label-based range predicate
    * (reference: utils.py:77-124). The driver converts the bbox to a
    * pixel-index range analytically (regular grid), so the filter is a
    * simple i/j range Catalyst can push into the scan / use for
    * partition pruning on (tj, ti).
    */
  def clipPixelsByBbox(
      px: Dataset[Pixel], gm: GridMapping,
      x0: Double, y0: Double, x1: Double, y1: Double): Dataset[Pixel] = {
    val (i0, j0, i1, j1) = gm.ijBboxFromXyBbox(x0, y0, x1, y1)
    // Column predicates (not Scala lambdas) so Catalyst pushes the
    // range into the scan (parquet min/max pruning at scale)
    if (i0 < 0) px.filter(lit(false))
    else px.filter(col("i") >= i0 && col("i") < i1 && col("j") >= j0 && col("j") < j1)
  }

  /** Project a subset of variables (reference: utils.py:154-161). */
  def selectVariables(px: Dataset[Pixel], vars: Seq[String]): Dataset[Pixel] =
    px.filter(col("varName").isin(vars: _*))

  /** Inverse spatial index: pixel bbox of an xy bbox computed by
    * scanning a coordinate pixel table (the irregular-grid form;
    * reference: base.py:535-629, gridmapping/bboxes.py:28-106) —
    * "literally a predicate + min/max aggregate" (SURVEY.md §2.6).
    * `coords` columns: (j, i, x, y).
    */
  def ijBboxFromCoords(
      coords: DataFrame,
      x0: Double, y0: Double, x1: Double, y1: Double,
      xyBorder: Double = 0.0): DataFrame = {
    coords
      .filter(col("x") >= x0 - xyBorder && col("x") <= x1 + xyBorder &&
              col("y") >= y0 - xyBorder && col("y") <= y1 + xyBorder)
      .agg(
        coalesce(min(col("i")), lit(-1L)).as("i_min"),
        coalesce(min(col("j")), lit(-1L)).as("j_min"),
        coalesce(max(col("i")), lit(-1L)).as("i_max"),
        coalesce(max(col("j")), lit(-1L)).as("j_max"))
  }

  /** Global coordinate bbox — tree-reduced min/max
    * (reference: gridmapping/bboxes.py:109-166).
    */
  def computeXyBbox(coords: DataFrame): DataFrame =
    coords.agg(
      min(col("x")).as("x_min"), min(col("y")).as("y_min"),
      max(col("x")).as("x_max"), max(col("y")).as("y_max"))
}
