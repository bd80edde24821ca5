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

  /** Zonal statistics: per-zone count/sum/mean/min/max of pixel values
    * whose CENTER falls inside the zone's xy bbox — the raster×vector
    * aggregation every EO pipeline runs after resampling (not in the
    * reference's operator set; the natural next consumer of its
    * outputs). Nulls (NaN cells) are skipped, matching the NaN-skip
    * float semantics of the window reducers.
    *
    * Scale shape: the zone table is BROADCAST and the raster is
    * scanned ONCE for all zones (a per-zone clip loop would rescan
    * the raster |zones| times); the join emits a row per (pixel,
    * covering zone) and partial-aggregates map-side, so the shuffle
    * carries at most |zones| × partitions rows. Pixels covered by k
    * overlapping zones count toward all k (standard zonal semantics).
    *
    * Returns (zone_id, n_px, sum_v, mean_v, min_v, max_v).
    */
  def zonalStats(
      px: Dataset[Pixel], gm: GridMapping,
      zones: Seq[(Long, (Double, Double, Double, Double))]): DataFrame = {
    require(zones.nonEmpty, "zonalStats needs at least one zone")
    val spark = px.sparkSession
    import spark.implicits._
    val zdf = zones.map { case (id, (x0, y0, x1, y1)) => (id, x0, y0, x1, y1) }
      .toDF("zone_id", "xmin", "ymin", "xmax", "ymax")
    // pixel-center coordinates as Column arithmetic (same closed form
    // as GridMapping.ijToXyTransform), codegen-friendly
    val xc = lit(gm.xMin) + (col("i") + lit(0.5)) * lit(gm.xRes)
    val yc =
      if (gm.isJAxisUp) lit(gm.yMin) + (col("j") + lit(0.5)) * lit(gm.yRes)
      else lit(gm.yMax) - (col("j") + lit(0.5)) * lit(gm.yRes)
    px.toDF()
      .filter(!isnan(col("value")))
      .withColumn("xc", xc).withColumn("yc", yc)
      .join(broadcast(zdf),
        col("xc") >= col("xmin") && col("xc") <= col("xmax") &&
        col("yc") >= col("ymin") && col("yc") <= col("ymax"))
      .groupBy(col("zone_id"))
      .agg(count(lit(1)).as("n_px"),
        sum(col("value")).as("sum_v"),
        round(sum(col("value")) / count(lit(1)), 6).as("mean_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
  }
}
