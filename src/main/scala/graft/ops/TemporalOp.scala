package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.kernel.Reducers
import graft.model.Tile

/** TEMPORAL COMPOSITING — pixel-wise reduction along the time (band)
  * axis in fixed-size buckets: the "monthly max-NDVI composite" /
  * cloud-free mosaic primitive of every raster cube stack, and the
  * natural fourth family next to the reference's three SPATIAL
  * resamplers (the reference resamples space only; its time axis is
  * passthrough — `xcube_resampling/affine.py:226-233` treats
  * non-spatial dims as copy-through, so compositing is a deliberate
  * beyond-reference addition).
  *
  * Two formulations, same semantics:
  *
  *  - [[compositeStats]] — pixel-row form: ONE hash aggregation keyed
  *    (var, bucket, j, i) producing n_obs/mean/min/max per output
  *    cell. Partial aggregation reduces map-side (each input band
  *    contributes one row per pixel), so the shuffle carries one row
  *    per OUTPUT cell per map partition — the 100 TB shape; the
  *    whole thing is codegen'd SQL, DuckDB-oracle-checkable.
  *  - [[compositeTiles]] — tile-kernel form: groups the <= `bucket`
  *    stacked tiles of each (var, bucket, tj, ti) key and reduces
  *    every pixel's time column with ANY of the 13 window reducers
  *    ([[graft.kernel.Reducers]] — the same kernels the coarsen
  *    family uses spatially), NaN-skipping included. One shuffle of
  *    tile rows keyed by the composite key, state bounded by
  *    bucket-size tiles per group.
  */
object TemporalOp {

  /** Pixel-form composite statistics. Input columns (varName, band, j,
    * i, value) with NULL for missing cells; output one row per
    * (varName, bucket, j, i): n_obs (non-null count), mean_v (rounded
    * 6, exact-sum/count so it is bit-stable across engines when
    * values are integer-valued doubles), min_v, max_v — all NULL when
    * the bucket has no observation for the cell.
    */
  def compositeStats(px: DataFrame, bucket: Int): DataFrame = {
    require(bucket >= 1, s"bucket must be >= 1, got $bucket")
    px.groupBy(col("varName"), (col("band") / bucket).cast("int").as("bucket"),
        col("j"), col("i"))
      .agg(count(col("value")).as("n_obs"),
        round(sum(col("value")) / count(col("value")), 6).as("mean_v"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
  }

  /** Tile-kernel composite: reduce each pixel's time column across the
    * tiles of one bucket with `method`. Tiles in a group must share
    * dims (the engine's tiling guarantees it); the composite tile
    * keeps the bucket index in `band`.
    */
  def compositeTiles(
      tiles: Dataset[Tile], bucket: Int,
      method: Reducers.Method, isInt: Boolean = false): Dataset[Tile] = {
    require(bucket >= 1, s"bucket must be >= 1, got $bucket")
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.groupByKey(t => (t.varName, t.band / bucket, t.tj, t.ti))
      .mapGroups { (key: (String, Int, Int, Int), it: Iterator[Tile]) =>
        val (varName, b, tj, ti) = key
        val stack = it.toArray.sortBy(_.band)
        val h = stack.head.h; val w = stack.head.w
        require(stack.forall(t => t.h == h && t.w == w),
          s"mixed tile dims in composite group ($varName, $b, $tj, $ti)")
        val n = stack.length
        val out = new Array[Double](h * w)
        val colBuf = new Array[Double](n)
        var p = 0
        while (p < h * w) {
          var k = 0
          while (k < n) { colBuf(k) = stack(k).data(p); k += 1 }
          out(p) = Reducers.reduce(colBuf, n, 1, method, isInt)
          p += 1
        }
        Tile(varName, b, tj, ti, h, w, out)
      }
  }
}
