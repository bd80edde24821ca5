package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.geom.GridMapping
import graft.kernel.Reducers
import graft.model.Tile

/** Window aggregation / coarsening — the Spark analog of `da.coarsen`
  * used by the affine downscale path (reference:
  * xcube_resampling/affine.py:308-311, reducers coarsen.py:50-155).
  *
  * Tile-kernel path: when the tile size is a multiple of the divisor
  * (the engine arranges intermediate grids that way, exactly as the
  * reference rechunks to output tiling, affine.py:311), every tile
  * reduces independently — a narrow map, NO shuffle. This is the
  * 100 TB-safe shape: coarsening never moves data across executors.
  */
object CoarsenOp {

  /** Reduce each tile's (divJ x divI) windows. Requires tile dims to be
    * multiples of the divisors (callers build intermediate grids so).
    */
  def coarsenTiles(
      tiles: Dataset[Tile],
      divJ: Int, divI: Int,
      aggFor: String => (Reducers.Method, Boolean)): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles.map { t =>
      require(t.h % divJ == 0 && t.w % divI == 0,
        s"tile ${t.h}x${t.w} not divisible by coarsen window ${divJ}x$divI")
      val (method, isInt) = aggFor(t.varName)
      val oh = t.h / divJ; val ow = t.w / divI
      val out = new Array[Double](oh * ow)
      val win = new Array[Double](divJ * divI)
      var oj = 0
      while (oj < oh) {
        var oi = 0
        while (oi < ow) {
          var k = 0
          var wj = 0
          while (wj < divJ) {
            var wi = 0
            while (wi < divI) {
              win(k) = t.data((oj * divJ + wj) * t.w + oi * divI + wi)
              k += 1; wi += 1
            }
            wj += 1
          }
          out(oj * ow + oi) = Reducers.reduce(win, divJ, divI, method, isInt)
          oi += 1
        }
        oj += 1
      }
      Tile(t.varName, t.band, t.tj, t.ti, oh, ow, out)
    }
  }

  /** Pixel-table SQL formulation of one reducer — the oracle-checkable
    * groupBy shape (used by harness queries; mirrors the per-method SQL
    * in SURVEY.md §2.3). Input df columns: (j, i, value); output
    * (j, i, value) with j, i in the coarsened grid.
    */
  def coarsenPixelsSql(
      df: DataFrame, divJ: Int, divI: Int, method: Reducers.Method): DataFrame = {
    val cj = (col("j") / divJ).cast("int").as("j")
    val ci = (col("i") / divI).cast("int").as("i")
    import Reducers._
    method match {
      case Center =>
        df.filter(col("j") % divJ === divJ / 2 && col("i") % divI === divI / 2)
          .select(cj, ci, col("value"))
      case First =>
        df.filter(col("j") % divJ === 0 && col("i") % divI === 0)
          .select(cj, ci, col("value"))
      case Last =>
        df.filter(col("j") % divJ === divJ - 1 && col("i") % divI === divI - 1)
          .select(cj, ci, col("value"))
      case Mode =>
        val counted = df.groupBy(cj, ci, col("value")).agg(count(lit(1)).as("cnt"))
        import org.apache.spark.sql.expressions.{Window => W}
        val w = W.partitionBy(col("j"), col("i"))
          .orderBy(col("cnt").desc, col("value").asc)
        counted.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select(col("j"), col("i"), col("value"))
      case _ =>
        val agg = method match {
          case Count => sum(when(col("value") =!= 0.0, 1).otherwise(0)).cast("double")
          case Max => max(col("value"))
          case Mean => avg(col("value"))
          case Median => expr("percentile(value, 0.5)") // exact, linear interp = np.median
          case Min => min(col("value"))
          case Prod => expr("aggregate(collect_list(value), cast(1.0 as double), (acc, x) -> acc * x)")
          case Std => stddev_pop(col("value"))
          case Sum => sum(col("value"))
          case Var => var_pop(col("value"))
          case other => throw new IllegalArgumentException(other.name)
        }
        df.groupBy(cj, ci).agg(agg.as("value"))
    }
  }
}
