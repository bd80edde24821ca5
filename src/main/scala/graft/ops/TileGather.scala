package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.broadcast
import graft.geom.GridMapping
import graft.kernel.Window
import graft.model.Tile

/** The one real shuffle of the resampling pipelines: align source tiles
  * to the target tiles whose kernels need them, then run a per-target-
  * tile kernel over the assembled source window.
  *
  * The reference does this as `_reorganize_data_array_slice`
  * (reference: xcube_resampling/reproject.py:499-530) — a dask gather
  * that concatenates each target tile's source window into one dense
  * array. Here it is a broadcast join of the (tiny, driver-computed)
  * tile->window plan against the source tile table, followed by
  * `groupByKey(target tile).mapGroups(assemble + kernel)`.
  *
  * Scale notes: the plan has numTargetTiles rows (~data size / tile
  * area) and is always broadcastable; each source tile is shipped only
  * to the target tiles that read it (1-4 typically), so shuffle volume
  * is O(source bytes x overlap), not O(n^2). Empty windows (plan rows
  * with no source tiles) still produce a fill-only tile via the
  * fill-task union — matching the reference's `-1`-bbox fill blocks
  * (reference: reproject.py:415-423, rectify.py:393-396).
  */
object TileGather {

  /** One plan row: target tile (dtj, dti) reads source window
    * [i0, i1) x [j0, j1); srcTj/srcTi name a source tile overlapping it.
    */
  final case class PlanRow(
      dtj: Int, dti: Int, i0: Int, j0: Int, i1: Int, j1: Int,
      srcTj: Int, srcTi: Int)

  /** Expand per-target-tile windows into (target tile, source tile)
    * pairs on the driver. `windows` holds one entry per target tile;
    * a window of (-1,-1,-1,-1) means "no source coverage" and yields a
    * single plan row with srcTj = -1 (fill-only task).
    */
  def planFromWindows(
      srcGm: GridMapping,
      windows: Seq[(Int, Int, (Int, Int, Int, Int))]): Seq[PlanRow] =
    windows.flatMap { case (dtj, dti, (i0, j0, i1, j1)) =>
      if (i0 < 0) Seq(PlanRow(dtj, dti, -1, -1, -1, -1, -1, -1))
      else {
        val stj0 = math.max(0, j0 / srcGm.tileHeight)
        val stj1 = math.min(srcGm.numTilesY - 1, (j1 - 1) / srcGm.tileHeight)
        val sti0 = math.max(0, i0 / srcGm.tileWidth)
        val sti1 = math.min(srcGm.numTilesX - 1, (i1 - 1) / srcGm.tileWidth)
        for (stj <- stj0 to stj1; sti <- sti0 to sti1)
          yield PlanRow(dtj, dti, i0, j0, i1, j1, stj, sti)
      }
    }

  /** Run `kernel` once per (var, band, target tile), over the source
    * window assembled from the joined source tiles. `kernel` receives
    * the variable name, band, target tile coords, and the window (never
    * null; may be zero-sized for fill-only tasks).
    */
  def gather(
      tiles: Dataset[Tile],
      srcGm: GridMapping,
      plan: Seq[PlanRow],
      kernel: (String, Int, Int, Int, Window) => Tile): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    val planDs = spark.createDataset(plan)
    // every (var, band) runs the same plan: join on source tile coords
    val joined = tiles.joinWith(
      broadcast(planDs),
      tiles("tj") === planDs("srcTj") && tiles("ti") === planDs("srcTi"),
      "inner")

    val srcTileW = srcGm.tileWidth; val srcTileH = srcGm.tileHeight

    val grouped = joined
      .groupByKey { case (t, p) => (t.varName, t.band, p.dtj, p.dti) }
      .mapGroups { (key: (String, Int, Int, Int), rows: Iterator[(Tile, PlanRow)]) =>
        val (v, b, dtj, dti) = key
        val buf = rows.toArray
        val p = buf.head._2
        val win = assembleWindow(p, buf.map(_._1), srcTileW, srcTileH)
        kernel(v, b, dtj, dti, win)
      }

    // fill-only tasks: plan rows with no matching source tile (srcTj=-1)
    // never appear in the join — emit them from the vars x bands present.
    val fillPlans = plan.filter(_.srcTj < 0)
    if (fillPlans.isEmpty) grouped
    else {
      val varsBands = tiles.map(t => (t.varName, t.band)).distinct().collect()
      val fillTiles = for {
        (v, b) <- varsBands.toSeq
        p <- fillPlans
      } yield kernel(v, b, p.dtj, p.dti, new Window(0, 0, 0, 0, Array.empty))
      grouped.union(spark.createDataset(fillTiles))
    }
  }

  /** Copy the overlapping parts of each source tile into a dense window
    * array; cells no tile covers stay NaN (kernels treat NaN / fill at
    * sample time).
    */
  def assembleWindow(
      p: PlanRow, tiles: Array[Tile], srcTileW: Int, srcTileH: Int): Window = {
    val w = p.i1 - p.i0; val h = p.j1 - p.j0
    val data = Array.fill(math.max(0, w * h))(Double.NaN)
    tiles.foreach { t =>
      val tI0 = t.ti * srcTileW; val tJ0 = t.tj * srcTileH
      val ci0 = math.max(p.i0, tI0); val ci1 = math.min(p.i1, tI0 + t.w)
      val cj0 = math.max(p.j0, tJ0); val cj1 = math.min(p.j1, tJ0 + t.h)
      var j = cj0
      while (j < cj1) {
        var i = ci0
        while (i < ci1) {
          data((j - p.j0) * w + (i - p.i0)) = t.data((j - tJ0) * t.w + (i - tI0))
          i += 1
        }
        j += 1
      }
    }
    new Window(p.i0, p.j0, math.max(0, w), math.max(0, h), data)
  }
}
