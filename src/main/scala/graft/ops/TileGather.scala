package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{broadcast, lit}
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
  * array. Here it is a join of the tile->window plan against the source
  * tile table, followed by `groupByKey(target tile).mapGroups(assemble
  * + kernel)`.
  *
  * Scale notes: the plan has numTargetTiles x overlap rows and is
  * GENERATED DISTRIBUTED (a Dataset flatMap over the target tile index
  * range) — nothing driver-side scales with tile count. The plan⋈tiles
  * join is a plain equi-join on (srcTj, srcTi): AQE broadcasts the plan
  * side when it is small and falls back to a shuffle join at large tile
  * counts, so a 10^7-tile image never materializes a multi-GB plan on
  * the driver. Each source tile is shipped only to the target tiles
  * that read it (1-4 typically), so shuffle volume is
  * O(source bytes x overlap), not O(n^2). Empty windows (plan rows with
  * srcTj = -1) still produce a fill-only tile — matching the
  * reference's `-1`-bbox fill blocks (reference: reproject.py:415-423,
  * rectify.py:393-396).
  */
object TileGather {

  /** One plan row: target tile (dtj, dti) reads source window
    * [i0, i1) x [j0, j1); srcTj/srcTi name a source tile overlapping it.
    */
  final case class PlanRow(
      dtj: Int, dti: Int, i0: Int, j0: Int, i1: Int, j1: Int,
      srcTj: Int, srcTi: Int)

  /** One source window per target tile; i0 < 0 means "no source
    * coverage" (fill-only task).
    */
  final case class WindowRow(dtj: Int, dti: Int, i0: Int, j0: Int, i1: Int, j1: Int)

  /** Expand one target-tile window into its (target tile, source tile)
    * plan rows. A window with i0 < 0 yields a single srcTj = -1
    * (fill-only) row.
    */
  def planRowsOf(
      srcTileW: Int, srcTileH: Int, srcNumTilesX: Int, srcNumTilesY: Int,
      w: WindowRow): Seq[PlanRow] =
    if (w.i0 < 0) Seq(PlanRow(w.dtj, w.dti, -1, -1, -1, -1, -1, -1))
    else {
      val stj0 = math.max(0, w.j0 / srcTileH)
      val stj1 = math.min(srcNumTilesY - 1, (w.j1 - 1) / srcTileH)
      val sti0 = math.max(0, w.i0 / srcTileW)
      val sti1 = math.min(srcNumTilesX - 1, (w.i1 - 1) / srcTileW)
      for (stj <- stj0 to stj1; sti <- sti0 to sti1)
        yield PlanRow(w.dtj, w.dti, w.i0, w.j0, w.i1, w.j1, stj, sti)
    }

  /** Driver-side plan expansion (small tile counts / tests). */
  def planFromWindows(
      srcGm: GridMapping,
      windows: Seq[(Int, Int, (Int, Int, Int, Int))]): Seq[PlanRow] =
    windows.flatMap { case (dtj, dti, (i0, j0, i1, j1)) =>
      planRowsOf(srcGm.tileWidth, srcGm.tileHeight, srcGm.numTilesX, srcGm.numTilesY,
        WindowRow(dtj, dti, i0, j0, i1, j1))
    }

  /** Distributed plan expansion: the scale path — plan rows never touch
    * the driver.
    */
  def planDs(srcGm: GridMapping, windows: Dataset[WindowRow]): Dataset[PlanRow] = {
    val spark = windows.sparkSession
    import spark.implicits._
    val tw = srcGm.tileWidth; val th = srcGm.tileHeight
    val ntx = srcGm.numTilesX; val nty = srcGm.numTilesY
    windows.flatMap(w => planRowsOf(tw, th, ntx, nty, w))
  }

  /** Below this many TARGET tiles the plan is built on the driver and
    * broadcast (a few MB at most — lower latency for small grids and
    * tests); above it, the plan is generated distributed and joined, so
    * a 10^7-tile raster never materializes its plan on the driver.
    */
  val DriverPlanMaxTiles: Long = 4096L

  /** Plan + gather for window functions of the target tile index: picks
    * the driver/broadcast path for small grids, the distributed path at
    * scale. `windowOf` must be pure (it runs in executors at scale).
    */
  def gatherWithWindows(
      tiles: Dataset[Tile],
      srcGm: GridMapping,
      dstNumTilesX: Int, dstNumTilesY: Int,
      windowOf: (Int, Int) => WindowRow,
      kernel: (String, Int, Int, Int, Window) => Tile): Dataset[Tile] = {
    val n = dstNumTilesX.toLong * dstNumTilesY
    if (n <= DriverPlanMaxTiles) {
      val windows = for (dtj <- 0 until dstNumTilesY; dti <- 0 until dstNumTilesX)
        yield { val w = windowOf(dtj, dti); (w.dtj, w.dti, (w.i0, w.j0, w.i1, w.j1)) }
      gather(tiles, srcGm, planFromWindows(srcGm, windows), kernel)
    } else {
      val spark = tiles.sparkSession
      import spark.implicits._
      val nTx = dstNumTilesX
      val windowsDs = spark.range(n).map(id => windowOf((id / nTx).toInt, (id % nTx).toInt))
      gatherDs(tiles, srcGm, planDs(srcGm, windowsDs), kernel)
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
    // driver knows whether fill tasks exist — skip their stages if not
    gatherDs(tiles, srcGm, spark.createDataset(plan), kernel,
      mayHaveFills = plan.exists(_.srcTj < 0))
  }

  /** Dataset-plan gather — the scale path. `mayHaveFills = false` skips
    * the fill-task stages when the caller knows no srcTj = -1 rows
    * exist.
    */
  def gatherDs(
      tiles: Dataset[Tile],
      srcGm: GridMapping,
      plan: Dataset[PlanRow],
      kernel: (String, Int, Int, Int, Window) => Tile,
      mayHaveFills: Boolean = true): Dataset[Tile] = {
    val spark = tiles.sparkSession
    import spark.implicits._

    val realPlan = plan.filter(_.srcTj >= 0)
    val joined = tiles.joinWith(
      realPlan,
      tiles("tj") === realPlan("srcTj") && tiles("ti") === realPlan("srcTi"),
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

    if (!mayHaveFills) grouped
    else {
      // fill-only tasks (srcTj = -1 rows never join): cross with the
      // (var, band) inventory — tiny — and emit fill tiles DISTRIBUTED
      val fillPlans = plan.filter(_.srcTj < 0)
      val varsBands = tiles.map(t => (t.varName, t.band)).distinct()
      val fills = fillPlans
        .joinWith(broadcast(varsBands), lit(true), "inner")
        .map { case (p, (v, b)) =>
          kernel(v, b, p.dtj, p.dti, new Window(0, 0, 0, 0, Array.empty))
        }
      grouped.union(fills)
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
