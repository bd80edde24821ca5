package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}
import graft.kernel.{Interp, Reducers}
import graft.model.Policies
import graft.model.Policies.{F64, I64, VarPolicy}

/** Golden parity vs the reference's printed test expectations. */
class RasterPipelineSpec extends AnyFunSuite {
  val nan = Double.NaN

  // reference: tests/sampledata.py:29-39
  val srcLon = Array(Array(1.0, 6.0), Array(0.0, 2.0))
  val srcLat = Array(Array(56.0, 53.0), Array(52.0, 50.0))
  val srcRad = Array(Array(1.0, 2.0), Array(3.0, 4.0))
  val srcGmIrr = GridMapping(2, 2, 2, 2, 0.0, 50.0, 6.0, 56.0, 3.0, 2.0,
    Crs.Geographic, isRegular = false)

  def coordTiles(lon: Array[Array[Double]] = srcLon, lat: Array[Array[Double]] = srcLat) =
    toDs(tilesFrom("x", lon, srcGmIrr) ++ tilesFrom("y", lat, srcGmIrr))

  def radPolicy(interp: Int): Map[String, VarPolicy] =
    Map("rad" -> VarPolicy(interp, Reducers.Mean, recoverNan = false, fill = nan, dtype = F64))

  test("rectify 2x2 -> 4x4 nearest (reference: test_rectify.py:42-63)") {
    val dstGm = GridMapping.regular(4, 4, -1.0, 49.0, 2.0, 2.0, Crs.Geographic)
    val out = RectifyOp.rectify(
      toDs(tilesFrom("rad", srcRad, srcGmIrr)), coordTiles(),
      srcGmIrr, dstGm, radPolicy(Interp.NEAREST))
    assertImage(toArray(out.collect().toSeq, dstGm, "rad"), Array(
      Array(nan, nan, nan, nan),
      Array(nan, 1.0, 2.0, nan),
      Array(3.0, 3.0, 2.0, nan),
      Array(nan, 4.0, nan, nan)))
  }

  test("rectify leaks no cached blocks: nothing registers in the CacheManager, checkpoints reclaimable") {
    val spark = TestSpark.spark
    val sc = spark.sparkContext
    // entry COUNT, not emptiness: under parallel suites another spec may
    // legitimately hold cached plans, and gating on prior emptiness
    // would short-circuit the assertion into vacuity
    def cacheEntries(): Int = {
      val cm = spark.sharedState.cacheManager
      val f = cm.getClass.getDeclaredFields.find(_.getName.contains("cachedData"))
      f match {
        case Some(fld) =>
          fld.setAccessible(true)
          fld.get(cm) match {
            case c: java.util.Collection[_] => c.size()
            case it: Iterable[_] => it.size
            case _ => if (cm.isEmpty) 0 else 1
          }
        case None => if (cm.isEmpty) 0 else 1
      }
    }
    val cacheCountBefore = cacheEntries()
    val before = sc.getPersistentRDDs.keySet
    // run the pipeline on SHORT-LIVED THREADS: when each dies its
    // frames are certainly gone, so nothing but weak references can
    // reach the dropped Datasets (interpreted JVM frames otherwise keep
    // dead locals reachable and would pin the checkpoints artificially)
    val runs = 5
    for (_ <- 1 to runs) {
      @volatile var n = 0L
      val t = new Thread(() => {
        val dstGm = GridMapping.regular(4, 4, -1.0, 49.0, 2.0, 2.0, Crs.Geographic)
        n = RectifyOp.rectify(
          toDs(tilesFrom("rad", srcRad, srcGmIrr)), coordTiles(), srcGmIrr, dstGm,
          radPolicy(Interp.NEAREST)).count()
      })
      t.start(); t.join()
      assert(n > 0)
    }
    // DETERMINISTIC discriminator of the original regression: the old
    // `computeLookup(...).cache()` registered one InMemoryRelation PER
    // CALL in the shared CacheManager, pinned for the session lifetime
    // and immune to GC. localCheckpoint never touches the CacheManager,
    // so 5 rectify runs must not GROW the entry count (concurrent
    // suites may shrink it by uncaching their own plans — that's fine).
    assert(cacheEntries() <= cacheCountBefore,
      s"rectify grew the CacheManager ($cacheCountBefore -> ${cacheEntries()} entries): " +
        "cache-style per-call leak")
    // BEST-EFFORT reclamation probe (not load-proof, hence soft): the
    // checkpoint blocks are freed by the ContextCleaner once GC
    // collects the dropped RDDs; under a loaded suite the cleaner's
    // weak-ref queue can lag arbitrarily, so lingering blocks here are
    // reported, not failed — a plain-main probe of the same pipeline
    // reclaims every checkpoint after 2 GCs.
    var leaked = sc.getPersistentRDDs.keySet -- before
    var attempts = 0
    while (leaked.nonEmpty && attempts < 30) {
      System.gc()
      Thread.sleep(100)
      leaked = sc.getPersistentRDDs.keySet -- before
      attempts += 1
    }
    if (leaked.nonEmpty)
      org.apache.log4j.Logger.getLogger(getClass).info(
        s"ContextCleaner still lagging ${leaked.size} checkpoint(s) after the GC probe " +
          "(expected under parallel suite load; blocks are weak-ref reclaimed, not pinned)")
  }

  test("rectify 2x2 -> 7x7 nearest (reference: test_rectify.py:113-148)") {
    // rad offset so values don't lie on a plane
    val rad = Array(Array(1.0, 2.0), Array(3.0, 5.0))
    val dstGm = GridMapping.regular(7, 7, -0.5, 49.5, 1.0, 1.0, Crs.Geographic)
    val out = RectifyOp.rectify(
      toDs(tilesFrom("rad", rad, srcGmIrr)), coordTiles(),
      srcGmIrr, dstGm, radPolicy(Interp.NEAREST))
    assertImage(toArray(out.collect().toSeq, dstGm, "rad"), Array(
      Array(nan, 1.0, nan, nan, nan, nan, nan),
      Array(nan, 1.0, 1.0, nan, nan, nan, nan),
      Array(nan, 1.0, 1.0, 1.0, 2.0, nan, nan),
      Array(nan, 3.0, 3.0, 1.0, 2.0, 2.0, 2.0),
      Array(3.0, 3.0, 3.0, 5.0, 2.0, nan, nan),
      Array(nan, 3.0, 5.0, 5.0, nan, nan, nan),
      Array(nan, nan, 5.0, nan, nan, nan, nan)))
  }

  test("dataset dispatch: non-spatial vars pass through unchanged, one-spatial-dim vars drop (reference: affine.py:232-233)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gm = GridMapping.regular(4, 4, 0.0, 0.0, 1.0, 1.0, Crs.Geographic)
    val dst = GridMapping.regular(2, 2, 1.0, 1.0, 1.0, 1.0, Crs.Geographic)
    val img = Array.tabulate(4, 4)((j, i) => (j * 4 + i).toDouble)
    val ds = graft.model.RasterDataset(
      toDs(tilesFrom("sst", img, gm)),
      Seq(graft.model.VarDims("sst", Seq("time", "y", "x")),
        graft.model.VarDims("scalar_attr", Seq("time")),
        graft.model.VarDims("x_bnds", Seq("x", "bnds"))),
      Seq(("scalar_attr", 42.0), ("x_bnds", 0.5)).toDF("varName", "value"))
    val (out, gmOut) = ResampleInSpace.resampleDataset(ds, None, gm, Some(dst),
      Map("sst" -> VarPolicy(Interp.NEAREST, Reducers.Mean, recoverNan = false, fill = nan, dtype = F64)))
    assert(gmOut.isClose(dst))
    // spatial var went through the affine path: 1-pixel subset shift
    assertImage(toArray(out.tiles.collect().toSeq, dst, "sst"),
      Array(Array(5.0, 6.0), Array(9.0, 10.0)))
    // non-spatial var rides through untouched; the 1-spatial-dim var is gone
    assert(out.varDims.map(_.varName).toSet == Set("sst", "scalar_attr"))
    val kept = out.nonSpatial.collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(kept.toSeq == Seq(("scalar_attr", 42.0)))
    // output tiles carry no phantom variables
    assert(out.tiles.collect().forall(_.varName == "sst"))
  }

  test("rectify 3D band passthrough (reference: test_rectify.py:80-110)") {
    val dstGm = GridMapping.regular(4, 4, -1.0, 49.0, 2.0, 2.0, Crs.Geographic)
    val tiles = toDs(
      tilesFrom("rad", srcRad, srcGmIrr, band = 0) ++
      tilesFrom("rad", srcRad, srcGmIrr, band = 1))
    val out = RectifyOp.rectify(tiles, coordTiles(), srcGmIrr, dstGm,
      radPolicy(Interp.NEAREST)).collect().toSeq
    val want = Array(
      Array(nan, nan, nan, nan),
      Array(nan, 1.0, 2.0, nan),
      Array(3.0, 3.0, 2.0, nan),
      Array(nan, 4.0, nan, nan))
    assertImage(toArray(out, dstGm, "rad", band = 0), want)
    assertImage(toArray(out, dstGm, "rad", band = 1), want)
  }

  // reference: tests/sampledata.py:95-109 — UTM32 5x5, band_1 = 0..24
  val utmGm = GridMapping.regular(5, 5, 565250.0, 5933850.0, 100.0, 100.0,
    Crs.utm(32, north = true))
  val band1 = Array.tabulate(5, 5)((j, i) => (j * 5 + i).toDouble)
  val bandPolicy: Map[String, VarPolicy] =
    Map("band_1" -> VarPolicy(Interp.NEAREST, Reducers.Center, recoverNan = false,
      fill = -1.0, dtype = I64))

  test("reproject UTM32 -> LAEA 3035 nearest (reference: test_reproject.py:21-41)") {
    val dstGm = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 80.0, 80.0, Crs.laea3035)
    val out = ReprojectOp.reproject(toDs(tilesFrom("band_1", band1, utmGm)),
      utmGm, dstGm, bandPolicy)
    assertImage(toArray(out.collect().toSeq, dstGm, "band_1"), Array(
      Array(1, 1, 2, 3, 4),
      Array(6, 6, 7, 8, 9),
      Array(11, 12, 12, 13, 14),
      Array(16, 17, 17, 18, 19),
      Array(21, 17, 17, 18, 19)).map(_.map(_.toDouble)))
  }

  test("reproject to j-axis-up target (reference: test_reproject.py:78-103)") {
    val dstGm = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 80.0, 80.0,
      Crs.laea3035, isJAxisUp = true)
    val out = ReprojectOp.reproject(toDs(tilesFrom("band_1", band1, utmGm)),
      utmGm, dstGm, bandPolicy)
    assertImage(toArray(out.collect().toSeq, dstGm, "band_1"), Array(
      Array(21, 17, 17, 18, 19),
      Array(16, 17, 17, 18, 19),
      Array(11, 12, 12, 13, 14),
      Array(6, 6, 7, 8, 9),
      Array(1, 1, 2, 3, 4)).map(_.map(_.toDouble)))
  }

  test("reproject from j-axis-up source (reference: test_reproject.py:105-131)") {
    // flipped source rows + is_j_axis_up gm
    val flipped = band1.reverse
    val srcUp = utmGm.copy(isJAxisUp = true)
    val dstGm = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 80.0, 80.0, Crs.laea3035)
    val out = ReprojectOp.reproject(toDs(tilesFrom("band_1", flipped, srcUp)),
      srcUp, dstGm, bandPolicy)
    assertImage(toArray(out.collect().toSeq, dstGm, "band_1"), Array(
      Array(1, 1, 2, 3, 4),
      Array(6, 6, 7, 8, 9),
      Array(11, 12, 12, 13, 14),
      Array(16, 17, 17, 18, 19),
      Array(21, 17, 17, 18, 19)).map(_.map(_.toDouble)))
  }

  test("reproject chunked source gives identical values") {
    val dstGm = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 80.0, 80.0,
      Crs.laea3035, tileSize = Some((2, 2)))
    val srcTiled = utmGm.derive(tileSize = Some((2, 3)))
    val out = ReprojectOp.reproject(toDs(tilesFrom("band_1", band1, srcTiled)),
      srcTiled, dstGm, bandPolicy)
    assertImage(toArray(out.collect().toSeq, dstGm, "band_1"), Array(
      Array(1, 1, 2, 3, 4),
      Array(6, 6, 7, 8, 9),
      Array(11, 12, 12, 13, 14),
      Array(16, 17, 17, 18, 19),
      Array(21, 17, 17, 18, 19)).map(_.map(_.toDouble)))
  }

  test("dispatcher routes: identity, affine, reproject, rectify") {
    val tiles = toDs(tilesFrom("band_1", band1, utmGm))
    // identity: same gm -> unchanged
    val (same, gmOut) = ResampleInSpace(tiles, None, utmGm, Some(utmGm), bandPolicy)
    assert(gmOut == utmGm)
    assertImage(toArray(same.collect().toSeq, utmGm, "band_1"), band1)
    // affine route: same CRS shifted target
    val shifted = GridMapping.regular(3, 3, 565350.0, 5933950.0, 100.0, 100.0,
      Crs.utm(32, north = true))
    val (aff, _) = ResampleInSpace(tiles, None, utmGm, Some(shifted), bandPolicy)
    assertImage(toArray(aff.collect().toSeq, shifted, "band_1"), Array(
      Array(6, 7, 8), Array(11, 12, 13), Array(16, 17, 18)).map(_.map(_.toDouble)))
    // reproject route: different CRS
    val laea = GridMapping.regular(5, 5, 4320080.0, 3382480.0, 80.0, 80.0, Crs.laea3035)
    val (rep, _) = ResampleInSpace(tiles, None, utmGm, Some(laea), bandPolicy)
    assert(rep.count() == 1)
    // rectify route: irregular source
    val (rect, rectGm) = ResampleInSpace(
      toDs(tilesFrom("rad", srcRad, srcGmIrr)), Some(coordTiles()), srcGmIrr,
      Some(GridMapping.regular(4, 4, -1.0, 49.0, 2.0, 2.0, Crs.Geographic)),
      radPolicy(Interp.NEAREST))
    assert(rect.count() == 1)
  }

  test("reproject rotated-pole grid to geographic end-to-end") {
    // CORDEX-style pole: rotated (0,0) sits at 18E 50.75N; a small
    // rotated grid around the origin reprojects onto a geographic grid
    // centered there
    val rp = Crs.RotatedPole(39.25, -162.0, 0.0, "CF:rotated_pole")
    val srcGm = GridMapping.regular(8, 8, -2.0, -2.0, 0.5, 0.5, rp, Some((4, 4)))
    val data = Array.tabulate(8, 8)((j, i) => (j * 8 + i).toDouble)
    val dstGm = GridMapping.regular(6, 6, 17.0, 49.9, 0.25, 0.25, Crs.Geographic, Some((3, 3)))
    val out = ReprojectOp.reproject(toDs(tilesFrom("v", data, srcGm)), srcGm, dstGm,
      Map("v" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, nan, F64)))
    val got = toArray(out.collect().toSeq, dstGm, "v")
    // independent oracle: forward-rotate each target center into the
    // rotated frame and do the nearest-index arithmetic directly
    for (j <- 0 until 6; i <- 0 until 6) {
      val lon = dstGm.xMin + (i + 0.5) * dstGm.xRes
      val lat = dstGm.yMax - (j + 0.5) * dstGm.yRes
      val (rlon, rlat) = rp.fromLonLat(lon, lat)
      val fi = (rlon - srcGm.xMin) / srcGm.xRes - 0.5
      val fj = (srcGm.yMax - rlat) / srcGm.yRes - 0.5
      val si = math.rint(fi).toInt; val sj = math.rint(fj).toInt
      val want =
        if (si < 0 || si > 7 || sj < 0 || sj > 7) nan else data(sj)(si)
      assert((got(j)(i).isNaN && want.isNaN) || got(j)(i) == want,
        s"at ($j,$i): got ${got(j)(i)} want $want (rlon=$rlon rlat=$rlat)")
    }
  }

  test("clip with a non-overlapping bbox yields an EMPTY dataset (utils.py:119-124)") {
    val gm = GridMapping.regular(4, 4, 0.0, 50.0, 1.0, 1.0, Crs.Geographic, Some((2, 2)))
    val tiles = toDs(tilesFrom("v", Array.fill(4, 4)(1.0), gm))
    val (clipped, gmOut) = RasterOps.clipTiles(tiles, gm, 100.0, 10.0, 101.0, 11.0)
    assert(clipped.count() == 0)
    assert(gmOut.width == 0 && gmOut.height == 0)
    // overlapping bbox still clips normally
    val (c2, gm2) = RasterOps.clipTiles(tiles, gm, 0.0, 50.0, 2.0, 52.0)
    assert(gm2.width == 2 && c2.count() > 0)
  }

  test("time coordinates pass through a 3D pipeline via band metadata") {
    val s = TestSpark.spark
    import s.implicits._
    val gm = GridMapping.regular(4, 4, 0.0, 50.0, 1.0, 1.0, Crs.Geographic, Some((2, 2)))
    // two time slices of one variable
    val tiles = toDs(
      tilesFrom("rad", Array.fill(4, 4)(1.0), gm, band = 0) ++
      tilesFrom("rad", Array.fill(4, 4)(2.0), gm, band = 1))
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2024-06-02 10:00:00")
    val meta = s.createDataset(Seq(
      graft.model.BandMeta("rad", 0, t0), graft.model.BandMeta("rad", 1, t1)))
    // a real resample (2x upscale), then reattach the time coordinate
    val dst = GridMapping.regular(8, 8, 0.0, 50.0, 0.5, 0.5, Crs.Geographic, Some((4, 4)))
    val out = AffineOp.affineTransform(tiles, gm, dst,
      Map("rad" -> VarPolicy(Interp.NEAREST, Reducers.Mean, false, nan, F64)))
    val withTime = graft.model.Raster.attachBandMeta(out, meta)
    val byBand = withTime.select("band", "band_time").distinct().collect()
      .map(r => r.getInt(0) -> r.getTimestamp(1)).toMap
    assert(byBand == Map(0 -> t0, 1 -> t1))
    // every output tile kept its slice's timestamp
    assert(withTime.filter(org.apache.spark.sql.functions.col("band_time").isNull).count() == 0)
  }

  test("zonalStats: hand-computed zones, NaN skipped, overlap double-counts, off-grid zone clips") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    // 4x4 grid, res 1.0, xMin 0, yMax 4 (j-down): center of (j,i) is
    // (i+0.5, 3.5-j). values = j*4+i, except (0,0) -> NaN
    val gm = GridMapping.regular(4, 4, 0.0, 0.0, 1.0, 1.0, Crs.Geographic, Some((4, 4)))
    val pxDf = (for (j <- 0 until 4; i <- 0 until 4) yield
      (j, i, if (j == 0 && i == 0) None else Some((j * 4 + i).toDouble)))
      .toDF("j", "i", "value")
    val px = graft.model.Raster.pixelsFromDf(pxDf)
    val out = graft.ops.SpatialOps.zonalStats(px, gm, Seq(
      (0L, (0.0, 2.0, 2.0, 4.0)),   // top-left 2x2: cells (0,0)NaN,(0,1),(1,0),(1,1) -> 1,4,5
      (1L, (0.0, 0.0, 4.0, 4.0)),   // whole grid minus the NaN: sum 0..15 - 0 = 120, n=15
      (2L, (3.0, -5.0, 9.0, 1.0)))) // bottom-right 1x1: cell (3,3) = 15
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(0L) == ((3L, 10.0, math.rint(10.0 / 3 * 1e6) / 1e6, 1.0, 5.0)), s"zone0: ${out(0L)}")
    assert(out(1L) == ((15L, 120.0, 8.0, 1.0, 15.0)), s"zone1: ${out(1L)}")
    assert(out(2L) == ((1L, 15.0, 15.0, 15.0, 15.0)), s"zone2: ${out(2L)}")
  }
}
