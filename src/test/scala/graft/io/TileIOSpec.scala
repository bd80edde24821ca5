package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.TestSpark._
import graft.geom.{Crs, GridMapping}

class TileIOSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val gm = GridMapping.regular(8, 6, 50.0, 10.0, 0.1, 0.1, Crs.Geographic,
    tileSize = Some((4, 3)))
  val img = Array.tabulate(6, 8)((j, i) => (j * 8 + i).toDouble)

  test("tile table round-trips through partitioned parquet + JSON sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io").toString
    TileIO.writeTiles(toDs(tilesFrom("refl", img, gm)), dir, gm)
    val (ds, gm2) = TileIO.readTiles(spark, dir)
    assert(gm2 == gm)
    assertImage(toArray(ds.collect().toSeq, gm2, "refl"), img)
    // partitioned layout exists
    assert(new java.io.File(s"$dir/tiles/tj=0").exists())
    assert(new java.io.File(s"$dir/tiles/tj=1").exists())
  }

  test("clipped read prunes tile partitions before scanning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io2").toString
    TileIO.writeTiles(toDs(tilesFrom("refl", img, gm)), dir, gm)
    // bbox covering only the bottom tile row (y in 10.0..10.25 -> tj=1)
    val (ds, _) = TileIO.readTilesClipped(spark, dir, 50.0, 10.0, 50.8, 10.25)
    val tiles = ds.collect()
    assert(tiles.nonEmpty && tiles.forall(_.tj == 1))
    // pruning is visible in the plan as a partition filter on tj
    val p = ds.toDF().queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") && p.contains("tj"), p.take(1500))
  }

  test("addSpatialRef rewrites the CRS of an existing store in place (cfconv.py:320-358)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-io3").toString
    TileIO.writeTiles(toDs(tilesFrom("refl", img, gm)), dir, gm)
    assert(TileIO.readTiles(spark, dir)._2.crs == Crs.Geographic)
    TileIO.addSpatialRef(dir, Crs.utm(32, north = true))
    val (ds, gm2) = TileIO.readTiles(spark, dir)
    assert(gm2.crs.name == "EPSG:32632")
    assert(gm2.width == gm.width && gm2.xMin == gm.xMin) // geometry untouched
    assert(ds.count() == gm.numTilesX.toLong * gm.numTilesY) // tiles untouched
    // no store at all -> loud failure
    val ex = intercept[IllegalArgumentException](
      TileIO.addSpatialRef(s"$dir/nope", Crs.Geographic))
    assert(ex.getMessage.contains("no tile store"))
  }

  test("projected CRS survives the JSON sidecar via CF attrs") {
    val utmGm = GridMapping.regular(5, 5, 565250.0, 5933850.0, 100.0, 100.0,
      Crs.utm(32, north = true))
    val back = TileIO.gridMappingFromJson(TileIO.gridMappingToJson(utmGm))
    assert(back.crs.name == "EPSG:32632")
    assert(back == utmGm)
    val laeaGm = GridMapping.regular(3, 3, 4320000.0, 3380000.0, 80.0, 80.0, Crs.laea3035)
    assert(TileIO.gridMappingFromJson(TileIO.gridMappingToJson(laeaGm)) == laeaGm)
  }
}
