package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.geom.GridMapping
import graft.model.Tile

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Single-band tiles from a row-major 2D array, tiled per gm. */
  def tilesFrom(varName: String, rows: Array[Array[Double]], gm: GridMapping,
      band: Int = 0): Seq[Tile] = {
    for {
      tj <- 0 until gm.numTilesY
      ti <- 0 until gm.numTilesX
    } yield {
      val h = gm.tileH(tj); val w = gm.tileW(ti)
      val data = new Array[Double](h * w)
      for (j <- 0 until h; i <- 0 until w)
        data(j * w + i) = rows(tj * gm.tileHeight + j)(ti * gm.tileWidth + i)
      Tile(varName, band, tj, ti, h, w, data)
    }
  }

  def toDs(tiles: Seq[Tile]): Dataset[Tile] = {
    val s = spark
    import s.implicits._
    s.createDataset(tiles)
  }

  /** Collect tiles back to one dense row-major image. */
  def toArray(tiles: Seq[Tile], gm: GridMapping, varName: String, band: Int = 0): Array[Array[Double]] = {
    val out = Array.fill(gm.height, gm.width)(Double.NaN)
    tiles.filter(t => t.varName == varName && t.band == band).foreach { t =>
      for (j <- 0 until t.h; i <- 0 until t.w)
        out(t.tj * gm.tileHeight + j)(t.ti * gm.tileWidth + i) = t.data(j * t.w + i)
    }
    out
  }

  def assertImage(got: Array[Array[Double]], want: Array[Array[Double]], tol: Double = 1e-7): Unit = {
    assert(got.length == want.length, s"height ${got.length} != ${want.length}")
    for (j <- got.indices) {
      assert(got(j).length == want(j).length)
      for (i <- got(j).indices) {
        val g = got(j)(i); val w = want(j)(i)
        assert((g.isNaN && w.isNaN) || math.abs(g - w) <= tol,
          s"at ($j,$i): got $g want $w\ngot:\n${render(got)}\nwant:\n${render(want)}")
      }
    }
  }

  def render(a: Array[Array[Double]]): String =
    a.map(_.map(v => if (v.isNaN) "nan" else f"$v%.2f").mkString(", ")).mkString("\n")
}
