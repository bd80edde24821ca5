package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.kernel.Reducers
import graft.model.Tile

/** Temporal compositing: tile-kernel vs pixel-form parity and
  * NaN-skip semantics on hand fixtures.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nan = Double.NaN

  // 4 time bands of one 1x2 tile; pixel 0 loses band 1 to NaN, pixel 1
  // loses bands 2 and 3
  private def stack = Seq(
    Tile("v", 0, 0, 0, 1, 2, Array(10.0, 1.0)),
    Tile("v", 1, 0, 0, 1, 2, Array(nan, 3.0)),
    Tile("v", 2, 0, 0, 1, 2, Array(30.0, nan)),
    Tile("v", 3, 0, 0, 1, 2, Array(40.0, nan)))

  test("compositeTiles reduces each pixel's time column with NaN skip (mean/max/count)") {
    val ds = spark.createDataset(stack)
    def run(m: Reducers.Method) =
      TemporalOp.compositeTiles(ds, bucket = 2, m).collect()
        .map(t => (t.band, t.data.toSeq)).sortBy(_._1).toSeq
    // bucket 0 = bands {0,1}: px0 mean(10) = 10, px1 mean(1,3) = 2
    // bucket 1 = bands {2,3}: px0 mean(30,40) = 35, px1 all-NaN -> NaN
    val mean = run(Reducers.Mean)
    assert(mean(0) == ((0, Seq(10.0, 2.0))))
    assert(mean(1)._1 == 1 && mean(1)._2(0) == 35.0 && mean(1)._2(1).isNaN)
    val max = run(Reducers.Max)
    assert(max(0) == ((0, Seq(10.0, 3.0))))
    assert(max(1)._2(0) == 40.0 && max(1)._2(1).isNaN)
    // Count mirrors the reference's np.count_nonzero: NaN is nonzero,
    // so it counts PRESENT-and-nonzero semantics only for real zeros
    val count = run(Reducers.Count)
    assert(count(0) == ((0, Seq(2.0, 2.0))))
    assert(count(1) == ((1, Seq(2.0, 2.0))))
  }

  test("compositeStats (pixel form) agrees with the tile kernel on mean") {
    val px = stack.flatMap(t => t.data.zipWithIndex.map { case (v, i) =>
      ("v", t.band, 0, i, if (v.isNaN) null else java.lang.Double.valueOf(v))
    }).toDF("varName", "band", "j", "i", "value")
    val statRows = TemporalOp.compositeStats(px, bucket = 2).collect()
      .map(r => (r.getInt(1), r.getInt(3),
        if (r.isNullAt(5)) Double.NaN else r.getDouble(5))).sortBy(x => (x._1, x._2))
    val tileRows = TemporalOp.compositeTiles(spark.createDataset(stack), 2, Reducers.Mean)
      .collect().flatMap(t => t.data.zipWithIndex.map { case (v, i) => (t.band, i, v) })
      .sortBy(x => (x._1, x._2))
    statRows.zip(tileRows).foreach { case ((b1, i1, v1), (b2, i2, v2)) =>
      assert(b1 == b2 && i1 == i2)
      assert((v1.isNaN && v2.isNaN) || v1 == v2, s"($b1,$i1): $v1 vs $v2")
    }
  }
}
