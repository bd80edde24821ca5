package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[graft.rel.RelOps]] and [[graft.io.BucketedIO]] — the relational
  * planning diagnostics and the co-located-join layout: hand-computed
  * skew metrics, and bucketed results bit-equal to the plain join
  * (bucketing is layout, never semantics).
  */
class RelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("keySkewReport: hand-computed histogram metrics") {
    // key 1 x 6, key 2 x 2, key 3 x 2: n_rows 10, n_keys 3, max 6,
    // top2 = 6 + 2 = 8 (tie between keys 2 and 3 broken to key 2),
    // share 0.8, skew_ratio 6 * 3 / 10 = 1.8
    val df = (Seq.fill(6)(1L) ++ Seq.fill(2)(2L) ++ Seq.fill(2)(3L))
      .toDF("k")
    val r = graft.rel.RelOps.keySkewReport(df, col("k"), topK = 2).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, 3L, 6L, 8L)))
    assert(r.getDouble(4) == 0.8 && r.getDouble(5) == 1.8)
    // uniform keys: skew_ratio reads exactly 1
    val flat = (1L to 4L).flatMap(k => Seq.fill(3)(k)).toDF("k")
    val f = graft.rel.RelOps.keySkewReport(flat, col("k")).collect()(0)
    assert(f.getDouble(5) == 1.0)
  }

  test("bucketed join result equals the plain join bit for bit") {
    val dir = "/root/testdata/sf0.001"
    graft.io.BucketedIO.writeBucketedOrderTables(spark, dir)
    val bucketed = graft.io.BucketedIO.bucketedOrderJoin(spark, dir)
      .collect().map(_.toSeq).toSeq
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val ord = spark.read.parquet(s"$dir/orders.parquet")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
      .collect().map(_.toSeq).toSeq
    assert(bucketed == plain && bucketed.nonEmpty)
  }

  test("mergeDistributiveAgg: merged state == one-pass aggregate; one-sided keys pass through") {
    import spark.implicits._
    val rows = Seq(
      ("x", 1.0), ("x", 5.0), ("y", 2.0), ("y", 2.0), ("z", 9.0)
    ).toDF("k", "v")
    val base = graft.rel.RelOps.distributiveAgg(
      rows.filter($"v" < 5.0), Seq("k"), "v")   // x:1, y:2,2
    val delta = graft.rel.RelOps.distributiveAgg(
      rows.filter($"v" >= 5.0), Seq("k"), "v")  // x:5, z:9
    val merged = graft.rel.RelOps.mergeDistributiveAgg(base, delta, Seq("k"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val onePass = graft.rel.RelOps.distributiveAgg(rows, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(merged == onePass, s"merged $merged vs one-pass $onePass")
    // z exists only in the delta; its state must pass through intact
    assert(merged("z") == ((1L, 9.0, 9.0, 9.0)))
    assert(merged("x") == ((2L, 6.0, 1.0, 5.0)))
  }

  test("tableStats: exact rows/nulls/NDV on a hand table") {
    import spark.implicits._
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), Some("b")), (Some(2L), None),
      (None, Some("a")), (Some(3L), Some("a"))
    ).toDF("k", "s")
    val st = graft.rel.RelOps.tableStats(df, Seq("s", "k")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ordered by col_name: k before s
    assert(st.toSeq == Seq(("k", 5L, 1L, 3L), ("s", 5L, 1L, 2L)), s"got ${st.toSeq}")
  }
}
