package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** BUCKETED warehouse tables — the CO-LOCATED JOIN infrastructure for
  * pipelines that join the same fact tables run after run. Writing
  * both sides bucketed (and sorted) by the join key pre-pays the
  * shuffle ONCE at write time: every subsequent join between them is
  * planned with matching `HashPartitioning` from the scans, so the
  * sort-merge join runs with ZERO exchanges — at 100 TB that deletes
  * the dominant cost (two full-fact shuffles) from every pipeline run
  * that touches the pair. This is Spark's native v1 datasource
  * bucketing (no Hive needed): `bucketBy(n, key).sortBy(key)` +
  * `saveAsTable`, readable back through the session catalog with
  * bucketed scans enabled by default.
  *
  * The bucket count is part of the CONTRACT between the tables: both
  * sides must agree (Spark only elides the shuffle when the bucket
  * counts match), which is why [[writeBucketed]] takes it explicitly
  * and the demonstration query writes both sides through the same
  * call. Data in the table is bit-identical to the source — bucketing
  * only changes LAYOUT, which the oracle checks by running the plain
  * join SQL against the un-bucketed parquet.
  */
object BucketedIO {

  /** Root for the demonstration tables' storage, outside the repo. */
  val WarehouseRoot = "/tmp/graft-warehouse"

  /** Per-source-dir namespace key. Table names AND storage paths are
    * suffixed with it (the AnnIndexIO/SketchIO contract): a fixed
    * global name + per-dir memoized write would let a session that
    * touches two scale dirs skip the rewrite and silently serve the
    * other dir's rows.
    */
  private def dirKey(dir: String): String =
    java.lang.Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(dir) & 0x7fffffff)

  /** The demonstration pair's catalog names for a source dir. */
  def orderTableNames(dir: String): (String, String) =
    (s"graft_b_lineitem_${dirKey(dir)}", s"graft_b_orders_${dirKey(dir)}")

  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .option("path", s"$WarehouseRoot/$table")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write the demonstration pair: lineitem and orders bucketed by
    * the order key under the SAME bucket count (the shuffle-elision
    * contract). The one-time layout investment of the pattern.
    */
  def writeBucketedOrderTables(
      spark: SparkSession, dir: String, numBuckets: Int = 32): Unit = {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
    val ord = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"), col("o_orderstatus"))
    val (liName, ordName) = orderTableNames(dir)
    writeBucketed(li, liName, "l_orderkey", numBuckets)
    writeBucketed(ord, ordName, "o_orderkey", numBuckets)
  }

  /** The co-located join demonstration over tables
    * [[writeBucketedOrderTables]] laid out: join through the catalog,
    * aggregate. The `merge` hint pins the sort-merge strategy (at
    * harness scale AQE would broadcast the small side, hiding exactly
    * the shuffle-elision this operator exists to prove; at 100 TB both
    * sides are fact-sized and SMJ is what the planner picks anyway).
    * PlanSpec asserts no exchange feeds the join.
    */
  def bucketedOrderJoin(spark: SparkSession, dir: String): DataFrame = {
    val (liName, ordName) = orderTableNames(dir)
    spark.table(liName)
      .join(spark.table(ordName).hint("merge"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"),
        sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy(col("o_orderstatus"))
  }
}
