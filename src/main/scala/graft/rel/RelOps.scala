package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational planning diagnostics — the measurements a pipeline runs
  * BEFORE committing a join strategy at scale, next to the layout
  * evidence of `OrderOps.zorderLayoutStats`.
  */
object RelOps {

  /** ANALYZE-STYLE TABLE STATISTICS — the per-column (rows, nulls,
    * NDV) table a cost-based optimizer's join ordering and
    * broadcast-threshold decisions read. NDV here is EXACT
    * (count-distinct): at test scale the number is oracle-checkable,
    * and the expression slot is where a real 100 TB run swaps in
    * `approx_count_distinct` (HLL++) — the report's schema and
    * consumers don't change. One pass over the table: the multi-column
    * distinct expands the scan #cols-fold (Spark's EXPAND), which is
    * exactly ANALYZE's cost profile; nothing but the single stats row
    * is ever collected, then reshaped driver-side into one row per
    * column.
    *
    * Returns (col_name, n_rows, n_null, ndv) ordered by col_name.
    */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableStats needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = Seq(count(lit(1)).as("__n")) ++
      cols.flatMap { c =>
        Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
          countDistinct(col(c)).as(s"__ndv_$c"))
      }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("__n")
    cols.sorted.map { c =>
      (c, n, r.getAs[Long](s"__null_$c"), r.getAs[Long](s"__ndv_$c"))
    }.toDF("col_name", "n_rows", "n_null", "ndv")
  }

  /** MATERIALIZED-AGGREGATE DELTA MAINTENANCE — the warehouse
    * capability that turns "rescan 100 TB nightly" into "aggregate the
    * delta and merge": [[distributiveAgg]] computes the per-key
    * (count, sum, min, max) state once per shard, and
    * [[mergeDistributiveAgg]] combines two states by the aggregates'
    * own algebra (count/sum by +, min/max by least/greatest — the
    * DISTRIBUTIVE family; insert-only, as min/max cannot retract).
    * Maintenance cost is the delta scan plus an aggregate-sized
    * full-outer join — the base table is never read again. AVG and
    * other algebraic aggregates derive from the merged state at the
    * edge; a merged state is bit-equal to the one-pass aggregate
    * whenever the summed values are exactly representable (integer
    * grains, decimals), the same exactness contract the TPC-H anchors
    * rely on.
    */
  def distributiveAgg(
      df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("n_rows"),
      sum(col(valueCol)).as("sum_v"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** Merge two [[distributiveAgg]] states (insert-only). Keys present
    * on one side pass through; on both, the aggregate algebra applies.
    */
  def mergeDistributiveAgg(
      base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val b = base.toDF(keys ++ Seq("n_a", "s_a", "mn_a", "mx_a"): _*)
    val d = delta.toDF(keys ++ Seq("n_b", "s_b", "mn_b", "mx_b"): _*)
    b.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L)))
          .as("n_rows"),
        when(col("s_a").isNull, col("s_b"))
          .when(col("s_b").isNull, col("s_a"))
          .otherwise(col("s_a") + col("s_b")).as("sum_v"),
        least(col("mn_a"), col("mn_b")).as("min_v"),
        greatest(col("mx_a"), col("mx_b")).as("max_v")): _*)
  }

  /** JOIN-KEY SKEW REPORT: the one-row summary that decides between a
    * plain shuffle join, AQE skew splitting, and explicit salting
    * (`q_salted_join`'s strategy) for a given key. `skew_ratio` is the
    * heaviest key's count over the mean per-key count — the factor by
    * which the hottest shuffle partition outweighs the average, i.e.
    * the straggler multiplier a plain hash shuffle would suffer;
    * `topk_share` is how concentrated the key mass is (a high share
    * over few keys says salting the handful of hot keys fixes the
    * join; a flat share says the key is fine).
    *
    * Cost: ONE map-side-combined aggregation to key grain, then one
    * bounded aggregation over the key histogram with the TopK heap —
    * no window, no second scan, nothing driver-side beyond one row.
    * Counts are exact longs; the two ratios are single IEEE divisions
    * (< 2^53 integers), bit-identical across engines.
    *
    * Returns (n_rows, n_keys, max_cnt, topk_cnt, topk_share,
    * skew_ratio). Keys must be long-castable (the TopK entry id);
    * NULL keys are excluded — they never match an equi-join, so they
    * contribute no shuffle weight to the join being diagnosed.
    */
  def keySkewReport(
      df: DataFrame, keyCol: Column, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val cnt = df.select(keyCol.cast("long").as("key"))
      .filter(col("key").isNotNull)
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
    cnt.agg(
        sum(col("cnt")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("cnt")).as("max_cnt"),
        graft.functions.TopK.topK(topK)(col("key"), col("cnt").cast("double"))
          .as("t"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        expr("CAST(aggregate(t.entries, 0D, (a, x) -> a + x.sim) AS BIGINT)")
          .as("topk_cnt"))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"), col("topk_cnt"),
        (col("topk_cnt").cast("double") / col("n_rows").cast("double"))
          .as("topk_share"),
        (col("max_cnt").cast("double") * col("n_keys") / col("n_rows"))
          .as("skew_ratio"))
  }
}
