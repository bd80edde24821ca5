package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-scaled corpus generator: replicate the driver testdata
  * `factor`-fold with salted ids so heavy-query wall-times can be
  * measured at a scale the driver does not provide (see SCALE.md).
  *
  * Replication models CORPUS GROWTH, not duplication blow-up: each
  * copy k gets ids shifted into its own range and EVERY TOKEN tagged
  * with the copy index, so copies are token-disjoint from their
  * originals (a mere suffix token would leave them Jaccard-0.99
  * near-duplicates and inflate LSH bucket pairs quadratically in the
  * factor) while within-copy gram/duplicate structure is preserved
  * exactly. Duplicate-cluster sizes and per-user event counts stay
  * constant; counts of everything grow linearly — the 10x corpus is 10
  * independent shards of the same distribution, which is what "10x
  * more data" means for a pipeline.
  */
object ScaleData {

  def replicateDocuments(df: DataFrame, factor: Int): DataFrame =
    df.select(explode(sequence(lit(0), lit(factor - 1))).as("k"), col("*"))
      .select(
        (col("doc_id") * factor + col("k")).as("doc_id"),
        when(col("k") === 0, col("text"))
          .otherwise(concat_ws(" ",
            transform(split(col("text"), " "),
              // '§' cannot appear in the driver corpus's tokens, so a
              // tagged token can never collide with an original (a bare
              // digit suffix could: 'a12' == 'a1'+'2')
              t => when(t === "", t)
                .otherwise(concat(t, lit("§"), col("k")))))).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  def replicateEmbeddings(df: DataFrame, factor: Int): DataFrame =
    df.select(explode(sequence(lit(0), lit(factor - 1))).as("k"), col("*"))
      .select(
        (col("vec_id") * factor + col("k")).as("vec_id"),
        // deterministic sub-1e-3 per-copy perturbation: vectors stay in
        // the same metric neighborhood but are never bit-identical
        // across copies (identical vectors would create artificial
        // zero-distance ties the 1x corpus does not have)
        transform(col("embedding"), (v, i) =>
          (v + ((col("k") * 7 + i) % lit(13) - lit(6)).cast("float") * lit(1e-4f))
            .cast("float")).as("embedding"),
        col("label"))

  def replicateKeyed(df: DataFrame, factor: Int, idCols: Seq[String]): DataFrame = {
    val base = df.select(explode(sequence(lit(0), lit(factor - 1))).as("k"), col("*"))
    val shifted = idCols.foldLeft(base) { (acc, c) =>
      acc.withColumn(c, col(c) * factor + col("k"))
    }
    shifted.drop("k")
  }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    write(replicateDocuments(read("documents"), factor), "documents")
    write(replicateEmbeddings(read("embeddings"), factor), "embeddings")
    // orderkey shifts consistently on both sides so the join structure
    // (items per order) is preserved shard by shard
    write(replicateKeyed(read("lineitem"), factor, Seq("l_orderkey")), "lineitem")
    write(replicateKeyed(read("orders"), factor, Seq("o_orderkey")), "orders")
    // user shift keeps per-user event counts constant (10x users, not
    // 10x events per user — growth, not skew amplification)
    write(replicateKeyed(read("events"), factor, Seq("event_id", "user_id")), "events")
    // dimension tables pass through VERBATIM: o_custkey/l_suppkey are
    // not shifted by the fact replication, so the original dims keep
    // referential integrity — each customer simply carries factor x
    // orders (fact growth against fixed dimensions, the realistic
    // warehouse growth shape). Skip-by-existence, not a catch-all:
    // a write failure (disk full, permissions) must still fail loudly
    // rather than silently produce a dim-less replica
    for (t <- Seq("region", "nation", "customer", "supplier", "part")
         if new java.io.File(s"$src/$t.parquet").exists())
      write(read(t), t)
    spark.stop()
  }
}
