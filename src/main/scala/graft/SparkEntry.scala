package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Query implementations live in [[graft.Queries]]; each runs the real
  * engine operators (tile kernels over grids derived from the testdata)
  * and is paired with equivalent DuckDB SQL in [[Queries.oracles]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q_affine_upscale_bilinear")(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data-pipeline operators (dedup, similarity search, text
    * analysis, multimodal) from [[LlmQueries]]. Every face is routed
    * through [[FaceOrder]], which appends the final sort implied by
    * its oracle's trailing ORDER BY — so the emitted row order and
    * the oracle's can never disagree (the driver's hash is
    * order-sensitive; r12's q_embed_drift red row was exactly a face
    * that shipped without its sort). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Queries.all ++ LlmQueries.all).map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) =>
        FaceOrder(name, oracleSql.get(name), fn(s, dir)))
    }
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles ++ LlmQueries.oracles
}
