package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round tooling: dump `.explain("formatted")` for the
  * named queries (or every query) to one text file per query —
  * the plan evidence committed under plans/rNN/. Not part of the
  * driver contract; never timed.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [suffix] [q1,q2,...]
  * writes <outDir>/<name>_<suffix>.txt (suffix defaults to "plan").
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else "plan"
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
      else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      Queries.prewarm(spark, sfDir)
      LlmQueries.prewarm(spark, sfDir)
    } catch { case _: Throwable => () }
    new java.io.File(outDir).mkdirs()
    val sel = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$outDir/${name}_$suffix.txt")
        try w.println(plan) finally w.close()
        println(s"dumped $name")
      } catch {
        case e: Throwable => println(s"FAILED $name: ${e.getMessage}")
      }
      graft.model.Lineage.drainRetired()
    }
    spark.stop()
  }
}
