package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [comma-separated query-name filter]
    val sfDir = args(0); val outDir = args(1)
    val only: Set[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).toSet else Set.empty
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); map to long nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Incremental per-query status: one JSONL line APPENDED AND FLUSHED
    // as each face completes, so a wall-clock-killed driver run leaves
    // partial signal instead of an empty correctness artifact (the
    // r15 failure mode: CORRECTNESS_r15.json shipped as `{}` because
    // the driver's budget expired before any result was written).
    val resultsLog = new java.io.PrintWriter(new java.io.FileWriter(
      s"$outDir/verify_results.jsonl", /*append=*/ false), /*autoFlush=*/ true)
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q0(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json is written BEFORE the face loop: a wall-clock-
    // killed run then still leaves the oracle map next to whatever
    // parquet dumps completed, so a partial compare remains possible.
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      SparkEntry.oracleSql
        .map { case (k, v) => s"${q0(k)}: ${q0(v)}" }.mkString("{", ",", "}"))
    // Sort-key-uniqueness guard AT THE DRIVER'S SCALE: FaceOrder makes
    // every face emit its oracle's ORDER BY, but a sort only determines
    // emission order when its keys are UNIQUE — and a key unique at
    // sf0.001 (SortedFaceSpec's scale) can collide at sf0.01 (10x rows,
    // same key domain), reopening the nondeterministic-tie hash red the
    // guard exists to prevent. Checking here runs the assertion on the
    // ACTUAL verify corpus for free (the face output is already
    // materialized; re-grouping a result-sized frame is trivial).
    val tieNames = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // -1 = uniqueness check never ran (no oracle SQL for the face,
        // or FaceOrder parsed no sort keys); 0 = ran and found no ties.
        // Without the sentinel the committed record can't distinguish
        // "checked clean" from "not checked".
        var ties = -1L
        for (sql <- SparkEntry.oracleSql.get(name)) {
          val face = spark.read.parquet(s"$outDir/$name")
          for (keys <- FaceOrder.sortKeys(sql, face.columns.toSeq)) {
            import org.apache.spark.sql.functions.{col, count, lit}
            ties = face.groupBy(keys.map { case (n, _) => col(n) }: _*)
              .agg(count(lit(1)).as("n"))
              .filter(col("n") > 1).limit(1).count()
            if (ties > 0) {
              tieNames += name
              System.err.println(s"[verify] FACE_TIES: $name — oracle sort " +
                "keys are NOT unique at this scale; the order-sensitive " +
                "driver hash can go red nondeterministically. Widen the " +
                "ORDER BY on both sides.")
            }
          }
        }
        val secs = (System.nanoTime() - t0) / 1e9
        resultsLog.println(
          f"""{"name": ${q0(name)}, "status": "ok", "ties": $ties, "secs": $secs%.3f}""")
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val secs = (System.nanoTime() - t0) / 1e9
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
        resultsLog.println(
          f"""{"name": ${q0(name)}, "status": "fail", "error": ${q0(msg)}, "secs": $secs%.3f}""")
      }
      // sequential drain point: this face's plans (write + tie check)
      // have executed; cuts its construction retired are now dead
      graft.model.Lineage.drainRetired()
    }
    resultsLog.close()
    // machine-readable tie report next to the dumps (empty list = the
    // uniqueness contract held for every parsed face at this sf)
    Files.writeString(Paths.get(s"$outDir/face_ties.json"),
      tieNames.sorted.map(q0).mkString("[", ",", "]"))
    if (tieNames.nonEmpty)
      System.err.println(s"[verify] ${tieNames.size} faces with non-unique " +
        s"sort keys: ${tieNames.sorted.mkString(", ")}")
    spark.stop()
  }
}
