package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lineage cutting for iterative operators (CC rounds, k-core peel,
  * label propagation, the BPE merge loop, the sorted-prefix passes):
  * iterative DataFrames otherwise nest the previous round's logical
  * plan, which grows exponentially and stalls planning long before any
  * data volume matters.
  *
  * Durability is the caller's choice (`reliable`):
  *  - `false` (default): `localCheckpoint` stores the round's blocks
  *    in executor block storage — freed by the ContextCleaner when the
  *    frame is dropped. Fastest, but an executor lost mid-iteration
  *    fails the job (never corrupts it): the blocks have no recompute
  *    path.
  *  - `true`: reliable `checkpoint()` to the configured checkpoint dir
  *    (HDFS/object storage on a cluster) — survives executor
  *    decommissioning on preemptible/spot fleets, costs one write+read
  *    of the round's data. The checkpoint dir must be set; failing
  *    loudly here beats Spark's late error inside the job.
  */
object Lineage {

  private def requireDir(df: Dataset[_]): Unit =
    require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable=true requires sparkContext.setCheckpointDir(...) pointing at " +
        "storage that survives executor loss (HDFS/object store on a cluster)")

  def cut(df: DataFrame, reliable: Boolean): DataFrame =
    if (reliable) { requireDir(df); df.checkpoint() }
    else df.localCheckpoint()

  def cutDs[T](ds: Dataset[T], reliable: Boolean): Dataset[T] =
    if (reliable) { requireDir(ds); ds.checkpoint() }
    else ds.localCheckpoint()
}
