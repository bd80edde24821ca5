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

  /** EAGER release of a [[cut]] frame's blocks, for iterative loops
    * where round r's cut makes round r-1's blocks dead the moment it
    * materializes. Leaving them to GC + ContextCleaner (weak-ref
    * based) lets O(rounds) of executor storage accrete per execution
    * — measured as a 2.3–3.7 s drift on the CC clustering bench row,
    * the same mechanism the LSH sweep fix killed between runs, here
    * killed within one. The frame MUST NOT be read again: local
    * checkpoint blocks have no recompute path, so a later access
    * fails loudly rather than silently recomputing. No-op for frames
    * that aren't a materialized scan (reliable checkpoints are files,
    * freed on context stop).
    */
  // Spark WARNs "locally checkpointed ... cannot be recomputed after
  // unpersisting" on every release — that non-recomputability is this
  // API's documented contract, and one warning per CC round would
  // drown the bench harness's single-line stdout protocol.
  private lazy val silenceUnpersistWarn: Unit =
    org.apache.log4j.Logger.getLogger("org.apache.spark.rdd.MapPartitionsRDD")
      .setLevel(org.apache.log4j.Level.ERROR)

  def release(df: Dataset[_]): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        silenceUnpersistWarn
        // blocking: async removal would overlap (and so time-pollute)
        // the rounds that follow — removal in local mode is a block-
        // manager map operation, cheap against a round's joins
        lr.rdd.unpersist(blocking = true); ()
      case _ => ()
    }

  /** [[release]] for a plan that WRAPS its cut (a memoized face is
    * typically a Project over the final checkpoint, where the shallow
    * match is a silent no-op): unpersists EVERY materialized scan in
    * the plan. The caller asserts exclusivity — nothing in this plan
    * may be shared with a frame that is still read (a shared cut
    * would fail loudly on its next access).
    */
  def releaseAll(df: Dataset[_]): Unit = {
    silenceUnpersistWarn
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true); ()
      case _ => ()
    }
  }
}
