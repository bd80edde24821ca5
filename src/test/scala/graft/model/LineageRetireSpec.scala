package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.text.TextOps

/** The retire queue is what keeps a re-invoked fresh-build face from
  * accreting checkpoint-block GENERATIONS (the r17 full-capture
  * regression: superseded memo cuts + operator-internal survivor cuts
  * were left to weak-ref reclaim, and the resulting 2-8 s GC storms
  * bled into NEIGHBORING bench faces — q_embed_ann_recall measured
  * 0.63 s alone vs 4.36 s sharing a JVM with fresh-rebuild faces).
  * Pin both halves of the contract: deferred (a retired cut stays
  * readable until the drain), and drained (its blocks are GONE after).
  */
class LineageRetireSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("retired cuts stay executable until the drain (guard-spec safety)") {
    Lineage.drainRetired() // start from a clean queue
    val c = Lineage.cutRetired(
      Seq(1L, 2L, 3L).toDF("x"), reliable = false)
    // a plan CONSTRUCTED over the retired cut, executed later but
    // before any drain — the clustersFresh guard-spec incident shape
    val derived = c.agg(sum(col("x")).as("s"))
    assert(derived.collect()(0).getLong(0) == 6L,
      "a retired-but-not-drained cut must remain readable")
    assert(Lineage.drainRetired() == 1)
  }

  test("drainRetired releases the blocks; fresh generations do not accrete") {
    Lineage.drainRetired()
    val before = persistedIds
    // three sequential "fresh rebuild" generations, each superseding
    // the last (the Bench measure-loop shape: construct, execute, drain)
    for (gen <- 1 to 3) {
      val cut = Lineage.cutRetired(
        Seq.tabulate(100)(i => (i.toLong, gen.toLong)).toDF("id", "g"),
        reliable = false)
      assert(cut.count() == 100L)
      val drained = Lineage.drainRetired()
      assert(drained >= 1, s"generation $gen was not drained")
      assert((persistedIds -- before).isEmpty,
        s"generation $gen left persisted blocks behind: ${persistedIds -- before}")
    }
  }

  test("an operator's internal survivor cuts drain after its result executes") {
    Lineage.drainRetired()
    val before = persistedIds
    val docs = Seq.tabulate(20)(i => i.toLong).toDF("doc_id")
    val sigs = Seq.tabulate(20)(i => (i.toLong, (i / 2).toLong)).toDF("id", "sig")
    val pairs = Seq((0L, 2L), (4L, 6L)).toDF("id_a", "id_b")
    def run(): Map[Long, Long] =
      TextOps.dedupClustersBySig(docs, sigs, pairs).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = run()
    Lineage.drainRetired()
    val second = run() // a fresh build after the drain must agree
    Lineage.drainRetired()
    assert(first == second, "drain between builds changed the labels")
    // equality classes sig=0 {0,1} + sig=1 {2,3} merge through (0,2);
    // sig=2 {4,5} + sig=3 {6,7} through (4,6); the rest pair by sig
    assert(first(3L) == 0L && first(7L) == 4L && first(19L) == 18L)
    assert((persistedIds -- before).isEmpty,
      s"operator survivors leaked past the drain: ${persistedIds -- before}")
  }
}
