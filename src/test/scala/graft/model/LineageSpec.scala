package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The release contract is load-bearing for the iterative operators'
  * bench stability (the r14 q_dedup_clusters fix): released blocks
  * must actually be gone, a later read must fail LOUDLY (local
  * checkpoints have no recompute path — a silent recompute would hide
  * a use-after-release), and non-cut frames must pass through as
  * no-ops so release can be called unconditionally in loops.
  */
class LineageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("release frees a cut frame's blocks; a later read fails loudly") {
    val cut = Lineage.cut((1 to 100).toDF("x"), reliable = false)
    assert(cut.count() == 100) // materialized, readable
    Lineage.release(cut)
    val ex = intercept[Exception](cut.count())
    assert(ex.getMessage.contains("CHECKPOINT") || ex.getMessage.contains("Checkpoint"),
      s"expected a loud checkpoint-block failure, got: ${ex.getMessage.take(200)}")
  }

  test("releaseAll reaches a cut wrapped in a Project (the memoized-face shape)") {
    val cut = Lineage.cut((1 to 50).toDF("x"), reliable = false)
    val face = cut.select((col("x") * 2).as("y")) // Project over LogicalRDD
    assert(face.count() == 50)
    Lineage.release(face) // shallow: must be a NO-OP on a wrapped plan
    assert(face.count() == 50, "shallow release must not reach through a Project")
    Lineage.releaseAll(face)
    intercept[Exception](face.count())
  }

  test("cut caps inherited stats: label-to-label join rounds cannot square sizeInBytes") {
    // the pointer-jumping shape: every round joins the cut frame to
    // itself, so Catalyst's size-only stats visitor SQUARES the
    // inherited sizeInBytes — uncapped, the BigInt's bit length
    // doubles per round (2^r growth) until the next cut's stats walk
    // drowns in million-digit multiplies (measured: 35+ min of driver
    // CPU on the 10x audio CC bench). The cap must hold EVERY round.
    var labels = Lineage.cut(
      (1L to 100L).toDF("id").withColumn("lbl", col("id")), reliable = false)
    for (r <- 1 to 8) {
      val joined = labels.toDF("a_id", "a_lbl")
        .join(labels.toDF("b_id", "b_lbl"), col("a_lbl") === col("b_id"))
        .select(col("a_id").as("id"), col("b_lbl").as("lbl"))
      labels = Lineage.cut(joined, reliable = false)
      val bits = labels.queryExecution.analyzed.stats.sizeInBytes.bitLength
      assert(bits <= 61, s"round $r: inherited sizeInBytes grew to $bits bits")
    }
    assert(labels.count() == 100) // the cut chain still reads correctly
  }

  test("stat-cap reflection resolves on this Spark version (canary) and " +
      "degrades to a no-op when the field is missing") {
    // canary: a Spark upgrade that renames LogicalRDD.originStats makes
    // this assert red instead of silently shipping uncapped iterative
    // stats (the cap test above would then also fail, loudly)
    assert(Lineage.originStatsField.isDefined,
      "LogicalRDD.originStats no longer resolvable — stat capping is " +
        "silently disabled; update the reflection in Lineage.capCutStats")
    // missing-field path: must return the cut unchanged, never throw —
    // the cap is a planning optimization, and cut() is on every
    // iterative hot path
    val cut = (1 to 20).toDF("x").localCheckpoint()
    val out = Lineage.capCutStatsWith(None, cut)
    assert(out.count() == 20)
  }

  test("release of a non-cut frame is a no-op") {
    val plain = (1 to 10).toDF("x")
    Lineage.release(plain)
    Lineage.releaseAll(plain)
    assert(plain.count() == 10)
  }
}
