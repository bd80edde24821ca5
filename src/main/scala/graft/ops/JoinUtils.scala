package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join patterns for the 100 TB tier. AQE's runtime
  * skew-join split handles most cases; explicit SALTING is the
  * portable fallback when a handful of hot keys dwarf every split
  * threshold (the classic power-law join: one user id owning 1% of a
  * petabyte). The salted result is PROVABLY identical to the plain
  * join — the harness oracles it against the unsalted SQL join.
  */
object JoinUtils {

  /** Salted inner equi-join on `key`: every probe-side row picks ONE
    * deterministic salt (hash of the whole row, so replays and
    * retries land identically), the build side replicates across ALL
    * `salts` values, and the join key becomes (key, salt) — a hot key
    * now spreads over `salts` shuffle partitions instead of one. Build
    * side pays a `salts`-fold replication, which is the explicit,
    * bounded price of the pattern (use it when the build side is the
    * small-but-not-broadcastable one).
    *
    * Non-key column names must be disjoint between the two sides
    * (same contract as a plain `join(..., Seq(key))`).
    */
  def saltedEquiJoin(
      probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
