package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.plans.logical._

/** The driver's correctness hash is ROW-ORDER-SENSITIVE and nearly
  * every oracle ends in ORDER BY — so a Spark face that emits shuffle
  * order can go hash-red even when the values are identical (the r12
  * `q_embed_drift` defect). [[FaceOrder]] makes the defect class
  * structurally impossible by deriving each face's final sort from
  * its oracle's trailing ORDER BY; this spec is the guard on BOTH
  * layers: it parses every oracle, and for each one whose ORDER BY is
  * a genuine top-level (trailing) sort — not one buried inside a
  * window or subquery — asserts the registered face's optimized plan
  * ends in a global Sort. A new query whose oracle sorts by an
  * expression [[FaceOrder]] can't parse must hand-write its own
  * final sort (the TPC-H Q3/Q10 TakeOrdered pattern) or fail here.
  */
class SortedFaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  /** Remove all parenthesized content (innermost-out), leaving only
    * top-level clause keywords: an ORDER BY that survives is a
    * genuine trailing sort of the statement, one that vanishes lived
    * inside an OVER(...) / subquery and does not order the output.
    */
  private def stripParens(sql: String): String = {
    var t = sql; var prev = ""
    while (t != prev) { prev = t; t = t.replaceAll("\\([^()]*\\)", " ") }
    t
  }

  /** Does the plan end in a global Sort, looking through operators
    * that preserve their child's row order on a coalesce(1) write?
    */
  private def sortedFace(plan: LogicalPlan): Boolean = plan match {
    case s: Sort          => s.global
    case p: Project       => sortedFace(p.child)
    case f: Filter        => sortedFace(f.child)
    case l: GlobalLimit   => sortedFace(l.child)
    case l: LocalLimit    => sortedFace(l.child)
    case a: SubqueryAlias => sortedFace(a.child)
    case w: WithCTE       => sortedFace(w.plan)
    case _                => false
  }

  test("every face whose oracle ends in a top-level ORDER BY sorts globally") {
    val oracles = SparkEntry.oracleSql
    assert(oracles.size > 200, s"oracle inventory shrank: ${oracles.size}")
    val missing = oracles.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    val needSort = oracles.filter { case (_, sql) =>
      stripParens(sql).toUpperCase.contains("ORDER BY")
    }
    // the contract only means something if it covers the surface
    assert(needSort.size > 200,
      s"only ${needSort.size} oracles have a trailing ORDER BY — parser broke?")
    val bad = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, _) <- needSort.toSeq.sortBy(_._1)) {
      val plan = SparkEntry.queries(name)(spark, dir).queryExecution.optimizedPlan
      if (!sortedFace(plan))
        bad += s"$name (top operator ${plan.nodeName}, no global Sort)"
    }
    assert(bad.isEmpty,
      s"""${bad.size} ORDER BY-oracled faces do not end in a global Sort —
         |the driver hash is order-sensitive, these can go red:
         |${bad.mkString("\n")}""".stripMargin)
  }

  test("oracle ORDER BY keys form a unique key of each face (no tie rows)") {
    // FaceOrder guarantees the SAME sort as the oracle — but a sort
    // only determines emission order when its keys are UNIQUE. On a
    // tie, Spark and DuckDB each emit engine-dependent order and the
    // driver's order-sensitive hash can go red nondeterministically
    // (the last way order nondeterminism can still reach it after
    // r13). This guard executes every FaceOrder-parsed face at
    // sf0.001 and asserts no two rows share the full sort key; a
    // violation is fixed by widening the oracle's ORDER BY (both
    // sides — FaceOrder then follows automatically).
    import org.apache.spark.sql.functions.{col, count, lit}
    val parsedFaces = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val df = SparkEntry.queries(name)(spark, dir)
        FaceOrder.sortKeys(sql, df.columns.toSeq).map(k => (name, df, k))
    }
    assert(parsedFaces.size > 200,
      s"only ${parsedFaces.size} faces parse a FaceOrder sort — parser broke?")
    val dups = scala.collection.mutable.ArrayBuffer[String]()
    for ((name, df, sortKeys) <- parsedFaces) {
      val keys = sortKeys.map { case (n, _) => col(n) }
      val ties = df.groupBy(keys: _*).agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).limit(1).count()
      if (ties > 0) dups += name
    }
    assert(dups.isEmpty,
      s"""${dups.size} faces have NON-UNIQUE oracle sort keys — ties emit in
         |engine-dependent order and the order-sensitive driver hash can go
         |red; widen these oracles' ORDER BY (both sides):
         |${dups.mkString("\n")}""".stripMargin)
  }

  test("FaceOrder parses the oracle ORDER BY vocabulary") {
    import org.apache.spark.sql.functions.col
    val cols = Seq("a", "b", "c")
    def names(sql: String) =
      FaceOrder.sortCols(sql, cols).map(_.map(_.toString))
    // ordinals, names, DESC, alias qualifiers, LIMIT tails — all with
    // DuckDB's default NULLS LAST placement (Spark's bare asc is
    // NULLS FIRST, which would misplace nullable keys vs the oracle)
    assert(names("SELECT * FROM t ORDER BY 1") ==
      Some(Seq(col("a").asc_nulls_last.toString)))
    assert(names("SELECT * FROM t ORDER BY 2 DESC, 1") ==
      Some(Seq(col("b").desc_nulls_last.toString, col("a").asc_nulls_last.toString)))
    assert(names("SELECT * FROM t ORDER BY x.b, C ASC") ==
      Some(Seq(col("b").asc_nulls_last.toString, col("c").asc_nulls_last.toString)))
    assert(names("SELECT * FROM t ORDER BY b DESC, a LIMIT 20") ==
      Some(Seq(col("b").desc_nulls_last.toString, col("a").asc_nulls_last.toString)))
    // expression tails and inner-only ORDER BY parse to None
    assert(names("SELECT * FROM t ORDER BY SUM(x) DESC, a").isEmpty)
    assert(names(
      "SELECT ROW_NUMBER() OVER (ORDER BY a) AS rn FROM t").isEmpty)
    // out-of-range ordinal / unknown name refuse rather than misapply
    assert(names("SELECT * FROM t ORDER BY 4").isEmpty)
    assert(names("SELECT * FROM t ORDER BY nope").isEmpty)
    // multi-line statements: the tail regex is DOTALL
    assert(names("SELECT *\nFROM t\nORDER BY c,\n  b DESC") ==
      Some(Seq(col("c").asc_nulls_last.toString, col("b").desc_nulls_last.toString)))
  }
}
