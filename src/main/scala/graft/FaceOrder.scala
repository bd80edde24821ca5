package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Deterministic emission order for every oracle-backed face, DERIVED
  * from the oracle's own trailing ORDER BY — the r12 `q_embed_drift`
  * red row proved the driver's hash can be sensitive to emission
  * order, and a hand-maintained `.orderBy` per query is exactly the
  * kind of contract that drifts (one new query shipped without it).
  * [[SparkEntry.queries]] routes every face through [[apply]], so a
  * face and its oracle CANNOT disagree on final order; the guard
  * spec (SortedFaceSpec) asserts the result plan-shape-level.
  *
  * Parsing is deliberately conservative: only a trailing clause of
  * comma-separated ordinals / column names (optionally
  * alias-qualified, optionally ASC/DESC, optionally followed by a
  * LIMIT) is recognized. An expression tail (e.g. `ORDER BY SUM(...)
  * DESC, key` — TPC-H Q3/Q10, link prediction) parses to None and the
  * face keeps its own hand-written TakeOrdered sort, which the guard
  * spec then requires to exist.
  *
  * 100 TB note: the appended Sort is on the FACE — the final,
  * report-sized (or deliberately position-keyed) output — never on an
  * intermediate. Under `Bench`'s `.count()` Catalyst eliminates it
  * entirely (EliminateSorts: order is unobservable through a count),
  * so benchmarks time the operator, not the emission contract.
  */
object FaceOrder {

  /** Trailing `ORDER BY <simple items> [LIMIT n]` at the very end of
    * the statement. `[^()]` keeps any parenthesized (expression or
    * window) ORDER BY from matching — those always have a `)` between
    * the keyword and end-of-string.
    */
  private val Tail =
    """(?is).*\bORDER\s+BY\s+([A-Za-z0-9_.\s,]+?)\s*(?:LIMIT\s+\d+\s*)?$""".r

  private val Item =
    """(?i)\s*([A-Za-z0-9_.]+)\s*(ASC|DESC)?\s*""".r

  /** The (face column name, isDescending) pairs implied by the
    * oracle's trailing ORDER BY, resolved against the face's output
    * columns (ordinals by position, names case-insensitively with any
    * `alias.` qualifier stripped). None when the oracle has no
    * trailing ORDER BY or the clause isn't a simple column list.
    */
  def sortKeys(oracleSql: String, faceCols: Seq[String]): Option[Seq[(String, Boolean)]] = {
    oracleSql.trim match {
      case Tail(clause) =>
        val byLower = faceCols.map(c => c.toLowerCase -> c).toMap
        val items = clause.split(",").toSeq.map {
          case Item(key, dir) =>
            val name =
              if (key.forall(_.isDigit)) {
                val i = key.toInt
                if (i >= 1 && i <= faceCols.length) Some(faceCols(i - 1))
                else None
              } else byLower.get(key.split('.').last.toLowerCase)
            name.map(n => (n, dir != null && dir.equalsIgnoreCase("DESC")))
          case _ => None
        }
        if (items.forall(_.isDefined)) Some(items.map(_.get)) else None
      case _ => None
    }
  }

  /** [[sortKeys]] as Spark sort Columns. DuckDB's ORDER BY default is
    * NULLS LAST for both directions; Spark's bare `asc` is NULLS
    * FIRST — match the oracle engine's null placement or a nullable
    * sort key emits a different row order than its oracle even with
    * identical values.
    */
  def sortCols(oracleSql: String, faceCols: Seq[String]): Option[Seq[Column]] =
    sortKeys(oracleSql, faceCols).map(_.map {
      case (n, true)  => col(n).desc_nulls_last
      case (n, false) => col(n).asc_nulls_last
    })

  /** Append the oracle-derived final sort to a face (identity when
    * the oracle doesn't order or orders by an expression).
    */
  def apply(name: String, oracleSql: Option[String], df: DataFrame): DataFrame =
    oracleSql.flatMap(sortCols(_, df.columns.toSeq)) match {
      case Some(cols) => df.orderBy(cols: _*)
      case None       => df
    }
}
