package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a typed [[Aggregator]]: keeps the k best
  * (sim DESC, id ASC) candidate rows per group in a k-sized sorted
  * buffer.
  *
  * The alternative — `row_number() OVER (PARTITION BY query_id ORDER BY
  * sim DESC)` — shuffles EVERY candidate of a query into one task and
  * fully sorts it there: with few queries against a huge corpus (the
  * brute-force top-k shape) that is a single-task full-corpus sort.
  * An aggregator instead partial-aggregates: each input partition
  * reduces its candidates to at most k rows map-side, the shuffle
  * carries k rows per (partition, query), and the merge is a k-by-k
  * sorted merge. Same results, bit for bit — the comparator mirrors
  * the window's (sim DESC NULLS/NaN first, id ASC) total order via
  * `java.lang.Double.compare`.
  */
object TopK {

  /** One scored candidate (the aggregator's input row). */
  final case class SimEntry(id: Long, sim: Double)

  /** Ranked output entry; rank is 1-based in (sim DESC, id ASC) order. */
  final case class Ranked(id: Long, sim: Double, rank: Long)

  /** Wrapper so the output has a product encoder (Seq alone is not). */
  final case class TopKOut(entries: Seq[Ranked])

  /** k-bounded buffer, sorted best-first; `n` entries are valid. */
  final case class Buf(var n: Int, ids: Array[Long], sims: Array[Double])

  /** Whether (s1, i1) ranks strictly better than (s2, i2) under the
    * window order sim DESC, id ASC. `Double.compare` (not `>`) so NaN
    * sorts as the largest value, exactly like Spark's descending sort.
    */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c > 0 else i1 < i2
  }

  final class TopKAggregator(k: Int) extends Aggregator[SimEntry, Buf, TopKOut] {
    require(k > 0, "k must be positive")

    override def zero: Buf = Buf(0, new Array[Long](k), new Array[Double](k))

    override def reduce(b: Buf, a: SimEntry): Buf = {
      insert(b, a.id, a.sim)
      b
    }

    private def insert(b: Buf, id: Long, sim: Double): Unit = {
      if (b.n == k && !better(sim, id, b.sims(k - 1), b.ids(k - 1))) return
      var pos = 0
      while (pos < b.n && better(b.sims(pos), b.ids(pos), sim, id)) pos += 1
      if (pos >= k) return
      var j = math.min(b.n, k - 1)
      while (j > pos) { b.sims(j) = b.sims(j - 1); b.ids(j) = b.ids(j - 1); j -= 1 }
      b.sims(pos) = sim
      b.ids(pos) = id
      if (b.n < k) b.n += 1
    }

    override def merge(b1: Buf, b2: Buf): Buf = {
      // two-pointer merge of two best-first lists, truncated at k
      val out = zero
      var i = 0; var j = 0
      while (out.n < k && (i < b1.n || j < b2.n)) {
        val takeFirst = j >= b2.n ||
          (i < b1.n && better(b1.sims(i), b1.ids(i), b2.sims(j), b2.ids(j)))
        if (takeFirst) { out.ids(out.n) = b1.ids(i); out.sims(out.n) = b1.sims(i); i += 1 }
        else { out.ids(out.n) = b2.ids(j); out.sims(out.n) = b2.sims(j); j += 1 }
        out.n += 1
      }
      out
    }

    override def finish(b: Buf): TopKOut =
      TopKOut((0 until b.n).map(r => Ranked(b.ids(r), b.sims(r), r + 1L)))

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[TopKOut] = Encoders.product[TopKOut]
  }

  /** `topK(k)(idCol, simCol)` aggregates to a struct whose `entries`
    * field is the ranked top-k array — explode it for row-per-hit form.
    */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAggregator(k), Encoders.product[SimEntry])
    (id: Column, sim: Column) => fn(id, sim)
  }
}
