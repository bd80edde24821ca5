package graft.kernel

/** The 13 window-aggregation reducers used for downsampling
  * (reference: xcube_resampling/coarsen.py:50-155 and the registry at
  * xcube_resampling/constants.py:51-65).
  *
  * Each reduces one window (row-major `values`, shape `winH` x `winW`)
  * to a single Double. Float semantics skip NaN (numpy nan-reducers);
  * integer semantics (`isIntType = true`) use the plain reducer and
  * round-half-to-even the result back to an integral value
  * (reference: coarsen.py:93-111; test_coarsen.py asserts
  * mean([[1,2],[3,4]]) == 2 for ints).
  */
object Reducers {

  sealed abstract class Method(val name: String) extends Serializable
  case object Center extends Method("center")
  case object Count extends Method("count")
  case object First extends Method("first")
  case object Last extends Method("last")
  case object Max extends Method("max")
  case object Mean extends Method("mean")
  case object Median extends Method("median")
  case object Min extends Method("min")
  case object Mode extends Method("mode")
  case object Prod extends Method("prod")
  case object Std extends Method("std")
  case object Sum extends Method("sum")
  case object Var extends Method("var")

  val all: Seq[Method] =
    Seq(Center, Count, First, Last, Max, Mean, Median, Min, Mode, Prod, Std, Sum, Var)

  def byName(name: String): Method =
    all.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"invalid agg_method: $name (must be one of ${all.map(_.name).mkString(", ")})"))

  /** Round-half-to-even, matching numpy.rint (reference: coarsen.py:110). */
  @inline def rint(x: Double): Double = math.rint(x)

  def reduce(
      values: Array[Double], winH: Int, winW: Int,
      method: Method, isIntType: Boolean): Double = {
    val n = winH * winW
    method match {
      case Center => values((winH / 2) * winW + (winW / 2))
      case First  => values(0)
      case Last   => values(n - 1)
      case Count  =>
        // np.count_nonzero: NaN counts as nonzero (NaN != 0 is true)
        var c = 0; var k = 0
        while (k < n) { if (values(k) != 0.0) c += 1; k += 1 }
        c.toDouble
      case Mode =>
        // categorical histogram over [min, max]; no NaN handling by
        // design (reference: coarsen.py:114-155). First-max wins
        // (= smallest value among the most frequent).
        var mn = Double.MaxValue; var mx = Double.MinValue
        var k = 0
        while (k < n) { val v = values(k); if (v < mn) mn = v; if (v > mx) mx = v; k += 1 }
        val lo = mn.toLong
        val span = mx.toLong - lo + 1
        if (span <= 65536) {
          val counts = new Array[Int](span.toInt)
          k = 0
          while (k < n) { counts((values(k).toLong - lo).toInt) += 1; k += 1 }
          var best = 0; var bestC = counts(0); var j = 1
          while (j < span.toInt) { if (counts(j) > bestC) { bestC = counts(j); best = j }; j += 1 }
          (best + lo).toDouble
        } else {
          // a stray non-categorical window (e.g. a 1e9-magnitude float)
          // would make the dense histogram a GB-scale allocation in an
          // executor — hash-count instead; same binning (toLong), same
          // smallest-value-among-max-count winner
          val m = scala.collection.mutable.HashMap.empty[Long, Int]
          k = 0
          while (k < n) {
            val key = values(k).toLong
            m.update(key, m.getOrElse(key, 0) + 1)
            k += 1
          }
          var best = Long.MaxValue; var bestC = 0
          m.foreach { case (v, c) =>
            if (c > bestC || (c == bestC && v < best)) { bestC = c; best = v }
          }
          best.toDouble
        }
      case Median =>
        val vs = if (isIntType) values.take(n).sorted
                 else values.take(n).filter(v => !v.isNaN).sorted
        if (vs.isEmpty) Double.NaN
        else {
          val m = vs.length
          val med = if (m % 2 == 1) vs(m / 2) else (vs(m / 2 - 1) + vs(m / 2)) / 2.0
          if (isIntType) rint(med) else med
        }
      case _ =>
        // streaming reducers
        var sum = 0.0; var prod = 1.0
        var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
        var cnt = 0; var k = 0
        while (k < n) {
          val v = values(k)
          if (isIntType || !v.isNaN) {
            sum += v; prod *= v
            if (v < mn) mn = v; if (v > mx) mx = v
            cnt += 1
          }
          k += 1
        }
        // two-pass variance (mean, then mean of squared deviations) —
        // numpy's nanvar formulation; the one-pass E[x^2]-E[x]^2 form
        // cancels catastrophically for large-magnitude windows
        def var2(): Double = {
          val m = sum / cnt
          var s = 0.0; var k2 = 0
          while (k2 < n) {
            val v = values(k2)
            if (isIntType || !v.isNaN) { val d = v - m; s += d * d }
            k2 += 1
          }
          s / cnt
        }
        val res = method match {
          case Sum  => if (cnt == 0) 0.0 else sum // np.nansum of all-NaN = 0
          case Prod => if (cnt == 0) 1.0 else prod // np.nanprod of all-NaN = 1
          case Max  => if (cnt == 0) Double.NaN else mx
          case Min  => if (cnt == 0) Double.NaN else mn
          case Mean => if (cnt == 0) Double.NaN else sum / cnt
          case Var  => if (cnt == 0) Double.NaN else var2()
          case Std  => if (cnt == 0) Double.NaN else math.sqrt(var2())
          case other => throw new IllegalStateException(other.name)
        }
        if (isIntType && (method == Mean || method == Var || method == Std)) rint(res) else res
    }
  }
}
