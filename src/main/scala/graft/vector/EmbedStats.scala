package graft.vector

import java.math.BigInteger
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-matrix statistics: the EXACT second-moment (Gram)
  * accumulation every whitening / PCA / OPQ-style rotation pipeline
  * starts from, and a driver-side eigensolve over the resulting d×d
  * covariance — the "is my embedding space healthy" band (collapsed
  * dimensions, dominant directions, effective rank) next to the
  * recall band.
  *
  * DETERMINISM: components quantize to integer units
  * `round(x · 2^24)` (exact in double — 2^24 is a power of two — and
  * identical in DuckDB), so every sum is an integer sum: order-free,
  * bit-identical across partitionings and engines. The only doubles
  * are the final divisions.
  *
  * SCALE SHAPE (the part that matters at 100 TB): the Gram matrix
  * accumulates PER PARTITION into a d(d+1)/2-long accumulator array —
  * O(d²) state per partition, ONE traversal of the data, and the
  * driver fold touches #partitions × d² numbers, never n. The
  * alternative (posexplode twice + groupBy (i,j)) shuffles n·d² rows
  * — four orders of magnitude more traffic at d = 64. Long
  * accumulators flush into BigInteger every 256 rows so no partition
  * size can overflow (|x| ≤ 8 enforced ⇒ |p| ≤ 2^27 ⇒ pair products
  * ≤ 2^54 ⇒ 256 of them ≤ 2^62).
  */
object EmbedStats {

  /** Unit scale: 2^24 (embedding components are float32, |x| small;
    * the quantization is the determinism contract, documented above).
    */
  val UnitScale: Double = 16777216.0

  /** Largest accepted |component| — the bound the Long-accumulator
    * overflow proof in [[partitionGram]] relies on: |x| <= 8 means
    * |p| <= 2^27, pair products <= 2^54, and [[FlushEvery]] = 256 of
    * them stay under 2^62. Embeddings are unit-norm-ish in practice;
    * anything larger fails loudly instead of silently overflowing.
    */
  val MaxComponent: Double = 8.0

  private val FlushEvery = 256

  /** One partition's exact partial: row count, per-dim unit sums, and
    * the upper-triangle pair-product sums, all as big-integer bytes.
    */
  private def partitionGram(dims: Int)(rows: Iterator[Seq[Double]])
    : Iterator[(Long, Array[Array[Byte]], Array[Array[Byte]])] = {
    val nPairs = dims * (dims + 1) / 2
    val sLong = new Array[Long](dims)
    val gLong = new Array[Long](nPairs)
    val sBig = Array.fill(dims)(BigInteger.ZERO)
    val gBig = Array.fill(nPairs)(BigInteger.ZERO)
    var n = 0L
    var sinceFlush = 0
    def flush(): Unit = {
      var i = 0
      while (i < dims) {
        sBig(i) = sBig(i).add(BigInteger.valueOf(sLong(i))); sLong(i) = 0L; i += 1
      }
      var k = 0
      while (k < nPairs) {
        gBig(k) = gBig(k).add(BigInteger.valueOf(gLong(k))); gLong(k) = 0L; k += 1
      }
      sinceFlush = 0
    }
    val p = new Array[Long](dims)
    rows.foreach { v =>
      require(v.length == dims, s"ragged embedding: ${v.length} != $dims dims")
      var i = 0
      while (i < dims) {
        // The flush-interval overflow proof holds only for
        // |x| <= MaxComponent; fail loudly on unnormalized embeddings
        // rather than silently overflow the Long accumulators.
        require(math.abs(v(i)) <= MaxComponent,
          s"embedding component ${v(i)} exceeds |x| <= $MaxComponent; " +
            "normalize (or rescale) before EmbedStats")
        p(i) = math.round(v(i) * UnitScale); i += 1
      }
      var k = 0
      i = 0
      while (i < dims) {
        sLong(i) += p(i)
        var j = i
        while (j < dims) { gLong(k) += p(i) * p(j); j += 1; k += 1 }
        i += 1
      }
      n += 1L
      sinceFlush += 1
      if (sinceFlush == FlushEvery) flush()
    }
    flush()
    Iterator.single((n, sBig.map(_.toByteArray), gBig.map(_.toByteArray)))
  }

  /** The exact accumulated moments: (n, s(d), g(d(d+1)/2)) with g in
    * upper-triangle row-major order. Driver-held — d²-sized, the
    * centroid-collect contract.
    */
  private[graft] def gramMoments(
      embeddings: DataFrame, vecCol: String)
    : (Long, Array[BigInteger], Array[BigInteger], Int) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vecs = embeddings
      .select(col(vecCol).cast("array<double>").as("v")).as[Seq[Double]]
    val dims = vecs.head().length
    val partials = vecs.mapPartitions(partitionGram(dims)).collect()
    val nPairs = dims * (dims + 1) / 2
    val s = Array.fill(dims)(BigInteger.ZERO)
    val g = Array.fill(nPairs)(BigInteger.ZERO)
    var n = 0L
    partials.foreach { case (pn, ps, pg) =>
      n += pn
      var i = 0
      while (i < dims) { s(i) = s(i).add(new BigInteger(ps(i))); i += 1 }
      var k = 0
      while (k < nPairs) { g(k) = g(k).add(new BigInteger(pg(k))); k += 1 }
    }
    (n, s, g, dims)
  }

  /** The moments tuple both faces derive from — exposed so one Gram
    * pass can serve [[covarianceFromMoments]] AND
    * [[pcaSpectrumFromMoments]] (the tokenizer-memo sharing contract:
    * at a real corpus each redundant pass is a full data scan).
    */
  type Moments = (Long, Array[BigInteger], Array[BigInteger], Int)

  def moments(
      embeddings: DataFrame, vecCol: String = "embedding"): Moments =
    gramMoments(embeddings, vecCol)

  /** EXACT COVARIANCE matrix of the embedding columns, upper triangle
    * (i ≤ j): population covariance
    * `cov_ij = (n·Σpipj − Σpi·Σpj) / (n² · 2^48)`. The 6-dp face is
    * computed ENTIRELY in integers on both engines:
    * `cov_micro = round_half_away((n·Σpipj − Σpi·Σpj)·10^6 / (n²·2^48))`
    * via `sign · ((2·|num|·10^6 + D) div (2·D))` (truncating division
    * on non-negative operands = the same quotient in BigInteger and
    * DuckDB HUGEINT `//`), and only `cov = cov_micro / 1e6` touches a
    * double — an exact IEEE division both engines round identically.
    * A hugeint→double cast of the ~2^70 numerator is NOT part of the
    * chain: that conversion is not guaranteed correctly rounded and
    * differs across DuckDB versions (the r11 hash-fail root cause).
    * Returns (i, j, n, spp, cov_micro) where spp is the exact
    * pair-product sum as a decimal STRING and cov_micro the covariance
    * in BIGINT micro-units — the hash-matchable face carries no
    * DECIMAL or DOUBLE column at all (cross-engine DECIMAL
    * canonicalization was the r10–r12 hash-fail root cause).
    */
  def embedCovariance(
      embeddings: DataFrame, vecCol: String = "embedding"): DataFrame =
    covarianceFromMoments(embeddings.sparkSession,
      gramMoments(embeddings, vecCol))

  /** [[embedCovariance]] from ALREADY-ACCUMULATED moments. */
  def covarianceFromMoments(
      spark: org.apache.spark.sql.SparkSession, m: Moments): DataFrame = {
    val (n, s, g, dims) = m
    require(n >= 1, "empty embedding table")
    val nBig = BigInteger.valueOf(n)
    // D = n^2 * 2^48 (the unit-scale^2 denominator), exact.
    val dBig = nBig.multiply(nBig).multiply(BigInteger.ONE.shiftLeft(48))
    val twoD = dBig.shiftLeft(1)
    val micro = BigInteger.valueOf(1000000L)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val num = nBig.multiply(g(k)).subtract(s(i).multiply(s(j)))
        // round-half-away-from-zero of num*1e6/D, pure integers.
        val q = num.abs.multiply(micro).shiftLeft(1).add(dBig).divide(twoD)
        val covMicro = if (num.signum < 0) q.negate else q
        // Hashed face is DECIMAL- and DOUBLE-free BY DESIGN: spp (the
        // exact pair-product sum, potentially > 2^63) travels as its
        // decimal STRING, and the covariance as BIGINT micro-units —
        // a DECIMAL(38,0) output column canonicalizes differently
        // between a Spark parquet dump and a DuckDB HUGEINT result
        // even when the values are identical (three rounds of
        // driver-hash evidence), while strings and longs round-trip
        // bit-for-bit. cov_micro ≤ 10^6·|x|²_max, checked exact.
        rows += Row(i.toLong, j.toLong, n, g(k).toString,
          covMicro.longValueExact)
        j += 1; k += 1
      }
      i += 1
    }
    val schema = StructType(Seq(
      StructField("i", LongType), StructField("j", LongType),
      StructField("n", LongType),
      StructField("spp", StringType),
      StructField("cov_micro", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** POWER ITERATION over the exact covariance — the dominant
    * embedding direction as a per-step integer trace, the
    * hash-checkable face the Jacobi spectrum can't have (no SQL
    * eigensolver exists, but T unrolled matvec stages DO replay in
    * SQL). Each step multiplies the current vector by the exact
    * integer covariance NUMERATOR matrix `num_ij = n·Σpipj − Σpi·Σpj`
    * (scale-invariant under the per-step normalization, so the
    * n²·2^48 denominator never appears) and renormalizes to
    * max-abs = 2^20 units with round-half-away integer division — the
    * covariance-micro idiom: no double anywhere in the chain, so the
    * trace is bit-identical across engines and partitionings.
    *
    * Start vector: all-ones (2^20 each) — deterministic; orthogonality
    * to the dominant eigenvector is measure-zero and self-corrects
    * under rounding. T steps of a d×d matvec are driver-trivial
    * (d is tokenizer-small); the distributed work is the ONE memoized
    * Gram pass that every moments consumer shares.
    *
    * Magnitude headroom: |num| ≲ n²·2^50·|x|²/2², matvec adds 2^20·d;
    * the rounding step adds 2^21 — inside HUGEINT (2^127) for the
    * oracle up to n ~ 50k at d = 64, and unbounded (BigInteger) on the
    * Spark side.
    *
    * Returns (step, i, v_unit) for step 0..steps — step 0 is the start
    * vector, each later row the renormalized matvec of the previous.
    */
  def powerIterationFromMoments(
      spark: org.apache.spark.sql.SparkSession, m: Moments,
      steps: Int = 8): DataFrame = {
    val (n, s, g, dims) = m
    require(n >= 1, "empty embedding table")
    require(steps >= 1 && steps <= 64, s"steps must be in [1,64], got $steps")
    val nBig = BigInteger.valueOf(n)
    // full numerator matrix from the upper-triangle moments
    val num = Array.ofDim[BigInteger](dims, dims)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val v = nBig.multiply(g(k)).subtract(s(i).multiply(s(j)))
        num(i)(j) = v; num(j)(i) = v
        j += 1; k += 1
      }
      i += 1
    }
    val unit = BigInteger.ONE.shiftLeft(20)
    var v = Array.fill(dims)(unit)
    val rows = new scala.collection.mutable.ArrayBuffer[Row]
    def emit(step: Int): Unit = {
      var ii = 0
      while (ii < dims) {
        rows += Row(step.toLong, ii.toLong, v(ii).longValueExact)
        ii += 1
      }
    }
    emit(0)
    var t = 1
    while (t <= steps) {
      val nv = Array.tabulate(dims) { ii =>
        var acc = BigInteger.ZERO
        var jj = 0
        while (jj < dims) { acc = acc.add(num(ii)(jj).multiply(v(jj))); jj += 1 }
        acc
      }
      val mAbs = nv.map(_.abs).max
      require(mAbs.signum > 0,
        "zero covariance matvec — constant embeddings have no dominant direction")
      // v'_i = round_half_away(nv_i · 2^20 / mAbs), pure integers
      v = nv.map { x =>
        val q = x.abs.multiply(unit).shiftLeft(1).add(mAbs)
          .divide(mAbs.shiftLeft(1))
        if (x.signum < 0) q.negate else q
      }
      emit(t)
      t += 1
    }
    val schema = StructType(Seq(
      StructField("step", LongType), StructField("i", LongType),
      StructField("v_unit", LongType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1), schema)
  }

  /** [[powerIterationFromMoments]] end-to-end from an embedding table. */
  def embedPowerIteration(
      embeddings: DataFrame, steps: Int = 8,
      vecCol: String = "embedding"): DataFrame =
    powerIterationFromMoments(embeddings.sparkSession,
      gramMoments(embeddings, vecCol), steps)

  /** Deterministic cyclic-Jacobi eigensolve of a symmetric matrix
    * (Golub & Van Loan §8.5): fixed (p,q) sweep order, rotations until
    * the off-diagonal mass is below `eps` or `maxSweeps` sweeps.
    * Returns (eigenvalues, eigenvectors as columns), sorted by
    * eigenvalue DESC with ties by original index — a pure function of
    * the input matrix.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]], eps: Double = 1e-12, maxSweeps: Int = 64)
    : (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until d; j <- i + 1 until d) s += a(i)(j) * a(i)(j)
      s
    }
    var sweep = 0
    while (off() > eps && sweep < maxSweeps) {
      for (p <- 0 until d; q <- p + 1 until d if math.abs(a(p)(q)) > 0) {
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
        val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
          case tt if tt == 0.0 && theta == 0.0 => 1.0
          case tt => tt
        }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val sn = t * c
        for (k <- 0 until d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sn * akq
          a(k)(q) = sn * akp + c * akq
        }
        for (k <- 0 until d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sn * aqk
          a(q)(k) = sn * apk + c * aqk
        }
        for (k <- 0 until d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - sn * vkq
          v(k)(q) = sn * vkp + c * vkq
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => (-a(i)(i), i))
    (order.map(i => a(i)(i)).toArray,
      Array.tabulate(d, d)((r, ci) => v(r)(order(ci))))
  }

  /** PCA spectrum of the embedding space: eigenvalues of the exact
    * covariance (Jacobi, driver-side — d is tokenizer-small, the
    * distributed work is [[embedCovariance]]'s one data pass),
    * explained-variance fractions, and the cumulative curve. The
    * effective-rank readout that decides Matryoshka truncation tiers
    * and catches collapsed embedding spaces. Rows-only at the harness
    * (no SQL eigensolver); [[embedCovariance]] is its hash-matched
    * companion — the q_text_compress(_stats) pattern.
    */
  def embedPcaSpectrum(
      embeddings: DataFrame, topK: Int = 16,
      vecCol: String = "embedding"): DataFrame =
    pcaSpectrumFromMoments(embeddings.sparkSession,
      gramMoments(embeddings, vecCol), topK)

  /** [[embedPcaSpectrum]] from ALREADY-ACCUMULATED moments. */
  def pcaSpectrumFromMoments(
      spark: org.apache.spark.sql.SparkSession, m: Moments,
      topK: Int = 16): DataFrame = {
    import spark.implicits._
    val (n, s, g, dims) = m
    require(n >= 2, "need at least 2 vectors for a spectrum")
    val denom = n.toDouble * n.toDouble * UnitScale * UnitScale
    val nBig = BigInteger.valueOf(n)
    val cov = Array.ofDim[Double](dims, dims)
    var k = 0
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val num = nBig.multiply(g(k)).subtract(s(i).multiply(s(j)))
        cov(i)(j) = num.doubleValue / denom
        cov(j)(i) = cov(i)(j)
        j += 1; k += 1
      }
      i += 1
    }
    val (eig, _) = jacobiEigen(cov)
    val total = eig.sum
    val kk = math.min(topK, dims)
    var cum = 0.0
    (0 until kk).map { c =>
      cum += eig(c)
      (c.toLong + 1L, eig(c),
        if (total > 0) eig(c) / total else 0.0,
        if (total > 0) cum / total else 0.0)
    }.toDF("component", "eigenvalue", "explained_frac", "cumulative_frac")
  }
}
