package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.vector.EmbedStats

/** [[EmbedStats]] — exact integer Gram accumulation and the Jacobi
  * spectrum: hand-computed covariances on dyadic inputs (unit
  * quantization is exact there), partitioning-invariance of the
  * integer sums, eigensolve correctness on known matrices, and the
  * spectrum's probability-vector invariants.
  */
class EmbedStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("covariance on dyadic vectors is exact; constant dims read 0") {
    // components are dyadic -> 2^24 quantization is EXACT, so the
    // covariance is the textbook value with no rounding slack
    val e = Seq(
      (0L, Array(1.0f, 0.5f)),
      (1L, Array(0.0f, 0.5f)),
      (2L, Array(-1.0f, 0.5f))).toDF("vec_id", "embedding")
    val cov = EmbedStats.embedCovariance(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    assert(cov((0L, 0L)) == 666667L) // E[x^2] - 0 = 2/3, micro-units
    assert(cov((0L, 1L)) == 0L)      // dim 1 constant
    assert(cov((1L, 1L)) == 0L)
    // the exact integer face: spp(0,0) = 2 * 2^48 (decimal string —
    // the hashed face is DECIMAL- and DOUBLE-free by design)
    val spp = EmbedStats.embedCovariance(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        new java.math.BigInteger(r.getString(3))).toMap
    assert(spp((0L, 0L)) == java.math.BigInteger.valueOf(2L << 48))
  }

  test("components beyond the overflow-proof bound fail loudly, not silently") {
    // the Long-accumulator proof needs |x| <= MaxComponent; an
    // unnormalized embedding must raise, never produce a wrong Gram
    val bad = Seq((0L, Array(9.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      EmbedStats.embedCovariance(bad).collect()
    }
    assert(e.getMessage.contains("MaxComponent") ||
      e.getCause != null && e.getCause.getMessage.contains("normalize"),
      s"unexpected failure: ${e.getMessage}")
    // the bound itself is accepted
    val ok = Seq((0L, Array(8.0f, -8.0f)), (1L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    assert(EmbedStats.embedCovariance(ok).count() == 3)
  }

  test("integer sums are partitioning-invariant (order-free proof)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def face(parts: Int) = EmbedStats.embedCovariance(e.repartition(parts))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3),
        r.getLong(4))).sortBy(t => (t._1, t._2)).toSeq
    assert(face(1) == face(7))
  }

  test("jacobi eigensolve: known 2x2 and 3x3 spectra, A v = lambda v, orthonormal V") {
    val (e2, v2) = EmbedStats.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(e2(0) - 3.0) < 1e-10 && math.abs(e2(1) - 1.0) < 1e-10)
    val a3 = Array(
      Array(4.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 9.0))
    val (e3, v3) = EmbedStats.jacobiEigen(a3)
    assert(e3.toSeq == Seq(9.0, 4.0, 1.0))
    // eigen equation and orthonormality for the 2x2
    val a = Array(Array(2.0, 1.0), Array(1.0, 2.0))
    for (c <- 0 until 2) {
      val av = (0 until 2).map(r => a(r)(0) * v2(0)(c) + a(r)(1) * v2(1)(c))
      val lv = (0 until 2).map(r => e2(c) * v2(r)(c))
      av.zip(lv).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9) }
    }
    val dot01 = v2(0)(0) * v2(0)(1) + v2(1)(0) * v2(1)(1)
    val n0 = v2(0)(0) * v2(0)(0) + v2(1)(0) * v2(1)(0)
    assert(math.abs(dot01) < 1e-10 && math.abs(n0 - 1.0) < 1e-10)
  }

  test("power iteration converges to the dominant eigenvector of the exact covariance") {
    // a corpus with an unambiguous dominant direction: variance along
    // dim 0 dwarfs the rest, with a small dim-1 admixture so the
    // eigenvector is not axis-aligned (the trace must EARN the answer)
    val e = (0 until 32).map { i =>
      val t = 0.125f * (i - 16)
      (i.toLong, Array(t, 0.25f * t, if (i % 2 == 0) 0.0625f else -0.0625f))
    }.toDF("vec_id", "embedding")
    val trace = EmbedStats.embedPowerIteration(e, steps = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(trace.length == 9 * 3)
    // step 0 is the all-ones start vector
    assert(trace.filter(_._1 == 0L).forall(_._3 == 1048576L))
    // the final vector aligns with the Jacobi dominant eigenvector
    val m = EmbedStats.moments(e)
    val (nDocs, s, g, d) = m
    val denom = nDocs.toDouble * nDocs.toDouble * EmbedStats.UnitScale * EmbedStats.UnitScale
    val cov = Array.ofDim[Double](d, d)
    var k = 0
    for (i <- 0 until d; j <- i until d) {
      val num = java.math.BigInteger.valueOf(nDocs).multiply(g(k))
        .subtract(s(i).multiply(s(j)))
      cov(i)(j) = num.doubleValue / denom; cov(j)(i) = cov(i)(j); k += 1
    }
    val (eig, vecs) = EmbedStats.jacobiEigen(cov)
    val top = (0 until d).map(r => vecs(r)(0))
    val vf = trace.filter(_._1 == 8L).sortBy(_._2).map(_._3.toDouble / 1048576.0)
    val dot = vf.zip(top).map { case (a, b) => a * b }.sum
    val cosAbs = math.abs(dot) /
      (math.sqrt(vf.map(x => x * x).sum) * math.sqrt(top.map(x => x * x).sum))
    assert(cosAbs > 0.9999, s"final vector off the dominant direction: cos=$cosAbs")
    // Rayleigh quotient of the final vector ~ the top eigenvalue
    val av = (0 until d).map(r => (0 until d).map(c => cov(r)(c) * vf(c)).sum)
    val rayleigh = vf.zip(av).map { case (a, b) => a * b }.sum / vf.map(x => x * x).sum
    assert(math.abs(rayleigh - eig(0)) < 1e-6 * math.max(1.0, math.abs(eig(0))),
      s"rayleigh $rayleigh vs top eigenvalue ${eig(0)}")
    // normalization contract: every step's max |component| is 2^20
    for (t <- 1L to 8L)
      assert(trace.filter(_._1 == t).map(x => math.abs(x._3)).max == 1048576L)
  }

  test("power iteration is a pure function of the moments (partitioning-invariant)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def face(parts: Int) =
      EmbedStats.embedPowerIteration(e.repartition(parts), steps = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(face(1) == face(5))
  }

  test("pca spectrum: rank-1 data explains everything in one component") {
    // all vectors on one line -> eigenvalue 1 carries all variance
    val e = (0 until 16).map(i =>
      (i.toLong, Array(0.25f * (i - 8), 0.5f * (i - 8), -0.25f * (i - 8))))
      .toDF("vec_id", "embedding")
    val sp = EmbedStats.embedPcaSpectrum(e, topK = 3).collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getDouble(3)))
    assert(sp.length == 3)
    assert(math.abs(sp(0)._2 - 1.0) < 1e-9, s"first comp frac ${sp(0)._2}")
    assert(math.abs(sp(2)._3 - 1.0) < 1e-9, "cumulative must end at 1")
    // real corpus: fractions decreasing, cumulative monotone in (0, 1]
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rs = EmbedStats.embedPcaSpectrum(emb, topK = 16).collect()
      .map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(rs.length == 16)
    assert(rs.sliding(2).forall { case Array(a, b) => a._1 >= b._1 - 1e-12 })
    assert(rs.last._3 <= 1.0 + 1e-9 && rs.head._3 > 0.0)
  }
}
