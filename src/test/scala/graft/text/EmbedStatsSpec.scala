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
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    assert(cov((0L, 0L)) == 0.666667) // E[x^2] - 0 = 2/3
    assert(cov((0L, 1L)) == 0.0)      // dim 1 constant
    assert(cov((1L, 1L)) == 0.0)
    // the exact integer face: spp(0,0) = 2 * 2^48
    val spp = EmbedStats.embedCovariance(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDecimal(3).toBigInteger).toMap
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
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDecimal(3).toString,
        r.getDouble(4))).sortBy(t => (t._1, t._2)).toSeq
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
