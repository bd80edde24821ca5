package graft.geom

/** 2x3 affine transform in row form ((a,b,c),(d,e,f)):
  * {{{ x' = a*x + b*y + c ;  y' = d*x + e*y + f }}}
  *
  * Semantics mirror the `affine` package used by the reference
  * (reference: xcube_resampling/gridmapping/helpers.py:51-56,
  * xcube_resampling/gridmapping/base.py:437-496): `this * other` applies
  * `other` first, then `this`; `invert` is the matrix inverse.
  */
final case class Affine(
    a: Double, b: Double, c: Double,
    d: Double, e: Double, f: Double) {

  @inline def applyX(x: Double, y: Double): Double = a * x + b * y + c
  @inline def applyY(x: Double, y: Double): Double = d * x + e * y + f

  def apply(x: Double, y: Double): (Double, Double) =
    (applyX(x, y), applyY(x, y))

  /** Matrix product: (this * other)(p) == this(other(p)). */
  def *(o: Affine): Affine = Affine(
    a * o.a + b * o.d, a * o.b + b * o.e, a * o.c + b * o.f + c,
    d * o.a + e * o.d, d * o.b + e * o.e, d * o.c + e * o.f + f)

  def invert: Affine = {
    val det = a * e - b * d
    require(det != 0.0, "affine transform is not invertible")
    // EXACT float operation order of the `affine` package's __invert__
    // (idet multiply, not divide) — downstream goldens are sensitive to
    // the last ulp of the composed offsets (NaN propagation at
    // exact-integer sample points flips with 1-ulp drift)
    val idet = 1.0 / det
    val ra = e * idet
    val rb = -b * idet
    val rd = -d * idet
    val re = a * idet
    Affine(ra, rb, -c * ra - f * rb, rd, re, -c * rd - f * re)
  }

  def rows: ((Double, Double, Double), (Double, Double, Double)) =
    ((a, b, c), (d, e, f))
}

object Affine {
  val identity: Affine = Affine(1, 0, 0, 0, 1, 0)

  /** Pure scale + translation (the only shapes the resampling paths emit). */
  def scaleTranslate(sx: Double, sy: Double, tx: Double, ty: Double): Affine =
    Affine(sx, 0, tx, 0, sy, ty)
}
