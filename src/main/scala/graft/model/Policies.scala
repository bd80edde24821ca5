package graft.model

import graft.kernel.{Interp, Reducers}

/** Per-variable resampling policies, resolved on the driver BEFORE the
  * job and broadcast into kernels — the Spark home of the reference's
  * dtype-keyed option maps (reference: xcube_resampling/utils.py:192-333,
  * constants.py:66-77).
  */
object Policies {

  /** Logical element type of a raster variable. The engine computes in
    * Double (as the reference computes in the source dtype then casts);
    * the dtype drives policy defaults and int rounding.
    */
  sealed abstract class DType(val name: String, val isInt: Boolean) extends Serializable
  case object F64 extends DType("float64", false)
  case object F32 extends DType("float32", false)
  case object I64 extends DType("int64", true)
  case object I32 extends DType("int32", true)
  case object I16 extends DType("int16", true)
  case object I8 extends DType("int8", true)
  case object U8 extends DType("uint8", true)
  case object U16 extends DType("uint16", true)
  case object U32 extends DType("uint32", true)
  case object Bool extends DType("bool", true)

  val dtypes: Seq[DType] = Seq(F64, F32, I64, I32, I16, I8, U8, U16, U32, Bool)
  def dtypeByName(n: String): DType =
    dtypes.find(_.name == n).getOrElse(throw new IllegalArgumentException(s"unknown dtype $n"))

  final case class VarPolicy(
      interp: Int,            // Interp.NEAREST / BILINEAR / TRIANGULAR
      agg: Reducers.Method,
      recoverNan: Boolean,
      fill: Double,
      dtype: DType) extends Serializable

  /** An option value keyed by variable name or dtype, or given as a
    * scalar — mirrors `InterpMethods`/`AggMethods`/`FillValues`/
    * `RecoverNans` (reference: constants.py:49-72).
    */
  final case class Options[T](
      scalar: Option[T] = None,
      byVar: Map[String, T] = Map.empty[String, T],
      byDtype: Map[String, T] = Map.empty[String, T]) {
    def resolve(varName: String, dtype: DType, default: => T): T =
      scalar.getOrElse(
        byVar.get(varName).orElse(byDtype.get(dtype.name)).getOrElse(default))
    def isEmpty: Boolean = scalar.isEmpty && byVar.isEmpty && byDtype.isEmpty
  }
  object Options {
    def none[T]: Options[T] = Options[T]()
    def of[T](v: T): Options[T] = Options(scalar = Some(v))
  }

  /** Default interp: nearest for ints, bilinear otherwise
    * (reference: utils.py:197-198).
    */
  def defaultInterp(dtype: DType): Int = if (dtype.isInt) Interp.NEAREST else Interp.BILINEAR

  /** Default agg: center for ints, mean otherwise
    * (reference: utils.py:259-260).
    */
  def defaultAgg(dtype: DType): Reducers.Method = if (dtype.isInt) Reducers.Center else Reducers.Mean

  /** Default fill by dtype: NaN / 255 / 65535 / -1
    * (reference: constants.py:74-77, utils.py:307-316).
    */
  def defaultFill(dtype: DType): Double = dtype match {
    case U8 => 255.0
    case U16 => 65535.0
    case d if d.isInt => -1.0
    case _ => Double.NaN
  }

  /** Rewrite triangular -> bilinear for the downscale prepass
    * (reference: utils.py:239-251).
    */
  def prepInterpDownscale(o: Options[Int]): Options[Int] = {
    def fix(i: Int): Int = if (i == Interp.TRIANGULAR) Interp.BILINEAR else i
    Options(o.scalar.map(fix), o.byVar.view.mapValues(fix).toMap, o.byDtype.view.mapValues(fix).toMap)
  }

  def resolve(
      varName: String, dtype: DType,
      interp: Options[Int] = Options.none,
      agg: Options[Reducers.Method] = Options.none,
      recoverNan: Options[Boolean] = Options.none,
      fill: Options[Double] = Options.none): VarPolicy =
    VarPolicy(
      interp = interp.resolve(varName, dtype, defaultInterp(dtype)),
      agg = agg.resolve(varName, dtype, defaultAgg(dtype)),
      recoverNan = recoverNan.resolve(varName, dtype, false),
      fill = fill.resolve(varName, dtype, defaultFill(dtype)),
      dtype = dtype)
}
