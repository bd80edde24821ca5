package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for squared-L2 distance over two
  * `array<double>` columns, WITH `doGenCode` — the exact-ground-truth
  * kernel of the PQ/ADC recall operators.
  *
  * Why not `aggregate(zip_with(...))`: Spark's higher-order functions
  * are `CodegenFallback` — each pair builds an intermediate
  * difference-squared array and folds it through interpreted lambda
  * trees, which dominated `pqBruteRecall`'s candidate×query scan (and
  * its allocation rate showed up as 250-400 ms of GC per bench run).
  * This compiles to one tight primitive loop inside whole-stage
  * codegen, no intermediate array.
  *
  * Numeric order matches the HOF formulation exactly: a left fold of
  * `(x_i - y_i)^2` in ascending dim order from 0.0 — so every double
  * (and the DuckDB oracle hashes built on the same ascending fold) is
  * bit-identical.
  */
case class SquaredL2Distance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "squared_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredL2Distance =
    copy(left = newLeft, right = newRight)
}

object SquaredL2Distance {
  import org.apache.spark.sql.GraftExpressionBridge

  /** Column form: `sqL2(a, b)` — callers must pass `array<double>`
    * columns (cast upstream, as the vector ops do).
    */
  def sqL2(a: Column, b: Column): Column =
    GraftExpressionBridge.column(
      SquaredL2Distance(GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
