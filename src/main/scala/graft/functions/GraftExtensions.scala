package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the library's native Catalyst
  * expressions, so `spark.sql("SELECT cosine_sim(a, b) ...")` works
  * next to the `Column` API.
  *
  * Two entry points:
  *  - `GraftExtensions` for config-time wiring
  *    (`spark.sql.extensions=graft.functions.GraftExtensions`) — the
  *    standard injection path for cluster-wide deployments;
  *  - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {

  /** (name, info, builder) triples for every SQL-exposed function. */
  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"cosine_sim takes 2 arguments, got ${args.length}")
        CosineSimilarity(args.head, args(1))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"nfc_normalize takes 1 argument, got ${args.length}")
        NfcNormalize(args.head)
      }),
    (FunctionIdentifier("squared_l2"),
      new ExpressionInfo(classOf[SquaredL2Distance].getName, "squared_l2"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"squared_l2 takes 2 arguments, got ${args.length}")
        SquaredL2Distance(args.head, args(1))
      }))

  /** Register on a live session (idempotent — re-registration replaces). */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
