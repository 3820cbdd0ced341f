package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{MinHashSigExpression, SimHashExpression, TrigramsExpression, WinnowExpression}

/** SparkSessionExtensions injector: registers graft's native Catalyst
  * functions for SQL use. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` at session build time; the
  * DataFrame API (`graft.functions.MinHashSig(col)`) needs no
  * registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSigExpression].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => MinHashSigExpression(children.head)),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHashExpression].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimHashExpression(children.head)),
    (FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowExpression].getName, "graft_winnow"),
      (children: Seq[Expression]) => WinnowExpression(children.head)),
    (FunctionIdentifier("graft_trigrams"),
      new ExpressionInfo(classOf[TrigramsExpression].getName, "graft_trigrams"),
      (children: Seq[Expression]) => TrigramsExpression(children.head)))
}
