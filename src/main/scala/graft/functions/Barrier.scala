package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that reports itself non-deterministic: a pure
  * optimization BARRIER. `PushDownPredicates` refuses to inline aliases
  * from a projection containing a non-deterministic field, so a filter
  * over a [[BarrierExpression]]-wrapped column stays ABOVE the projection
  * and reads the computed column once, instead of having the column's
  * (expensive, often interpreted) definition duplicated into a
  * scan-level Filter. Built-in nondeterministic wrappers don't work for
  * this: `monotonically_increasing_id` is rejected by the streaming
  * UnsupportedOperationChecker, and Spark 4 pushes predicates through
  * `rand`-containing projections. Evaluation and codegen are exact
  * pass-throughs of the child. */
case class BarrierExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "graft_barrier"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): BarrierExpression =
    copy(child = newChild)
}

object Barrier {
  /** DataFrame-API form: `Barrier(expensiveColumn)`. */
  def apply(c: Column): Column =
    GraftSqlBridge.column(BarrierExpression(GraftSqlBridge.expression(c)))
}
