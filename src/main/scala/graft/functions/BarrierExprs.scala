package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** `no_pushdown(expr)`: value-identity wrapper that reports itself
  * NON-deterministic to the optimizer — the JVM-expression analogue of the
  * optimization guide §4.4 trick (`udf.asNondeterministic()` to stop the
  * optimizer duplicating an expensive UDF around a filter).
  *
  * Why it exists: `PushDownPredicates` pushes a Filter below every Project
  * it crosses, SUBSTITUTING each referenced alias with its full expression
  * tree. For a predicate over staged heavy columns that substitution
  * compounds layer by layer — the q75 Gopher filter's predicate arrived at
  * the scan with 22 copies of the `gram_run_stats` kernel and 51 copies of
  * the tokenizer (measured round 15), every one of them evaluated per row
  * INSIDE the single-task scan stage, below the adaptive fan-out exchange.
  * Catalyst has no cross-operator common-subexpression elimination, so the
  * only way to keep "compute the stats once in a parallel Project, then
  * filter on the tiny boolean" is to make the predicate non-pushable.
  *
  * Wrapping ONLY the filter condition is deliberate: the staging Projects
  * stay deterministic (still eligible for every other rewrite), column
  * pruning is unaffected (the barrier sits in a Filter condition, not a
  * projection), and cheap predicates elsewhere keep pushing down to the
  * parquet scan as designed.
  *
  * The claim of non-determinism is conservative: it disables rewrites,
  * never enables one, so results are unchanged (the wrapped expression is
  * in fact deterministic). Codegen is a pass-through of the child's code.
  */
case class NoPushdown(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  // the whole point: the optimizer must treat this subtree as immovable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "no_pushdown"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): NoPushdown =
    copy(child = newChild)
}

/** Column-level entry point for the pushdown barrier. */
object BarrierOps {
  /** Keep an expensive computed predicate where it is written: evaluated
    * once, above the projections that stage its inputs (and above the
    * adaptive fan-out exchange), instead of being substituted and
    * re-evaluated at the scan.
    */
  def noPush(c: Column): Column =
    Bridge.column(NoPushdown(Bridge.expression(c)))
}
