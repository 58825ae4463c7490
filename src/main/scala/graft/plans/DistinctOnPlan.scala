package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, CurrentRow, Descending, EqualTo, Expression, Literal, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, UnaryNode, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** DISTINCT ON as a first-class logical operator (reference: sql/expr/
  * relational/RelOp.scala DistinctOn): keep, per distinct key tuple,
  * the first row under `order`.
  *
  * The node carries only resolved attributes, so it satisfies the
  * analyzer as-is; [[RewriteDistinctOn]] (injected through
  * GraftExtensions) lowers it to the window+filter plan Catalyst and
  * Tungsten already execute well — one shuffle on the keys, ranking
  * inside the partition, no driver-side logic. This is the idiomatic
  * Spark shape for an operator the engine lacks: custom logical node +
  * rewrite rule, not a custom physical execution.
  */
case class DistinctOnPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output

  override protected def withNewChildInternal(
      newChild: LogicalPlan): DistinctOnPlan = copy(child = newChild)
}

/** Lowers [[DistinctOnPlan]]: row_number() over (partition by keys
  * order by order) == 1, projecting the child's columns back out. */
object RewriteDistinctOn extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case DistinctOnPlan(keys, order, child) => lower(keys, order, child)
  }

  def lower(
      keys: Seq[Expression], order: Seq[SortOrder],
      child: LogicalPlan): LogicalPlan = {
    val frame =
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val spec = WindowSpecDefinition(keys, order, frame)
    val rn = Alias(WindowExpression(RowNumber(), spec), "__graft_rn")()
    val window = Window(Seq(rn), keys, order, child)
    Project(child.output,
      Filter(EqualTo(rn.toAttribute, Literal(1)), window))
  }
}

object DistinctOnPlan {
  /** Build a resolved DistinctOnPlan over `plan` from column names.
    * `order` entries are (columnName, ascending). */
  def resolved(
      plan: LogicalPlan, keys: Seq[String],
      order: Seq[(String, Boolean)]): DistinctOnPlan = {
    def attr(n: String): Attribute =
      plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"distinctOn: no column '$n' in ${plan.output.map(_.name)}"))
    DistinctOnPlan(
      keys.map(attr),
      order.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending)
      },
      plan)
  }
}
