package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

import graft.plans.TopKPerKey.TopKPerKeyNode

/** Optimizer rule (`Rule[LogicalPlan]` — the Catalyst extension point):
  * rewrite the classic per-key top-k pattern
  *
  *   Filter(rank <= k, Window(row_number over (partition by K order by O)))
  *
  * into [[TopKPerKeyNode]], which plans as partial+final bounded heaps
  * (see [[TopKPerKey]]) instead of Exchange → full Sort → Window →
  * Filter. Users keep writing the idiomatic row_number form; the rule
  * swaps the physical strategy underneath.
  *
  * Soundness conditions (all checked):
  *  - exactly one window expression, and it is `row_number()`;
  *  - the filter conjunct bounds that attribute from above with an
  *    integer literal (`<= k`, `< k+1`, or `= 1`);
  *  - node output == window output (same attrs, same exprIds — the
  *    rewrite reuses the alias's exprId for the rank attribute), so no
  *    downstream reference changes. Remaining filter conjuncts stay in
  *    a Filter above the new node.
  */
object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def rankBound(cond: Expression, rankAttr: Attribute): Option[Int] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rankAttr.exprId => Some(k)
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
        if a.exprId == rankAttr.exprId => Some(k - 1)
      case EqualTo(a: Attribute, Literal(1, IntegerType))
        if a.exprId == rankAttr.exprId => Some(1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute)
        if a.exprId == rankAttr.exprId => Some(k)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _)) if orderSpec.nonEmpty =>
      val rankAttr = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rankAttr).map(c -> _))
      if (bounds.isEmpty) f
      else {
        val k = bounds.map(_._2).min
        if (k <= 0) f
        else {
          val boundConds = bounds.map(_._1).toSet
          val rest = conjuncts.filterNot(boundConds)
          val newRank = AttributeReference(alias.name, IntegerType,
            nullable = false)(exprId = alias.exprId)
          val topk = TopKPerKeyNode(partitionSpec, orderSpec, k, child, newRank)
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk)
        }
      }
  }
}
