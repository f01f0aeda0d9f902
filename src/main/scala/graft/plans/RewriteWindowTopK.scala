package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule that recognizes the standard declarative top-n-per-key
  * idiom —
  *
  *   SELECT <cols without rn> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) AS rn …)
  *   WHERE rn <= k
  *
  * i.e. `Project(cols, Filter(rn <= k, Window([rn := row_number()])))`
  * with the rank column DROPPED by the projection — and lowers it to the
  * native [[TopKPerKeyNode]] (bounded heaps, no input sort on either
  * side of the exchange). Users keep writing the textbook window form;
  * the optimizer retargets it onto the custom physical operator — the
  * same pays-for-itself split as [[graft.expressions.RewriteNearestCentroid]].
  *
  * Fires ONLY when the rewrite is airtight:
  *  - the Window computes exactly one expression, a row_number (rank /
  *    dense_rank admit ties past k — NOT row-set-equivalent to top-k);
  *  - the filter is a bare comparison pinning that rank to ≤ k;
  *  - the projection references only the window child's columns (the
  *    rank is discarded — if it survives, the window must run);
  *  - the partition spec is non-empty (global top-k already lowers to
  *    TakeOrderedAndProject, which is optimal).
  *
  * Tie caveat (same contract as the direct TopKPerKey API): under a
  * non-total ORDER BY, which tied row lands in the top k is arbitrary
  * on BOTH paths (row_number over ties follows nondeterministic input
  * order), so the rewrite does not change the determinism class.
  *
  * Register with `spark.experimental.extraOptimizations :+=
  * RewriteWindowTopK` (plus the [[TopKPerKeyStrategy]]), or get both
  * via `spark.sql.extensions=graft.expressions.GraftExtensions`.
  */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, Filter(cond, w: Window))
        if w.windowExpressions.size == 1 =>
      (w.windowExpressions.head, limitOf(cond)) match {
        case (a @ Alias(WindowExpression(_: RowNumber,
              WindowSpecDefinition(part, order, _)), _), Some((rn, k)))
            if a.exprId == rn.exprId && part.nonEmpty && order.nonEmpty &&
              k > 0 &&
              projectList.forall(_.references.subsetOf(w.child.outputSet)) =>
          // InferWindowGroupLimit may already have inserted its partial
          // limit below the window; the native operator subsumes it
          val child = w.child match {
            case wgl: WindowGroupLimit => wgl.child
            case c => c
          }
          Project(projectList, TopKPerKeyNode(part, order, k, child))
        case _ => p
      }
  }

  /** `rn <= k` in any of its spellings → (rank attribute, k). */
  private def limitOf(cond: Expression): Option[(Attribute, Int)] =
    cond match {
      case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) =>
        Some((a, k))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) =>
        Some((a, k))
      // k > MinValue: `k - 1` on Int.MinValue wraps to MaxValue and
      // would turn an always-false filter into top-MaxValue-per-key
      case LessThan(a: Attribute, Literal(k: Int, IntegerType))
          if k > Int.MinValue =>
        Some((a, k - 1))
      case GreaterThan(Literal(k: Int, IntegerType), a: Attribute)
          if k > Int.MinValue =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, Literal(1, IntegerType)) => Some((a, 1))
      case EqualTo(Literal(1, IntegerType), a: Attribute) => Some((a, 1))
      case _ => None
    }
}
