package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, CurrentRow, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowFrame, RowNumber, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rewrite: `row_number() OVER (PARTITION BY k ORDER BY o) <= K`
  * filters whose rank column is immediately projected away become
  * [[TopKPerKeyPlan]] — the user writes the idiomatic window formulation
  * and the plan runs as partial+final bounded heaps (no per-key sort, only
  * O(keys·K) rows across the exchange). This is the rule rung of the
  * extension ladder: users opt in once via
  * `spark.sql.extensions=graft.plans.GraftExtensions` and every existing
  * window-top-k query in their codebase is re-planned, no API change.
  *
  * Contrast with Spark's own InferWindowGroupLimit, which bounds the rows
  * entering the window to K per key per partition but still shuffles the
  * survivors, SORTS them, computes row_number, and filters — the rewrite
  * removes the window (and its sort) entirely when the rank itself is
  * unused.
  *
  * Matched shape (after predicate pushdown / project collapse):
  * {{{ Project(p, Filter(rn <= K [AND rest...], Window([rn], part, ord, child))) }}}
  * subject to:
  *   - the window computes exactly one expression, a default-framed
  *     row_number (rank()/dense_rank() admit ties, a bounded heap does not);
  *   - the partition spec is non-empty (global top-k belongs to Limit) and
  *     the order spec non-empty;
  *   - neither the projection nor the residual conjuncts reference the rank
  *     (rank consumers need the real window);
  *   - K >= 1 (a non-positive K makes the filter constant-false; left for
  *     Spark's own simplification).
  * Residual conjuncts stay as a Filter ABOVE the top-k: both predicates
  * apply to the same ranked row-set, so order is immaterial.
  *
  * Determinism matches the window formulation it replaces: when the order
  * is total within each key the result is identical; when rows tie,
  * row_number itself is nondeterministic (partition-order dependent) and
  * the heap's pick is just a different arbitrary choice (see
  * [[TopK.perKey]]'s contract).
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `conjunct` as an upper bound on the rank attribute, if it is one. */
  private def limitOf(conjunct: Expression, rankId: ExprId): Option[Int] =
    conjunct match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.exprId == rankId => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.exprId == rankId => Some(k - 1)
      // flipped spellings (SQL "WHERE 3 >= rk" parses literal-first)
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.exprId == rankId => Some(k)
      case GreaterThan(IntegerLiteral(k), a: Attribute) if a.exprId == rankId => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(1)) if a.exprId == rankId => Some(1)
      case EqualTo(IntegerLiteral(1), a: Attribute) if a.exprId == rankId => Some(1)
      case _ => None
    }

  private def refsRank(e: Expression, rankId: ExprId): Boolean =
    e.references.exists(_.exprId == rankId)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList, Filter(cond,
        Window(Seq(rank @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          part, ord, wchild, _)))
        if part.nonEmpty && ord.nonEmpty &&
          !projList.exists(refsRank(_, rank.exprId)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (limits, rest) = conjuncts.partition(limitOf(_, rank.exprId).isDefined)
      val ks = limits.flatMap(limitOf(_, rank.exprId))
      if (ks.isEmpty || ks.min < 1 || rest.exists(refsRank(_, rank.exprId))) p
      else {
        // InferWindowGroupLimit may already have bounded the window's input;
        // the window is going away, so its helper node goes too.
        val inner = wchild match {
          case WindowGroupLimit(_, _, _, _, c) => c
          case other => other
        }
        val topk = TopKPerKeyPlan(ks.min, part, ord, inner)
        Project(projList,
          if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      }
  }
}
