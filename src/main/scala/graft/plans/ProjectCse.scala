package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Common-subexpression elimination for Project nodes and Filter
  * conditions.
  *
  * The Cypher translator composes variant-typed expressions whose operands
  * are referenced several times per operator (`Values.arith` reads each
  * argument up to 6×); nesting multiplies copies, so a projection like
  * `round(l.extendedprice * 100) / 100` can reference the underlying
  * property-map lookup dozens of times. Whole-stage codegen's builtin
  * subexpression elimination bails once the generated method blows past the
  * JIT limit and execution falls back to interpreted projection — per-copy
  * re-evaluation, catastrophic on wide rows.
  *
  * This rule hoists deterministic subexpressions that occur ≥2 times across
  * a projection into a child Project (`__cse_N` aliases); the parent then
  * references plain attributes. Evaluation per row becomes linear in the
  * number of distinct subexpressions — the Spark analogue of the reference
  * evaluating its `AR_ExpNode` tree node-by-node per record
  * (`/root/reference/src/arithmetic/arithmetic_expression.c`).
  *
  * Notes:
  *   - hoisting makes conditionally-evaluated subexpressions eager; sound
  *     under non-ANSI evaluation (no side effects / no throwing exprs).
  *   - CollapseProject will not undo the split: the hoisted exprs are
  *     non-cheap and multiply referenced.
  *   - exprs capturing lambda variables or subqueries are skipped.
  */
/** Marker for engine expressions that can RAISE at eval time on inputs
  * their surrounding CASE guards exclude (e.g. the temporal kernel raising
  * on a non-temporal variant). [[ProjectCseRule]] must never hoist a
  * subtree containing one out of its guard — eager evaluation would raise
  * on rows the guard was protecting (first found by FuzzSpec:
  * `'a' + toString(i % 3)` duplicated `render(v)` through the concat, the
  * hoist ran `TemporalFn("render")` on plain ints, and the query failed).
  */
trait GraftThrowing { self: Expression => }

object ProjectCseRule extends Rule[LogicalPlan] {

  private val MinSize = 4 // expression-tree node count worth hoisting

  /** Runs ONCE per query (injected pre-CBO, not in the fixed-point batch —
    * layer-per-iteration splitting there multiplied whole-batch passes);
    * the local loop peels nested repeats until no candidates remain.
    */
  override def apply(plan: LogicalPlan): LogicalPlan = {
    var cur = plan
    var rounds = 0
    var changed = true
    while (changed && rounds < 40) {
      val next = splitOnce(cur)
      changed = !next.fastEquals(cur)
      cur = next
      rounds += 1
    }
    cur
  }

  // NOTE on Filter conditions: an alias-hoisting CSE for filters (tried in
  // round 9) is ALWAYS undone — the "Pushdown Filters from PartitionPruning"
  // batch re-runs PushDownPredicates after every preCBO rule and inlines
  // the hoisted aliases back into the condition. Filter-side explosions are
  // instead fixed structurally ([[VariantEq]]: operands of the variant
  // ternary compare evaluate once by construction).
  private def splitOnce(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projectList, child) =>
      val candidates = collectRepeats(projectList, child)
      if (candidates.isEmpty) p
      else {
        val temps = candidates.zipWithIndex.map { case (e, i) =>
          Alias(e, s"__cse_$i")()
        }
        val byCanon = candidates.zip(temps).map { case (e, a) =>
          e.canonicalized -> a.toAttribute
        }
        def replace(e: Expression): Expression =
          byCanon.find(_._1 == e.canonicalized) match {
            case Some((_, attr)) if !e.isInstanceOf[Alias] => attr
            case _ => e.mapChildren(replace)
          }
        val upper: Seq[NamedExpression] = projectList.map { ne =>
          replace(ne) match {
            case a: Alias => a
            case attr: Attribute => attr
            case other => Alias(other, ne.name)(exprId = ne.exprId)
          }
        }
        // no-progress guard (canonicalization mismatch): avoid wrapping
        // without replacing, which would grow the plan every iteration
        if (upper.zip(projectList).forall { case (a, b) => a.fastEquals(b) }) p
        else Project(upper, Project(child.output ++ temps, child))
      }
  }

  /** Repeated, hoistable subexpressions (outermost-first, deduped). */
  private def collectRepeats(projectList: Seq[NamedExpression],
      child: LogicalPlan): Seq[Expression] = {
    val counts = scala.collection.mutable.LinkedHashMap[Expression, Int]()
    val repr = scala.collection.mutable.HashMap[Expression, Expression]()
    def visit(e: Expression): Unit = {
      if (hoistable(e, child)) {
        val k = e.canonicalized
        counts(k) = counts.getOrElse(k, 0) + 1
        repr.getOrElseUpdate(k, e)
      }
      e.children.foreach(visit)
    }
    projectList.foreach {
      case Alias(c, _) => visit(c)
      case other => other.children.foreach(visit)
    }
    val repeated = counts.filter(_._2 >= 2).keys.toSeq
    // keep outermost candidates only (drop ones contained in another pick)
    val picked = scala.collection.mutable.ArrayBuffer[Expression]()
    repeated.sortBy(k => -size(repr(k))).foreach { k =>
      val e = repr(k)
      if (!picked.exists(p => contains(p, k))) picked += e
    }
    picked.toSeq
  }

  private def contains(haystack: Expression, canon: Expression): Boolean =
    haystack.canonicalized == canon ||
      haystack.children.exists(contains(_, canon))

  private def size(e: Expression): Int =
    1 + e.children.map(size).sum

  private def hoistable(e: Expression, child: LogicalPlan): Boolean =
    size(e) >= MinSize &&
      e.deterministic &&
      !e.isInstanceOf[Alias] &&
      e.references.subsetOf(child.outputSet) &&
      !e.exists {
        case _: NamedLambdaVariable | _: LambdaFunction => true
        case _: PlanExpression[_] => true
        case _: aggregate.AggregateExpression => true
        // eager evaluation of a hoisted CSE is only sound for non-throwing
        // expressions — raise_error/assert_true (and engine expressions
        // marked GraftThrowing) live under conditional guards precisely so
        // they DON'T run on every row
        case _: RaiseError | _: AssertTrue => true
        case _: GraftThrowing => true
        case _ => false
      }
}
