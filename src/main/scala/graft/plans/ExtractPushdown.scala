package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Pushes struct-field extraction down through Project/Filter/Join
  * boundaries to meet the expression that CONSTRUCTS the struct.
  *
  * The translator's join plans build variant structs in per-label view
  * projections (below the pattern joins) and extract fields in the RETURN
  * projection (above them). Locally each side is optimal, but the
  * construct-then-extract pair sits on opposite sides of a Join, where
  * neither Catalyst's `SimplifyExtractValueOps` nor [[VariantFoldRule]]'s
  * local rewrites can see both ends: the intermediate rows carry whole
  * 6-field variant structs (inflating shuffle/broadcast payloads) only for
  * one field to be read out at the top.
  *
  * This rule finds `GetStructField(attr, ord)` where `attr` is produced by
  * a descendant Project as a non-trivial expression E, adds
  * `GetStructField(E, ord) AS f` to that Project (VariantFoldRule +
  * constant folding then collapse it to the native column in the same
  * fixed-point batch), and rewrites the use to `f`. The original struct
  * column stays; column pruning removes it when nothing else reads it.
  */
object ExtractPushdownRule extends Rule[LogicalPlan] {

  /** Extraction chains over a single attribute this rule relocates:
    * `attr.field`, `element_at(attr, key)`, `element_at(attr, key).field`.
    */
  private def extractionOf(e: Expression): Option[(AttributeReference, Expression)] =
    e match {
      case GetStructField(a: AttributeReference, _, _) => Some((a, e))
      case GetStructField(ElementAt(a: AttributeReference, _: Literal, _, _), _, _) =>
        Some((a, e))
      case ElementAt(a: AttributeReference, _: Literal, _, _) => Some((a, e))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(exprs, child) =>
      relocate(exprs, child :: Nil) match {
        case None => p
        case Some((newExprs, newChildren)) =>
          Project(newExprs.map(_.asInstanceOf[NamedExpression]),
            newChildren.head)
      }
    // a JOIN CONDITION comparing variants (a value join between patterns,
    // e.g. WHERE a.acctbal = b.acctbal across a cross pattern) references
    // whole variant structs: relocating the field extractions lets the
    // comparison fold to native columns, which in turn lets Catalyst
    // extract equi-join keys — BroadcastNestedLoopJoin becomes a hash join
    case j @ Join(l, r, _, Some(cond), _) =>
      relocate(Seq(cond), Seq(l, r)) match {
        case None => j
        case Some((Seq(newCond), Seq(l2, r2))) =>
          // re-project to the ORIGINAL output: the relocated columns grew
          // the children, and a parent with shape requirements (Union)
          // must still see the old schema
          Project(j.output,
            j.copy(left = l2, right = r2, condition = Some(newCond)))
        case _ => j
      }
    case f @ Filter(cond, child) =>
      relocate(Seq(cond), child :: Nil) match {
        case None => f
        case Some((Seq(newCond), Seq(c2))) =>
          Project(f.output, Filter(newCond, c2))
        case _ => f
      }
  }

  /** Relocate every extraction chain in `exprs` into whichever of
    * `children` produces its attribute; returns the rewritten expressions
    * and children, or None if nothing moved.
    */
  private def relocate(exprs: Seq[Expression],
      children: Seq[LogicalPlan]): Option[(Seq[Expression], Seq[LogicalPlan])] = {
    val uses = exprs.flatMap(_.collect(Function.unlift(extractionOf))).distinct
    if (uses.isEmpty) return None
    val cur = children.toArray
    val repl = scala.collection.mutable.Map[Expression, Attribute]()
    uses.foreach { case (a, g) =>
      if (!repl.contains(g)) {
        val i = cur.indexWhere(_.outputSet.contains(a))
        if (i >= 0) pushInto(cur(i), a, g) match {
          case Some((newChild, attr)) =>
            cur(i) = newChild
            repl(g) = attr
          case None => ()
        }
      }
    }
    if (repl.isEmpty) None
    else {
      // substitute EVERY collected use shape (GetStructField chains AND
      // bare ElementAt) — leaving one unsubstituted would re-collect it
      // next fixed-point iteration and append duplicate aliases below,
      // preventing batch convergence
      val newExprs = exprs.map(_.transform {
        case e if repl.contains(e) => repl(e)
      })
      Some((newExprs, cur.toSeq))
    }
  }

  /** Rewrite `plan` so that it additionally outputs the extraction chain
    * `g` applied to the expression producing attribute `a` in a descendant
    * Project; returns the rewritten plan and the new output attribute.
    * Only descends through nodes that pass `a` through unchanged. The
    * relocated extraction lands directly over its constructor, where
    * VariantFoldRule + SimplifyExtractValueOps collapse it to the native
    * column in the same fixed-point batch.
    */
  private def pushInto(plan: LogicalPlan, a: AttributeReference,
      g: Expression): Option[(LogicalPlan, Attribute)] = plan match {
    case pr @ Project(list, _) =>
      list.find(_.exprId == a.exprId) match {
        // duplicating a nondeterministic constructor would give the
        // extracted field a value inconsistent with the struct column
        case Some(Alias(e, _)) if !e.isInstanceOf[AttributeReference] && e.deterministic =>
          // found the constructor — emit the pre-extracted value next to it
          val newAlias = Alias(
            g.transform { case x: AttributeReference if x.exprId == a.exprId => e },
            s"${a.name}#x")()
          Some((pr.copy(projectList = list :+ newAlias),
            newAlias.toAttribute))
        case Some(Alias(e: AttributeReference, _)) =>
          // pass-through alias: chase the underlying attribute
          pushInto(pr.child, e,
              g.transform { case x: AttributeReference if x.exprId == a.exprId => e })
            .map { case (c2, attr) =>
              (pr.copy(projectList = list :+ attr, child = c2), attr)
            }
        case Some(_: AttributeReference) =>
          pushInto(pr.child, a, g).map { case (c2, attr) =>
            (pr.copy(projectList = list :+ attr, child = c2), attr)
          }
        case _ => None
      }
    case f @ Filter(_, c) =>
      pushInto(c, a, g).map { case (c2, attr) => (f.copy(child = c2), attr) }
    case j @ Join(l, r, jt, _, _) =>
      // only descend into a side whose rows the join PRESERVES: pushing
      // into the null-extended side of an outer join would surface an
      // attribute whose (non-nullable) child schema is wrong above the
      // join — null guards over it then fold away and the outer rows
      // evaluate the relocated extraction on nulled inputs (a null path's
      // length(p) materialized as a non-null variant with a null payload)
      val leftSafe = jt != RightOuter && jt != FullOuter
      val rightSafe = jt == Inner || jt == Cross || jt == RightOuter
      if (l.outputSet.contains(a) && leftSafe)
        pushInto(l, a, g).map { case (l2, attr) => (j.copy(left = l2), attr) }
      else if (r.outputSet.contains(a) && rightSafe)
        pushInto(r, a, g).map { case (r2, attr) => (j.copy(right = r2), attr) }
      else None
    case _ => None
  }
}
