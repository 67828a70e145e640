package graft.cypher

/** openCypher AST subset — shapes follow the reference's libcypher-parser
  * surface (whitelist: `/root/reference/src/ast/cypher_whitelist.c`), scoped
  * to what the engine translates.
  */
object Ast {

  // ── expressions ──────────────────────────────────────────────────────────
  sealed trait Expr
  case class LitInt(v: Long) extends Expr
  case class LitFloat(v: Double) extends Expr
  case class LitString(v: String) extends Expr
  case class LitBool(v: Boolean) extends Expr
  case object LitNull extends Expr
  case class ListLit(items: List[Expr]) extends Expr
  case class MapLit(entries: List[(String, Expr)]) extends Expr
  case class Variable(name: String) extends Expr
  case class Prop(target: Expr, key: String) extends Expr
  case class Param(name: String) extends Expr
  /** binary op: OR XOR AND = <> < <= > >= + - * / % ^ IN
    * STARTSWITH ENDSWITH CONTAINS
    */
  case class Bin(op: String, l: Expr, r: Expr) extends Expr
  case class Not(e: Expr) extends Expr
  case class Neg(e: Expr) extends Expr
  case class IsNull(e: Expr, negated: Boolean) extends Expr
  case class Fn(name: String, args: List[Expr],
      distinct: Boolean = false) extends Expr
  case object CountStar extends Expr
  case class CaseExpr(scrutinee: Option[Expr], whens: List[(Expr, Expr)],
      otherwise: Option[Expr]) extends Expr
  case class Subscript(target: Expr, index: Expr) extends Expr
  case class SliceExpr(target: Expr, from: Option[Expr],
      to: Option[Expr]) extends Expr
  /** [x IN list WHERE pred | proj] */
  case class ListComprehension(variable: String, list: Expr,
      where: Option[Expr], projection: Option[Expr]) extends Expr
  /** any/all/none/single(x IN list WHERE pred) */
  case class Quantifier(kind: String, variable: String, list: Expr,
      pred: Expr) extends Expr
  /** existential pattern predicate: WHERE (n)-[:R]->(m) */
  case class PatternPred(path: PathPat) extends Expr

  // ── patterns ─────────────────────────────────────────────────────────────
  case class NodePat(variable: Option[String], label: Option[String],
      props: List[(String, Expr)])
  /** direction: 1 = ->, -1 = <-, 0 = undirected. varLen = (min, maxOpt). */
  case class RelPat(variable: Option[String], types: List[String],
      props: List[(String, Expr)], direction: Int,
      varLen: Option[(Int, Option[Int])])
  /** shortest=true ⇔ wrapped in shortestPath(...) — keep only ONE minimal
    * path per (start, end) pair (`path_funcs.c` shortestpath);
    * allShortest=true ⇔ allShortestPaths(...) — keep EVERY minimal path
    * (beyond the reference, which rejects it:
    * `arithmetic_expression_construct.c:485`).
    */
  case class PathPat(pathVar: Option[String], head: NodePat,
      tail: List[(RelPat, NodePat)], shortest: Boolean = false,
      allShortest: Boolean = false)

  // ── clauses ──────────────────────────────────────────────────────────────
  sealed trait Clause
  case class Match(optional: Boolean, paths: List[PathPat],
      where: Option[Expr]) extends Clause
  case class Unwind(list: Expr, alias: String) extends Clause
  case class SortItem(expr: Expr, ascending: Boolean)
  case class Projection(distinct: Boolean, items: List[(Expr, Option[String])],
      orderBy: List[SortItem], skip: Option[Expr], limit: Option[Expr])
  case class With(proj: Projection, where: Option[Expr]) extends Clause
  case class Return(proj: Projection) extends Clause
  case class Create(paths: List[PathPat]) extends Clause
  case class Merge(path: PathPat, onMatch: List[SetItem],
      onCreate: List[SetItem]) extends Clause
  case class SetItem(target: Expr, key: Option[String], value: Expr)
  case class SetClause(items: List[SetItem]) extends Clause
  case class Delete(exprs: List[Expr], detach: Boolean) extends Clause
  /** CALL proc.name(args) YIELD col AS alias, … (`op_procedure_call.c`) */
  case class CallProc(name: String, args: List[Expr],
      yields: List[(String, Option[String])]) extends Clause
  /** CREATE INDEX ON :Label(prop) — single-property node index DDL
    * (`src/index/index.c`, commands.md "Indexing").
    */
  case class CreateIndex(label: String, prop: String) extends Clause
  /** DROP INDEX ON :Label(prop). */
  case class DropIndex(label: String, prop: String) extends Clause

  /** Top-down expression rewrite: where `pf` applies, its result replaces
    * the node (no recursion into the replacement); otherwise children are
    * rewritten structurally.
    */
  def transformExpr(e: Expr)(pf: PartialFunction[Expr, Expr]): Expr =
    if (pf.isDefinedAt(e)) pf(e)
    else {
      def t(x: Expr): Expr = transformExpr(x)(pf)
      e match {
        case ListLit(items) => ListLit(items.map(t))
        case MapLit(entries) => MapLit(entries.map { case (k, v) => (k, t(v)) })
        case Prop(target, key) => Prop(t(target), key)
        case Bin(op, l, r) => Bin(op, t(l), t(r))
        case Not(x) => Not(t(x))
        case Neg(x) => Neg(t(x))
        case IsNull(x, n) => IsNull(t(x), n)
        case Fn(n, args, d) => Fn(n, args.map(t), d)
        case CaseExpr(s, w, o) => CaseExpr(s.map(t),
          w.map { case (a, b) => (t(a), t(b)) }, o.map(t))
        case Subscript(target, i) => Subscript(t(target), t(i))
        case SliceExpr(target, f, to) =>
          SliceExpr(t(target), f.map(t), to.map(t))
        case ListComprehension(v, l, w, p) =>
          ListComprehension(v, t(l), w.map(t), p.map(t))
        case Quantifier(k, v, l, p) => Quantifier(k, v, t(l), t(p))
        case other => other
      }
    }

  /** Collect over an expression tree (pre-order). */
  def foreachExpr(e: Expr)(f: Expr => Unit): Unit = {
    f(e)
    val kids: Seq[Expr] = e match {
      case ListLit(items) => items
      case MapLit(entries) => entries.map(_._2)
      case Prop(target, _) => Seq(target)
      case Bin(_, l, r) => Seq(l, r)
      case Not(x) => Seq(x)
      case Neg(x) => Seq(x)
      case IsNull(x, _) => Seq(x)
      case Fn(_, args, _) => args
      case CaseExpr(s, w, o) =>
        s.toSeq ++ w.flatMap { case (a, b) => Seq(a, b) } ++ o.toSeq
      case Subscript(target, i) => Seq(target, i)
      case SliceExpr(target, f0, to) => Seq(target) ++ f0.toSeq ++ to.toSeq
      case ListComprehension(_, l, w, p) => Seq(l) ++ w.toSeq ++ p.toSeq
      case Quantifier(_, _, l, p) => Seq(l, p)
      case _ => Nil
    }
    kids.foreach(foreachExpr(_)(f))
  }

  case class SingleQuery(clauses: List[Clause])
  /** union chain: parts(i) UNION [ALL] parts(i+1); unionAll(i) applies
    * between parts i and i+1.
    */
  case class Query(parts: List[SingleQuery], unionAll: List[Boolean])

  /** Thrown mid-parse for inputs the grammar matches but the language
    * rejects (e.g. IntegerOverflow) — surfaces as a compile-time error.
    */
  case class ParseRejected(msg: String) extends RuntimeException(msg)
}
