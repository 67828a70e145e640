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
  case class PathPat(pathVar: Option[String], head: NodePat,
      tail: List[(RelPat, NodePat)])

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

  case class SingleQuery(clauses: List[Clause])
  /** union chain: parts(i) UNION [ALL] parts(i+1); unionAll(i) applies
    * between parts i and i+1.
    */
  case class Query(parts: List[SingleQuery], unionAll: List[Boolean])
}
