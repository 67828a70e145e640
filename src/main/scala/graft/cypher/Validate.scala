package graft.cypher

/** Compile-time semantic checks the reference's AST validator performs
  * before planning (`/root/reference/src/ast/ast_validations.c`):
  * variable-binding conflicts, projection-name conflicts, and
  * non-deterministic-in-aggregate rejection. Runs on the parsed AST before
  * translation; throws [[Translator.TranslateError]] with the openCypher
  * error name in the message (the TCK accepts any engine error for a typed
  * error expectation, but the name keeps diagnostics honest).
  */
object Validate {
  import Ast._
  private def fail(msg: String): Nothing =
    throw Translator.TranslateError(msg)

  private sealed trait Kind
  private case object VNode extends Kind
  private case object VRel extends Kind
  private case object VPath extends Kind
  /** value of statically-unknown shape — may hold an entity at runtime
    * (coalesce of nodes, unwound collect element), so patterns accept it */
  private case object VValue extends Kind
  /** value statically known to be a non-entity literal — re-matching it as
    * a node/relationship is a compile-time VariableTypeConflict */
  private case object VLit extends Kind
  /** value statically known to be a LIST or MAP (possibly of entities) —
    * legal only in a variable-length relationship position (the Match9
    * list-binding form); a node position is a VariableTypeConflict
    * (TCK Match3 [30]) */
  private case object VListVal extends Kind

  private def isLiteralish(e: Expr): Boolean = e match {
    case _: LitInt | _: LitFloat | _: LitString | _: LitBool => true
    // `null` is a valid (null) entity: `WITH null AS a OPTIONAL MATCH
    // p = (a)-->()` must type-check (Path1 [1] null-path semantics)
    case LitNull => false
    // a list/map built FROM variables may hold entities (the deprecated
    // `WITH [r1, r2] AS rs MATCH ()-[rs*]->()` list-binding, Match9) —
    // only an all-literal composite is statically a non-entity value
    case ListLit(items) => items.forall(isLiteralish)
    case MapLit(entries) => entries.forall(kv => isLiteralish(kv._2))
    case Neg(x) => isLiteralish(x)
    case Bin(_, l, r) => isLiteralish(l) && isLiteralish(r)
    case _ => false
  }

  def check(q: Query): Unit = q.parts.foreach(checkSingle)

  private def checkSingle(sq: SingleQuery): Unit = {
    var scope = Map.empty[String, Kind]

    def bindPattern(p: PathPat, creating: Boolean,
        boundBefore: Map[String, Kind]): Unit = {
      // named path: the variable must be fresh, and must not collide with
      // any entity variable of the same pattern (Match6 [21-23])
      p.pathVar.foreach { pv =>
        if (scope.contains(pv))
          fail(s"VariableAlreadyBound: $pv is already declared")
        val entityVars = (p.head.variable.toList ++
          p.tail.flatMap { case (r, n) => r.variable.toList ++
            n.variable.toList }).toSet
        if (entityVars.contains(pv))
          fail(s"VariableAlreadyBound: $pv is already declared")
        scope += pv -> VPath
      }
      def bindNode(np: NodePat, singleNodePath: Boolean): Unit =
        np.variable.foreach { v =>
          scope.get(v) match {
            case Some(VLit) => fail(
              s"VariableTypeConflict: $v is bound to a value, not a node")
            case Some(VListVal) => fail(
              s"VariableTypeConflict: $v is bound to a list/map, " +
                "not a node")
            case Some(VRel) => fail(
              s"VariableTypeConflict: $v is bound to a relationship")
            case Some(VPath) => fail(
              s"VariableAlreadyBound: $v is already declared as a path")
            case Some(VNode | VValue) if creating =>
              // reusing a bound node inside CREATE is legal only as a
              // bare endpoint of a relationship pattern (Create1 [11-17]);
              // an (even empty) property map re-defines the node
              if (np.label.nonEmpty || np.props.nonEmpty ||
                  np.bracesGiven ||
                  (singleNodePath && boundBefore.contains(v)))
                fail(s"VariableAlreadyBound: $v is already declared")
            case _ => ()
          }
          if (scope.get(v) != Some(VValue)) scope += v -> VNode
        }
      def bindRel(rp: RelPat): Unit = rp.variable.foreach { v =>
        scope.get(v) match {
          case Some(VLit) => fail(
            s"VariableTypeConflict: $v is bound to a value")
          case Some(VListVal) if rp.varLen.isEmpty => fail(
            s"VariableTypeConflict: $v is bound to a list/map (lists " +
              "bind only in variable-length positions)")
          case Some(VNode) => fail(
            s"VariableTypeConflict: $v is bound to a node")
          case Some(VPath) => fail(
            s"VariableAlreadyBound: $v is already declared as a path")
          case Some(VRel) if creating => fail(
            s"VariableAlreadyBound: $v is already declared")
          case _ => ()
        }
        if (scope.get(v) != Some(VValue) && scope.get(v) != Some(VListVal))
          scope += v -> VRel
      }
      bindNode(p.head, p.tail.isEmpty)
      p.tail.foreach { case (rp, np) => bindRel(rp); bindNode(np, false) }
    }

    def checkProjection(pr: Projection, isReturn: Boolean): Unit = {
      // duplicate output names (Return4 [10] ColumnNameConflict). RETURN
      // may repeat the SAME expression under one name — the reference
      // emits the column twice (test_results.py test08: `RETURN
      // max(a.val), max(a.val)`); only DIFFERENT expressions conflict.
      // WITH stays strict either way: its outputs become frame variables,
      // which cannot be ambiguous.
      val named = pr.items.flatMap {
        case (Variable("*"), _) => None
        case (e @ Variable(v), alias) => Some((alias.getOrElse(v), e))
        case (e, Some(a)) => Some((a, e))
        case _ => None
      }
      named.groupBy(_._1).collectFirst {
        case (n, xs) if xs.size > 1 &&
          (!isReturn || xs.map(_._2).distinct.size > 1) => n
      }.foreach(n => fail(
        s"ColumnNameConflict: multiple result columns named '$n'"))
      // non-deterministic functions inside aggregates (Return6 [15])
      val aggNames = Set("count", "sum", "avg", "min", "max", "collect",
        "stdev", "stdevp", "percentiledisc", "percentilecont")
      def scan(e: Expr): Unit = foreachExpr(e) {
        case Fn(a, args, _) if aggNames(a) =>
          args.foreach(arg => foreachExpr(arg) {
            case Fn("rand" | "randomuuid", _, _) => fail(
              "NonConstantExpression: non-deterministic function inside " +
                "an aggregate")
            // nested aggregation (ast_validations.c — the reference's
            // exact message, test_function_calls.py test01)
            case Fn(inner, _, _) if aggNames(inner) => fail(
              "Can't use aggregate functions inside of aggregate functions")
            case _ => ()
          })
        case _ => ()
      }
      pr.items.foreach(i => scan(i._1))
      // rebuild scope from the projection (WITH/RETURN re-scope)
      val star = pr.items.exists(_._1 == Variable("*"))
      val next = pr.items.flatMap {
        case (Variable("*"), _) => Nil
        case (Variable(v), alias) =>
          List(alias.getOrElse(v) -> scope.getOrElse(v, VValue))
        case (e, Some(a)) =>
          val k: Kind = e match {
            case _ if isLiteralish(e) => VLit
            case _: ListLit | _: MapLit => VListVal
            case _ => VValue
          }
          List(a -> k)
        case (e, None) => Nil // unaliased expression: text-named value col
      }.toMap
      scope = if (star) scope ++ next else next
    }

    // clause order: a reading clause (MATCH/UNWIND/CALL) may not follow
    // an updating clause in the same WITH scope
    // (`ast_validations.c:1060-1082`)
    var updatingSeen = false
    sq.clauses.foreach { cl =>
      cl match {
        case _: Create | _: Merge | _: SetClause | _: Delete =>
          updatingSeen = true
        case _: With => updatingSeen = false
        case m: Match if updatingSeen => fail(
          s"A WITH clause is required to introduce ${
            if (m.optional) "OPTIONAL MATCH" else "MATCH"
          } after an updating clause.")
        case _: Unwind if updatingSeen => fail(
          "A WITH clause is required to introduce UNWIND after an " +
            "updating clause.")
        case _: CallProc if updatingSeen => fail(
          "A WITH clause is required to introduce CALL after an " +
            "updating clause.")
        case _ => ()
      }
    }

    sq.clauses.foreach {
      case Match(_, paths, _) =>
        val before = scope
        // a relationship variable binds at most once per MATCH pattern
        // (TCK Match3 [29]; re-matching across clauses stays legal)
        paths.flatMap(_.tail.flatMap(_._1.variable))
          .groupBy(identity).collectFirst {
            case (v, xs) if xs.size > 1 => v
          }.foreach(v => fail("RelationshipUniquenessViolation: " +
            s"relationship variable $v used twice in one pattern"))
        paths.foreach(bindPattern(_, creating = false, before))
      case Create(paths) =>
        val before = scope
        paths.foreach(bindPattern(_, creating = true, before))
      case Merge(path, _, _) =>
        // MERGE's own validator covers rebinding; record bindings only
        (path.head :: path.tail.map(_._2)).foreach(_.variable.foreach(v =>
          scope += v -> VNode))
        path.tail.foreach(_._1.variable.foreach(v => scope += v -> VRel))
        path.pathVar.foreach(pv => scope += pv -> VPath)
      case Unwind(_, alias) =>
        if (scope.contains(alias))
          fail(s"VariableAlreadyBound: $alias is already declared")
        scope += alias -> VValue
      case With(proj, _) => checkProjection(proj, isReturn = false)
      case Return(proj) => checkProjection(proj, isReturn = true)
      case CallProc(_, _, yields, _, _) =>
        yields.foreach { case (c, alias) =>
          scope += alias.getOrElse(c) -> VValue }
      case _ => () // SET/DELETE/index DDL bind nothing new
    }
  }
}
