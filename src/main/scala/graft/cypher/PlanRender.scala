package graft.cypher

/** Reference-shaped operator-tree rendering for read queries — the
  * `GRAPH.EXPLAIN` wire format (`src/commands/cmd_explain.c` +
  * `execution_plan_debug.c:11-27`: root first, children indented 4 spaces,
  * detail after the op name). Op names match the reference registry
  * exactly (`src/execution_plan/ops/op.h:19-54` and each op's `.name`
  * string), so flow-test-style plan assertions
  * (`tests/flow/test_optimizations_plan.py`) port verbatim.
  *
  * The tree mirrors the TRANSLATOR's structural decisions, not a separate
  * planner: paths go through [[Translator.reorderPath]] (same
  * statistics-driven anchor reversal the real translation applies), scans
  * pick Node By Id Seek / Node By Label Scan / All Node Scan by the same
  * rules, bound-variable re-use chains instead of re-scanning, and
  * disjoint patterns meet in a Cartesian Product. It is a rendering of
  * the logical operator pipeline; the physical Catalyst plan (what
  * actually executes) stays available via `Graft.explain`.
  */
private[cypher] object PlanRender {

  private final case class Op(name: String, detail: String = "",
      children: List[Op] = Nil) {
    def line: String = if (detail.isEmpty) name else s"$name | $detail"
  }

  def render(session: CypherSession, ast: Ast.Query): String = {
    val parts = ast.parts.map(renderPart(session, _))
    val tree = parts match {
      case List(single) => Op("Results", children = List(single))
      case several =>
        // UNION: each branch keeps its own projection; the reference
        // combines them under a Join op (op_join.c), with a Distinct
        // above it unless every combinator was UNION ALL
        val joined = Op("Join", children = several)
        val body =
          if (ast.unionAll.forall(identity)) joined
          else Op("Distinct", children = List(joined))
        Op("Results", children = List(body))
    }
    val sb = new StringBuilder
    def walk(op: Op, depth: Int): Unit = {
      sb ++= (" " * (4 * depth)) + op.line + "\n"
      op.children.foreach(walk(_, depth + 1))
    }
    walk(tree, 0)
    sb.result().stripLineEnd
  }

  /** One UNION branch / the whole single query body: rooted at the
    * part's projection — the shared Results root is added by [[render]].
    */
  private def renderPart(session: CypherSession,
      part: Ast.SingleQuery): Op = {
    val ctx = Translator.Ctx(session.graph, Map.empty, Some(session))
    var current: Option[Op] = None
    var bound = Set.empty[String]

    def nodeName(np: Ast.NodePat): String = np.variable.getOrElse("")
    def nodeStr(np: Ast.NodePat): String =
      s"(${nodeName(np)}${np.label.fold("")(l => s":$l")})"
    def relStr(r: Ast.RelPat): String = {
      val types = if (r.types.isEmpty) "" else ":" + r.types.mkString("|")
      val star = r.varLen.fold("") { case (mn, mx) =>
        s"*$mn..${mx.fold("")(_.toString)}" }
      val core = s"[${r.variable.getOrElse("")}$types$star]"
      r.direction match {
        case 1 => s"-$core->"
        case -1 => s"<-$core-"
        case _ => s"-$core-"
      }
    }
    def hopStr(from: Ast.NodePat, r: Ast.RelPat, to: Ast.NodePat): String =
      s"${nodeStr(from)}${relStr(r)}${nodeStr(to)}"

    /** id(n) = <const> in WHERE promotes the scan to an id seek — the same
      * rule the translator's seekById path applies.
      */
    def idSeek(where: Option[Ast.Expr], v: String): Boolean = {
      def check(e: Ast.Expr): Boolean = e match {
        case Ast.Bin("=", Ast.Fn("id", List(Ast.Variable(`v`)), _), rhs) =>
          isConstE(rhs)
        case Ast.Bin("=", lhs, Ast.Fn("id", List(Ast.Variable(`v`)), _)) =>
          isConstE(lhs)
        case Ast.Bin("AND", l, r) => check(l) || check(r)
        case _ => false
      }
      where.exists(check)
    }
    def isConstE(e: Ast.Expr): Boolean = e match {
      case Ast.LitInt(_) | Ast.Param(_) => true
      case _ => false
    }

    def scanOp(np: Ast.NodePat, where: Option[Ast.Expr]): Op = {
      val v = nodeName(np)
      if (v.nonEmpty && idSeek(where, v))
        Op("NodeByIdSeek", s"(${v}${np.label.fold("")(l => s":$l")})")
      else np.label match {
        case Some(l) => Op("Node By Label Scan", s"($v:$l)")
        case None => Op("All Node Scan", s"($v)")
      }
    }

    def pathOps(p0: Ast.PathPat, where: Option[Ast.Expr]): Op = {
      // the SAME anchor-reversal decision the translation makes
      val frame = Translator.Frame(session.graph.nodes.limit(0),
        bound.map(_ -> Translator.KNode).toMap)
      val p = Translator.reorderPath(ctx, frame, p0)
      var tree: Op =
        if (bound.contains(nodeName(p.head)))
          Op("Argument", nodeStr(p.head)) // bound var: no new scan
        else scanOp(p.head, where)
      bound ++= p.head.variable
      var from = p.head
      p.tail.foreach { case (r, to) =>
        val name =
          if (r.varLen.isDefined)
            if (bound.contains(nodeName(to)))
              "Conditional Variable Length Traverse (Expand Into)"
            else "Conditional Variable Length Traverse"
          else if (bound.contains(nodeName(to))) "Expand Into"
          else "Conditional Traverse"
        tree = Op(name, hopStr(from, r, to), List(tree))
        bound ++= r.variable ++ to.variable
        from = to
      }
      tree
    }

    def stack(op: Op): Unit = current = Some(op)

    def projectionOps(proj: Ast.Projection, agg: Boolean,
        below: Option[Op]): Op = {
      var tree: Op =
        if (agg) Op("Aggregate", children = below.toList)
        else Op("Project", children = below.toList)
      if (proj.distinct && !agg) tree = Op("Distinct", children = List(tree))
      if (proj.orderBy.nonEmpty) tree = Op("Sort", children = List(tree))
      proj.skip.foreach(_ => tree = Op("Skip", children = List(tree)))
      proj.limit.foreach(_ => tree = Op("Limit", children = List(tree)))
      tree
    }

    part.clauses.foreach {
      case m: Ast.Match =>
        var sub: Option[Op] = None
        m.paths.foreach { p =>
          val shares = (p.head.variable.toSet ++
            p.tail.flatMap { case (r, n) => r.variable ++ n.variable })
            .exists(bound)
          val ops = pathOps(p, m.where)
          sub = sub match {
            case None => Some(ops)
            case Some(prev) =>
              if (shares) Some(chainOnto(ops, prev))
              else Some(Op("Cartesian Product", children = List(prev, ops)))
          }
        }
        var tree = sub.getOrElse(Op("Argument"))
        m.where.foreach(_ => tree = Op("Filter", children = List(tree)))
        if (m.optional) {
          tree = Op("Optional", children = List(tree))
          current.foreach(c => tree = Op("Apply", children = List(c, tree)))
          current = None
        } else current.foreach { c =>
          // a plain MATCH after bound state chains (bound anchors become
          // Arguments above) or cross-products with the upstream
          tree = chainOnto(tree, c)
        }
        stack(tree)
      case u: Ast.Unwind =>
        stack(Op("Unwind", u.alias, current.toList))
      case w: Ast.With =>
        val agg = w.proj.items.exists { case (e, _) =>
          Translator.containsAgg(e) }
        var tree = projectionOps(w.proj, agg, current)
        w.where.foreach(_ => tree = Op("Filter", children = List(tree)))
        current = Some(tree)
        bound = w.proj.items.flatMap {
          case (Ast.Variable(n), None) => Some(n)
          case (_, as) => as
        }.toSet
      case r: Ast.Return =>
        val agg = r.proj.items.exists { case (e, _) =>
          Translator.containsAgg(e) }
        current = Some(projectionOps(r.proj, agg, current))
      case c: Ast.CallProc =>
        stack(Op("ProcedureCall", c.name, current.toList))
      case other =>
        stack(Op(other.getClass.getSimpleName, children = current.toList))
    }
    current.getOrElse(Op("Argument"))
  }

  /** Chain `upper`'s deepest leaf onto `lower` — replaces the leaf
    * Argument/scan of a dependent pattern with the upstream pipeline (the
    * translator's join-on-bound-variable shape rendered as a chain).
    */
  private def chainOnto(upper: Op, lower: Op): Op =
    upper.children match {
      case Nil =>
        if (upper.name == "Argument") lower
        else Op("Cartesian Product", children = List(lower, upper))
      case kids =>
        upper.copy(children = kids.init :+ chainOnto(kids.last, lower))
    }
}
