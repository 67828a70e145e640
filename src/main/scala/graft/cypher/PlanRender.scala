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
    // stats-served count (reduce_count.c): the answer comes from graph
    // statistics — no scan, no traverse, no aggregate in the plan
    // (test_optimizations_plan.py tests 01-10 assert exactly this)
    if (session.statsCountTarget(ast).isDefined)
      return "Results\n    Project"
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
    def nodeStr(np: Ast.NodePat): String = {
      // internal rebind names (a scheduled reuse of an anonymous node)
      // display as anonymous, like the reference's op headers
      val v = np.variable.filterNot(_.startsWith("__")).getOrElse("")
      s"($v${np.label.fold("")(l => s":$l")})"
    }
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
    def pathStr(p: Ast.PathPat): String =
      p.tail.foldLeft(nodeStr(p.head)) { case (acc, (r, n)) =>
        acc + relStr(r) + nodeStr(n)
      }

    /** id(n) <cmp> <const> in WHERE promotes the scan to an id seek — the
      * same rule the translator's seekById/id-filter path applies; like the
      * reference's `_reduce_scans` both equality and range comparisons
      * qualify (`op_node_by_id_seek.c` takes an UnsignedRange).
      */
    def idSeek(where: Option[Ast.Expr], v: String): Boolean = {
      val cmp = Set("=", "<", "<=", ">", ">=")
      def check(e: Ast.Expr): Boolean = e match {
        case Ast.Bin(op, Ast.Fn("id", List(Ast.Variable(`v`)), _), rhs)
            if cmp(op) => isConstE(rhs)
        case Ast.Bin(op, lhs, Ast.Fn("id", List(Ast.Variable(`v`)), _))
            if cmp(op) => isConstE(lhs)
        case Ast.Bin("AND", l, r) => check(l) || check(r)
        case _ => false
      }
      where.exists(check)
    }
    def isConstE(e: Ast.Expr): Boolean = e match {
      case Ast.LitInt(_) | Ast.Param(_) => true
      case _ => false
    }

    /** A WHERE conjunct (or inline pattern prop) the index on
      * (label, prop) can serve: comparisons / scalar-list IN / range() /
      * STARTS WITH / distance() ranges — the reference's
      * `optimizations/utilize_indices.c` surface (test_index_scans.py).
      * A nested-array IN stays a label scan (its test04).
      */
    def idxSarg(where: Option[Ast.Expr], v: String, prop: String): Boolean = {
      val cmp = Set("=", "<", "<=", ">", ">=", "STARTSWITH")
      def propOf(e: Ast.Expr): Boolean = e match {
        case Ast.Prop(Ast.Variable(`v`), `prop`) => true
        case Ast.Fn("distance", args, _) => args.exists(propOf)
        case _ => false
      }
      def constish(e: Ast.Expr): Boolean = Translator.isPureLit(e) ||
        e.isInstanceOf[Ast.Param] || (e match {
          case Ast.Fn("point", _, _) => true
          case _ => false
        })
      def scalarList(e: Ast.Expr): Boolean = e match {
        // IN [] is an EMPTY index iterator in the reference — still an
        // index scan; a nested array disqualifies (test04)
        case Ast.ListLit(items) => items.forall {
          case _: Ast.ListLit => false
          case x => Translator.isPureLit(x)
        }
        case Ast.Fn("range", _, _) => true
        case _: Ast.Param => true
        case _ => false
      }
      // a distance() leaf only qualifies as a BOUNDED circle (< / <=,
      // geo index range — test_index_scans.py test13); other props take
      // any comparison
      def distOk(side: Ast.Expr, opOnProp: String): Boolean = side match {
        case Ast.Fn("distance", _, _) => opOnProp == "<" || opOnProp == "<="
        case _ => true
      }
      def flip(op: String): String = op match {
        case "<" => ">"
        case "<=" => ">="
        case ">" => "<"
        case ">=" => "<="
        case o => o
      }
      def check(e: Ast.Expr): Boolean = e match {
        case Ast.Bin(op, l, r) if cmp(op) =>
          (propOf(l) && constish(r) && distOk(l, op)) ||
            (propOf(r) && constish(l) && distOk(r, flip(op)))
        case Ast.Bin("IN", l, r) if propOf(l) => scalarList(r)
        case Ast.Bin("AND", l, r) => check(l) || check(r)
        case _ => false
      }
      where.exists(check)
    }

    /** Does the whole WHERE let index scans replace the label scan for
      * `v`? AND needs ONE servable conjunct; an OR needs BOTH sides
      * servable by SOME index on the label (the reference unions the
      * iterators — `p.name IN […] OR p.age = 33` stays an Index Scan).
      */
    def idxServed(where: Option[Ast.Expr], v: String,
        idxProps: Seq[String]): Boolean = {
      def served(e: Ast.Expr): Boolean = e match {
        case Ast.Bin("AND", l, r) => served(l) || served(r)
        case Ast.Bin("OR", l, r) => served(l) && served(r)
        case leaf => idxProps.exists(p => idxSarg(Some(leaf), v, p))
      }
      where.exists(served)
    }

    def scanOp(np: Ast.NodePat, where: Option[Ast.Expr]): Op = {
      val v = nodeName(np)
      if (v.nonEmpty && idSeek(where, v)) np.label match {
        // labeled id-constrained scan carries the reference's combined op
        // name (`op_node_by_label_scan.c:52`)
        case Some(l) => Op("Node By Label and ID Scan", s"($v:$l)")
        case None => Op("NodeByIdSeek", s"($v)")
      } else np.label match {
        case Some(l) =>
          // an index on this label that a predicate (WHERE conjunct or
          // inline equality prop) can serve renders as the reference's
          // Index Scan — mirroring the execution, which scans this
          // label's SORTED index view (CypherSession.indexedGraph) with
          // the predicate pushed into it
          val idxProps = session.propIndexList.collect {
            case (`l`, p) => p
          }
          val served = idxProps.exists(p => np.props.exists(_._1 == p)) ||
            (v.nonEmpty && idxServed(where, v, idxProps))
          if (served) Op("Index Scan", s"($v:$l)")
          else Op("Node By Label Scan", s"($v:$l)")
        case None => Op("All Node Scan", s"($v)")
      }
    }

    def pathOps(p0: Ast.PathPat, where: Option[Ast.Expr],
        conjs: List[Ast.Expr] = Nil,
        placed: scala.collection.mutable.Set[Ast.Expr] =
          scala.collection.mutable.Set.empty): Op = {
      // the SAME anchor-reversal decision the translation makes (legacy
      // per-path shape — MATCH clauses schedule hop-by-hop in matchOps)
      val frame = Translator.Frame(session.graph.nodes.limit(0),
        bound.map(_ -> Translator.KNode).toMap)
      val p = Translator.reorderPath(ctx, frame, p0,
        Translator.filteredVars(where))
      // early filter placement (`optimizations/filter_placement`): a WHERE
      // conjunct reading only THIS path's variables renders directly above
      // the op that binds the last of them; inline property constraints
      // render as Filter over their scan/traverse (reference scans carry
      // no predicates). Conjuncts touching outer streams stay with the
      // branch logic below (Value Hash Join / branch wrapping).
      val pathVars = ((p0.head :: p0.tail.map(_._2)).flatMap(_.variable) ++
        p0.tail.flatMap(_._1.variable)).toSet
      val candidates = conjs.filter { c =>
        val cv = exprVars(c)
        cv.nonEmpty && cv.subsetOf(pathVars)
      }
      var localBound = pathVars.intersect(bound)
      def wrapReady(tree0: Op): Op = {
        val ready = candidates.filter(c => !placed(c) &&
          exprVars(c).subsetOf(localBound))
        if (ready.isEmpty) tree0
        else { ready.foreach(placed += _)
          Op("Filter", children = List(tree0)) }
      }
      val headBound = bound.contains(nodeName(p.head))
      var tree: Op =
        if (headBound) Op("Argument", nodeStr(p.head)) // bound: no new scan
        else scanOp(p.head, where)
      bound ++= p.head.variable
      localBound ++= p.head.variable
      if (p.head.props.nonEmpty && !headBound)
        tree = Op("Filter", children = List(tree))
      tree = wrapReady(tree)
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
        localBound ++= r.variable ++ to.variable
        if (to.props.nonEmpty || r.props.nonEmpty)
          tree = Op("Filter", children = List(tree))
        tree = wrapReady(tree)
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
        // branches: independent pattern streams within this MATCH, each
        // with its variable scope — the unit the reference's
        // optimizations work on (filter placement over minimal branch
        // groups, Cartesian Product splitting, Value Hash Join). The
        // upstream pipeline participates as a branch of its own (a
        // consecutive MATCH in the same scope joins/chains against it,
        // exactly like a comma-separated pattern).
        // filter compaction (reduce true filters, `optimizations/
        // compact_filters.c`): constant-TRUE conjuncts build no Filter op;
        // constant-false ones stay (reference keeps them — test20)
        val allConjs = m.where.map(splitAnd).getOrElse(Nil)
          .filterNot(c => constBool(c).contains(true))
        // pattern-predicate conjuncts render as (Anti) Semi Apply over the
        // filtered stream (`op_semi_apply.c`; the translator executes them
        // as left_semi/left_anti joins) — property conjuncts stay Filters
        // BELOW the apply (test_path_filter.py test14 asserts
        // `Semi Apply / Filter / Node By Label Scan` for either conjunct
        // order, which also makes the shape order-insensitive here)
        val (patConjs, conjs0) = allConjs.partition {
          case Ast.PatternPred(_) | Ast.Not(Ast.PatternPred(_)) => true
          case _ => false
        }
        val placed = scala.collection.mutable.Set.empty[Ast.Expr]
        var branches = Vector.empty[(Op, Set[String])]
        if (!m.optional) current.foreach { c =>
          branches :+= ((c, bound))
          current = None
        }
        val frame0 = Translator.Frame(session.graph.nodes.limit(0),
          bound.map(_ -> Translator.KNode).toMap)
        val sched = if (m.optional) None
          else Translator.traversalOrder(ctx, frame0, m.paths,
            Translator.filteredVars(m.where))
        sched match {
          case Some(segs) =>
            // hop-granular greedy schedule (the translation's actual
            // order): each segment extends the branch holding its bound
            // endpoint; a both-ends-bound hop bridging two branches joins
            // them (Expand Into over their product); inline props and
            // fully-bound conjuncts filter as early as possible
            val matchVars = m.paths.flatMap(p =>
              (p.head :: p.tail.map(_._2)).flatMap(_.variable) ++
                p.tail.flatMap(_._1.variable)).toSet
            def inm(np: Ast.NodePat): String =
              np.variable.getOrElse(Translator.nameOf(np))
            def wrapReady(i: Int): Unit = {
              val (bt, bv) = branches(i)
              val ready = conjs0.filter(c => !placed(c) && {
                val cv = exprVars(c)
                cv.nonEmpty && cv.subsetOf(matchVars) && cv.subsetOf(bv)
              })
              if (ready.nonEmpty) {
                ready.foreach(placed += _)
                branches = branches.updated(i,
                  (Op("Filter", children = List(bt)), bv))
              }
            }
            segs.foreach { case (_, seg) =>
              val hn = inm(seg.head)
              val at = branches.indexWhere(_._2.contains(hn))
              if (seg.tail.isEmpty) {
                if (at == -1) {
                  var t: Op = scanOp(seg.head, m.where)
                  bound ++= seg.head.variable
                  if (seg.head.props.nonEmpty)
                    t = Op("Filter", children = List(t))
                  branches :+= ((t, Set(hn)))
                  wrapReady(branches.size - 1)
                } else if (seg.head.props.nonEmpty ||
                    seg.head.label.nonEmpty) {
                  // re-match of a bound variable: its predicates filter
                  val (bt, bv) = branches(at)
                  branches = branches.updated(at,
                    (Op("Filter", children = List(bt)), bv))
                }
              } else {
                val (r, to) = seg.tail.head
                val tn = inm(to)
                val toAt = branches.indexWhere(_._2.contains(tn))
                val (srcIdx, closing) =
                  if (at == -1 && toAt == -1)
                    sys.error("unanchored hop segment") // cannot happen
                  else if (at == -1) (toAt, false)
                  else (at, toAt != -1)
                if (closing && toAt != srcIdx) {
                  // bridge two branches: product, then the hop checks it
                  val (bt1, bv1) = branches(srcIdx)
                  val (bt2, bv2) = branches(toAt)
                  val cp = Op("Cartesian Product",
                    children = List(bt1, bt2))
                  var t = Op("Expand Into", hopStr(seg.head, r, to),
                    List(cp))
                  if (to.props.nonEmpty || r.props.nonEmpty)
                    t = Op("Filter", children = List(t))
                  val keep = branches.indices
                    .filterNot(i => i == srcIdx || i == toAt)
                  val merged = (t, bv1 ++ bv2 ++ r.variable)
                  val pos = math.min(srcIdx, toAt)
                  val before = branches.zipWithIndex.take(pos).collect {
                    case (b, i) if keep.contains(i) => b
                  }
                  branches = (before :+ merged) ++
                    branches.zipWithIndex.drop(pos).collect {
                      case (b, i) if keep.contains(i) => b
                    }
                  bound ++= r.variable ++ to.variable
                  wrapReady(before.size)
                } else {
                  val (bt, bv) = branches(srcIdx)
                  val name =
                    if (closing) "Expand Into" else "Conditional Traverse"
                  var t = Op(name, hopStr(seg.head, r, to), List(bt))
                  if (to.props.nonEmpty || r.props.nonEmpty)
                    t = Op("Filter", children = List(t))
                  bound ++= r.variable ++ to.variable
                  branches = branches.updated(srcIdx,
                    (t, bv ++ r.variable ++ to.variable + tn))
                  wrapReady(srcIdx)
                }
              }
            }
          case None =>
            m.paths.foreach { p =>
              val pVars = (p.head.variable.toSeq ++ p.tail.flatMap {
                case (r, n) => r.variable ++ n.variable }).toSet
              val ops = pathOps(p, m.where, conjs0, placed)
              branches.indexWhere(_._2.intersect(pVars).nonEmpty) match {
                case -1 => branches :+= ((ops, pVars))
                case i =>
                  val (bt, bv) = branches(i)
                  branches = branches.updated(i,
                    (chainOnto(ops, bt), bv ++ pVars))
              }
            }
        }
        val conjs = conjs0.filterNot(placed)
        var topConjs = List.empty[Ast.Expr]
        conjs.foreach { c =>
          val cv = exprVars(c)
          val hit = branches.indices.filter(i =>
            branches(i)._2.intersect(cv).nonEmpty)
          def wrap(i: Int): Unit = {
            val (bt, bv) = branches(i)
            branches = branches.updated(i,
              (Op("Filter", children = List(bt)), bv))
          }
          def mergeInvolved(name: String, is: Seq[Int],
              filter: Boolean): Unit = {
            val kids = is.map(branches(_)._1).toList
            val vars = is.map(branches(_)._2).reduce(_ ++ _)
            var merged = Op(name, children = kids)
            if (filter) merged = Op("Filter", children = List(merged))
            val keep = branches.indices.filterNot(is.contains(_))
            val at = is.min
            branches = (branches.zipWithIndex.take(at).collect {
              case (b, i) if keep.contains(i) => b
            } :+ ((merged, vars))) ++
              branches.zipWithIndex.drop(at).collect {
                case (b, i) if keep.contains(i) && i != at => b
              }
          }
          c match {
            case _ if hit.isEmpty => topConjs :+= c
            case _ if hit.size == 1 => wrap(hit.head)
            // cross-branch equality ⇒ Value Hash Join (op_value_hash_join
            // .c via optimizations/apply_join.c): the translator's
            // filter-into-join — Catalyst plans the equi-join, never the
            // cross product
            case Ast.Bin("=", l, r) if hit.size == 2 && {
                val (lv, rv) = (exprVars(l), exprVars(r))
                val lIn = branches.indices.filter(i =>
                  branches(i)._2.intersect(lv).nonEmpty)
                val rIn = branches.indices.filter(i =>
                  branches(i)._2.intersect(rv).nonEmpty)
                lIn.size == 1 && rIn.size == 1 && lIn != rIn
              } =>
              mergeInvolved("Value Hash Join", hit, filter = false)
            // a conjunct spanning branches groups them under ONE n-ary
            // Cartesian Product with the Filter directly above (the
            // reference's CP splitting keeps unrelated streams outside)
            case _ => mergeInvolved("Cartesian Product", hit, filter = true)
          }
        }
        var tree = branches.map(_._1).toList match {
          case Nil => Op("Argument")
          case List(single) => single
          case several => Op("Cartesian Product", children = several)
        }
        if (topConjs.nonEmpty) tree = Op("Filter", children = List(tree))
        patConjs.foreach {
          case Ast.PatternPred(p) =>
            tree = Op("Semi Apply", children = List(tree, pathOps(p, None)))
          case Ast.Not(Ast.PatternPred(p)) =>
            tree = Op("Anti Semi Apply",
              children = List(tree, pathOps(p, None)))
          case _ => ()
        }
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
        bound += u.alias
        stack(Op("Unwind", u.alias, current.toList))
      case w: Ast.With =>
        val agg = w.proj.items.exists { case (e, _) =>
          Translator.containsAgg(e) }
        // WITH … WHERE: when the predicate only reads pass-through
        // variables (aliases of plain variables), Catalyst pushes the
        // filter through the projection — the reference places it the
        // same way (test_with_clause.py test10 asserts Filter directly
        // above Apply, but directly above Project when the predicate
        // reads a COMPUTED alias)
        val passThrough: Map[String, Boolean] = w.proj.items.flatMap {
          case (Ast.Variable(n), None) => Some(n -> true)
          case (e, Some(a)) => Some(a -> e.isInstanceOf[Ast.Variable])
          case _ => None
        }.toMap
        val pushable = !agg && w.where.exists(cond =>
          exprVars(cond).forall(v => passThrough.getOrElse(v, false)))
        var tree = current
        if (pushable)
          tree = Some(Op("Filter", children = tree.toList))
        var top = projectionOps(w.proj, agg, tree)
        if (w.where.isDefined && !pushable)
          top = Op("Filter", children = List(top))
        current = Some(top)
        bound = w.proj.items.flatMap {
          case (Ast.Variable(n), None) => Some(n)
          case (_, as) => as
        }.toSet
      case r: Ast.Return =>
        val agg = r.proj.items.exists { case (e, _) =>
          Translator.containsAgg(e) }
        current = Some(projectionOps(r.proj, agg, current))
      case c: Ast.CallProc =>
        // YIELD columns are bound downstream: a MATCH anchored on one
        // chains onto the call (reference: execution begins at the
        // procedure and proceeds into the traversal — test_bound_variables
        // test03 asserts ProcedureCall DEEPER than Conditional Traverse)
        bound ++= c.yields.map { case (col0, alias) => alias.getOrElse(col0) }
        stack(Op("ProcedureCall", c.name, current.toList))

      // ── mutating clauses (op names per op.h; EXPLAIN renders the
      // compile-time tree, nothing executes) ───────────────────────────
      case c: Ast.Create =>
        val detail = c.paths.map(p => pathStr(p)).mkString(", ")
        stack(Op("Create", detail, current.toList))
        bound ++= c.paths.flatMap(p => p.head.variable.toSeq ++
          p.tail.flatMap { case (r, n) => r.variable ++ n.variable })
      case m: Ast.Merge =>
        // op_merge.h three-stream shape: optional bound-variable stream,
        // then the match stream (Argument-tapped when variables are
        // bound), then the MergeCreate stream
        val detail = pathStr(m.path)
        val boundStream = current.toList
        current = None
        val matchStream = pathOps(m.path, None)
        val createStream = Op("MergeCreate", detail,
          if (boundStream.nonEmpty) List(Op("Argument")) else Nil)
        stack(Op("Merge", detail,
          boundStream ++ List(matchStream, createStream)))
      case _: Ast.SetClause =>
        stack(Op("Update", children = current.toList))
      case d: Ast.Delete =>
        stack(Op("Delete", if (d.detach) "detach" else "",
          current.toList))
      case i: Ast.CreateIndex =>
        stack(Op("Create Index",
          s":${i.label}(${i.props.mkString(", ")})", current.toList))
      case i: Ast.DropIndex =>
        stack(Op("Drop Index", s":${i.label}(${i.prop})", current.toList))
    }
    current.getOrElse(Op("Argument"))
  }

  private def splitAnd(e: Ast.Expr): List[Ast.Expr] = e match {
    case Ast.Bin("AND", l, r) => splitAnd(l) ++ splitAnd(r)
    case other => List(other)
  }

  private def exprVars(e: Ast.Expr): Set[String] = {
    val out = scala.collection.mutable.Set[String]()
    Ast.foreachExpr(e) {
      case Ast.Variable(n) => out += n
      case _ => ()
    }
    out.toSet
  }

  /** Constant-fold a boolean predicate over literals — the rendering
    * analogue of the reference's filter compaction (a conjunct that folds
    * to TRUE builds no Filter op; FALSE ones stay, matching
    * `test_optimizations_plan.py` tests 19/20/24).
    */
  private def constBool(e: Ast.Expr): Option[Boolean] = e match {
    case Ast.LitBool(b) => Some(b)
    case Ast.Not(x) => constBool(x).map(!_)
    case Ast.Bin("AND", l, r) =>
      for (a <- constBool(l); b <- constBool(r)) yield a && b
    case Ast.Bin("OR", l, r) =>
      for (a <- constBool(l); b <- constBool(r)) yield a || b
    case Ast.Bin(op @ ("=" | "<>" | "<" | "<=" | ">" | ">="), l, r) =>
      (constNum(l), constNum(r)) match {
        case (Some(a), Some(b)) => Some(op match {
          case "=" => a == b
          case "<>" => a != b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
        })
        case _ => None
      }
    case _ => None
  }

  private def constNum(e: Ast.Expr): Option[Double] = e match {
    case Ast.LitInt(v) => Some(v.toDouble)
    case Ast.LitFloat(v) => Some(v)
    case Ast.Neg(x) => constNum(x).map(-_)
    case _ => None
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
