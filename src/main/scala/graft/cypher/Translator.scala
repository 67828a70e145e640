package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cypher AST → DataFrame plan translator.
  *
  * The reference compiles MATCH patterns to GraphBLAS algebraic expressions
  * and runs a pull-based op tree (`/root/reference/src/execution_plan/`);
  * here every pattern element becomes a Catalyst join and every clause a
  * DataFrame transform — Catalyst then owns filter pushdown, join strategy,
  * partial aggregation (SURVEY.md §4: most reference optimizer passes
  * dissolve into built-in rules).
  *
  * Record ≡ DataFrame row; variables are columns: node/edge vars are structs
  * (id/label/props resp. id/src/dst/reltype/props), value vars are variant
  * structs (Values.variantType). Missing property ≡ NULL via element_at.
  */
object Translator {

  sealed trait Kind
  case object KNode extends Kind
  case object KEdge extends Kind
  case object KValue extends Kind
  /** named path: raw struct(nodes: array<node>, rels: array<edge>) —
    * the T_PATH analogue (`src/datatypes/path/sipath.h:19-73`).
    */
  case object KPath extends Kind

  /** A variable-length relationship variable: the LIST of traversed edge
    * structs (Cypher binds `-[rs:T*1..3]->` to a relationship list).
    */
  case object KRelList extends Kind

  /** the Volcano Record analogue (`src/execution_plan/record.h:18-44`):
    * df columns ↔ alias→entry mapping.
    */
  case class Frame(df: DataFrame, vars: Map[String, Kind],
      bindings: Map[String, Column] = Map.empty,
      bindingTypes: Map[String, DataType] = Map.empty) {
    /** Lambda-variable bindings resolve first and COMPOSE — a nested
      * comprehension's frame keeps every enclosing lambda's binding (an
      * override-based chain would drop the outer variable and fail
      * resolution, see lambdaExpr).
      */
    def col(name: String): Column =
      bindings.getOrElse(name, df(s"`$name`"))
    def has(name: String): Boolean =
      vars.contains(name) || bindings.contains(name)
    /** Flat pre-resolved property column (see [[propColName]]), if the scan
      * projected one for this (variable, key).
      */
    def propCol(v: String, k: String): Option[Column] = {
      val n = propColName(v, k)
      if (df.columns.contains(n)) Some(df(s"`$n`")) else None
    }
    /** Rebuild this frame around a derived DataFrame (layering adds temp
      * projection columns but keeps every original column). Subclasses
      * with custom name resolution (the WITH-WHERE alias view) override
      * so their mapping survives [[layerNested]].
      */
    def derive(newDf: DataFrame, newVars: Map[String, Kind]): Frame =
      Frame(newDf, newVars, bindings, bindingTypes)
  }

  case class TranslateError(msg: String) extends RuntimeException(msg)

  /** All variable names referenced anywhere in an expression tree
    * (generic Product walk — covers every AST node shape).
    */
  private def exprVars(e: Ast.Expr): Set[String] = {
    val acc = scala.collection.mutable.Set[String]()
    def go(x: Any): Unit = x match {
      case Ast.Variable(n) => acc += n
      case p: Product => p.productIterator.foreach(go)
      case l: Iterable[_] => l.foreach(go)
      case _ => ()
    }
    go(e)
    acc.toSet
  }

  private val AggFns = Set("count", "sum", "avg", "min", "max", "collect",
    "stdev", "stdevp", "percentiledisc", "percentilecont")

  /** Functions returning raw structs/arrays (not variants) — see
    * layerNested.noSpill.
    */
  private val StructFns =
    Set("startnode", "endnode", "nodes", "relationships")

  /** Functions whose arguments are shape-checked syntactically (entity
    * variables, map literals, path values) — layerNested leaves these calls
    * intact.
    */
  private val ShapeArgFns = Set("id", "labels", "type", "startnode",
    "endnode", "property", "point", "nodes", "relationships", "length",
    "indegree", "outdegree", "exists")

  def nodeStruct(df: DataFrame): Column =
    struct(df("id").as("id"), df("label").as("label"), df("props").as("props"))

  private var anonCounter = 0
  private def freshName(prefix: String): String = synchronized {
    anonCounter += 1; s"__${prefix}_$anonCounter"
  }

  // ═══════════════════════════════ queries ═══════════════════════════════
  /** Translate a read-only query to a result DataFrame (columns = return
    * items, values = variants or entity structs).
    */
  def translate(graph: PropertyGraph, q: Ast.Query,
      params: Map[String, Any] = Map.empty,
      session: Option[CypherSession] = None): DataFrame = {
    val parts = q.parts.map(p => translateSingle(graph, p, params, session))
    if (parts.size == 1) parts.head
    else {
      // UNION: sequence of (unionAll?) combines (`op_join.c` +
      // execution_plan.c:91-103 distinct for UNION)
      if (q.unionAll.distinct.size > 1)
        throw TranslateError(
          "Invalid combination of UNION and UNION ALL")
      var acc = parts.head
      q.unionAll.zip(parts.tail).foreach { case (all, df0) =>
        if (df0.columns.toSet != acc.columns.toSet)
          throw TranslateError(
            "All sub queries in a UNION must have the same return column " +
              s"names (${acc.columns.mkString(",")} vs ${df0.columns.mkString(",")})")
        // sides may bind the same column to different VALUE KINDS (a node
        // on one side, an edge or scalar on the other — the reference
        // collates them in one column, test_union.py test06): box entity
        // structs into the variant form wherever the Spark types disagree
        var df = df0
        acc.columns.foreach { cn =>
          val lt = acc.schema(cn).dataType
          val rt = df.schema(cn).dataType
          if (lt.sql != rt.sql) { // .sql ignores nullability
            acc = acc.withColumn(cn, entityToVariant(acc(cn), lt))
            df = df.withColumn(cn, entityToVariant(df(cn), rt))
          }
        }
        acc = acc.unionByName(df)
        if (!all) acc = dedupByIdentity(acc)
      }
      acc
    }
  }

  /** Lift an entity-struct column to the variant form (boxed tagged JSON,
    * the same shape entities take inside list values) so UNION sides of
    * different value kinds share one column type; variant and other
    * columns pass through unchanged.
    */
  private def entityToVariant(c: Column, dt: DataType): Column = dt match {
    case s: StructType if s.fieldNames.contains("reltype") &&
        s.fieldNames.contains("src") =>
      when(c.isNull, Values.vNull).otherwise(Values.vBoxed(boxEdge(c)))
    case s: StructType if s.fieldNames.contains("label") &&
        s.fieldNames.contains("props") =>
      when(c.isNull, Values.vNull).otherwise(Values.vBoxed(boxNode(c)))
    case _ => c
  }

  def translateSingle(graph: PropertyGraph, sq: Ast.SingleQuery,
      params: Map[String, Any],
      session: Option[CypherSession] = None): DataFrame =
    readFrame(graph, sq.clauses, params, session).df

  /** Run the read-clause prefix of a query (MATCH/UNWIND/WITH/RETURN/CALL) —
    * also the entry point for mutation statements that bind variables
    * before writing (MATCH … SET/DELETE/CREATE).
    */
  def readFrame(graph: PropertyGraph, clauses: List[Ast.Clause],
      params: Map[String, Any],
      session: Option[CypherSession] = None): Frame = {
    val spark = graph.nodes.sparkSession
    val unit = spark.range(1).select(lit(1).as("__unit"))
    var frame = Frame(unit, Map.empty)
    val ctx = Ctx(graph, params, session, collectPropUse(clauses),
      collectFullVars(clauses))
    clauses.foreach {
      case m: Ast.Match => frame = translateMatch(ctx, frame, m)
      case u: Ast.Unwind => frame = translateUnwind(ctx, frame, u)
      case w: Ast.With => frame = translateProjection(ctx, frame, w.proj,
        w.where, carryFlats = true)
      case c: Ast.CallProc =>
        frame = translateCall(ctx, frame, c,
          standalone = clauses == List(c))
      case r: Ast.Return =>
        frame = translateProjection(ctx, frame, r.proj, None)
      case other =>
        throw TranslateError(s"unsupported clause in read query: $other")
    }
    frame
  }

  case class Ctx(graph: PropertyGraph, params: Map[String, Any],
      session: Option[CypherSession] = None,
      propUse: Map[String, Set[String]] = Map.empty,
      fullVars: Option[Set[String]] = None,
      /** Late-bound parameter boxes for cached parameterized plans
        * ([[PointWrite]]): when set, `$p` translates to a [[graft.plans
        * .ParamRef]] placeholder instead of folding the current value in,
        * so the translated plan re-executes under new bindings. Param
        * surfaces that must branch on the VALUE at translation time
        * (`$map.key`, runtime SKIP/LIMIT, procedure args) read
        * `params` — which the cached path leaves empty — and so throw,
        * falling the statement back to fresh translation.
        */
      paramBoxes: Map[String, graft.plans.ParamBox] = Map.empty) {
    /** Does variable `v`'s struct need the full props map? (None ⇒ yes.) */
    def needsProps(v: String): Boolean = fullVars.forall(_.contains(v))
    /** Variables currently bound to pure literals by WITH (for the
      * compile-time type checks the TCK wants on e.g. `list[idx]` where
      * `idx` was aliased to 3.14 — updated in projection order).
      */
    val constVars = scala.collection.mutable.Map[String, Ast.Expr]()
    /** Edge variables generated for ANONYMOUS relationship patterns this
      * statement — under `edgeUniquenessScope = "named"` (reference
      * compat, `docs/known_limitations.md` "Relationship uniqueness in
      * patterns") these are exempt from cross-edge uniqueness filters.
      */
    val anonEdgeVars = scala.collection.mutable.Set[String]()
    /** Statically-proven variant tag per flat prop column
      * ([[propColName]] key): Some(t) = every scan that projected this
      * column constructs tag t for non-null values; None = conflicting or
      * unprovable. Feeds [[staticNativeCmp]].
      */
    val propTags = scala.collection.mutable.Map[String, Option[Int]]()
    def registerPropTag(colName: String, tag: Option[Int]): Unit =
      propTags(colName) = propTags.get(colName) match {
        case Some(prev) if prev != tag => None
        case _ => tag
      }
    /** Resolved uniqueness scope (see [[CypherSession.edgeUniquenessScope]]). */
    def namedOnlyUniqueness: Boolean =
      session.exists(_.edgeUniquenessScope == "named")
  }

  /** Name of the flat column a scan projects for property `k` of variable
    * `v` — `element_at(props, k)` resolved AT THE SCAN, before any join, so
    * [[graft.plans.VariantFoldRule]] collapses it to the underlying native
    * column (parquet-pruned, filter-pushable) and the props map is never
    * materialized unless the full entity is returned. The reference's
    * analogue is compiling property reads to attribute-id lookups at plan
    * build (`src/arithmetic/arithmetic_expression_construct.c`).
    */
  def propColName(v: String, k: String): String = s"__p:$v:$k"

  /** Static variant tag of property `key` as constructed by the scan view
    * `df`'s props map, when provably monomorphic: walks the view's
    * ALREADY-ANALYZED plan (no extra analysis pass) to the map constructor
    * defining `props` and reads the literal `t` field the variant
    * constructors (vInt/vFloat/vStr/vBool/vRetag) bake in. Conservative by
    * design — any unrecognized shape (props read raw from storage,
    * data-dependent tags, conditional map construction) yields None and
    * callers keep the generic variant path.
    */
  private[cypher] def staticPropTag(df: DataFrame, key: String)
      : Option[Int] = {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.plans.logical._
    // Some(Some(t)) = constructs tag t; Some(None) = provably null (does
    // not constrain the tag); None = unknown shape → give up
    def merge(xs: Seq[Option[Option[Int]]]): Option[Option[Int]] =
      if (xs.contains(None)) None
      else {
        val tags = xs.flatten.flatten.distinct
        if (tags.size > 1) None else Some(tags.headOption)
      }
    def tagOfValue(e: Expression): Option[Option[Int]] = e match {
      case Literal(null, _) => Some(None)
      case Alias(c, _) => tagOfValue(c)
      case c: Cast => tagOfValue(c.child)
      case CaseWhen(branches, elseV) =>
        merge((branches.map(_._2) ++ elseV.toSeq).map(tagOfValue))
      case If(_, a, b) => merge(Seq(tagOfValue(a), tagOfValue(b)))
      case s: CreateNamedStruct =>
        s.children.grouped(2).collectFirst {
          case Seq(Literal(n, _), v) if n != null && n.toString == "t" => v
        } match {
          case Some(Literal(t: Int, _)) => Some(Some(t))
          case _ => None
        }
      case _ => None
    }
    def mapEntryTag(e: Expression): Option[Option[Int]] = e match {
      case Literal(null, _) => Some(None)
      case Alias(c, _) => mapEntryTag(c)
      case c: Cast => mapEntryTag(c.child)
      case CaseWhen(branches, elseV) =>
        merge((branches.map(_._2) ++ elseV.toSeq).map(mapEntryTag))
      case If(_, a, b) => merge(Seq(mapEntryTag(a), mapEntryTag(b)))
      case m: CreateMap =>
        m.children.grouped(2).collectFirst {
          case Seq(Literal(k, _), v) if k != null && k.toString == key => v
        } match {
          case Some(v) => tagOfValue(v)
          case None => Some(None) // key never in the map → always absent
        }
      case _ => None
    }
    def defOf(plan: LogicalPlan, id: ExprId): Option[Option[Int]] =
      plan match {
        case Project(exprs, child) =>
          exprs.find(_.exprId == id) match {
            case Some(a: Alias) => a.child match {
              case ar: AttributeReference => defOf(child, ar.exprId)
              case other => mapEntryTag(other)
            }
            case Some(_: AttributeReference) => defOf(child, id)
            case _ => None
          }
        case u: Union =>
          val idx = u.output.indexWhere(_.exprId == id)
          if (idx < 0) None
          else merge(u.children.map(c => defOf(c, c.output(idx).exprId)))
        case other if other.children.size == 1 =>
          defOf(other.children.head, id)
        case _ => None // leaf relation: props is stored data → unknown
      }
    val analyzed = df.queryExecution.analyzed
    analyzed.output.find(_.name == "props")
      .flatMap(a => defOf(analyzed, a.exprId)).flatten
  }

  /** Pass 0 over a statement: which property keys does each variable ever
    * get asked for? Drives scan-time property projection (the graph-layer
    * twin of Catalyst column pruning — prune the *property bag* down to the
    * accessed keys before it crosses a join).
    */
  private[cypher] def collectPropUse(
      clauses: List[Ast.Clause]): Map[String, Set[String]] = {
    val acc = scala.collection.mutable.Map[String, Set[String]]()
    def expr(e: Ast.Expr): Unit = Ast.foreachExpr(e) {
      case Ast.Prop(Ast.Variable(n), k) =>
        acc(n) = acc.getOrElse(n, Set.empty) + k
      case Ast.PatternPred(p) => pathPat(p)
      // foreachExpr walks the comprehension's where/projection but not its
      // pattern — register the inner pattern's `{k: v}` property reads here
      case Ast.PatternComprehension(p, _, _) => pathPat(p)
      case _ => ()
    }
    def pathPat(p: Ast.PathPat): Unit = {
      def nodeP(np: Ast.NodePat): Unit = {
        np.props.foreach { case (k, e) =>
          expr(e)
          // a pattern prop {k: v} reads this variable's property k
          np.variable.foreach(v => acc(v) = acc.getOrElse(v, Set.empty) + k)
        }
      }
      def relP(rp: Ast.RelPat): Unit =
        rp.props.foreach { case (k, e) =>
          expr(e)
          rp.variable.foreach(v => acc(v) = acc.getOrElse(v, Set.empty) + k)
        }
      nodeP(p.head)
      p.tail.foreach { case (rp, np) => relP(rp); nodeP(np) }
    }
    def proj(pr: Ast.Projection): Unit = {
      pr.items.foreach(i => expr(i._1))
      pr.orderBy.foreach(si => expr(si.expr))
      pr.skip.foreach(expr); pr.limit.foreach(expr)
    }
    clauses.foreach {
      case m: Ast.Match => m.paths.foreach(pathPat); m.where.foreach(expr)
      case u: Ast.Unwind => expr(u.list)
      case w: Ast.With => proj(w.proj); w.where.foreach(expr)
      case r: Ast.Return => proj(r.proj)
      case c: Ast.CallProc =>
        c.args.foreach(expr); c.where.foreach(expr)
      case c: Ast.Create => c.paths.foreach(pathPat)
      case mg: Ast.Merge =>
        pathPat(mg.path)
        (mg.onMatch ++ mg.onCreate).foreach(si => expr(si.value))
      case s: Ast.SetClause => s.items.foreach(si => expr(si.value))
      case d: Ast.Delete => d.exprs.foreach(expr)
      case _: Ast.CreateIndex | _: Ast.DropIndex => () // DDL carries no exprs
    }
    acc.toMap
  }

  /** Pass 0b: which variables are ever needed as FULL entities (props map
    * included)? Everything else gets a props-less struct from the scan —
    * the scan then reads only id/label plus the accessed property columns.
    * Returns None ("assume everything full") when `RETURN *` defeats the
    * analysis.
    */
  private[cypher] def collectFullVars(
      clauses: List[Ast.Clause]): Option[Set[String]] = {
    val full = scala.collection.mutable.Set[String]()
    var sawStar = false
    // functions whose entity argument reads no properties
    val idOnlyFns = Set("id", "count")
    def expr(e: Ast.Expr): Unit = e match {
      case Ast.Variable("*") => sawStar = true
      case Ast.Variable(n) => full += n
      // startNode/endNode hydrate their result from BOUND NODE variables
      // matching the endpoint id (see trFn) — those sources must keep
      // their props (test_function_calls.py test16 reads
      // startNode(e).name); the cheap per-key pruning can't know which
      // node the id resolves to, so everything goes full
      case Ast.Fn(f, _, _) if f.toLowerCase == "startnode" ||
          f.toLowerCase == "endnode" || f.toLowerCase == "tojson" =>
        sawStar = true
      // a shortestPath EXPRESSION materializes its endpoints into the
      // path value — they need full props like any named path
      case Ast.Fn(f, args, _) if f.toLowerCase == "shortestpath" =>
        args.foreach {
          case Ast.PatternPred(p) => markPath(p)
          case a => expr(a)
        }
      case Ast.Prop(Ast.Variable(_), _) => () // property read only
      case Ast.Prop(t, _) => expr(t)
      case Ast.Fn(f, args, _) if idOnlyFns.contains(f.toLowerCase) =>
        args.foreach { case Ast.Variable(_) => (); case a => expr(a) }
      case Ast.PatternPred(p) =>
        p.head.props.foreach(kv => expr(kv._2))
        p.tail.foreach { case (rp, np) =>
          rp.props.foreach(kv => expr(kv._2))
          np.props.foreach(kv => expr(kv._2))
        }
      case Ast.ListLit(items) => items.foreach(expr)
      case Ast.MapLit(entries) => entries.foreach(kv => expr(kv._2))
      case Ast.Bin(_, l, r) => expr(l); expr(r)
      case Ast.Not(x) => expr(x)
      case Ast.Neg(x) => expr(x)
      case Ast.IsNull(x, _) => expr(x)
      case Ast.Fn(_, args, _) => args.foreach(expr)
      case Ast.CaseExpr(s, w, o) =>
        s.foreach(expr)
        w.foreach { case (a, b) => expr(a); expr(b) }
        o.foreach(expr)
      case Ast.Subscript(t, i) => expr(t); expr(i)
      case Ast.SliceExpr(t, f, to) => expr(t); f.foreach(expr); to.foreach(expr)
      case Ast.ListComprehension(_, l, w, p) =>
        expr(l); w.foreach(expr); p.foreach(expr)
      case Ast.Quantifier(_, _, l, p) => expr(l); expr(p)
      case Ast.PatternComprehension(p, w, pr) =>
        // a named-path comprehension ([p = (n)-->() | p]) materializes its
        // entities into path arrays — pin the whole pattern full, like any
        // named path; otherwise only pattern-prop exprs + body matter
        if (p.pathVar.isDefined) markPath(p)
        p.head.props.foreach(kv => expr(kv._2))
        p.tail.foreach { case (rp, np) =>
          rp.props.foreach(kv => expr(kv._2))
          np.props.foreach(kv => expr(kv._2))
        }
        w.foreach(expr); expr(pr)
      case _ => ()
    }
    def markPath(p: Ast.PathPat): Unit = {
      // named/shortest paths materialize their entities into path arrays —
      // anonymous members resolve through nameOf (identity-stable on the
      // cached AST), so they are pinned full too
      full += nameOf(p.head)
      p.tail.foreach { case (rp, np) => full += nameOf(rp); full += nameOf(np) }
    }
    def proj(pr: Ast.Projection): Unit = {
      pr.items.foreach(i => expr(i._1))
      pr.orderBy.foreach(si => expr(si.expr))
      pr.skip.foreach(expr); pr.limit.foreach(expr)
    }
    val projections = scala.collection.mutable.ArrayBuffer[Ast.Projection]()
    clauses.foreach {
      case m: Ast.Match =>
        m.paths.foreach { p =>
          if (p.pathVar.isDefined || p.shortest) markPath(p)
          p.head.props.foreach(kv => expr(kv._2))
          p.tail.foreach { case (rp, np) =>
            rp.props.foreach(kv => expr(kv._2))
            np.props.foreach(kv => expr(kv._2))
          }
        }
        m.where.foreach(expr)
      case u: Ast.Unwind => expr(u.list)
      case w: Ast.With => proj(w.proj); projections += w.proj; w.where.foreach(expr)
      case r: Ast.Return => proj(r.proj); projections += r.proj
      case c: Ast.CallProc =>
        c.args.foreach(expr); c.where.foreach(expr)
      case c: Ast.Create => c.paths.foreach { p =>
        markPath(p) // created entities carry their prop maps
        p.head.props.foreach(kv => expr(kv._2))
        p.tail.foreach { case (rp, np) =>
          rp.props.foreach(kv => expr(kv._2))
          np.props.foreach(kv => expr(kv._2))
        }
      }
      case mg: Ast.Merge =>
        markPath(mg.path)
        (mg.onMatch ++ mg.onCreate).foreach { si =>
          expr(si.target); expr(si.value)
        }
      case s: Ast.SetClause =>
        s.items.foreach { si => expr(si.target); expr(si.value) }
      case d: Ast.Delete => d.exprs.foreach(expr)
    }
    if (sawStar) return None
    // propagate fullness backwards through projection aliases
    // (WITH c AS x … RETURN x ⇒ c is full)
    var changed = true
    while (changed) {
      changed = false
      projections.foreach(_.items.foreach {
        case (Ast.Variable(v), alias) =>
          val n = alias.getOrElse(v)
          if (full.contains(n) && !full.contains(v)) {
            full += v; changed = true
          }
        case _ => ()
      })
    }
    Some(full.toSet)
  }

  // ═══════════════════════════════ CALL ════════════════════════════════════
  /** ProcedureCall (`op_procedure_call.c`): invoke a registered procedure
    * with constant args, YIELD columns into the frame (cross-joined when
    * variables are already bound — procs are uncorrelated table functions).
    */
  private[cypher] def translateCall(ctx: Ctx, frame: Frame,
      c: Ast.CallProc, standalone: Boolean = false): Frame = {
    val session = ctx.session.getOrElse(
      throw TranslateError("CALL requires a CypherSession"))
    // correlated algo.BFS (`proc_bfs.c`): the source argument is a BOUND
    // NODE variable — per input row, yield arrays of reachable nodes and
    // the BFS tree edges; a source with nothing reachable emits no record
    // (the row drops, test_bfs.py test06)
    if (c.name.equalsIgnoreCase("algo.BFS")) c.args match {
      case List(Ast.Variable(v), d, r) if frame.has(v) =>
        val depth = constantAny(ctx, d, frame.vars.keySet) match {
          case l: Long => l
          case i: Int => i.toLong
          case other => throw TranslateError(s"algo.BFS maxLevel: $other")
        }
        val rel = constantAny(ctx, r, frame.vars.keySet) match {
          case null => None
          case s: String => Some(s)
          case other => throw TranslateError(s"algo.BFS reltype: $other")
        }
        return bfsCorrelated(ctx, frame, c, v, depth, rel)
      case _ => ()
    }
    // argument passing mode: the parenthesis-free form binds arguments
    // implicitly from query parameters — standalone calls only (Call2 [4])
    val args: List[Any] =
      if (c.explicitArgs) c.args.map(constantAny(ctx, _, frame.vars.keySet))
      else if (!standalone) throw TranslateError(
        "InvalidArgumentPassingMode: implicit procedure arguments are " +
          "only allowed in a standalone CALL")
      else Procedures.signatureArgs(session, c.name).getOrElse(Nil).map { an =>
        ctx.params.getOrElse(an, throw TranslateError(
          s"missing implicit argument `$an` for procedure ${c.name}")) match {
          case i: Int => i.toLong
          case v => v
        }
      }
    // in-query calls must YIELD every output they use; a call with outputs
    // and no YIELD is only legal standalone (Call1 [12])
    if (!standalone && c.yields.isEmpty &&
      Procedures.declaredOuts(session, c.name).exists(_ > 0))
      throw TranslateError(s"procedure ${c.name} has outputs: an in-query " +
        "CALL must YIELD them explicitly")
    // YIELD must not shadow an already-bound variable (Call1 [15]) nor
    // bind the same output twice (test_procedures.py test02: YIELD
    // node, node is an error)
    c.yields.foldLeft(Set.empty[String]) { case (seen, (n, a)) =>
      val alias = a.getOrElse(n)
      if (frame.vars.contains(alias) || seen.contains(alias))
        throw TranslateError(
          s"VariableAlreadyBound: `$alias` is already declared")
      seen + alias
    }
    val (df, kinds) = Procedures.invoke(session, c.name, args)
    if (kinds.isEmpty) {
      // VOID procedure: in-query it passes rows through untouched; a
      // standalone call produces an empty result
      if (c.yields.nonEmpty) throw TranslateError(
        s"procedure ${c.name} yields no outputs")
      // in-query VOID calls pass the frame's rows through untouched (the
      // frame may legitimately have zero vars — a unit frame mid-query)
      return if (standalone) Frame(df, Map.empty) else frame
    }
    val (outDf, outKinds) =
      if (c.yields.isEmpty) (df, kinds)
      else {
        val cols = c.yields.map { case (n, a) => df(n).as(a.getOrElse(n)) }
        (df.select(cols: _*),
          c.yields.map { case (n, a) =>
            a.getOrElse(n) -> kinds.getOrElse(n,
              throw TranslateError(s"procedure ${c.name} yields no `$n`"))
          }.toMap)
      }
    val bound =
      if (frame.vars.isEmpty) Frame(outDf, outKinds)
      else Frame(frame.df.crossJoin(outDf), frame.vars ++ outKinds)
    // `YIELD … WHERE pred` filters the yielded rows in place
    // (test_procedures.py test04)
    c.where.map(applyWhere(ctx, bound, _)).getOrElse(bound)
  }

  /** constant (literal/param) expression → Scala value for procedure args.
    * `scope` holds the frame's bound variables: a WITH-bound literal
    * evaluates (the reference evaluates bound variables in arg position),
    * any other in-scope variable gets the must-be-constant message, and
    * only a variable absent from scope raises the reference's
    * "not defined" shape (test_query_validation.py test22).
    */
  private def constantAny(ctx: Ctx, e: Ast.Expr,
      scope: Set[String] = Set.empty): Any = e match {
    case Ast.LitInt(v) => v
    case Ast.LitFloat(v) => v
    case Ast.LitString(v) => v
    case Ast.LitBool(v) => v
    case Ast.LitNull => null
    case Ast.Neg(Ast.LitInt(v)) => -v
    case Ast.Neg(Ast.LitFloat(v)) => -v
    case Ast.Param(n) => ctx.params.getOrElse(n,
      throw TranslateError(s"missing parameter: $$$n")) match {
      case i: Int => i.toLong
      case v => v
    }
    case Ast.Variable(n) if ctx.constVars.contains(n) =>
      constantAny(ctx, ctx.constVars(n), scope)
    case Ast.Variable(n) if scope.contains(n) =>
      throw TranslateError(s"procedure arg must be constant: $n")
    // an out-of-scope variable is an unresolvable alias — the reference's
    // message shape (test_query_validation.py test22)
    case Ast.Variable(n) => throw TranslateError(s"$n not defined")
    case other => throw TranslateError(s"procedure arg must be constant: $other")
  }

  // ═══════════════════════════════ MATCH ═══════════════════════════════
  /** Variables a WHERE conjunct filters (for anchor scoring) — pattern
    * predicates excluded: they gate via semi-joins, not scans.
    */
  private[cypher] def filteredVars(where: Option[Ast.Expr]): Set[String] = {
    def conjuncts(e: Ast.Expr): Seq[Ast.Expr] = e match {
      case Ast.Bin("AND", l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    where.toSeq.flatMap(conjuncts).flatMap {
      case Ast.PatternPred(_) | Ast.Not(Ast.PatternPred(_)) => Nil
      case c => exprVars(c).toSeq
    }.toSet
  }

  def translateMatch(ctx: Ctx, frame: Frame, m: Ast.Match): Frame = {
    if (m.optional) return translateOptional(ctx, frame, m)
    var f = frame
    val fv = filteredVars(m.where)
    val pathEdgeVars = scala.collection.mutable.ArrayBuffer[List[String]]()
    traversalOrder(ctx, f, m.paths, fv) match {
      case Some(segs) =>
        // hop-granular greedy order; segments of one source pattern share
        // its uniqueness scope
        val byPath = scala.collection.mutable.Map[Int,
          scala.collection.mutable.ListBuffer[String]]()
        segs.foreach { case (pi, seg) =>
          val (f2, ev) = translatePath(ctx, f, seg, preAnchored = true)
          f = f2
          byPath.getOrElseUpdate(pi,
            scala.collection.mutable.ListBuffer[String]()) ++= ev
        }
        m.paths.indices.foreach(pi =>
          pathEdgeVars += byPath.get(pi).map(_.toList).getOrElse(Nil))
      case None =>
        m.paths.foreach { p =>
          val (f2, evs) = translatePath(ctx, f, p)
          f = f2
          pathEdgeVars += evs
        }
    }
    // relationship uniqueness per path (docs/known_limitations.md:3);
    // under the "named" scope anonymous edges are reachability tests and
    // skip these checks (reference compat — see CypherSession
    // .edgeUniquenessScope)
    val namedOnly = ctx.namedOnlyUniqueness
    pathEdgeVars.foreach { evs =>
      val checked =
        if (namedOnly) evs.filterNot(ctx.anonEdgeVars) else evs
      checked.combinations(2).foreach { case List(a, b) =>
        f = f.copy(df = f.df.filter(
          f.col(a).getField("id") =!= f.col(b).getField("id")))
      }
    }
    m.where.foreach { w => f = applyWhere(ctx, f, w) }
    f
  }

  /** Bound frames under the row-id trick (OPTIONAL MATCH / SemiApply /
    * ApplyMultiplexer) pin `monotonically_increasing_id` with a
    * localCheckpoint so the rid is stable across the per-pattern
    * self-joins. Small frames checkpoint EAGERLY (one tiny job at
    * translate time, everything downstream is a cheap cached scan); a
    * frame the optimizer estimates above the threshold checkpoints
    * LAZILY — same single materialization, but deferred to first action
    * and never paid for a plan that is only explained, so a huge bound
    * side under a multi-pattern WHERE is not built twice. The estimate is
    * Catalyst's static `sizeInBytes` — no extra job to decide.
    */
  private val PinEagerMaxBytes = BigInt(256L << 20)
  private def pinRid(ctx: Ctx, df: DataFrame, rid: String): DataFrame = {
    val tagged = df.withColumn(rid, monotonically_increasing_id())
    val est = try tagged.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(0) }
    tracked(ctx, tagged.localCheckpoint(est <= PinEagerMaxBytes))
  }

  /** Register a checkpointed frame with the session's block lifecycle (so
    * superseded pins/frontiers are unpersisted instead of leaking); a
    * session-less translation keeps the plain checkpoint.
    */
  private def tracked(ctx: Ctx, df: DataFrame): DataFrame =
    ctx.session.map(_.track(df)).getOrElse(df)

  /** OPTIONAL MATCH via the row-id trick: tag each input row, run the inner
    * match, left-join the new columns back on the tag (`op_optional.c` +
    * Apply → decorrelated left_outer, SURVEY §2.3).
    */
  private def translateOptional(ctx: Ctx, frame: Frame, m: Ast.Match): Frame = {
    val rid = freshName("rid")
    val tagged = pinRid(ctx, frame.df, rid)
    val seed = Frame(tagged, frame.vars)
    val inner = translateMatch(ctx, seed, m.copy(optional = false))
    val newVars = inner.vars.keySet -- frame.vars.keySet
    val newFlats = inner.df.columns.toSeq.filter(c =>
      c.startsWith("__p:") && !tagged.columns.contains(c))
    val right = inner.df.select(
      (Seq(inner.col(rid)) ++ newVars.toSeq.map(inner.col) ++
        newFlats.map(c => inner.df(s"`$c`"))): _*)
    val joined = tagged.join(right, Seq(rid), "left_outer").drop(rid)
    Frame(joined, frame.vars ++ newVars.map(n => n -> inner.vars(n)))
  }

  /** path composition tracker for named paths (T_PATH). */
  private sealed trait PathSeg
  private case class NodeSeg(name: String) extends PathSeg
  private case class EdgeSeg(name: String) extends PathSeg
  /** var-len segment: accumulated rels/nodes array columns. */
  private case class VarSeg(relsCol: String, nodesCol: String) extends PathSeg

  /** Anchor-selection heuristic (≡ `traverse_order.c:217-239`, which
    * scores pattern arrangements by label frequency and filter coverage):
    * a chain pattern is traversed from whichever END is cheaper to seed —
    * an already-bound variable beats any scan, a labeled+filtered scan
    * beats a labeled scan beats an all-node scan, ties broken by the
    * graph's per-label counts. Implemented as a pattern REVERSAL (flip
    * each hop's direction) before the left-to-right translator runs, so
    * every downstream operator (expand joins, var-len frontiers) is
    * untouched. Uses statistics only when the graph has them computed
    * ([[graft.graph.PropertyGraph.statsPeek]]) — a cold read never pays a
    * counting job for a heuristic. Named paths keep pattern order (path
    * assembly is order-sensitive); shortestPath has its own planner.
    */
  private[cypher] def reorderPath(ctx: Ctx, frame: Frame,
      p: Ast.PathPat, filtered: Set[String] = Set.empty): Ast.PathPat = {
    if (p.shortest || p.allShortest || p.pathVar.isDefined ||
      p.tail.isEmpty) return p
    // a NAMED var-len relationship binds its edge LIST in pattern order
    // (TCK Match9 [2]) — a reversed traversal would collect it backwards
    if (p.tail.exists(h => h._1.varLen.isDefined && h._1.variable.isDefined))
      return p
    val (score, relSel) = anchorScoring(ctx, frame, filtered)
    val last = p.tail.last._2
    val fwd = score(p.head) * relSel(p.tail.head._1)
    val rev = score(last) * relSel(p.tail.last._1)
    if (rev < fwd) reversePath(p) else p
  }

  private def reversePath(p: Ast.PathPat): Ast.PathPat = {
    val nodes = p.head +: p.tail.map(_._2) // n0 .. nk
    val revTail = p.tail.indices.reverse.map { i =>
      val r = p.tail(i)._1
      (r.copy(direction = -r.direction), nodes(i))
    }.toList
    Ast.PathPat(None, p.tail.last._2, revTail)
  }

  /** Anchor-cost model shared by [[reorderPath]] and [[anchorSegments]]:
    * node score = estimated scan cardinality, decimated per constant prop
    * equality and once more when a WHERE conjunct filters the variable
    * (the reference scores filtered anchors above unfiltered,
    * `traverse_order_utils.c:16-37`). With no statistics snapshot (a
    * never-mutated session — the reference's test_traversal_construction
    * runs on an EMPTY graph) the same model degrades to the pure
    * heuristic: label ≺ unlabeled, filtered ≺ labeled-only.
    */
  private def anchorScoring(ctx: Ctx, frame: Frame, filtered: Set[String])
      : (Ast.NodePat => Double, Ast.RelPat => Double) = {
    val (labels, reltypes) = ctx.graph.statsPeek
      .getOrElse((Map.empty[String, Long], Map.empty[String, Long]))
    val noStats = ctx.graph.statsPeek.isEmpty
    val total = math.max(labels.values.sum, 1L)
    val totalEdges = math.max(reltypes.values.sum, 1L)
    def score(np: Ast.NodePat): Double = {
      val name = np.variable.getOrElse(nameOf(np))
      if (frame.vars.contains(name)) 0.0 // bound: already materialized
      else {
        val base = np.label.map(l =>
          if (noStats) total / 10.0
          else labels.getOrElse(l, 0L).toDouble).getOrElse(total.toDouble)
        val constProps = np.props.count(p => isConst(p._2))
        val filterHits = constProps +
          (if (np.variable.exists(filtered)) 1 else 0)
        base * math.pow(0.1, filterHits)
      }
    }
    // relation-operand selectivity (the reference scores relation
    // operands alongside node labels, traverse_order_utils.c:16-37 /
    // traverse_order.c:217-239): the FIRST hop expanded from an anchor
    // multiplies the frontier by that hop's edge population, so an
    // anchor followed by a rare reltype beats an equal-sized anchor
    // followed by a common one. Untyped hops select the whole edge
    // table (selectivity 1).
    // floor at one edge's worth: a reltype absent from the stats
    // snapshot (stale stats after mutation) must not zero BOTH ends'
    // scores — a 0.0 × 0.0 tie would disable the reversal the
    // node-count comparison alone would have made
    def relSel(r: Ast.RelPat): Double =
      if (r.types.isEmpty || noStats) 1.0
      else math.min(1.0, r.types.map(t =>
        math.max(reltypes.getOrElse(t, 0L), 1L)).sum.toDouble /
        totalEdges)
    (score, relSel)
  }

  /** Greedy traversal scheduling over ALL plain patterns of one MATCH —
    * the reference's `traverse_order.c` reordered algebraic expression,
    * hop by hop: start at the strictly cheapest scan anchor anywhere in
    * the pattern (not just path ends), then repeatedly expand the
    * cheapest frontier hop — filtered/labeled destinations first, hops
    * closing a cycle (both ends bound) immediately. A filtered middle
    * node prunes BEFORE either side's expansion instead of after a full
    * end-to-end scan; at scale that is |anchor| seed rows instead of
    * |head| × expansion. Returns `(sourcePathIndex, single-hop-or-scan
    * segment)` in execution order — segments of one source pattern share
    * its relationship-uniqueness scope — or None when any pattern needs
    * the legacy per-path translation (var-len, shortest, named paths,
    * re-matched edge variables).
    */
  private[cypher] def traversalOrder(ctx: Ctx, frame: Frame,
      paths: List[Ast.PathPat], filtered: Set[String])
      : Option[List[(Int, Ast.PathPat)]] = {
    val plain = paths.forall(p => !p.shortest && !p.allShortest &&
      p.pathVar.isEmpty && p.tail.forall(_._1.varLen.isEmpty) &&
      p.tail.forall(_._1.variable.forall(v => !frame.vars.contains(v))))
    if (!plain) return None
    val (score, relSel) = anchorScoring(ctx, frame, filtered)
    case class Hop(path: Int, rel: Ast.RelPat,
        from: Ast.NodePat, to: Ast.NodePat)
    val hops = scala.collection.mutable.ArrayBuffer[Hop]()
    paths.zipWithIndex.foreach { case (p, pi) =>
      var from = p.head
      p.tail.foreach { case (r, n) => hops += Hop(pi, r, from, n); from = n }
    }
    def nm(np: Ast.NodePat): String = np.variable.getOrElse(nameOf(np))
    // each node occurrence's label/prop predicates apply EXACTLY ONCE —
    // a later segment reusing the instance rebinds by name only (the
    // first binding may have pruned the props map, so re-applying the
    // predicate there would compare against nothing and drop every row)
    val seen = new java.util.IdentityHashMap[Ast.NodePat, String]()
    def occ(np: Ast.NodePat): Ast.NodePat =
      if (seen.containsKey(np))
        // keep the label (the label column is never pruned, and the
        // rendered hop keeps its display form); drop the props — their
        // predicate already ran at the binding occurrence
        Ast.NodePat(Some(seen.get(np)), np.label, Nil)
      else { seen.put(np, nm(np)); np }
    val bound = scala.collection.mutable.Set[String](
      frame.vars.keys.toSeq: _*)
    val out = scala.collection.mutable.ListBuffer[(Int, Ast.PathPat)]()
    // appearance order for deterministic tie-breaks
    val appear = scala.collection.mutable.LinkedHashMap[String, Int]()
    paths.foreach(p => (p.head :: p.tail.map(_._2)).foreach(np =>
      appear.getOrElseUpdate(nm(np), appear.size)))
    val scanPaths = scala.collection.mutable.LinkedHashMap[Int, Ast.PathPat]()
    paths.zipWithIndex.foreach { case (p, pi) =>
      if (p.tail.isEmpty) scanPaths(pi) = p
    }
    def anchorCandidates: Seq[(Int, Ast.NodePat, Double)] = {
      val fromHops = hops.toSeq.flatMap(h =>
        Seq((h.path, h.from), (h.path, h.to)))
      val fromScans = scanPaths.toSeq.map { case (pi, p) => (pi, p.head) }
      (fromHops ++ fromScans).filterNot { case (_, np) => bound(nm(np)) }
        .map { case (pi, np) => (pi, np, score(np)) }
    }
    while (hops.nonEmpty) {
      val avail = hops.zipWithIndex.filter { case (h, _) =>
        bound(nm(h.from)) || bound(nm(h.to)) }
      if (avail.isEmpty) {
        // new connected component: open the cheapest scan
        val cands = anchorCandidates
        val (pi, np, _) = cands.minBy { case (_, np, s) =>
          (s, appear(nm(np))) }
        bound += nm(np)
        scanPaths.remove(pi)
        out += ((pi, Ast.PathPat(None, occ(np), Nil)))
      } else {
        // cheapest frontier hop; both-ends-bound (cycle-closing) hops are
        // free filters and go first
        def cost(h: Hop): (Double, Int) = {
          val c =
            if (bound(nm(h.from)) && bound(nm(h.to))) -1.0
            else {
              val far = if (bound(nm(h.from))) h.to else h.from
              score(far) * relSel(h.rel)
            }
          (c, appear(nm(h.from)) min appear(nm(h.to)))
        }
        val (h, idx) = avail.minBy { case (h, _) => cost(h) }
        hops.remove(idx)
        val seg =
          if (bound(nm(h.from)))
            Ast.PathPat(None, occ(h.from), List((h.rel, occ(h.to))))
          else Ast.PathPat(None, occ(h.to),
            List((h.rel.copy(direction = -h.rel.direction), occ(h.from))))
        bound += nm(h.from); bound += nm(h.to)
        out += ((h.path, seg))
      }
    }
    // remaining scan-only patterns (pure products and re-matches), in
    // pattern order
    scanPaths.foreach { case (pi, p) =>
      bound += nm(p.head)
      out += ((pi, Ast.PathPat(p.pathVar, occ(p.head), Nil)))
    }
    Some(out.toList)
  }

  /** Translate one path; returns frame + edge var names (for uniqueness).
    * `preAnchored` marks segments [[anchorSegments]] already oriented —
    * re-running the end-reversal there could undo a split's orientation.
    */
  private[cypher] def translatePath(ctx: Ctx, frame: Frame,
      p0: Ast.PathPat, preAnchored: Boolean = false)
      : (Frame, List[String]) = {
    val p = if (preAnchored) p0 else reorderPath(ctx, frame, p0)
    if (p.shortest)
      require(p.tail.size == 1 && p.tail.head._1.varLen.isDefined,
        "shortestPath needs a single variable-length relationship pattern")
    var f = bindNode(ctx, frame, p.head,
      passThrough = p.tail.isEmpty && p.pathVar.isEmpty && !p.shortest)
    val startName = p.head.variable.getOrElse(nameOf(p.head))
    // shortestPath keeps ONE path per (input row, endpoint pair) — stamp a
    // per-row key BEFORE expansion multiplies rows, so other bound variables
    // (earlier MATCHes, UNWIND fan-out) keep their own shortest path instead
    // of one global winner per endpoint pair
    val spRowKey = if (p.shortest) {
      val k = freshName("sprk")
      f = f.copy(df = f.df.withColumn(k, monotonically_increasing_id()))
      Some(k)
    } else None
    var prev = startName
    val edgeVars = scala.collection.mutable.ArrayBuffer[String]()
    val segs = scala.collection.mutable.ArrayBuffer[PathSeg](NodeSeg(prev))
    val temps = scala.collection.mutable.ArrayBuffer[String]()
    // pattern-wide relationship uniqueness: id-array columns of every
    // var-len segment in THIS pattern (each kept until the path ends) —
    // cross-checked against each other and against single-hop edges below
    val varSegIdCols = scala.collection.mutable.ArrayBuffer[String]()
    val needAcc = p.pathVar.isDefined || p.shortest
    p.tail.foreach { case (rel, node) =>
      rel.varLen match {
        // var-len with an ALREADY-BOUND relationship-list variable: not a
        // free traversal — the edge sequence must EQUAL the bound list
        // (TCK Match4 [8]); expand then constrain on the id sequence
        case Some((mn, mx)) if rel.variable.exists(rv =>
            f.vars.get(rv).exists(k => k == KRelList || k == KValue)) =>
          val rv = rel.variable.get
          val boundIds: Column = f.vars(rv) match {
            case KRelList =>
              transform(f.col(rv), r => r.getField("id"))
            case _ => // variant list of boxed edges
              transform(f.col(rv).getField("arr"), e =>
                get_json_object(e.getField("s"), "$.id").cast(LongType))
          }
          val (f2, acc) = expandVarLen(ctx, f, prev,
            rel.copy(variable = None), node, mn,
            mx.getOrElse(unboundedMaxHops(ctx, rel)),
            keepAcc = needAcc, keepIds = Some(freshName("vids")))
          val idsCol = acc.idsCol.get
          f = f2.copy(df = f2.df.filter(col(s"`$idsCol`") === boundIds))
          varSegIdCols += idsCol
          temps += idsCol
          acc.arrs.foreach { case (relsCol, nodesCol) =>
            segs += VarSeg(relsCol, nodesCol)
            temps += relsCol
            temps += nodesCol
          }
        case None =>
          val (f2, ev) = expandOne(ctx, f, prev, rel, node)
          f = f2
          if (rel.variable.isEmpty) ctx.anonEdgeVars += ev
          edgeVars += ev
          segs += EdgeSeg(ev)
          segs += NodeSeg(node.variable.getOrElse(nameOf(node)))
        case Some((mn, mx)) =>
          val (f2, acc) = expandVarLen(ctx, f, prev, rel, node, mn,
            mx.getOrElse(unboundedMaxHops(ctx, rel)),
            keepAcc = needAcc || rel.variable.isDefined,
            keepIds = Some(freshName("vids")))
          f = f2
          // the rel variable binds the traversed-edge LIST (Cypher var-len
          // semantics) — register its kind so size()/projection see a raw
          // edge-struct array, not a variant
          rel.variable.foreach { rv =>
            f = f.copy(vars = f.vars + (rv -> KRelList))
          }
          acc.idsCol.foreach { idsCol =>
            varSegIdCols += idsCol
            temps += idsCol
          }
          acc.arrs.foreach { case (relsCol, nodesCol) =>
            segs += VarSeg(relsCol, nodesCol)
            if (rel.variable.isEmpty) temps += relsCol
            temps += nodesCol
          }
      }
      prev = node.variable.getOrElse(nameOf(node))
    }
    // relationship uniqueness ACROSS segments of one pattern (openCypher
    // relationship isomorphism; within-segment uniqueness is enforced
    // during expansion): no single-hop edge inside a var-len segment's
    // edges, no overlap between two var-len segments
    varSegIdCols.foreach { idsCol =>
      edgeVars.foreach { ev =>
        // anonymous single-hop edges skip the var-len overlap check under
        // the "named" uniqueness scope, same exemption as the pairwise one
        if (!(ctx.namedOnlyUniqueness && ctx.anonEdgeVars.contains(ev)))
          f = f.copy(df = f.df.filter(!array_contains(
            col(s"`$idsCol`"), f.col(ev).getField("id"))))
      }
    }
    varSegIdCols.toList.combinations(2).foreach { case List(a, b) =>
      f = f.copy(df = f.df.filter(
        !arrays_overlap(col(s"`$a`"), col(s"`$b`"))))
    }
    if (p.shortest) {
      // shortestPath (`path_funcs.c:108-190`: BFS, ONE minimal path per
      // (start, end) pair): enumeration + rank — min hop count first,
      // edge-id array as the deterministic tiebreak.
      val relsCol = segs.collectFirst { case VarSeg(rc, _) => rc }.get
      val part = org.apache.spark.sql.expressions.Window
        .partitionBy(col(s"`${spRowKey.get}`"),
          f.col(startName).getField("id"),
          f.col(prev).getField("id"))
      val w = part.orderBy(size(f.col(relsCol)),
        transform(f.col(relsCol), r => r.getField("id")))
      val rn = freshName("sprn")
      // shortestPath keeps ONE minimal path (row_number over length +
      // deterministic tiebreak); allShortestPaths keeps EVERY minimal
      // path — rank() over length alone ties at 1 for all minimal paths
      val rankFn =
        if (p.allShortest) rank().over(part.orderBy(size(f.col(relsCol))))
        else row_number().over(w)
      f = f.copy(df = f.df.withColumn(rn, rankFn)
        .filter(col(s"`$rn`") === 1).drop(rn, spRowKey.get))
    }
    p.pathVar.foreach { pv =>
      // assemble struct(nodes, rels) from the segments (`topath`,
      // `path_funcs.c:266-289`)
      val nodeArrs = segs.collect {
        case NodeSeg(n) => array(f.col(n))
        case VarSeg(_, nc) => f.col(nc)
      }
      val relArrs = segs.collect {
        case EdgeSeg(e) => array(f.col(e))
        case VarSeg(rc, _) => f.col(rc)
      }
      val rels =
        if (relArrs.isEmpty) array().cast(ArrayType(edgeStructType))
        else concat(relArrs.toSeq: _*)
      val df = f.df.withColumn(pv,
        struct(concat(nodeArrs.toSeq: _*).as("nodes"), rels.as("rels")))
      f = Frame(df, f.vars + (pv -> KPath))
    }
    if (temps.nonEmpty) f = f.copy(df = f.df.drop(temps.toSeq: _*))
    (f, edgeVars.toList)
  }

  val nodeStructType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("label", StringType),
    StructField("props", Values.propsType)))

  val edgeStructType: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("src", LongType),
    StructField("dst", LongType),
    StructField("reltype", StringType),
    StructField("props", Values.propsType)))

  private val nodeNames = new java.util.IdentityHashMap[Ast.NodePat, String]()
  private[cypher] def nameOf(np: Ast.NodePat): String = synchronized {
    np.variable.getOrElse {
      Option(nodeNames.get(np)).getOrElse {
        val n = freshName("n"); nodeNames.put(np, n); n
      }
    }
  }
  private val relNames = new java.util.IdentityHashMap[Ast.RelPat, String]()
  private[cypher] def nameOf(rp: Ast.RelPat): String = synchronized {
    rp.variable.getOrElse {
      Option(relNames.get(rp)).getOrElse {
        val n = freshName("r"); relNames.put(rp, n); n
      }
    }
  }

  /** Scan for a node pattern (label/props pushed into the scan —
    * NodeByLabelScan, `op_node_by_label_scan.c`).
    */
  private def nodeScan(ctx: Ctx, np: Ast.NodePat, as: String,
      keepProps: Boolean = false): DataFrame = {
    var df = np.label.fold(ctx.graph.nodes)(ctx.graph.nodesByLabel)
    np.props.foreach { case (k, e) =>
      val v = constantValue(ctx, e)
      df = df.filter(coalesce(Values.eq(
        element_at(col("props"), k), v), lit(false)))
    }
    // project accessed properties flat at the scan (folds to native columns)
    val flats = ctx.propUse.getOrElse(as, Set.empty).toSeq.sorted.map { k =>
      ctx.registerPropTag(propColName(as, k), staticPropTag(df, k))
      element_at(col("props"), k).as(propColName(as, k))
    }
    // props-bag pruning: a var never used as a full entity gets a null
    // props field — the scan then reads only id/label + accessed props
    val propsCol =
      if (keepProps || ctx.needsProps(as)) col("props")
      else lit(null).cast(Values.propsType)
    df.select(struct(col("id"), col("label"),
      propsCol.as("props")).as(as) +: flats: _*)
  }

  /** true iff the expression references no frame state (literals/params
    * only) — safe to push into a base-table scan.
    */
  private def isConst(e: Ast.Expr): Boolean = e match {
    case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
         Ast.LitBool(_) | Ast.LitNull | Ast.Param(_) => true
    case Ast.ListLit(items) => items.forall(isConst)
    case Ast.Neg(x) => isConst(x)
    case Ast.Bin(_, l, r) => isConst(l) && isConst(r)
    case _ => false
  }

  /** Literal-only (no params — those fold elsewhere): foldable driver-side
    * to a single Catalyst Literal.
    */
  private[cypher] def isPureLit(e: Ast.Expr): Boolean = e match {
    case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
         Ast.LitBool(_) | Ast.LitNull => true
    case Ast.Neg(x) => isPureLit(x)
    case Ast.ListLit(items) => items.forall(isPureLit)
    case _ => false
  }

  /** Driver-side Row encoding of a pure-literal value at variant nesting
    * depth `d` (see [[Values.nestedType]]); raises past the depth floor
    * like `Values.narrow`.
    */
  private[cypher] def litRow(e: Ast.Expr, d: Int): Any = {
    def row(t: Int, i: Any = null, f: Any = null, s: Any = null,
        b: Any = null, arr: Any = null): org.apache.spark.sql.Row =
      if (d <= 0) org.apache.spark.sql.Row(t, i, f, s, b)
      else org.apache.spark.sql.Row(t, i, f, s, b, arr)
    e match {
      case Ast.LitNull => null
      case Ast.LitInt(v) => row(Values.T_INT, i = v)
      case Ast.LitFloat(v) => row(Values.T_FLOAT, f = v)
      case Ast.LitString(v) => row(Values.T_STRING, s = v)
      case Ast.LitBool(v) => row(Values.T_BOOL, b = v)
      case Ast.Neg(x) => litRow(x, d) match {
        case null => null
        case r: org.apache.spark.sql.Row if r.getInt(0) == Values.T_INT =>
          row(Values.T_INT, i = -r.getLong(1))
        case r: org.apache.spark.sql.Row if r.getInt(0) == Values.T_FLOAT =>
          row(Values.T_FLOAT, f = -r.getDouble(2))
        case _ => null
      }
      case Ast.ListLit(items) =>
        if (d <= 0) throw TranslateError(
          s"nested list values exceed the supported nesting depth " +
            s"(${Values.MaxNest})")
        row(Values.T_ARRAY, arr = items.map(i => litRow(i, d - 1)))
      case other => throw TranslateError(s"not a literal: $other")
    }
  }

  /** An all-literal list expression as ONE Literal column (constant-width
    * codegen regardless of element count).
    */
  private def constListLiteral(items: List[Ast.Expr]): Column =
    org.apache.spark.sql.GraftColumn.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        litRow(Ast.ListLit(items), Values.MaxNest), Values.variantType))

  /** Static list-literal nesting depth. */
  private def astDepth(x: Ast.Expr): Int = x match {
    case Ast.ListLit(xs) => 1 + (0 +: xs.map(astDepth)).max
    case _ => 0
  }

  /** JSON string escape for [[litJson]]. */
  private def jsonQuote(v: String): String =
    "\"" + v.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Driver-side tagged-JSON encoding of a pure-literal value — the boxed
    * (T_BOXED) form for list literals nested past the schema floor.
    */
  private def litJson(e: Ast.Expr): String = e match {
    case Ast.LitNull => "null"
    case Ast.LitInt(v) => s"""{"t":${Values.T_INT},"i":$v}"""
    case Ast.LitFloat(v) => s"""{"t":${Values.T_FLOAT},"f":$v}"""
    case Ast.LitString(v) =>
      s"""{"t":${Values.T_STRING},"s":${jsonQuote(v)}}"""
    case Ast.LitBool(v) => s"""{"t":${Values.T_BOOL},"b":$v}"""
    case Ast.Neg(Ast.LitInt(v)) => litJson(Ast.LitInt(-v))
    case Ast.Neg(Ast.LitFloat(v)) => litJson(Ast.LitFloat(-v))
    case Ast.ListLit(xs) =>
      xs.map(litJson).mkString(
        s"""{"t":${Values.T_ARRAY},"arr":[""", ",", "]}")
    case other => throw TranslateError(s"not a boxable literal: $other")
  }

  /** Tagged-JSON encodings of runtime values for the boxed branch: the
    * field names match the variant/entity structs, so `to_json` IS the
    * encoder and the driver decode parses the same shape back.
    */
  private def boxNode(e: Column): Column =
    to_json(struct(lit(Values.T_NODE).as("t"), e.getField("id").as("id"),
      e.getField("label").as("label"), e.getField("props").as("props")))

  private def boxEdge(e: Column): Column =
    to_json(struct(lit(Values.T_EDGE).as("t"), e.getField("id").as("id"),
      e.getField("src").as("src"), e.getField("dst").as("dst"),
      e.getField("reltype").as("reltype"), e.getField("props").as("props")))

  private def boxMapStruct(c: Column): Column =
    to_json(struct(lit(Values.T_BOXED_MAP).as("t"), c.as("m")))

  /** Unbox a tagged-JSON value back to an inline variant where the fixed
    * schema can hold it (scalars and scalar lists); anything deeper stays
    * boxed and round-trips through the driver decode.
    */
  private def jsonToVariant(js: Column): Column = {
    val t0 = get_json_object(js, "$.t").cast(IntegerType)
    when(js.isNull, Values.vNull)
      .when(t0.isin(Values.T_INT, Values.T_FLOAT, Values.T_STRING,
        Values.T_BOOL, Values.T_ARRAY),
        from_json(js, Values.variantType))
      .otherwise(Values.vBoxed(js))
  }

  private def bindNode(ctx: Ctx, frame0: Frame, np: Ast.NodePat,
      passThrough: Boolean = false): Frame = {
    val name = nameOf(np)
    var frame = frame0
    frame0.vars.get(name).foreach {
      case KNode => ()
      case KValue =>
        // a projected VALUE re-bound in a node pattern is legal when it
        // holds an entity (WITH coalesce(b, c) AS x MATCH (x)-->(d)) or
        // null. A variant-typed value holds a node only BOXED (entities
        // carried inside lists/maps): unbox it; anything else — including
        // null — rebinds as a NULL node whose row PASSES THROUGH. The
        // reference treats a bound-variable re-match as a no-op check, so
        // `WITH NULL AS a MATCH (a) RETURN a` yields the null row while
        // any traversal or predicate over it matches nothing
        // (test_null_handling.py test07; rebound as a typed COLUMN, not a
        // binding — path assembly must see the node struct type).
        // An ISOLATED bare pattern (no chain/label/props/path var) needs
        // no node struct at all — the reference's no-op rebind is a pure
        // pass-through there, so a non-entity value survives intact
        // (`WITH 5 AS a MATCH (a) RETURN a` → [5], not [null]).
        val pureNoOp = passThrough && np.label.isEmpty && np.props.isEmpty
        if (!pureNoOp &&
          !dataTypeOf(frame0, frame0.col(name)).exists(dt => dt match {
          case s: StructType =>
            s.fieldNames.contains("id") && s.fieldNames.contains("props")
          case _ => false
        })) {
          val vc = frame0.col(name)
          val unboxed = when(Values.tag(vc) === Values.T_BOXED &&
              get_json_object(vc.getField("s"), "$.t") ===
                Values.T_NODE.toString,
            from_json(vc.getField("s"), nodeStructType))
            .otherwise(lit(null).cast(nodeStructType))
          frame = frame0.copy(
            df = frame0.df.withColumn(name, unboxed),
            vars = frame0.vars + (name -> KNode))
        }
      case other => throw TranslateError(
        s"VariableTypeConflict: $name already bound as $other cannot " +
          "re-bind as a node")
    }
    if (frame.has(name)) {
      // re-matched bound var: apply label/prop predicates as filters
      var df = frame.df
      np.label.foreach(l => df = df.filter(
        Values.labelHas(frame.col(name).getField("label"), l)))
      np.props.foreach { case (k, e) =>
        df = df.filter(coalesce(Values.eq(
          frame.propCol(name, k).getOrElse(
            element_at(frame.col(name).getField("props"), k)),
          trExpr(ctx, frame, e)), lit(false)))
      }
      Frame(df, frame.vars)
    } else {
      // const props push into the scan (filter reaches the parquet read);
      // frame-dependent props filter after the join
      val (constProps, dynProps) = np.props.partition { case (_, e) => isConst(e) }
      val scan = nodeScan(ctx, np.copy(props = constProps), name,
        keepProps = dynProps.nonEmpty && np.variable.isEmpty)
      // pristine unit frame → the scan IS the frame (no cross join wart)
      val df =
        if (frame.vars.isEmpty &&
            frame.df.columns.sameElements(Array("__unit"))) scan
        else if (frame.vars.isEmpty) scan.crossJoin(frame.df).drop("__unit")
        else frame.df.crossJoin(scan)
      var f = Frame(df, frame.vars + (name -> KNode))
      dynProps.foreach { case (k, e) =>
        f = f.copy(df = f.df.filter(coalesce(Values.eq(
          f.propCol(name, k).getOrElse(
            element_at(f.col(name).getField("props"), k)),
          trExpr(ctx, f, e)), lit(false))))
      }
      f
    }
  }

  /** Directed traversal view over the edge table: (__from,__to) per
    * direction; undirected = union of both orientations (transpose ≡ swap).
    */
  private def edgeView(ctx: Ctx, rel: Ast.RelPat,
      keepProps: Boolean = false): DataFrame = {
    // flat accessed-property columns at the scan (same as nodeScan)
    val flatNames = rel.variable.toSeq.flatMap { rn =>
      ctx.propUse.getOrElse(rn, Set.empty).toSeq.sorted.map(k =>
        (k, propColName(rn, k)))
    }
    val propsCol =
      if (keepProps || rel.variable.exists(ctx.needsProps)) col("props")
      else lit(null).cast(Values.propsType)
    // one orientation over one source table: `rev` swaps the traversal
    // columns AT THE SCAN (not by renaming a built view), so a dst-bucketed
    // transpose source keeps its bucketing visible under the `__from` alias
    // and the expansion join stays co-located
    def orient(src: DataFrame, rev: Boolean): DataFrame = {
      var e = src
      rel.props.foreach { case (k, expr) =>
        e = e.filter(coalesce(Values.eq(
          element_at(col("props"), k), constantValue(ctx, expr)), lit(false)))
      }
      val flats = flatNames.map { case (k, n) =>
        ctx.registerPropTag(n, staticPropTag(src, k))
        element_at(col("props"), k).as(n)
      }
      e.select(Seq(struct(col("id"), col("src"), col("dst"),
        col("reltype"), propsCol.as("props")).as("__edge"),
        (if (rev) col("dst") else col("src")).as("__from"),
        (if (rev) col("src") else col("dst")).as("__to")) ++ flats: _*)
    }
    lazy val base = orient(ctx.graph.edgesByTypes(rel.types), rev = false)
    // reverse orientation: the stored dst-bucketed transpose copy when the
    // graph carries one (zero-Exchange `<-` expansion), else the same
    // forward table column-swapped (one exchange at scale)
    lazy val rbase = orient(ctx.graph.edgesByTypesRev(rel.types)
      .getOrElse(ctx.graph.edgesByTypes(rel.types)), rev = true)
    rel.direction match {
      case 1 => base
      case -1 => rbase
      // undirected: both orientations, but a SELF-LOOP has only one
      // distinct traversal (the reference matches it once, not twice)
      case 0 => base.unionByName(rbase.where(col("__from") =!= col("__to")))
    }
  }

  /** Label/prop predicates of a node pattern applied to an ALREADY-BOUND
    * variable — the ExpandInto side of a traversal must still honor the
    * pattern's label and property constraints (mirrors bindNode's
    * re-match path).
    */
  private def filterBoundNode(ctx: Ctx, f0: Frame, np: Ast.NodePat,
      name: String): Frame = {
    var f = f0
    np.label.foreach(l => f = f.copy(df = f.df.filter(
      Values.labelHas(f.col(name).getField("label"), l))))
    np.props.foreach { case (k, e) =>
      f = f.copy(df = f.df.filter(coalesce(Values.eq(
        f.propCol(name, k).getOrElse(
          element_at(f.col(name).getField("props"), k)),
        trExpr(ctx, f, e)), lit(false))))
    }
    f
  }

  /** One-hop expansion: ConditionalTraverse / ExpandInto
    * (`op_conditional_traverse.c`, `op_expand_into.c`) as equi-joins.
    */
  private def expandOne(ctx: Ctx, frame: Frame, prev: String,
      rel: Ast.RelPat, node: Ast.NodePat): (Frame, String) = {
    val rname = nameOf(rel)
    val nname = nameOf(node)
    // a relationship variable bound by an earlier MATCH re-appearing in a
    // pattern is a CHECK on that edge, not a new traversal (re-joining the
    // edge view under the same name would duplicate the column): filter on
    // endpoint/type/prop agreement, binding the far node if needed
    if (frame.vars.get(rname).contains(KEdge))
      return expandBoundEdge(ctx, frame, prev, rel, node, rname, nname)
    if (frame.vars.get(rname).contains(KValue)) {
      // a projected VALUE at a relationship position holds an edge only
      // BOXED (entities carried inside lists/maps): unbox it and check it
      // like a bound edge; anything else — including null — rebinds as a
      // NULL edge, which connects nothing (the reference runs
      // `WITH NULL AS e MATCH (a:L)-[e]->(b)` to an empty result rather
      // than erroring — test_null_handling.py test07)
      val vc = frame.col(rname)
      val unboxed = when(Values.tag(vc) === Values.T_BOXED &&
          get_json_object(vc.getField("s"), "$.t") ===
            Values.T_EDGE.toString,
        from_json(vc.getField("s"), edgeStructType))
        .otherwise(lit(null).cast(edgeStructType))
      val f = frame.copy(df = frame.df.withColumn(rname, unboxed),
        vars = frame.vars + (rname -> (KEdge: Kind)))
      return expandBoundEdge(ctx, f, prev, rel, node, rname, nname)
    }
    frame.vars.get(rname).foreach { other =>
      throw TranslateError(
        s"VariableTypeConflict: $rname already bound as $other cannot " +
          "re-bind as a relationship")
    }
    val (constRelProps, dynRelProps) =
      rel.props.partition { case (_, e) => isConst(e) }
    val ev = edgeView(ctx, rel.copy(props = constRelProps),
      keepProps = dynRelProps.nonEmpty && rel.variable.isEmpty)
      .withColumnRenamed("__edge", rname)
    var joined = frame.df.join(ev,
      frame.col(prev).getField("id") === ev("__from"))
    dynRelProps.foreach { case (k, e) =>
      val f0 = Frame(joined, frame.vars)
      joined = joined.filter(coalesce(Values.eq(
        f0.propCol(rname, k).getOrElse(
          element_at(col(s"`$rname`").getField("props"), k)),
        trExpr(ctx, f0, e)), lit(false)))
    }
    val f1 = Frame(joined, frame.vars + (rname -> KEdge))
    val result =
      if (frame.has(nname)) {
        // ExpandInto: destination already bound — must be node-kinded
        frame.vars.get(nname).foreach {
          case KNode | KValue => ()
          case other => throw TranslateError(
            s"VariableTypeConflict: $nname already bound as $other " +
              "cannot re-bind as a node")
        }
        val df = joined.filter(
          col("__to") === frame.col(nname).getField("id"))
        filterBoundNode(ctx, Frame(df, f1.vars), node, nname)
      } else {
        val (constProps, dynProps) =
          node.props.partition { case (_, e) => isConst(e) }
        val scan = nodeScan(ctx, node.copy(props = constProps), nname,
          keepProps = dynProps.nonEmpty && node.variable.isEmpty)
        val df = joined.join(scan,
          col("__to") === scan(nname).getField("id"))
        var f = Frame(df, f1.vars + (nname -> KNode))
        dynProps.foreach { case (k, e) =>
          f = f.copy(df = f.df.filter(coalesce(Values.eq(
            f.propCol(nname, k).getOrElse(
              element_at(f.col(nname).getField("props"), k)),
            trExpr(ctx, f, e)), lit(false))))
        }
        f
      }
    (result.copy(df = result.df.drop("__from", "__to")), rname)
  }

  /** Re-matched bound relationship: endpoint/type/prop agreement filter
    * (see [[expandOne]]); binds the far node when it is not bound yet.
    */
  private def expandBoundEdge(ctx: Ctx, frame: Frame, prev: String,
      rel: Ast.RelPat, node: Ast.NodePat, rname: String,
      nname: String): (Frame, String) = {
    val r = frame.col(rname)
    val prevId = frame.col(prev).getField("id")
    val src = r.getField("src")
    val dst = r.getField("dst")
    frame.vars.get(nname).foreach {
      case KNode | KValue => ()
      case other => throw TranslateError(
        s"VariableTypeConflict: $nname already bound as $other " +
          "cannot re-bind as a node")
    }
    def connects(from: Column, to: Column): Column = {
      val m = from === prevId
      if (frame.has(nname)) m && to === frame.col(nname).getField("id")
      else m
    }
    val dirOk = rel.direction match {
      case 1 => connects(src, dst)
      case -1 => connects(dst, src)
      case 0 => connects(src, dst) || connects(dst, src)
    }
    var cond = r.isNotNull && dirOk
    if (rel.types.nonEmpty)
      cond = cond && r.getField("reltype").isin(rel.types.map(lit): _*)
    var f = Frame(frame.df.filter(cond), frame.vars)
    rel.props.foreach { case (k, e) =>
      f = f.copy(df = f.df.filter(coalesce(Values.eq(
        element_at(r.getField("props"), k), trExpr(ctx, f, e)), lit(false))))
    }
    if (frame.has(nname)) {
      f = filterBoundNode(ctx, f, node, nname)
    } else {
      val farId = rel.direction match {
        case 1 => dst
        case -1 => src
        case 0 => when(src === prevId, dst).otherwise(src)
      }
      val (constProps, dynProps) =
        node.props.partition { case (_, e) => isConst(e) }
      val scan = nodeScan(ctx, node.copy(props = constProps), nname,
        keepProps = dynProps.nonEmpty && node.variable.isEmpty)
      f = Frame(f.df.join(scan, farId === scan(nname).getField("id")),
        f.vars + (nname -> KNode))
      dynProps.foreach { case (k, e) =>
        f = f.copy(df = f.df.filter(coalesce(Values.eq(
          f.propCol(nname, k).getOrElse(
            element_at(f.col(nname).getField("props"), k)),
          trExpr(ctx, f, e)), lit(false))))
      }
    }
    (f, rname)
  }

  /** Var-len expansion `*min..max` (CondVarLenTraverse,
    * `op_cond_var_len_traverse.c` + all-paths DFS `src/algorithms/
    * all_paths.c`): PATH-enumeration semantics — one output row per distinct
    * path with edge-uniqueness inside the traversal, not mere reachability
    * (two parallel routes to the same node = two rows).
    *
    * Iterative frontier joins on the DISTINCT source-id set (the frame is
    * never multiplied through the loop; re-joined on start at the end).
    * Each frontier row carries accumulated rels/nodes arrays;
    * `localCheckpoint` per hop cuts the doubling lineage. At scale the
    * per-hop join shuffles on the frontier key, which successive iterations
    * reuse.
    */
  /** What a var-len expansion left in the frame: the rels/nodes entity
    * arrays (when accumulated) and the traversed-edge-ID array column
    * (when requested — pattern-wide uniqueness / bound-list re-match).
    */
  private case class VarLenAcc(arrs: Option[(String, String)],
      idsCol: Option[String])

  /** Practical cap for an UNBOUNDED var-len expansion: edge uniqueness
    * bounds any path by the number of candidate edges, so the cap is EXACT
    * whenever the (type-filtered) edge count is under the 64-hop scale
    * guard; beyond that the per-hop empty-frontier early exit is the real
    * terminator and 64 is a declared depth limit (the reference's DFS has
    * no limit but walks one path at a time, `algorithms/all_paths.c`).
    */
  private def unboundedMaxHops(ctx: Ctx, rel: Ast.RelPat): Int = {
    val ec = rel.types match {
      case Nil => ctx.graph.edgeCount
      case ts => ts.map(t => ctx.graph.reltypeCounts.getOrElse(t, 0L)).sum
    }
    math.max(1L, math.min(64L, ec)).toInt
  }

  private def expandVarLen(ctx: Ctx, frame: Frame, prev: String,
      rel: Ast.RelPat, node: Ast.NodePat, minH: Int, maxH: Int,
      keepAcc: Boolean, keepIds: Option[String] = None): (Frame, VarLenAcc) = {
    val nname = nameOf(node)
    val relsName = rel.variable.getOrElse(freshName("vrels"))
    val nodesName = freshName("vnodes")
    // accumulated path arrays materialize full edge structs
    val ev = edgeView(ctx, rel, keepProps = keepAcc || rel.variable.isDefined)
    val nodesTbl = ctx.graph.nodes.select(col("id").as("__vnid"),
      struct(col("id"), col("label"), col("props")).as("__vn"))

    // Shallow bounded expansions (the common `*1..3` shape) stay fully
    // lazy: per-hop checkpoints are LAZY lineage cuts (fresh attribute ids
    // for the self-joined edge view, materialized inside the one final
    // job), and the per-hop isEmpty early-exit probe is skipped — empty
    // tails join to empty frames for free. Deep/unbounded traversals keep
    // eager per-hop checkpoints + early exit: there the frontier usually
    // dies long before maxH and each hop's shuffle is worth cutting.
    val eagerHops = maxH > 4
    // eager per-hop cuts route through graft.Checkpoints so the cluster
    // resilience knob (graft.checkpoint.reliable=true) covers the Cypher
    // var-len surface, not just GraphOps — executor loss mid-traversal
    // recomputes from the reliable checkpoint instead of killing the
    // query. The shallow LAZY branch stays a plain lineage cut (no
    // materialization to make durable).
    def cut(df: DataFrame): DataFrame = tracked(ctx,
      if (eagerHops) graft.Checkpoints.materialize(df)
      else df.localCheckpoint(false))
    val sources = cut(frame.df
      .select(frame.col(prev).getField("id").as("__vstart"))
      .distinct())
    // When no path/rel variable is bound (keepAcc=false), the frontier
    // carries only edge IDs for path-uniqueness — arrays of longs, not
    // full entity structs. The per-hop checkpoints then hold a few bytes
    // per path instead of every property of every visited entity (memory
    // stays flat across a Bench/Verify session of many traversals).
    var frontier =
      if (keepAcc)
        cut(sources.select(col("__vstart"),
          col("__vstart").as("__vcur"),
          array().cast(ArrayType(LongType)).as("__vrelids"),
          array().cast(ArrayType(edgeStructType)).as("__vrels"),
          array().cast(ArrayType(nodeStructType)).as("__vnodes")))
      else
        cut(sources.select(col("__vstart"),
          col("__vstart").as("__vcur"),
          array().cast(ArrayType(LongType)).as("__vrelids")))
    val results = scala.collection.mutable.ArrayBuffer[DataFrame]()
    if (minH == 0) results += frontier
    var h = 0
    while (h < maxH && (!eagerHops || !frontier.isEmpty)) {
      h += 1
      // uniqueness predicate fused into the join condition — same rows,
      // one less analyzed DataFrame op per hop (the hop loop's cost is
      // driver-side analysis, one full-tree pass per op)
      val joined = frontier.join(ev, col("__vcur") === ev("__from") &&
        !array_contains(col("__vrelids"), ev("__edge").getField("id")))
      val step0 =
        if (keepAcc)
          joined.join(nodesTbl, ev("__to") === col("__vnid"))
            .select(col("__vstart"), col("__vnid").as("__vcur"),
              concat(col("__vrelids"),
                array(ev("__edge").getField("id"))).as("__vrelids"),
              concat(col("__vrels"), array(ev("__edge"))).as("__vrels"),
              concat(col("__vnodes"), array(col("__vn"))).as("__vnodes"))
        else
          joined.select(col("__vstart"), ev("__to").as("__vcur"),
            concat(col("__vrelids"),
              array(ev("__edge").getField("id"))).as("__vrelids"))
      val step = cut(step0)
      if (h >= minH) results += step
      frontier = step
    }
    val reach = results.reduceOption(_ unionByName _).getOrElse(
      frontier.limit(0))
    val joined = frame.df.join(reach,
      frame.col(prev).getField("id") === reach("__vstart"))
    var result =
      if (frame.has(nname)) {
        frame.vars.get(nname).foreach {
          case KNode | KValue => ()
          case other => throw TranslateError(
            s"VariableTypeConflict: $nname already bound as $other " +
              "cannot re-bind as a node")
        }
        filterBoundNode(ctx, Frame(joined.filter(
          col("__vcur") === frame.col(nname).getField("id")), frame.vars),
          node, nname)
      } else {
        val (constProps, dynProps) =
          node.props.partition { case (_, e) => isConst(e) }
        val scan = nodeScan(ctx, node.copy(props = constProps), nname,
          keepProps = dynProps.nonEmpty && node.variable.isEmpty)
        var f = Frame(joined.join(scan,
          col("__vcur") === scan(nname).getField("id")),
          frame.vars + (nname -> KNode))
        dynProps.foreach { case (k, e) =>
          f = f.copy(df = f.df.filter(coalesce(Values.eq(
            f.propCol(nname, k).getOrElse(
              element_at(f.col(nname).getField("props"), k)),
            trExpr(ctx, f, e)), lit(false))))
        }
        f
      }
    var df = result.df.drop("__vstart", "__vcur")
    val idsCol = keepIds match {
      case Some(n) => df = df.withColumnRenamed("__vrelids", n); Some(n)
      case None => df = df.drop("__vrelids"); None
    }
    val acc =
      if (keepAcc || rel.variable.isDefined) {
        df = df.withColumnRenamed("__vrels", relsName)
          .withColumnRenamed("__vnodes", nodesName)
        Some((relsName, nodesName))
      } else None
    val vars = result.vars ++ rel.variable.map(_ -> KValue)
    (Frame(df, vars), VarLenAcc(acc, idsCol))
  }

  /** indegree/outdegree (`entity_funcs.c:186-230`): a per-node degree needs
    * the edge table, so the scalar call resolves to a left join against a
    * degree view (`groupBy(src/dst).count`, map-side combined) and the call
    * site becomes a plain column reference (0 when unmatched — a node with
    * no edges). The join shuffles only the degree side at scale; the frame
    * keeps its partitioning.
    */
  private def resolveDegrees(ctx: Ctx, frame: Frame,
      exprs: Seq[Ast.Expr]): (Frame, Ast.Expr => Ast.Expr) = {
    // optional reltype arguments (`entity_funcs.c` takes variadic type
    // names: outdegree(n, 'friend')) restrict the counted edge set
    def typeArgs(args: List[Ast.Expr]): Option[List[String]] =
      if (args.forall(_.isInstanceOf[Ast.LitString]))
        Some(args.map { case Ast.LitString(s) => s })
      else None
    val found = scala.collection.mutable
      .LinkedHashMap[(String, String, List[String]), String]()
    exprs.foreach(Ast.foreachExpr(_) {
      case Ast.Fn(d @ ("indegree" | "outdegree"),
          Ast.Variable(v) :: rest, _)
          if frame.has(v) && typeArgs(rest).isDefined =>
        found.getOrElseUpdate((v, d, typeArgs(rest).get),
          freshName("deg")); ()
      case _ => ()
    })
    if (found.isEmpty) (frame, identity)
    else {
      var df = frame.df
      found.foreach { case ((v, dir, types), tmp) =>
        val idCol = freshName("degid")
        val edges =
          if (types.isEmpty) ctx.graph.edges
          else ctx.graph.edges.filter(col("reltype").isin(types: _*))
        val keyCol = if (dir == "outdegree") "src" else "dst"
        val deg = edges.groupBy(col(keyCol).as(idCol))
          .agg(count(lit(1)).as(s"${tmp}_n"))
        df = df.join(deg, frame.col(v).getField("id") === col(idCol),
            "left_outer")
          .withColumn(tmp,
            Values.vInt(coalesce(col(s"${tmp}_n"), lit(0L))))
          .drop(idCol, s"${tmp}_n")
      }
      val f2 = Frame(df, frame.vars ++ found.values.map(_ -> KValue))
      val rewrite = (e: Ast.Expr) => Ast.transformExpr(e) {
        case Ast.Fn(d @ ("indegree" | "outdegree"),
            Ast.Variable(v) :: rest, _)
            if typeArgs(rest).exists(t => found.contains((v, d, t))) =>
          Ast.Variable(found((v, d, typeArgs(rest).get)))
      }
      (f2, rewrite)
    }
  }

  /** Pattern comprehensions `[ (a)-[r]->(b) WHERE w | proj ]` resolve to a
    * per-row collected array BEFORE expression translation (the same tag +
    * sub-match + join-back discipline as [[patternMultiplex]]): evaluate
    * the projection per match, collect per row id ordered by the matched
    * entities' ids descending (the reference's match emission order), and
    * substitute the collected column into the expression.
    */
  /** Correlated BFS (see [[translateCall]]): one multi-source level-
    * synchronous sweep over ALL distinct source ids in the frame (the
    * same frontier machinery as var-len expansion — per-level checkpoint,
    * visited-set anti-join), then a per-source aggregation of node and
    * BFS-tree-edge arrays, index-aligned and ordered by (level, node id).
    * One traversal regardless of the frame's row count — never a per-row
    * loop.
    */
  private def bfsCorrelated(ctx: Ctx, frame: Frame, c: Ast.CallProc,
      v: String, depth: Long, rel: Option[String]): Frame = {
    val g = ctx.graph
    val edges = rel.map(g.edgesByType).getOrElse(g.edges)
    val seeds = frame.df.select(frame.col(v).getField("id").as("id"))
      .filter(col("id").isNotNull).distinct()
    val maxH = if (depth <= 0) 15 else math.min(depth, 15L).toInt
    val reach = graft.graph.GraphOps.varLenExpand(seeds,
      edges.select(col("src"), col("dst")), 0, maxH)
    val o = reach.filter(col("hops") >= 1)
      .select(col("start").as("__s"), col("node").as("__n"),
        col("hops").as("__h"))
    val e2 = edges.select(col("id").as("__eid"), col("src").as("__esrc"),
      col("dst").as("__edst"), col("reltype").as("__erel"),
      col("props").as("__eprops"))
    val pr = reach.select(col("start").as("__ps"), col("node").as("__pn"),
      col("hops").as("__ph"))
    // one BFS tree edge per discovered node: its destination is the node,
    // its source was discovered one level earlier (ties → min edge id)
    val cand = o.join(e2, col("__edst") === col("__n"))
      .join(pr, col("__ps") === col("__s") &&
        col("__pn") === col("__esrc") && col("__ph") === col("__h") - 1)
    val tree = cand.groupBy("__s", "__n", "__h").agg(
      min_by(struct(col("__eid").as("id"), col("__esrc").as("src"),
        col("__edst").as("dst"), col("__erel").as("reltype"),
        col("__eprops").as("props")), col("__eid")).as("__te"))
    val nd = g.nodes.select(col("id").as("__nid"),
      struct(col("id"), col("label"), col("props")).as("__tn"))
    val rows = tree.join(nd, col("__n") === col("__nid"))
    val agg0 = rows.groupBy("__s").agg(collect_list(
      struct(col("__h"), col("__n"), col("__tn"), col("__te"))).as("__all"))
    val sortedAll = array_sort(col("__all"), (a, b) =>
      when(a.getField("__h") < b.getField("__h"), -1)
        .when(a.getField("__h") > b.getField("__h"), 1)
        .when(a.getField("__n") < b.getField("__n"), -1)
        .when(a.getField("__n") > b.getField("__n"), 1).otherwise(0))
    val resDf = agg0.select(col("__s"),
      transform(sortedAll, x => x.getField("__tn")).as("nodes"),
      transform(sortedAll, x => x.getField("__te")).as("edges"))
    val joined = frame.df.join(resDf,
      frame.col(v).getField("id") === col("__s")).drop("__s")
    val yielded = c.yields.map { case (n, a) =>
      (n.toLowerCase, a.getOrElse(n)) }
    yielded.foreach { case (n, _) =>
      if (n != "nodes" && n != "edges") throw TranslateError(
        s"algo.BFS yields nodes and edges, not `$n`") }
    var df2 = joined
    Seq("nodes", "edges").foreach { n =>
      yielded.find(_._1 == n) match {
        case Some((_, alias)) =>
          if (alias != n) df2 = df2.withColumnRenamed(n, alias)
        case None => df2 = df2.drop(n)
      }
    }
    Frame(df2, frame.vars ++ yielded.map(_._2 -> (KValue: Kind)))
  }

  /** `shortestPath((a)-[*]->(b))` as a WITH/RETURN expression — the only
    * position the REFERENCE supports it in (`shared/shortest_path.c`,
    * test_shortest_path.py): resolves per input row through the shortest-
    * path planner and left-joins the path back on a pinned row id (no
    * route → null). Validation mirrors the reference: exactly one
    * variable-length relationship, minimal length 0 or 1, no relationship
    * property filters.
    */
  private def resolveShortestExprs(ctx: Ctx, frame: Frame,
      exprs: Seq[Ast.Expr]): (Frame, Ast.Expr => Ast.Expr) = {
    val found = scala.collection.mutable.LinkedHashMap[Ast.Expr, String]()
    exprs.foreach(Ast.foreachExpr(_) {
      case fn @ Ast.Fn("shortestpath", List(Ast.PatternPred(_)), _) =>
        found.getOrElseUpdate(fn, freshName("spx")); ()
      case _ => ()
    })
    if (found.isEmpty) return (frame, identity)
    var f = frame
    found.foreach { case (Ast.Fn(_, List(Ast.PatternPred(p)), _), tmp) =>
      if (p.tail.size != 1 || p.tail.head._1.varLen.isEmpty)
        throw TranslateError("shortestPath requires a path containing a " +
          "single variable-length relationship")
      if (p.tail.head._1.varLen.exists(_._1 > 1))
        throw TranslateError("shortestPath does not support a minimal " +
          "length different from 0 or 1")
      if (p.tail.head._1.props.nonEmpty)
        throw TranslateError(
          "filters on relationships in shortestPath are not supported")
      val rid = freshName("sprid")
      val tagged = pinRid(ctx, f.df, rid)
      // a right-to-left pattern normalizes to edge direction — the
      // reference's path value runs source→target either way (test02:
      // shortestPath((b)<-[*]-(a)) lists a's node first)
      val pN = if (p.tail.head._1.direction == -1) reversePath(p) else p
      val p2 = pN.copy(pathVar = Some(tmp), shortest = true)
      val (matched, _) = translatePath(ctx, Frame(tagged, f.vars), p2)
      val sel = matched.df.select(matched.col(rid).as("__sp_rid"),
        matched.col(tmp).as(tmp))
      val joined = tagged.join(sel, col(rid) === col("__sp_rid"),
        "left_outer").drop("__sp_rid", rid)
      f = Frame(joined, f.vars + (tmp -> (KPath: Kind)))
    }
    val rw = (e: Ast.Expr) => Ast.transformExpr(e) {
      case fn: Ast.Fn if found.contains(fn) => Ast.Variable(found(fn))
    }
    (f, rw)
  }

  private def resolvePatternComprehensions(ctx: Ctx, frame: Frame,
      exprs: Seq[Ast.Expr]): (Frame, Ast.Expr => Ast.Expr) = {
    val found =
      scala.collection.mutable.LinkedHashMap[Ast.PatternComprehension, String]()
    // comprehensions referencing an enclosing LAMBDA variable (list
    // comprehension / quantifier binder) can't be hoisted against the frame
    // — they resolve per lambda element via a head-id → list map (below):
    // pc → (map column name, lambda-bound head variable)
    val lambdaFound = scala.collection.mutable
      .LinkedHashMap[Ast.PatternComprehension, (String, String)]()
    // every variable a comprehension mentions (pattern vars included)
    def pcRefs(pc: Ast.PatternComprehension): Set[String] = {
      val vs = scala.collection.mutable.Set[String]()
      def ex(e: Ast.Expr): Unit = Ast.foreachExpr(e) {
        case Ast.Variable(n) => vs += n
        case _ => ()
      }
      pc.path.head.variable.foreach(vs += _)
      pc.path.head.props.foreach(kv => ex(kv._2))
      pc.path.tail.foreach { case (rp, np) =>
        rp.variable.foreach(vs += _); np.variable.foreach(vs += _)
        rp.props.foreach(kv => ex(kv._2)); np.props.foreach(kv => ex(kv._2))
      }
      pc.where.foreach(ex); ex(pc.projection)
      vs.toSet
    }
    // top-level occurrences only (an inner comprehension evaluates inside
    // its parent's sub-match, not against this frame); lambda binders are
    // tracked so a comprehension headed by the lambda variable is routed
    // to the map-lookup plan (TCK Pattern3 [11])
    def walk(e: Ast.Expr, bound: Set[String]): Unit = e match {
      case pc: Ast.PatternComprehension =>
        val lam = pcRefs(pc) intersect bound
        if (lam.isEmpty) { found.getOrElseUpdate(pc, freshName("pcmp")); () }
        else {
          val hv = pc.path.head.variable
          if (!hv.exists(h => lam == Set(h))) throw TranslateError(
            "pattern comprehension may reference an enclosing lambda " +
              s"variable only as its pattern head (got ${lam.mkString(", ")})")
          lambdaFound.getOrElseUpdate(pc, (freshName("pcmap"), hv.get)); ()
        }
      case Ast.ListComprehension(v, l, w, p) =>
        walk(l, bound); (w.toSeq ++ p.toSeq).foreach(walk(_, bound + v))
      case Ast.Quantifier(_, v, l, p) => walk(l, bound); walk(p, bound + v)
      case other => Ast.childExprs(other).foreach(walk(_, bound))
    }
    exprs.foreach(walk(_, Set.empty))
    if (found.isEmpty && lambdaFound.isEmpty)
      return (frame, identity[Ast.Expr] _)
    // element value + deterministic intra-list order key for one translated
    // sub-match (shared by the frame-correlated and lambda plans); nested
    // comprehensions in the projection resolve against the sub-match frame
    def elemOf(inner0: Frame, pc: Ast.PatternComprehension)
        : (Frame, Column, Column) = {
      val (inner, prw) =
        resolvePatternComprehensions(ctx, inner0, Seq(pc.projection))
      val proj = prw(pc.projection)
      val c = trExpr(ctx, inner, proj)
      val elem = typeOf(inner, proj, c) match {
        case Some(st: StructType) if isVariantStruct(st) => Values.narrow(c)
        case Some(st: StructType) if st.fieldNames.contains("nodes") =>
          Values.sBoxed(to_json(c)) // path value → boxed {nodes, rels}
        case Some(st: StructType) if st.fieldNames.contains("props") =>
          Values.sBoxed(
            if (st.fieldNames.contains("reltype")) boxEdge(c) else boxNode(c))
        case Some(st: StructType) if isMapStruct(st) =>
          Values.sBoxed(boxMapStruct(c))
        case _ => Values.narrow(c)
      }
      val idCols = (pc.path.head.variable.getOrElse(nameOf(pc.path.head)) ::
        pc.path.tail.flatMap { case (rp, np) =>
          List(rp.variable.getOrElse(nameOf(rp)),
            np.variable.getOrElse(nameOf(np)))
        }).filter(n => inner.vars.get(n).exists(k => k == KNode || k == KEdge))
        .map(n => -inner.col(n).getField("id"))
      val key = if (idCols.isEmpty) array(lit(0L)) else array(idCols: _*)
      (inner, elem, key)
    }
    var f = frame
    found.foreach { case (pc, tmp) =>
      val rid = freshName("rid")
      val tagged = pinRid(ctx, f.df, rid)
      val seed = Frame(tagged, f.vars)
      var (inner0, _) = translatePath(ctx, seed, pc.path)
      pc.where.foreach { w => inner0 = applyWhere(ctx, inner0, w) }
      val (inner, elem, key) = elemOf(inner0, pc)
      val collected = inner.df
        .groupBy(inner.col(rid).as(rid))
        .agg(collect_list(struct(key.as("k"), elem.as("v"))).as("__pcl"))
        .select(col(rid),
          transform(array_sort(col("__pcl")), x => x.getField("v")).as(tmp))
      val joined = tagged.join(collected, Seq(rid), "left_outer")
        .withColumn(tmp, Values.vArr(coalesce(col(tmp),
          array().cast(ArrayType(Values.elemType)))))
        .drop(rid)
      f = Frame(joined, f.vars + (tmp -> KValue))
    }
    lambdaFound.foreach { case (pc, (tmp, hv)) =>
      // the comprehension's value depends only on the head entity: match
      // the pattern ONCE with the head free, group per head id, and ship
      // the id → list map to every row (broadcast singleton). Bounded by
      // the pattern's total match count — the same rows a per-element
      // re-match would produce, materialized once instead of per row.
      val unit = ctx.graph.nodes.sparkSession.range(1).toDF("__pc_unit")
      var (inner0, _) = translatePath(ctx, Frame(unit, Map.empty), pc.path)
      pc.where.foreach { w => inner0 = applyWhere(ctx, inner0, w) }
      val (inner, elem, key) = elemOf(inner0, pc)
      val grouped = inner.df
        .groupBy(inner.col(hv).getField("id").as("__pc_hid"))
        .agg(collect_list(struct(key.as("k"), elem.as("v"))).as("__pcl"))
        .select(col("__pc_hid"),
          transform(array_sort(col("__pcl")), x => x.getField("v"))
            .as("__pc_lst"))
      val mapDf = grouped.agg(map_from_entries(
        collect_list(struct(col("__pc_hid"), col("__pc_lst")))).as(tmp))
      f = Frame(f.df.crossJoin(broadcast(mapDf)), f.vars + (tmp -> KValue))
    }
    val rewrite = (e: Ast.Expr) => Ast.transformExpr(e) {
      case pc: Ast.PatternComprehension if found.contains(pc) =>
        Ast.Variable(found(pc))
      case pc: Ast.PatternComprehension if lambdaFound.contains(pc) =>
        val (tmp, hv) = lambdaFound(pc)
        Ast.PcLookup(tmp, Ast.Fn("id", List(Ast.Variable(hv))))
    }
    (f, rewrite)
  }

  // ═══════════════════════════ WHERE / predicates ══════════════════════════
  /** Split top-level conjunction; pattern predicates become semi/anti joins
    * (`reduce_to_apply.c` ≡ RewritePredicateSubquery, done at translation).
    */
  private def applyWhere(ctx: Ctx, frame: Frame, w: Ast.Expr): Frame = {
    def conjuncts(e: Ast.Expr): List[Ast.Expr] = e match {
      case Ast.Bin("AND", l, r) => conjuncts(l) ++ conjuncts(r)
      case other => List(other)
    }
    checkBoolPredicate(frame, w)
    // value equality: true iff a variable of entity-ish kind is NOT involved
    // (entity orderKeys rank-only — all nodes would compare equal)
    def valueExpr(e: Ast.Expr): Boolean = e match {
      case Ast.Variable(v) => frame.vars.get(v).forall(_ == KValue)
      case _ => true
    }
    // does the expression read any frame column? A constant side keeps the
    // old variant-eq path: it folds to a native comparison and reaches the
    // parquet scan as a pushed filter, which the orderKey struct equality
    // (needed only for JOIN-key extraction) would prevent
    def refsVar(e: Ast.Expr): Boolean =
      e.isInstanceOf[Ast.Variable] || e.isInstanceOf[Ast.Prop] || (e match {
        case Ast.Bin(_, l, r) => refsVar(l) || refsVar(r)
        case Ast.Fn(_, args, _) => args.exists(refsVar)
        case Ast.Neg(x) => refsVar(x)
        case _ => false
      })
    var f = frame
    conjuncts(w).foreach {
      case Ast.PatternPred(p) => f = patternFilter(ctx, f, p, anti = false)
      case Ast.Not(Ast.PatternPred(p)) => f = patternFilter(ctx, f, p, anti = true)
      case Ast.Fn("exists", List(Ast.PatternPred(p)), _) =>
        f = patternFilter(ctx, f, p, anti = false)
      case Ast.Not(Ast.Fn("exists", List(Ast.PatternPred(p)), _)) =>
        f = patternFilter(ctx, f, p, anti = true)
      case pred if containsPattern(pred) =>
        // pattern predicates under OR / NOT / arbitrary boolean structure
        f = patternMultiplex(ctx, f, pred)
      case pred @ Ast.Bin("=", l0, r0) if valueExpr(l0) && valueExpr(r0) &&
          refsVar(l0) && refsVar(r0) =>
        // top-level equality conjunct → ONE struct-equality predicate on
        // the global-order sort key (the same normalization DISTINCT and
        // min/max already use). Catalyst extracts it as an equi-join key,
        // so a value join between patterns (WHERE a.x = b.x over a cross
        // pattern — ValueHashJoin, `op_value_hash_join.c`) plans as a hash
        // join instead of a nested-loop filter. Ternary semantics hold:
        // a null side yields a null key, null comparisons filter out.
        val (f2, rw) = resolveDegrees(ctx, f, Seq(pred))
        val (l, r) = rw(pred) match {
          case Ast.Bin("=", a, b) => (a, b)
          case _ => (l0, r0)
        }
        f = layeredFilter(ctx, f2, List(l, r)) { case (f3, List(l2, r2)) =>
          f3.df.filter(
            Values.eqKey(trExpr(ctx, f3, l2)) ===
              Values.eqKey(trExpr(ctx, f3, r2)))
        }
      case pred0 =>
        val (fp, pcRw) = resolvePatternComprehensions(ctx, f, Seq(pred0))
        val pred = pcRw(pred0)
        val (f2, rw) = resolveDegrees(ctx, fp, Seq(pred))
        f = layeredFilter(ctx, f2, List(rw(pred))) { case (f3, List(p2)) =>
          f3.df.filter(Values.filterTrue(trExpr(ctx, f3, p2)))
        }
    }
    f
  }

  /** The reference's FilterTree_Valid compile check plus the
    * statically-knowable half of its runtime FT_N_EXP type rule
    * (`filter_tree.c:431-435`, `FilterTree_applyFilters`): walking the
    * boolean structure (AND/OR/XOR/NOT), a leaf expression filter that is
    * a non-boolean CONSTANT — or a bare entity variable, whose type IS
    * known at compile time — raises "Expected boolean predicate".
    * Comparisons/functions/value variables pass (runtime ternary
    * semantics apply; list-valued leaves filter on non-emptiness, see
    * [[applyWhere]]).
    */
  private def checkBoolPredicate(frame: Frame, e: Ast.Expr): Unit = {
    def leafCheck(x: Ast.Expr): Unit = x match {
      case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
          _: Ast.MapLit =>
        throw TranslateError("Expected boolean predicate.")
      case Ast.ListLit(items) if items.forall(isPureLit) =>
        throw TranslateError("Expected boolean predicate.")
      case Ast.Variable(v) if frame.vars.get(v).exists(k =>
        k == KNode || k == KEdge || k == KPath) =>
        throw TranslateError("Expected boolean predicate.")
      case _ => ()
    }
    def walk(x: Ast.Expr): Unit = x match {
      case Ast.Bin(op, l, r) if Set("AND", "OR", "XOR")(op) =>
        walk(l); walk(r)
      case Ast.Not(i) => walk(i)
      case leaf => leafCheck(leaf)
    }
    walk(e)
  }

  /** Filter with evaluation layering: the predicate's nested
    * sub-expressions hoist into temp projection layers (see
    * [[layerNested]] — keeps every Catalyst tree one operator deep), the
    * filter runs over the layered frame, and the temps drop afterwards so
    * the frame's column set is unchanged. A shallow predicate adds no
    * layers and takes the exact old plan.
    */
  private def layeredFilter(ctx: Ctx, f: Frame, preds: List[Ast.Expr])(
      build: (Frame, List[Ast.Expr]) => DataFrame): Frame = {
    val before = f.df.columns
    val (f3, litems) = layerNested(ctx, f,
      preds.zipWithIndex.map { case (p, i) => (p, s"__w$i") })
    val filtered = build(f3, litems.map(_._1))
    val out =
      if (filtered.columns.sameElements(before)) filtered
      else filtered.select(before.map(c => filtered(s"`$c`")).toSeq: _*)
    f.copy(df = out)
  }

  private def containsPattern(e: Ast.Expr): Boolean = e match {
    case _: Ast.PatternPred => true
    case Ast.Bin(_, l, r) => containsPattern(l) || containsPattern(r)
    case Ast.Not(x) => containsPattern(x)
    case Ast.Neg(x) => containsPattern(x)
    case Ast.Fn(_, args, _) => args.exists(containsPattern)
    case _ => false
  }

  /** ApplyMultiplexer (`/root/reference/src/execution_plan/ops/
    * op_apply_multiplexer.c:171`): pattern predicates composed under
    * OR/NOT/any boolean structure. Each DISTINCT pattern runs once as a
    * semi-join key set on a tagged row id and materializes as a boolean
    * flag column (left join + coalesce(false) — a pattern predicate is
    * two-valued); the surrounding expression then evaluates as a plain
    * value predicate over the flags. One tag + one join per distinct
    * pattern, no per-branch re-execution of the input.
    */
  private def patternMultiplex(ctx: Ctx, frame: Frame, pred: Ast.Expr): Frame = {
    val rid = freshName("rid")
    // pinRid keeps the rid STABLE across the per-pattern self-joins
    // (recomputation would renumber rows); eager only while small.
    val tagged = pinRid(ctx, frame.df, rid)
    val flags = scala.collection.mutable.LinkedHashMap[Ast.PathPat, String]()
    def collectPats(e: Ast.Expr): Unit = e match {
      case Ast.PatternPred(p) =>
        if (!flags.contains(p)) flags(p) = freshName("pp")
      case Ast.Bin(_, l, r) => collectPats(l); collectPats(r)
      case Ast.Not(x) => collectPats(x)
      case Ast.Neg(x) => collectPats(x)
      case Ast.Fn(_, args, _) => args.foreach(collectPats)
      case _ => ()
    }
    collectPats(pred)
    val seed = Frame(tagged, frame.vars)
    var df = tagged
    flags.foreach { case (p, fn) =>
      val (inner, _) = translatePath(ctx, seed, p)
      val keys = inner.df.select(inner.col(rid)).distinct()
        .withColumn(fn, lit(true))
      df = df.join(keys, Seq(rid), "left_outer")
        .withColumn(fn, Values.vBool(coalesce(col(fn), lit(false))))
    }
    // exists(pattern) IS the flag; a bare pattern predicate likewise
    def subst(e: Ast.Expr): Ast.Expr = e match {
      case Ast.Fn("exists", List(Ast.PatternPred(p)), _) =>
        Ast.Variable(flags(p))
      case Ast.PatternPred(p) => Ast.Variable(flags(p))
      case Ast.Bin(op, l, r) => Ast.Bin(op, subst(l), subst(r))
      case Ast.Not(x) => Ast.Not(subst(x))
      case Ast.Neg(x) => Ast.Neg(subst(x))
      case f @ Ast.Fn(n, args, _) => f.copy(args = args.map(subst))
      case other => other
    }
    val f2 = Frame(df, frame.vars ++ flags.values.map(_ -> KValue))
    val rewritten = subst(pred)
    val (f3, rw) = resolveDegrees(ctx, f2, Seq(rewritten))
    val filtered = f3.df.filter(
      Values.filterTrue(trExpr(ctx, f3, rw(rewritten))))
    Frame(filtered.drop(flags.values.toSeq :+ rid: _*), frame.vars)
  }

  /** SemiApply / AntiSemiApply (`op_semi_apply.c`) via left_semi/left_anti
    * on a tagged row id.
    */
  private def patternFilter(ctx: Ctx, frame: Frame, p: Ast.PathPat,
      anti: Boolean): Frame = {
    val rid = freshName("rid")
    val tagged = pinRid(ctx, frame.df, rid)
    val seed = Frame(tagged, frame.vars)
    val (inner, _) = translatePath(ctx, seed, p)
    val keys = inner.df.select(inner.col(rid)).distinct()
    val how = if (anti) "left_anti" else "left_semi"
    val kept = tagged.join(keys, Seq(rid), how).drop(rid)
    Frame(kept, frame.vars)
  }

  // ═══════════════════════════════ UNWIND ══════════════════════════════════
  private[cypher] def translateUnwind(ctx: Ctx, frame: Frame,
      u: Ast.Unwind): Frame = {
    val v = trExpr(ctx, frame, u.list)
    // schema-driven: UNWIND over an ENTITY list (collect(n), nodes(p),
    // relationships(p)) binds entity rows, not variant scalars
    frame.df.select(v).schema.head.dataType match {
      case ArrayType(s: StructType, _) if s.fieldNames.contains("props") =>
        val kind = if (s.fieldNames.contains("reltype")) KEdge else KNode
        Frame(frame.df.withColumn(u.alias, explode(v)),
          frame.vars + (u.alias -> kind))
      case ArrayType(s: StructType, _) if !isVariantStruct(s) =>
        // typed-map array ([{a: 1}, {a: 2}]): elements bind as raw map
        // structs — prop access and the map sort key read them natively
        Frame(frame.df.withColumn(u.alias, explode(v)),
          frame.vars + (u.alias -> (KValue: Kind)))
      case _ =>
        val tmp = freshName("ex")
        val df = frame.df
          .withColumn(tmp, explode(v.getField("arr")))
          .withColumn(u.alias, Values.widen(col(tmp)))
          .drop(tmp)
        Frame(df, frame.vars + (u.alias -> KValue))
    }
  }

  // ═══════════════════════════ WITH / RETURN ═══════════════════════════════
  private[cypher] def containsAgg(e: Ast.Expr): Boolean = e match {
    case Ast.CountStar => true
    case Ast.Fn(n, args, _) =>
      AggFns.contains(n) || args.exists(containsAgg)
    case Ast.Bin(_, l, r) => containsAgg(l) || containsAgg(r)
    case Ast.ListComprehension(_, list, _, _) => containsAgg(list)
    case Ast.Quantifier(_, _, list, _) => containsAgg(list)
    case Ast.Subscript(t, i) => containsAgg(t) || containsAgg(i)
    case Ast.SliceExpr(t, f, to) => containsAgg(t) ||
      f.exists(containsAgg) || to.exists(containsAgg)
    case Ast.ListLit(xs) => xs.exists(containsAgg)
    case Ast.MapLit(entries) => entries.exists { case (_, v) => containsAgg(v) }
    case Ast.Not(x) => containsAgg(x)
    case Ast.Neg(x) => containsAgg(x)
    case Ast.IsNull(x, _) => containsAgg(x)
    case Ast.Prop(x, _) => containsAgg(x)
    case Ast.CaseExpr(s, w, o) =>
      s.exists(containsAgg) || w.exists { case (a, b) =>
        containsAgg(a) || containsAgg(b)
      } || o.exists(containsAgg)
    case _ => false
  }

  /** Marker field keeping the empty map literal representable as a Spark
    * struct (which needs at least one field); ignored by decode/compare.
    */
  val EmptyMapMarker = "__emptymap"

  /** Best-effort schema probe. None when the expression isn't resolvable
    * against the frame alone (e.g. it references lambda variables inside a
    * comprehension) — lambda-scope values are always variants anyway.
    */
  private def dataTypeOf(frame: Frame, c: Column): Option[DataType] =
    try Some(frame.df.select(c).schema.head.dataType)
    catch { case _: Throwable => None }

  /** Static type of an expression, resolvable even when the expression
    * closes over a lambda variable (a `transform`/`filter` binding cannot
    * be `df.select`ed, so [[dataTypeOf]] returns None inside lambda
    * bodies). Lambda variables carry their element type in
    * `frame.bindingTypes`; the entity/path-shaped functions have fixed
    * return types.
    */
  private def staticTypeOf(frame: Frame, e: Ast.Expr): Option[DataType] =
    e match {
      case Ast.Variable(n) => frame.bindingTypes.get(n)
      case Ast.Fn("nodes", _, _) => Some(ArrayType(nodeStructType))
      case Ast.Fn("relationships", _, _) => Some(ArrayType(edgeStructType))
      case Ast.Fn("startnode" | "endnode", _, _) => Some(nodeStructType)
      case Ast.Fn("head" | "last", args, _) =>
        staticTypeOf(frame, args.head).collect {
          case ArrayType(et: StructType, _) if !isVariantStruct(et) => et
        }
      case Ast.Fn("tail", args, _) =>
        staticTypeOf(frame, args.head).collect {
          case a @ ArrayType(et: StructType, _) if !isVariantStruct(et) => a
        }
      case Ast.Subscript(tgt, _) =>
        staticTypeOf(frame, tgt).collect {
          case ArrayType(et: StructType, _) if !isVariantStruct(et) => et
        }
      case _ => None
    }

  /** [[staticTypeOf]] first (lambda-safe), then the frame schema. */
  private[cypher] def typeOf(frame: Frame, e: Ast.Expr,
      c: Column): Option[DataType] =
    staticTypeOf(frame, e).orElse(dataTypeOf(frame, c))

  private[cypher] def isVariantStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      s.fieldNames.take(5).sameElements(Array("t", "i", "f", "s", "b"))
    case _ => false
  }

  /** A typed map-value struct (from a map literal) — any struct that is
    * not the variant encoding, an entity, or a path.
    */
  private[cypher] def isMapStruct(dt: DataType): Boolean = dt match {
    case s: StructType =>
      !isVariantStruct(s) && !s.fieldNames.contains("props") &&
        s.fieldNames.toSeq != Seq("nodes", "rels")
    case _ => false
  }

  /** Cypher map equality (ternary): differing key sets → false; same keys
    * → per-key equality folded with ternary AND (`map.c` Map_Compare
    * semantics, TCK Comparison1 [7]).
    */
  private def mapEq(a: Column, da: DataType, b: Column,
      db: DataType): Column = {
    def keysOf(dt: DataType): Option[Seq[(String, DataType)]] = dt match {
      case s: StructType if isMapStruct(s) =>
        Some(s.fields.toSeq.filter(_.name != EmptyMapMarker)
          .map(f => f.name -> f.dataType))
      case _ => None
    }
    (keysOf(da), keysOf(db)) match {
      case (Some(ka), Some(kb)) =>
        if (ka.map(_._1).toSet != kb.map(_._1).toSet) lit(false)
        else {
          val bs = kb.toMap
          ka.map { case (k, dva) =>
            val dvb = bs(k)
            if (isMapStruct(dva) || isMapStruct(dvb))
              mapEq(a.getField(k), dva, b.getField(k), dvb)
            else Values.eq(a.getField(k), b.getField(k))
          }.reduceOption(_ && _).getOrElse(lit(true))
        }
      case _ => lit(false) // map vs non-map never equal
    }
  }

  private def hasMapType(dt: DataType): Boolean = dt match {
    case _: MapType => true
    case s: StructType => s.fields.exists(f => hasMapType(f.dataType))
    case a: ArrayType => hasMapType(a.elementType)
    case _ => false
  }

  /** Cypher map equality is entry-order-insensitive: canonicalize maps to
    * key-sorted entry arrays (recursively) so serialized forms compare.
    */
  private def canonKeyType(dt: DataType): DataType = dt match {
    case m: MapType =>
      ArrayType(StructType(Seq(StructField("key", m.keyType),
        StructField("value", canonKeyType(m.valueType)))))
    case a: ArrayType => a.copy(elementType = canonKeyType(a.elementType))
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = canonKeyType(f.dataType))))
    case other => other
  }

  private def canonKey(cc: Column, dt: DataType): Column = dt match {
    case m: MapType =>
      // canon(value) first: a map-free value makes the entry struct
      // orderable for array_sort
      array_sort(transform(map_entries(cc), e =>
        struct(e.getField("key").as("key"),
          canonKey(e.getField("value"), m.valueType).as("value"))))
    case a: ArrayType if hasMapType(a.elementType) =>
      transform(cc, x => canonKey(x, a.elementType))
    case s: StructType if hasMapType(s) =>
      // keep NULL structs NULL (struct() of nulls would collide)
      when(cc.isNull, lit(null).cast(canonKeyType(s))).otherwise(
        struct(s.fields.map(f =>
          canonKey(cc.getField(f.name), f.dataType).as(f.name)).toSeq: _*))
    case _ => cc
  }

  /** Identity dedup key for one column, derived from its SCHEMA: entities
    * dedup by id, paths by node+rel id sequences (parallel edges give
    * distinct paths over identical node sequences), relationship lists by
    * id sequence, map-bearing values by canonical JSON. None = the column
    * is directly usable as a set-operation key.
    */
  private def identityKeyFor(c: Column, dt: DataType): Option[Column] = {
    // NULL-preserving (concat_ws would swallow a NULL array, merging NULL
    // with the empty list under DISTINCT)
    def nullSafe(k: Column): Column =
      when(c.isNull, lit(null).cast(StringType)).otherwise(k)
    dt match {
      case s: StructType if s.fieldNames.contains("props") &&
          s.fieldNames.contains("id") => // node / edge struct
        Some(nullSafe(c.getField("id").cast(StringType)))
      case s: StructType if s.fieldNames.toSeq == Seq("nodes", "rels") =>
        Some(nullSafe(concat_ws("|",
          concat_ws(",", transform(c.getField("nodes"),
            x => x.getField("id").cast(StringType))),
          concat_ws(",", transform(c.getField("rels"),
            x => x.getField("id").cast(StringType))))))
      case ArrayType(s: StructType, _)
          if s.fieldNames.contains("reltype") => // relationship list
        Some(nullSafe(concat_ws(",",
          transform(c, x => x.getField("id").cast(StringType)))))
      case d if hasMapType(d) =>
        Some(nullSafe(to_json(canonKey(c, d))))
      case _ => None
    }
  }

  /** dropDuplicates that tolerates entity/map columns (Spark set ops
    * reject MapType): dedup on identity keys, drop the keys after.
    */
  private[cypher] def dedupByIdentity(df: DataFrame): DataFrame = {
    var keyed = df
    val tempKeys = scala.collection.mutable.ArrayBuffer[String]()
    val dedupCols = df.schema.fields.map { fld =>
      identityKeyFor(keyed(s"`${fld.name}`"), fld.dataType) match {
        case Some(key) =>
          val kn = freshName("dk")
          keyed = keyed.withColumn(kn, key)
          tempKeys += kn
          kn
        case None => fld.name
      }
    }
    if (dedupCols.isEmpty) df.dropDuplicates()
    else keyed.dropDuplicates(dedupCols.head, dedupCols.tail: _*)
      .drop(tempKeys.toSeq: _*)
  }

  private def defaultName(e: Ast.Expr): String = e match {
    case Ast.Variable(n) => n
    case Ast.Prop(Ast.Variable(n), k) => s"$n.$k"
    case Ast.CountStar => "count(*)"
    case Ast.Fn(n, _, _) => n
    case _ => freshName("col")
  }

  private[cypher] def translateProjection(ctx: Ctx, frame0: Frame,
      proj0: Ast.Projection, where: Option[Ast.Expr],
      carryFlats: Boolean = false): Frame = {
    // shortestPath expressions, pattern comprehensions and degree calls
    // resolve to joined columns before any projection math
    val (frameSp, spRw) = resolveShortestExprs(ctx, frame0,
      proj0.items.map(_._1) ++ proj0.orderBy.map(_.expr))
    val (framePc, pcRw0) = resolvePatternComprehensions(ctx, frameSp,
      proj0.items.map(i => spRw(i._1)) ++
        proj0.orderBy.map(si => spRw(si.expr)))
    val pcRw = (e: Ast.Expr) => pcRw0(spRw(e))
    val (frame, degRw0) = resolveDegrees(ctx, framePc,
      proj0.items.map(i => pcRw(i._1)) ++
        proj0.orderBy.map(si => pcRw(si.expr)))
    val degRw = (e: Ast.Expr) => degRw0(pcRw(e))
    val proj = proj0.copy(
      // pin default aliases pre-rewrite (outdegree(n) stays named outdegree)
      items = proj0.items.map { case (e, a) =>
        (degRw(e), e match {
          case Ast.Variable("*") => a
          case _ => Some(a.getOrElse(defaultName(e)))
        })
      },
      orderBy = proj0.orderBy.map(si => si.copy(expr = degRw(si.expr))))
    // expand RETURN *
    val items: List[(Ast.Expr, String)] = proj.items.flatMap {
      case (Ast.Variable("*"), _) =>
        val vs = frame.vars.keys.filter(!_.startsWith("__")).toList.sorted
        // `MATCH () RETURN *` has nothing to project (TCK Return7 [2]);
        // `WITH *` (carryFlats) legally passes empty scope through
        if (vs.isEmpty && !carryFlats) throw TranslateError(
          "NoVariablesInScope: RETURN * requires variables in scope")
        vs.map(n => (Ast.Variable(n), n))
      case (e, alias) => List((e, alias.getOrElse(defaultName(e))))
    }

    val hasAgg = items.exists { case (e, _) => containsAgg(e) }
    // layered evaluation of nested item expressions (see layerNested) —
    // keeps every Catalyst tree one operator deep. Top-level Variables are
    // never rewritten, so kinds/carry logic below behave identically.
    val (lframe, litems) = layerNested(ctx, frame, items)
    var f: Frame = null

    if (hasAgg) {
      // Aggregate (`op_aggregate.c`): keys = non-aggregate items. Aggregate
      // calls nested in expressions (round(sum(x))/2) are extracted into
      // temp columns, the outer expression runs post-aggregation.
      val keys = litems.filter { case (e, _) => !containsAgg(e) }
      // Aggregate ARGUMENTS layer against the pre-agg frame (items holding
      // aggregates skip the outer layerNested pass — a temp hoisted there
      // would be invisible across the agg boundary). Without this,
      // `sum(<nested arithmetic>)` translates at full depth and the variant
      // combinators' per-op operand fan-out turns the Column tree
      // exponential (OOM on TCK Return6 [16]). Only the VALUE argument
      // (position 0) layers; shape-inspected tails (percentile's p) and
      // entity/leaf args pass through layerNested unchanged.
      var pre = lframe
      def layerAggArg(arg: Ast.Expr): Ast.Expr = {
        val (f2, its) = layerNested(ctx, pre, List((arg, "__aggarg")))
        pre = f2
        its.head._1
      }
      val aggTemps = scala.collection.mutable.ArrayBuffer[(String, Ast.Expr)]()
      // non-aggregate subexpressions that read pre-aggregation variables
      // become implicit grouping keys ({foo: a.name='x', kids: collect(…)},
      // TCK Return6 [6]) — hoisted whole so the post-agg expression only
      // sees keys and aggregate temps
      val keyTemps = scala.collection.mutable.ArrayBuffer[(String, Ast.Expr)]()
      def refsFrameVar(e: Ast.Expr): Boolean = {
        var found = false
        def walk(x: Ast.Expr): Unit = x match {
          case Ast.Variable(v) if lframe.has(v) => found = true
          case Ast.Bin(_, l, r) => walk(l); walk(r)
          case Ast.Not(y) => walk(y)
          case Ast.Neg(y) => walk(y)
          case Ast.IsNull(y, _) => walk(y)
          case Ast.Prop(y, _) => walk(y)
          case Ast.Fn(_, args, _) => args.foreach(walk)
          case Ast.CaseExpr(s, w, o) =>
            s.foreach(walk); w.foreach { case (a, b) => walk(a); walk(b) }
            o.foreach(walk)
          case Ast.ListLit(xs) => xs.foreach(walk)
          case Ast.MapLit(es) => es.foreach(kv => walk(kv._2))
          case Ast.Subscript(tg, i) => walk(tg); walk(i)
          case Ast.SliceExpr(tg, a, b) =>
            walk(tg); a.foreach(walk); b.foreach(walk)
          case Ast.ListComprehension(_, l, w2, p) =>
            walk(l); w2.foreach(walk); p.foreach(walk)
          case Ast.Quantifier(_, _, l, p) => walk(l); walk(p)
          case Ast.HasLabel(t, _) => walk(t)
          case _ => ()
        }
        walk(e)
        found
      }
      def extract(e: Ast.Expr): Ast.Expr = e match {
        case a if isAggCall(a) =>
          val n = freshName("agg")
          val a2 = a match {
            case Ast.Fn(fn, a0 :: rest, d) => Ast.Fn(fn, layerAggArg(a0) :: rest, d)
            case other => other
          }
          aggTemps += n -> a2
          Ast.Variable(n)
        case e2 if !containsAgg(e2) && refsFrameVar(e2) =>
          val n = freshName("key")
          keyTemps += n -> e2
          Ast.Variable(n)
        case Ast.Bin(op, l, r) => Ast.Bin(op, extract(l), extract(r))
        case Ast.Not(x) => Ast.Not(extract(x))
        case Ast.Neg(x) => Ast.Neg(extract(x))
        case Ast.IsNull(x, neg) => Ast.IsNull(extract(x), neg)
        case Ast.Fn(n, args, d) => Ast.Fn(n, args.map(extract), d)
        case Ast.CaseExpr(s, w, o) => Ast.CaseExpr(s.map(extract),
          w.map { case (a, b) => (extract(a), extract(b)) }, o.map(extract))
        // aggregate in a comprehension SOURCE ([x IN collect(v) | ...])
        // extracts like any other; lambda bodies cannot aggregate
        case Ast.ListComprehension(v, list, w, pr) =>
          Ast.ListComprehension(v, extract(list), w, pr)
        case Ast.Quantifier(k, v, list, pr) =>
          Ast.Quantifier(k, v, extract(list), pr)
        case Ast.Subscript(tg, i) => Ast.Subscript(extract(tg), extract(i))
        case Ast.SliceExpr(tg, f, to) =>
          Ast.SliceExpr(extract(tg), f.map(extract), to.map(extract))
        case Ast.ListLit(xs) => Ast.ListLit(xs.map(extract))
        case Ast.MapLit(entries) => Ast.MapLit(entries.map { case (k, v) =>
          (k, extract(v)) })
        case Ast.HasLabel(x, l) => Ast.HasLabel(extract(x), l)
        case other => other
      }
      val rewritten = litems.map { case (e, n) =>
        // key items are already materialized as named groupBy columns
        if (containsAgg(e)) (extract(e), n) else (Ast.Variable(n), n)
      }
      // translate keys AND aggregates against the final layered frame
      val keyCols = keys.map { case (e, n) => trAny(ctx, pre, e).as(n) } ++
        keyTemps.toSeq.map { case (n, e) => trAny(ctx, pre, e).as(n) }
      val aggCols = aggTemps.toSeq.map { case (n, a2) =>
        trAgg(ctx, pre, a2).as(n)
      }
      val grouped =
        if (keyCols.isEmpty) pre.df.agg(aggCols.head, aggCols.tail: _*)
        else pre.df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      val postVars: Map[String, Kind] =
        keys.map { case (e, n) => n -> kindOf(ctx, pre, e) }.toMap ++
          keyTemps.map { case (n, e) => n -> kindOf(ctx, pre, e) } ++
          aggTemps.map(_._1 -> KValue)
      // post-aggregation arithmetic gets its own layering pass
      val (postFrame, ritems) =
        layerNested(ctx, Frame(grouped, postVars), rewritten)
      val finalCols = ritems.map { case (e, n) =>
        trAny(ctx, postFrame, e).as(n)
      }
      f = Frame(postFrame.df.select(finalCols: _*),
        litems.map { case (e, n) => n -> kindOf(ctx, lframe, e) }.toMap)

    } else if (proj.distinct) {
      // DISTINCT projects first; ORDER BY sees only projected values.
      // Entities/paths carry props MAPs which Spark's set operations
      // reject — dedup on schema-derived identity keys (entity = id).
      // WHERE attached to the WITH filters BEFORE the dedup projection and
      // sees pre-projection variables AND the new aliases (TCK WithWhere1).
      var pref = lframe.copy(
        vars = lframe.vars ++ litems.map { case (e, n) =>
          n -> kindOf(ctx, lframe, e)
        },
        bindings = lframe.bindings ++ litems.map { case (e, n) =>
          n -> trAny(ctx, lframe, e)
        })
      where.foreach { w => pref = applyWhere(ctx, pref, w) }
      val src = lframe.copy(df = pref.df)
      val df0 = src.df.select(litems.map { case (e, n) =>
        trAny(ctx, src, e).as(n)
      }: _*)
      val kinds = litems.map { case (e, n) => n -> kindOf(ctx, lframe, e) }
      f = Frame(dedupByIdentity(df0), kinds.toMap)

    } else {
      // keep pre-projection columns alongside items so ORDER BY can
      // reference underlying variables (Cypher scoping); dropped after sort
      val itemCols = litems.zipWithIndex.map { case ((e, _), i) =>
        trAny(ctx, lframe, e).as(s"__item_$i")
      }
      val wide = lframe.df.select(lframe.df.col("*") +: itemCols: _*)
      val aliasMap = items.zipWithIndex.map { case ((_, n), i) =>
        n -> s"__item_$i"
      }.toMap
      val sortVars = frame.vars ++ items.map { case (e, n) =>
        n -> kindOf(ctx, frame, e)
      }
      def aliased(d: DataFrame,
          vs: Map[String, Kind] = sortVars): Frame = new Frame(d, vs) {
        override def col(name: String): Column =
          aliasMap.get(name).map(d(_)).getOrElse(super.col(name))
        // layering derives new frames (temp projection columns on top);
        // the __item_i columns survive those selects, so the alias view
        // re-wraps the derived df and keeps resolving projected names
        override def derive(newDf: DataFrame,
            newVars: Map[String, Kind]): Frame = aliased(newDf, newVars)
      }
      var sorted = wide
      where.foreach { w => sorted = applyWhere(ctx, aliased(sorted), w).df }
      if (proj.orderBy.nonEmpty) {
        val sf = aliased(sorted)
        val sorts = proj.orderBy.map { si =>
          val k = sortKey(ctx, sf, si.expr)
          if (si.ascending) k.asc_nulls_last else k.desc_nulls_first
        }
        sorted = sorted.orderBy(sorts: _*)
      }
      proj.skip.foreach(e => sorted = sorted.offset(runtimeInt(ctx, e, "SKIP")))
      proj.limit.foreach(e => sorted = sorted.limit(runtimeInt(ctx, e, "LIMIT")))
      // bare entity variables keep their scan-level flat property columns
      // across the projection (renamed to the new alias) — row-preserving
      // here, so carrying extra columns is safe (not so for DISTINCT/agg)
      val carry = if (!carryFlats) Nil else items.flatMap { case (e, n) =>
        e match {
          case Ast.Variable(v) if frame.vars.get(v)
              .exists(k => k == KNode || k == KEdge) =>
            sorted.columns.filter(_.startsWith(s"__p:$v:")).toSeq.map { pc =>
              sorted(s"`$pc`").as(s"__p:$n:" + pc.stripPrefix(s"__p:$v:"))
            }
          case _ => Nil
        }
      }
      val named = sorted.select(items.zipWithIndex.map { case ((_, n), i) =>
        col(s"__item_$i").as(n)
      } ++ carry: _*)
      recordConstVars(ctx, items)
      return Frame(named, items.map { case (e, n) =>
        n -> kindOf(ctx, frame, e)
      }.toMap)
    }

    // agg path: WHERE over the projected frame (HAVING shape); the
    // distinct-only path already filtered pre-projection
    if (hasAgg || !proj.distinct)
      where.foreach { w => f = applyWhere(ctx, f, w) }
    if (proj.orderBy.nonEmpty) {
      val sorts = proj.orderBy.map { si =>
        // ORDER BY may repeat a projected expression verbatim — most
        // commonly an aggregate (ORDER BY count(*) DESC): resolve
        // structural matches to the output alias instead of re-translating
        // (an aggregate can't evaluate post-aggregation)
        val resolved = litems.collectFirst {
          case (e, n) if e == si.expr => Ast.Variable(n)
        }.getOrElse(si.expr)
        val k = sortKey(ctx, f, resolved)
        if (si.ascending) k.asc_nulls_last else k.desc_nulls_first
      }
      f = f.copy(df = f.df.orderBy(sorts: _*))
    }
    proj.skip.foreach(e => f = f.copy(df = f.df.offset(runtimeInt(ctx, e, "SKIP"))))
    proj.limit.foreach(e => f = f.copy(df = f.df.limit(runtimeInt(ctx, e, "LIMIT"))))
    recordConstVars(ctx, items)
    f
  }

  /** ORDER BY sort key: variants use the global-order [[Values.orderKey]];
    * entity/path-typed columns (not representable in the variant) sort by
    * id / (length, id-sequence) — deterministic and type-grouped.
    */
  private def sortKey(ctx: Ctx, frame: Frame, e: Ast.Expr): Column = {
    val c = trExpr(ctx, frame, e)
    dataTypeOf(frame, c) match {
      case Some(st: StructType) if st.fieldNames.contains("nodes") =>
        struct(size(c.getField("nodes")).as("n"),
          to_json(transform(c.getField("nodes"),
            x => x.getField("id"))).as("ids"),
          to_json(transform(c.getField("rels"),
            x => x.getField("id"))).as("rids"))
      case Some(st: StructType) if st.fieldNames.contains("props") =>
        c.getField("id")
      case Some(st: StructType) if !isVariantStruct(st) =>
        // typed map value: Map_Compare key — key count, then keys, then
        // values semantically (map.c:208, test_map.py test04/05)
        if (isMapStruct(st)) mapOrderKey(c, st) else to_json(c)
      case _ => Values.orderKey(c)
    }
  }

  /** Track which aliases a projection bound to pure literals (see
    * Ctx.constVars).
    */
  private def recordConstVars(ctx: Ctx,
      items: List[(Ast.Expr, String)]): Unit =
    items.foreach { case (e, n) =>
      if (isPureLit(e)) ctx.constVars(n) = e else ctx.constVars.remove(n)
    }

  /** Evaluation layering for nested projection expressions.
    *
    * The variant combinators ([[Values]].arith/eq/…) reference each operand
    * several times (type dispatch), so a NESTED expression like
    * `round(x*100)/100` multiplies its operand tree per level — Catalyst
    * analysis/optimization cost grows ~8^depth. This rewrites every inner
    * non-leaf sub-expression into a temp column in its own projection layer
    * (identical subtrees share one temp — structural CSE), so each Catalyst
    * expression stays one operator deep and plan cost stays linear in AST
    * size. The runtime plan keeps the same work: CollapseProject will not
    * re-inline multi-referenced non-cheap expressions. This is the
    * translation-time equivalent of the reference evaluating its AR_ExpNode
    * tree node-by-node (`src/arithmetic/arithmetic_expression.c`).
    *
    * Lambda bodies (comprehensions/quantifiers) are left intact — their
    * sub-expressions reference the lambda variable, not frame columns; the
    * list operand is still layered. Aggregate calls are kept in place (their
    * args evaluate pre-aggregation and ARE layered); expressions containing
    * an aggregate or a pattern predicate are never hoisted themselves.
    */
  private def layerNested(ctx: Ctx, frame: Frame,
      items: List[(Ast.Expr, String)]): (Frame, List[(Ast.Expr, String)]) = {
    val (layers, newItems) = layerPlan(items)
    var f = frame
    layers.foreach { layer =>
      val cols = layer.toSeq.map { case (ex, n) => trExpr(ctx, f, ex).as(n) }
      f = f.derive(f.df.select(f.df.col("*") +: cols: _*),
        f.vars ++ layer.valuesIterator.map(_ -> (KValue: Kind)))
    }
    (f, newItems)
  }

  /** The planning half of [[layerNested]]: which sub-expressions hoist into
    * which layer (shared with the in-lambda layering, [[lambdaAcc]], which
    * applies the same plan as chained `transform` passes instead of
    * projection selects).
    */
  private def layerPlan(items: List[(Ast.Expr, String)])
      : (Seq[scala.collection.mutable.LinkedHashMap[Ast.Expr, String]],
        List[(Ast.Expr, String)]) = {
    import scala.collection.mutable
    val layers = mutable.ArrayBuffer[mutable.LinkedHashMap[Ast.Expr, String]]()

    def isLeaf(e: Ast.Expr): Boolean = e match {
      case _: Ast.Variable | _: Ast.Param | Ast.LitNull => true
      case _: Ast.LitInt | _: Ast.LitFloat | _: Ast.LitString |
           _: Ast.LitBool => true
      case Ast.Prop(Ast.Variable(_), _) => true
      case Ast.Neg(x) => isLeaf(x)
      case _ => false
    }
    def blocked(e: Ast.Expr): Boolean = {
      var b = false
      Ast.foreachExpr(e) {
        case _: Ast.PatternPred => b = true
        case a if isAggCall(a) => b = true
        case _ => ()
      }
      b
    }
    // expressions whose OUTPUT is not a variant (entity/path structs, map
    // literals) must stay inline — a hoisted temp would lose its shape for
    // the consuming function
    def noSpill(e: Ast.Expr): Boolean = e match {
      case _: Ast.MapLit => true
      // a list literal holding maps is typed (or identity-keyed by the
      // aggregate path) — hoisting it would force the variant encoding
      case Ast.ListLit(xs) if xs.exists(x =>
        x.isInstanceOf[Ast.MapLit] || noSpill(x)) => true
      case Ast.Fn(n, _, _) =>
        StructFns.contains(n.toLowerCase)
      case _ => false
    }
    def spill(child: Ast.Expr): (Ast.Expr, Int) = {
      val (c2, d) = rw(child)
      if (isLeaf(c2) || noSpill(c2) || blocked(child)) (c2, d)
      else {
        while (layers.size <= d)
          layers += mutable.LinkedHashMap[Ast.Expr, String]()
        val name = layers(d).getOrElseUpdate(c2, freshName("lyr"))
        (Ast.Variable(name), d + 1)
      }
    }
    def rw(e: Ast.Expr): (Ast.Expr, Int) = e match {
      case l if isLeaf(l) => (l, 0)
      case Ast.Bin(op, a, b) =>
        val (a2, da) = spill(a); val (b2, db) = spill(b)
        (Ast.Bin(op, a2, b2), math.max(da, db))
      case Ast.Not(x) =>
        // type-check BEFORE the operand spills to a temp (the trExpr check
        // would only ever see the hoisted variable)
        x match {
          case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
              _: Ast.ListLit | _: Ast.MapLit => throw TranslateError(
            s"InvalidArgumentType: NOT expects a boolean, got: $x")
          case _ => ()
        }
        val (x2, d) = spill(x); (Ast.Not(x2), d)
      case Ast.Neg(x) => val (x2, d) = spill(x); (Ast.Neg(x2), d)
      case Ast.IsNull(x, n) => val (x2, d) = spill(x); (Ast.IsNull(x2, n), d)
      case Ast.Fn(n, _, _) if ShapeArgFns.contains(n.toLowerCase) =>
        // arg must keep its syntactic shape (entity variable / map literal /
        // path value) — leave the whole call intact
        (e, 0)
      case Ast.Fn(n, args, dist) =>
        val rs = args.map(spill)
        (Ast.Fn(n, rs.map(_._1), dist), (0 +: rs.map(_._2)).max)
      case Ast.CaseExpr(s, whens, o) =>
        val s2 = s.map(spill)
        val w2 = whens.map { case (c, v) => (spill(c), spill(v)) }
        val o2 = o.map(spill)
        val d = (Seq(0) ++ s2.map(_._2) ++
          w2.flatMap { case (a, b) => Seq(a._2, b._2) } ++
          o2.map(_._2)).max
        (Ast.CaseExpr(s2.map(_._1),
          w2.map { case (a, b) => (a._1, b._1) }, o2.map(_._1)), d)
      case Ast.Subscript(tg, i) =>
        val (t2, dt) = spill(tg); val (i2, di) = spill(i)
        (Ast.Subscript(t2, i2), math.max(dt, di))
      case Ast.SliceExpr(tg, f0, to) =>
        val (t2, dt) = spill(tg)
        val f2 = f0.map(spill); val to2 = to.map(spill)
        (Ast.SliceExpr(t2, f2.map(_._1), to2.map(_._1)),
          (Seq(dt) ++ f2.map(_._2) ++ to2.map(_._2)).max)
      case l @ Ast.ListLit(xs) if xs.forall(isPureLit) =>
        // pure-literal lists fold to ONE driver-side Literal (or a boxed
        // JSON text when nested past the schema floor) — decomposing
        // them into spilled temps would force the per-level variant
        // encoding and re-impose the depth limit
        (l, 0)
      case Ast.ListLit(xs) =>
        val rs = xs.map(spill)
        (Ast.ListLit(rs.map(_._1)), (0 +: rs.map(_._2)).max)
      case Ast.MapLit(es) =>
        val rs = es.map { case (k, v) => k -> spill(v) }
        (Ast.MapLit(rs.map { case (k, r) => (k, r._1) }),
          (0 +: rs.map(_._2._2)).max)
      case Ast.ListComprehension(v, list, w, p) =>
        val (l2, d) = spill(list)
        (Ast.ListComprehension(v, l2, w, p), d)
      case Ast.Quantifier(k, v, list, p) =>
        val (l2, d) = spill(list)
        (Ast.Quantifier(k, v, l2, p), d)
      case other => (other, 0)
    }

    // aggregate/pattern-containing items translate on the AGG path against
    // its own pre/post frames — a hoisted temp from here would be unknown
    // there, so such items stay whole (no CSE inside them)
    val newItems = items.map { case (e, n) =>
      (if (blocked(e)) e else rw(e)._1, n)
    }
    (layers.toSeq, newItems)
  }

  /** In-lambda evaluation layering for DEEP comprehension/quantifier
    * bodies: applies a [[layerPlan]] as CHAINED `transform` passes over a
    * struct accumulator — the widened element rides as `__e`, each hoisted
    * sub-expression lands as one more struct field — so every Catalyst
    * lambda stays one operator deep. Without it a nested body like
    * `[key IN keys(r) | key + '->' + r[key]]` (TCK Merge6 control query)
    * multiplies its operand trees per level inside ONE lambda — the
    * variant combinators' type-dispatch fan-out makes the expression
    * ~15^depth and analysis runs out of memory. Returns the accumulator
    * array plus a binder producing the translation frame for an
    * accumulator element.
    */
  private def lambdaAcc(ctx: Ctx, frame: Frame, v: String, arr: Column,
      layers: Seq[scala.collection.mutable.LinkedHashMap[Ast.Expr, String]])
      : (Column, Column => Frame) = {
    def bind(y: Column, ns: List[String]): Frame = frame.copy(
      vars = frame.vars + (v -> KValue) ++ ns.map(_ -> (KValue: Kind)),
      bindings = frame.bindings + (v -> y.getField("__e")) ++
        ns.map(n => n -> y.getField(n)))
    var names = List.empty[String]
    var acc = transform(arr, x => struct(Values.widen(x).as("__e")))
    layers.foreach { layer =>
      val prev = names
      acc = transform(acc, y => struct(
        (y.getField("__e").as("__e") +: prev.map(n => y.getField(n).as(n))) ++
          layer.toSeq.map { case (ex, n) =>
            trExpr(ctx, bind(y, prev), ex).as(n) }: _*))
      names = prev ++ layer.valuesIterator.toList
    }
    (acc, y => bind(y, names))
  }

  private def isAggCall(e: Ast.Expr): Boolean = e match {
    case Ast.CountStar => true
    case Ast.Fn(n, _, _) => AggFns.contains(n)
    case _ => false
  }

  private def kindOf(ctx: Ctx, frame: Frame, e: Ast.Expr): Kind = e match {
    case Ast.Variable(n) => frame.vars.getOrElse(n, KValue)
    case _ => KValue
  }

  /** entity vars pass through as structs; everything else becomes a variant. */
  private def trAny(ctx: Ctx, frame: Frame, e: Ast.Expr): Column = e match {
    case Ast.Variable(n) if frame.has(n) && frame.vars(n) != KValue =>
      frame.col(n)
    case other => trExpr(ctx, frame, other)
  }

  // ═══════════════════════════ aggregates ══════════════════════════════════
  private def trAgg(ctx: Ctx, frame: Frame, e: Ast.Expr): Column = e match {
    case Ast.CountStar => Values.vInt(count(lit(1)))
    case Ast.Fn("count", List(arg), distinct) =>
      // maps nested inside list literals have no single Catalyst type
      // (heterogeneous key sets); counting needs only IDENTITY, so key
      // them by canonical JSON instead of materializing the value
      // (TCK Return5 [4])
      if (distinct && hasMapInList(arg))
        Values.vInt(countDistinct(jsonIdent(ctx, frame, arg)))
      else {
        val v = trAny(ctx, frame, arg)
        Values.vInt(if (distinct) countDistinct(v) else count(v))
      }
    case Ast.Fn("sum", List(arg), _) =>
      // reference semantics (agg_funcs.c AGG_SUM/AvgFinalize): processing
      // >=1 rows whose values are all NULL yields 0, zero rows yields NULL;
      // an all-integer input sums to an integer, any float promotes
      val v = trExpr(ctx, frame, arg)
      val anyFloat =
        max(when(Values.tag(v) === Values.T_FLOAT, 1).otherwise(0)) === 1
      when(count(lit(1)) > 0,
        when(anyFloat,
          Values.vFloat(coalesce(sum(Values.num(v)), lit(0.0))))
          .otherwise(Values.vInt(coalesce(sum(v.getField("i")), lit(0L)))))
        .otherwise(Values.vNull)
    case Ast.Fn("avg", List(arg), _) =>
      Values.vFloat(when(count(lit(1)) > 0,
        coalesce(avg(Values.num(trExpr(ctx, frame, arg))), lit(0.0))))
    case Ast.Fn("min", List(arg), _) =>
      // global-order min via sortable struct (custom Aggregator equivalent,
      // SURVEY §2.4 min/max note); aggregates skip nulls natively
      val v = trExpr(ctx, frame, arg)
      min(when(v.isNotNull, struct(Values.orderKey(v).as("k"), v.as("v"))))
        .getField("v")
    case Ast.Fn("max", List(arg), _) =>
      val v = trExpr(ctx, frame, arg)
      max(when(v.isNotNull, struct(Values.orderKey(v).as("k"), v.as("v"))))
        .getField("v")
    case Ast.Fn("collect", List(arg), distinct) =>
      arg match {
        // collect(entity/path): a raw struct array (the BASELINE
        // index_node_lookup query shape, `RETURN a, collect(b)`) — entity
        // and path structs don't fit the scalar-variant element type
        case Ast.Variable(v) if frame.vars.get(v)
            .exists(k => k == KNode || k == KEdge || k == KPath) =>
          val c = frame.col(v)
          val isPath = frame.vars(v) == KPath
          // entity collects sort by id (reference scan order, see the
          // scalar branch below); array_sort with an id comparator because
          // sort_array can't order structs carrying props maps
          def idSort(arr: Column): Column =
            if (isPath) arr
            else array_sort(arr, (a, b) =>
              when(a.getField("id") < b.getField("id"), -1)
                .when(a.getField("id") > b.getField("id"), 1).otherwise(0))
          if (!distinct) idSort(collect_list(c))
          else {
            // collect_set rejects structs containing maps (props) — dedup
            // by identity post-collect (entity = id, path = id sequences;
            // same-identity values are identical)
            def key(x: Column): Column =
              if (isPath) struct(
                transform(x.getField("nodes"), n => n.getField("id")).as("n"),
                transform(x.getField("rels"), r => r.getField("id")).as("r"))
              else x.getField("id")
            val arr = idSort(collect_list(c))
            filter(arr, (e, i) =>
              array_position(transform(arr, x => key(x)), key(e)) ===
                (i + 1).cast(LongType))
          }
        case _ =>
          val raw = trExpr(ctx, frame, arg)
          dataTypeOf(frame, raw) match {
            // map values are typed structs outside the variant element
            // model — collect them as a raw typed array (TCK Return4 [11]
            // `head(collect({k: v})`)
            case Some(s: StructType) if isMapStruct(s) =>
              // first-occurrence order, as the reference's Group_KeyGet
              // dedup (collect_set loses arrival order entirely)
              if (distinct) array_distinct(collect_list(raw))
              else collect_list(raw)
            // entity/path-valued EXPRESSIONS (startNode(r), nodes(p)[0]):
            // same raw-struct collect as the Variable branch
            case Some(s: StructType) if s.fieldNames.contains("props") ||
                s.fieldNames.contains("nodes") =>
              if (!distinct) collect_list(raw)
              else {
                val arr = collect_list(raw)
                def key(x: Column): Column =
                  if (s.fieldNames.contains("nodes")) struct(
                    transform(x.getField("nodes"),
                      n => n.getField("id")).as("n"),
                    transform(x.getField("rels"),
                      r => r.getField("id")).as("r"))
                  else x.getField("id")
                filter(arr, (e, i) =>
                  array_position(transform(arr, x => key(x)), key(e)) ===
                    (i + 1).cast(LongType))
              }
            // typed entity arrays (`collect(nodes(p))`, `collect(rs)`):
            // array-of-arrays, elements deterministically ordered by their
            // id sequence (the reference's scan-order emission — a
            // partitioned engine loses arrival order at the shuffle)
            case Some(ArrayType(et: StructType, _))
                if et.fieldNames.contains("id") =>
              def key(x: Column): Column =
                transform(x, e => e.getField("id"))
              val arr = array_sort(collect_list(raw), (a, b) =>
                when(key(a) < key(b), -1)
                  .when(key(a) > key(b), 1).otherwise(0))
              if (!distinct) arr
              else filter(arr, (e, i) =>
                array_position(transform(arr, x => key(x)), key(e)) ===
                  (i + 1).cast(LongType))
            case _ =>
              val v = Values.narrow(raw)
              // deterministic element order: when the collected expression
              // depends on exactly one bound entity, order elements by
              // that entity's id — the reference's pipelined scan emits
              // rows in id order (`op_all_node_scan.c` iterates the
              // datablock sequentially), an order a partitioned engine
              // loses at the shuffle. Sorting (id, value) pairs inside the
              // aggregate restores it without a global sort.
              val entVars = exprVars(arg).toList.filter(n =>
                frame.vars.get(n).exists(k => k == KNode || k == KEdge))
              entVars match {
                case List(ev) =>
                  val pairs = sort_array(collect_list(when(v.isNotNull,
                    struct(frame.col(ev).getField("id").as("o"),
                      v.as("v")))))
                  val vals = transform(pairs, p => p.getField("v"))
                  Values.vArr(
                    if (!distinct) vals
                    else filter(vals, (e, i) =>
                      array_position(vals, e) === (i + 1).cast(LongType)))
                case _ =>
                  // first-occurrence-order dedup (test_distinct.py
                  // collect_distinct: ['a','a',null,1,2,2,3,3,3] →
                  // ['a',1,2,3]); collect order itself is partition
                  // arrival order — deterministic for unit-row pipelines,
                  // unspecified after a shuffle (documented divergence
                  // from the single-threaded reference)
                  Values.vArr(
                    if (distinct) array_distinct(collect_list(v))
                    else collect_list(v))
              }
          }
      }
    // 0-or-1 values → 0.0, not null (`agg_funcs.c` StDevGenericFinalize:
    // `count - is_sampled == 0` short-circuits to 0)
    case Ast.Fn("stdev", List(arg), _) =>
      Values.vFloat(coalesce(
        stddev_samp(Values.num(trExpr(ctx, frame, arg))), lit(0.0)))
    case Ast.Fn("stdevp", List(arg), _) =>
      Values.vFloat(coalesce(
        stddev_pop(Values.num(trExpr(ctx, frame, arg))), lit(0.0)))
    case Ast.Fn("percentiledisc", List(arg, p), _) =>
      // exact for group sizes < 2^31 (approx sketch degenerates to exact)
      val n = Values.num(trExpr(ctx, frame, arg))
      Values.vFloat(percentile_approx(n,
        lit(constantDouble(ctx, p)), lit(2147483647)))
    case Ast.Fn("percentilecont", List(arg, p), _) =>
      Values.vFloat(percentile(Values.num(trExpr(ctx, frame, arg)),
        lit(constantDouble(ctx, p))))
    case Ast.Fn(n, _, _) if AggFns.contains(n) =>
      throw TranslateError(s"unsupported aggregate: $n")
    case other =>
      throw TranslateError(s"aggregate must be top-level, got: $other")
  }

  /** JSON text of a typed map-value struct (fields in canonical key
    * order; nested maps recurse, variant values via [[Values.jsonOf]]).
    */
  private def mapStructJson(c: Column, st: StructType): Column = {
    val parts = st.fields.filter(_.name != EmptyMapMarker).map { f =>
      concat(lit("\"" + f.name.replace("\"", "\\\"") + "\": "),
        mapFieldJson(c.getField(f.name), f.dataType))
    }
    if (parts.isEmpty) lit("{}")
    else concat(lit("{"), concat_ws(", ", parts.toSeq: _*), lit("}"))
  }

  /** JSON text of one typed map-struct field value: variants via
    * [[Values.jsonOf]], nested maps/entities recurse, typed arrays (the
    * list-of-map-literals fast path) render per element, raw primitives
    * directly — so `toJSON({a: [{b: 1}]})` emits the list, not null.
    */
  private def mapFieldJson(v: Column, dt: DataType): Column = dt match {
    case s2: StructType if isVariantStruct(s2) => Values.jsonOf(v)
    case s2: StructType => mapStructJson(v, s2)
    case ArrayType(et, _) =>
      when(v.isNull, lit("null")).otherwise(concat(lit("["),
        concat_ws(", ", transform(v, x => mapFieldJson(x, et))), lit("]")))
    case StringType =>
      when(v.isNull, lit("null")).otherwise(Values.jsonStr(v))
    case BooleanType | _: NumericType =>
      when(v.isNull, lit("null")).otherwise(v.cast(StringType))
    case _ => lit("null")
  }

  /** Comparison/sort key for a typed map-value struct, matching the
    * reference's Map_Compare (`src/datatypes/map.c:208-246`): key COUNT
    * first, then sorted keys element-wise, then values SEMANTICALLY
    * (numeric-aware, so `{a: 2} < {a: 10}` — not the JSON-lexicographic
    * order a string compare gives). Spark's field-wise struct ordering
    * over (n, k, v) reproduces that exactly, and the key is ONE fixed
    * Catalyst type for every map schema, so maps of different shapes
    * still compare. Nested-map values key on (map rank 0, key count,
    * canonical JSON) — count-first one level down.
    */
  private def mapOrderKey(c: Column, st: StructType): Column = {
    val fields = st.fields.filter(_.name != EmptyMapMarker)
    val vals: Seq[Column] = fields.toSeq.map(f =>
      typedMiniKey(c.getField(f.name), f.dataType, Values.MaxNest))
    struct(
      lit(fields.length).as("n"),
      (if (fields.isEmpty) array().cast(ArrayType(StringType))
      else array(fields.toSeq.map(f => lit(f.name)): _*)).as("k"),
      (if (vals.isEmpty) array().cast(ArrayType(Values.topKeyType))
      else array(vals: _*)).as("v"))
  }

  /** keyType(d)-shaped semantic mini-key for a TYPED map value — the typed
    * path's analogue of Values.variantMiniKey: nested maps compare
    * count → keys → values recursively and nested arrays element-wise
    * (Map_Compare, `map.c:208-246`), instead of tiebreaking on canonical
    * JSON text (which ordered {x: 2} AFTER {x: 10} at depth 2). At depth 0
    * (nesting budget exhausted) the JSON text remains the fallback.
    */
  private def typedMiniKey(v: Column, dt: DataType, d: Int): Column = {
    val nD = lit(null).cast(DoubleType)
    val nS = lit(null).cast(StringType)
    val nB = lit(null).cast(BooleanType)
    def key(r: Column, n: Column, s: Column,
        a: Option[Column] = None): Column = {
      val base = Seq(r.as("r"), n.as("n"), s.as("s"), nB.as("b"))
      val all =
        if (d <= 0) base
        else base :+ a.getOrElse(
          lit(null).cast(ArrayType(Values.keyType(d - 1)))).as("a")
      struct(all: _*)
    }
    val raw = dt match {
      case s2: StructType if isVariantStruct(s2) => Values.orderKeyAt(v, d, 1)
      case s2: StructType if isMapStruct(s2) =>
        val fs = s2.fields.filter(_.name != EmptyMapMarker)
        val n = lit(fs.length.toDouble)
        if (d <= 0) key(lit(0), n, mapStructJson(v, s2))
        else {
          def kEntry(name: String): Column = {
            val base = Seq(lit(11).as("r"), nD.as("n"),
              lit(name).as("s"), nB.as("b"))
            struct((if (d <= 1) base
            else base :+
              lit(null).cast(ArrayType(Values.keyType(d - 2))).as("a")): _*)
          }
          val arr = fs.toSeq.map(f => kEntry(f.name)) ++
            fs.toSeq.map(f =>
              typedMiniKey(v.getField(f.name), f.dataType, d - 1))
          key(lit(0), n, nS, Some(array(arr: _*)))
        }
      case s2: StructType if s2.fieldNames.contains("props") =>
        key(lit(if (s2.fieldNames.contains("reltype")) 2 else 1),
          v.getField("id").cast(DoubleType), nS)
      case at: ArrayType =>
        if (d <= 0) key(lit(3), nD, mapFieldJson(v, at))
        else key(lit(3), nD, nS,
          Some(transform(v, e => typedMiniKey(e, at.elementType, d - 1))))
      case StringType => key(lit(11), nD, v)
      case BooleanType => key(lit(12), v.cast(DoubleType), nS)
      case _ => key(lit(13), v.cast(DoubleType), nS)
    }
    // a null/missing typed value ranks greatest inside the composite
    // (NullRank), like null list elements in the variant path
    when(v.isNull, key(lit(Values.NullRank), nD, nS)).otherwise(raw)
  }

  /** Structural shape of a literal for typed-array unification: map
    * literals render their (sorted) keys with each value's shape, list
    * literals their element-shape set, and everything else is an opaque
    * variant ("v" — all variants share one Catalyst type). Two map
    * literals translate to the same struct schema iff their shapes match.
    */
  private def litShape(e: Ast.Expr): String = e match {
    case Ast.MapLit(es) => es.sortBy(_._1)
      .map { case (k, v) => s"$k:${litShape(v)}" }
      .mkString("{", ",", "}")
    case Ast.ListLit(is)
        if is.nonEmpty && is.forall(_.isInstanceOf[Ast.MapLit]) =>
      is.map(litShape).distinct.mkString("[", "|", "]")
    case _ => "v"
  }

  /** Does the expression tree put a map literal inside a list literal
    * (unrepresentable as one Catalyst array type)?
    */
  private def hasMapInList(e: Ast.Expr): Boolean = e match {
    case Ast.ListLit(items) =>
      items.exists {
        case _: Ast.MapLit => true
        case i => hasMapInList(i)
      }
    case Ast.MapLit(entries) => entries.exists(kv => hasMapInList(kv._2))
    case Ast.Bin(_, l, r) => hasMapInList(l) || hasMapInList(r)
    case Ast.Fn(_, args, _) => args.exists(hasMapInList)
    case _ => false
  }

  /** Canonical JSON identity key of an arbitrary value expression: map
    * entries key-sorted, strings quoted, null distinct from "null".
    * Used where only equality-identity is needed (DISTINCT counting).
    */
  private def jsonIdent(ctx: Ctx, frame: Frame, e: Ast.Expr): Column =
    e match {
      case Ast.MapLit(entries) =>
        concat(lit("{"), concat_ws(",",
          entries.sortBy(_._1).map { case (k, v) =>
            concat(lit("\"" + k + "\":"), jsonIdent(ctx, frame, v))
          }: _*), lit("}"))
      case Ast.ListLit(items) =>
        concat(lit("["), concat_ws(",",
          items.map(i => jsonIdent(ctx, frame, i)): _*), lit("]"))
      case other =>
        val c = trExpr(ctx, frame, other)
        dataTypeOf(frame, c) match {
          case Some(s: StructType) if isMapStruct(s) =>
            coalesce(to_json(canonKey(c, s)), lit("null"))
          case _ => Values.jsonOf(c)
        }
    }

  private def constantDouble(ctx: Ctx, e: Ast.Expr): Double = e match {
    case Ast.LitFloat(v) => v
    case Ast.LitInt(v) => v.toDouble
    case Ast.Neg(x) => -constantDouble(ctx, x)
    // parameters are driver-side constants — fold (TCK Aggregation6)
    case Ast.Param(p) => ctx.params.get(p) match {
      case Some(v: Double) => v
      case Some(v: Long) => v.toDouble
      case Some(v: Int) => v.toDouble
      case other => throw TranslateError(
        s"expected a numeric parameter for $$$p, got: $other")
    }
    case other => throw TranslateError(s"expected numeric literal: $other")
  }

  /** literal/parameter subtree → variant Column (for prop-map predicates). */
  private[cypher] def constantValue(ctx: Ctx, e: Ast.Expr): Column =
    trExpr(ctx, Frame(null, Map.empty), e)

  // ═══════════════════════════ expressions ═════════════════════════════════
  def trExpr(ctx: Ctx, frame: Frame, e: Ast.Expr): Column =
    // Snap every sub-expression result to ONE Catalyst-expression node:
    // Spark 4's `Column.===` (checkTrivialPredicate → Column.equals)
    // NORMALIZES both sides on every call, re-walking and re-copying the
    // whole operand ColumnNode tree — the variant combinators compare tag
    // fields ~15×/op, so translation cost without the snap is exponential
    // in expression depth (a one-op lambda body measured 1.9 s, depth 2
    // took minutes). A snapped node caches `normalized` per instance, so
    // each operand normalizes once no matter how often it is dispatched on.
    Values.snap(trExprRaw(ctx, frame, e))

  private val CmpOps = Set("<", "<=", ">", ">=", "=", "<>")

  /** Native fast path for `prop <op> literal` comparisons where the scan
    * proved the property's variant tag monomorphic ([[Ctx.propTags]]):
    * emits directly the native expression [[graft.plans.VariantFoldRule]]
    * would fold the ~30-branch variant comparison tree to — the OPTIMIZED
    * plan is identical, but the analyzer/optimizer/codegen never walk the
    * variant tree (measured ~70% of cypher cold build time was WHERE
    * translation+analysis). Ternary semantics replicated exactly from
    * Values.lt/lte/eq: null prop → null; ordered comparison touching NaN →
    * false (only a float PROP can be NaN — NaN literals are screened out);
    * int/float ordering through the same double widening [[Values.num]]
    * applies; equality same-kind only (mixed int/float equality has the
    * round-trip precision rule — left to the generic path).
    */
  /** A statically-tagged flat prop column: (variant column, proven tag). */
  private def staticPropSide(ctx: Ctx, frame: Frame, e: Ast.Expr)
      : Option[(Column, Int)] = e match {
    case Ast.Prop(Ast.Variable(n), k)
        if frame.vars.get(n).exists(_ != KValue) &&
          !frame.bindings.contains(n) =>
      for {
        c <- frame.propCol(n, k)
        tOpt <- ctx.propTags.get(propColName(n, k))
        t <- tOpt
      } yield (c, t)
    case _ => None
  }

  /** A pure scalar literal operand (NaN screened out — the fast paths
    * assume literals are never NaN).
    */
  private def staticLitSide(e: Ast.Expr): Option[Any] = e match {
    case Ast.LitInt(v) => Some(v) // Long
    case Ast.LitFloat(v) if !v.isNaN => Some(v) // Double
    case Ast.LitString(v) => Some(v)
    case Ast.LitBool(v) => Some(v)
    case Ast.Neg(Ast.LitInt(v)) => Some(-v)
    case Ast.Neg(Ast.LitFloat(v)) if !v.isNaN => Some(-v)
    case _ => None
  }

  private def staticNativeCmp(ctx: Ctx, frame: Frame, op: String,
      l: Ast.Expr, r: Ast.Expr): Option[Column] = {
    import Values._
    if (!CmpOps(op)) return None
    def propSide(e: Ast.Expr) = staticPropSide(ctx, frame, e)
    def litSide(e: Ast.Expr) = staticLitSide(e)
    val operands = (propSide(l), litSide(r)) match {
      case (Some(p), Some(v)) => Some((p, v, false))
      case _ => (propSide(r), litSide(l)) match {
        case (Some(p), Some(v)) => Some((p, v, true))
        case _ => None
      }
    }
    operands.flatMap { case ((pc, tag), litV, flip) =>
      val nB = lit(null).cast(BooleanType)
      val numericLit =
        litV.isInstanceOf[java.lang.Long] || litV.isInstanceOf[java.lang.Double]
      def cmp(a: Column, b: Column): Column = op match {
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
      }
      if (op == "=" || op == "<>") {
        val eqc: Option[Column] =
          if (tag == T_INT && litV.isInstanceOf[java.lang.Long])
            Some(pc.getField("i") === lit(litV))
          else if (tag == T_FLOAT && litV.isInstanceOf[java.lang.Double])
            Some(pc.getField("f") === lit(litV))
          else if (tag == T_STRING && litV.isInstanceOf[String])
            Some(pc.getField("s") === lit(litV))
          else if (tag == T_BOOL && litV.isInstanceOf[java.lang.Boolean])
            Some(pc.getField("b") === lit(litV))
          else None
        eqc.map { c =>
          val signed = if (op == "=") c else !c
          vBool(when(pc.isNull, nB).otherwise(signed))
        }
      } else if ((tag == T_INT || tag == T_FLOAT) && numericLit) {
        val a = if (tag == T_INT) pc.getField("i").cast(DoubleType)
          else pc.getField("f")
        val b = lit(litV).cast(DoubleType)
        val (x, y) = if (flip) (b, a) else (a, b)
        val base = cmp(x, y)
        val guarded =
          if (tag == T_FLOAT)
            when(isnan(pc.getField("f")), lit(false)).otherwise(base)
          else base
        Some(vBool(when(pc.isNull, nB).otherwise(guarded)))
      } else if (tag == T_STRING && litV.isInstanceOf[String]) {
        val a = pc.getField("s"); val b = lit(litV)
        val (x, y) = if (flip) (b, a) else (a, b)
        Some(vBool(when(pc.isNull, nB).otherwise(cmp(x, y))))
      } else None
    }
  }

  private val ArithOps = Set("+", "-", "*", "/", "%")

  /** Native fast path for arithmetic over statically-tagged props and
    * scalar literals — the exact branch [[Values]]' `arith`/`add`/`div`
    * would pick once the tags are known: both-int → int op (div raises on
    * /0 like the reference, % yields null like Spark); any float → double
    * op on the same [[Values.num]] widening; string+string → concat. The
    * explicit null-first guard replicates the variant path's
    * `when(a.isNull || b.isNull, vNull)` so e.g. `nullProp / 0` stays null
    * instead of raising. Mixed string/number `+` (stringification) and
    * every other tag combination fall back to the generic path.
    */
  private def staticNativeArith(ctx: Ctx, frame: Frame, op: String,
      l: Ast.Expr, r: Ast.Expr): Option[Column] = {
    import Values._
    if (!ArithOps(op)) return None
    // (native column, tag, is-prop-side)
    def natSide(e: Ast.Expr): Option[(Column, Int, Boolean)] =
      staticPropSide(ctx, frame, e).collect {
        case (pc, T_INT) => (pc.getField("i"), T_INT, true)
        case (pc, T_FLOAT) => (pc.getField("f"), T_FLOAT, true)
        case (pc, T_STRING) => (pc.getField("s"), T_STRING, true)
      }.orElse(staticLitSide(e).collect {
        case v: java.lang.Long => (lit(v), T_INT, false)
        case v: java.lang.Double => (lit(v), T_FLOAT, false)
        case v: String => (lit(v), T_STRING, false)
      })
    for {
      (la, ta, pa) <- natSide(l)
      (lb, tb, pb) <- natSide(r)
      if pa || pb // pure-literal arithmetic constant-folds anyway
      result <- {
        val bothInt = ta == T_INT && tb == T_INT
        val bothNum = (ta == T_INT || ta == T_FLOAT) &&
          (tb == T_INT || tb == T_FLOAT)
        def dbl(c: Column, t: Int): Column =
          if (t == T_INT) c.cast(DoubleType) else c
        def intDiv(x: Column, y: Column) =
          when(y === 0, raise_error(lit("/ by zero")).cast(LongType))
            .otherwise((x / nullif(y, lit(0))).cast(LongType))
        def dblDiv(x: Column, y: Column) =
          when(y === 0.0d,
            when(x === 0.0d || isnan(x), lit(Double.NaN))
              .when(x > 0.0d, lit(Double.PositiveInfinity))
              .otherwise(lit(Double.NegativeInfinity)))
            .otherwise(x / nullif(y, lit(0.0d)))
        val core: Option[Column] =
          if (op == "+" && ta == T_STRING && tb == T_STRING)
            Some(vStr(concat(la, lb)))
          else if (!bothNum) None
          else if (bothInt) op match {
            case "+" => Some(vInt(la + lb))
            case "-" => Some(vInt(la - lb))
            case "*" => Some(vInt(la * lb))
            case "/" => Some(vInt(intDiv(la, lb)))
            case "%" => Some(vInt(la % lb))
          }
          else {
            val (x, y) = (dbl(la, ta), dbl(lb, tb))
            op match {
              case "+" => Some(vFloat(x + y))
              case "-" => Some(vFloat(x - y))
              case "*" => Some(vFloat(x * y))
              case "/" => Some(vFloat(dblDiv(x, y)))
              case "%" => Some(vFloat(x % y))
            }
          }
        core.map(c => when(la.isNull || lb.isNull, vNull).otherwise(c))
      }
    } yield result
  }

  private def trExprRaw(ctx: Ctx, frame: Frame, e: Ast.Expr): Column = {
    import Values._
    def t(x: Ast.Expr): Column = trExpr(ctx, frame, x)
    e match {
      case Ast.LitInt(v) => vInt(lit(v))
      case Ast.LitFloat(v) => vFloat(lit(v))
      case Ast.LitString(v) => vStr(lit(v))
      case Ast.LitBool(v) => vBool(lit(v))
      case Ast.LitNull => vNull
      case Ast.Param(name) => paramValue(ctx, name)
      case Ast.PcLookup(mv, keyE) =>
        // hoisted lambda-correlated pattern comprehension (see
        // resolvePatternComprehensions): per-element lookup into the
        // broadcast head-id → element-list map; unmatched/null head → []
        val k = t(keyE)
        vArr(coalesce(element_at(frame.col(mv), k.getField("i")),
          array().cast(ArrayType(Values.elemType))))
      case Ast.ListLit(items) if items.nonEmpty && items.forall(isPureLit) =>
        // all-literal list: fold to ONE Catalyst Literal driver-side.
        // Per-element array(when(...struct...)) trees make the generated
        // code O(elements) — a 1000-element literal list explodes the
        // codegen unit (and Spark's CodeFormatter regex) before Janino
        // even runs. Literal nesting past the schema floor folds to a
        // BOXED tagged-JSON value instead (≡ SIArray arbitrary nesting,
        // `src/datatypes/array.c`).
        if (astDepth(e) > Values.MaxNest) vBoxed(lit(litJson(e)))
        else constListLiteral(items)
      case Ast.ListLit(items)
          if items.nonEmpty && items.forall(_.isInstanceOf[Ast.MapLit]) &&
            items.map(litShape).distinct.size == 1 =>
        // list of map literals: a raw typed array when the maps share one
        // SHAPE — same key set AND same value composite-structure per key
        // (MapLit canonicalizes field order, so one shape = one struct
        // schema). Heterogeneous key sets OR value shapes ({a: 's'} next
        // to {a: {m: 1}}) fall through to the generic path below, which
        // boxes each map (test_map.py test04: UNWIND [{b: 1}, {a: 2}])
        array(items.map(t): _*)
      case Ast.ListLit(items) =>
        // runtime nesting past the schema floor still fails at
        // TRANSLATION (non-literal deep elements can't be boxed without
        // runtime type dispatch)
        if (astDepth(e) > Values.MaxNest) throw TranslateError(
          s"nested list values exceed the supported nesting depth " +
            s"(${Values.MaxNest})")
        // elements the inline variant can't carry — entities, typed maps,
        // typed map arrays — box to tagged JSON (T_BOXED); scalars and
        // scalar lists stay inline
        def elemCol(item: Ast.Expr): Column = {
          val c = t(item)
          typeOf(frame, item, c) match {
            case Some(st: StructType) if isVariantStruct(st) => narrow(c)
            case Some(st: StructType) if st.fieldNames.contains("nodes") =>
              // path value → boxed {nodes, rels} (untagged JSON object —
              // the boxed-path encoding, see resolvePatternComprehensions)
              Values.sBoxed(to_json(c))
            case Some(st: StructType) if st.fieldNames.contains("props") =>
              Values.sBoxed(
                if (st.fieldNames.contains("reltype")) boxEdge(c)
                else boxNode(c))
            case Some(st: StructType) if isMapStruct(st) =>
              Values.sBoxed(boxMapStruct(c))
            case Some(ArrayType(et: StructType, _)) if isMapStruct(et) =>
              Values.sBoxed(to_json(struct(
                lit(Values.T_ARRAY).as("t"),
                transform(c, m => struct(
                  lit(Values.T_BOXED_MAP).as("t"), m.as("m"))).as("arr"))))
            case _ => narrow(c)
          }
        }
        vArr(array(items.map(elemCol): _*))

      case Ast.MapLit(entries) =>
        // map VALUES are typed structs (every literal's keys are static),
        // so nesting is arbitrary — unlike the fixed variant encoding.
        // Fields are CANONICALIZED to key order: same-key maps written in
        // different orders share one struct schema (and one to_json
        // rendering), so DISTINCT, equality and the map sort key are
        // key-order-insensitive (test_map.py test04/05). The marker field
        // keeps `{}` representable (Spark structs need ≥1 field);
        // decode/compare ignore it.
        if (entries.isEmpty) struct(lit(true).as(EmptyMapMarker))
        else struct(entries.sortBy(_._1)
          .map { case (k, v) => t(v).as(k) }: _*)

      case Ast.Variable(n) =>
        frame.vars.get(n) match {
          case Some(KValue) => frame.col(n)
          case Some(_) => frame.col(n) // entity struct; ops below special-case
          case None =>
            // reference message shape (`ast_validations.c:1211`)
            throw TranslateError(s"$n not defined")
        }

      case Ast.Prop(target, key) =>
        target match {
          case Ast.Variable(n) if frame.has(n) && frame.vars(n) != KValue =>
            // prefer the scan-level flat column (native, pruned, pushable)
            frame.propCol(n, key).getOrElse(
              element_at(frame.col(n).getField("props"), key))
          case Ast.Param(p) =>
            // $props.key: parameters are driver-side constants — fold the
            // map access at translation time (reference wire map params)
            ctx.params.get(p) match {
              case Some(m: Map[_, _]) =>
                m.asInstanceOf[Map[String, Any]].get(key)
                  .map(scalarParam).getOrElse(vNull)
              case Some(other) => throw TranslateError(
                s"$$$p.$key needs a map parameter, got: $other")
              case None => throw TranslateError(s"missing parameter: $$$p")
            }
          case other =>
            val c = t(other)
            typeOf(frame, other, c) match {
              case Some(s: StructType) if isMapStruct(s) =>
                // static-key map struct: missing key ≡ NULL
                if (s.fieldNames.contains(key)) c.getField(key) else vNull
              case Some(s: StructType) if s.fieldNames.contains("props") =>
                // entity-valued expression (startNode(r) etc.)
                element_at(c.getField("props"), key)
              case _ =>
                // variant-typed target: a BOXED map/entity exposes its
                // fields through the tagged JSON; any other runtime type
                // is a property access on a non-map (reference raises,
                // TCK Map1 [2])
                val js = c.getField("s")
                when(c.isNull, vNull)
                  .when(Values.tag(c) === Values.T_BOXED,
                    jsonToVariant(coalesce(
                      get_json_object(js, s"$$.m.$key"),
                      get_json_object(js, s"$$.props.$key"))))
                  // temporal component access: d.year, t.offset, …
                  .when(Values.isTemporal(c),
                    temporalFn("component", c, vStr(lit(key))))
                  .otherwise(vStr(raise_error(lit(
                    s"Type mismatch: expected a map to access '$key'"))
                    .cast(StringType)))
            }
        }

      case Ast.Bin(op, l, r)
          if staticNativeCmp(ctx, frame, op, l, r).isDefined =>
        staticNativeCmp(ctx, frame, op, l, r).get

      case Ast.Bin(op, l, r)
          if staticNativeArith(ctx, frame, op, l, r).isDefined =>
        staticNativeArith(ctx, frame, op, l, r).get

      case Ast.Bin(op, l, r) =>
        val isEntity = (x: Ast.Expr) => x match {
          case Ast.Variable(n) => frame.vars.get(n).exists(_ != KValue)
          case _ => false
        }
        val isPath = (x: Ast.Expr) => x match {
          case Ast.Variable(n) => frame.vars.get(n).contains(KPath)
          case _ => false
        }
        if (op == "=" || op == "<>") {
          // operand SHAPES (static, lambda-binding aware): 0 variant,
          // 1 node struct, 2 edge struct, 3 path struct, 4 typed map
          val cl = t(l); val cr = t(r)
          def shape(e: Ast.Expr, c: Column): Int =
            typeOf(frame, e, c) match {
              case Some(st: StructType) if isVariantStruct(st) => 0
              case Some(st: StructType) if st.fieldNames.contains("nodes") => 3
              case Some(st: StructType)
                  if st.fieldNames.contains("reltype") => 2
              case Some(st: StructType) if st.fieldNames.contains("props") => 1
              case Some(st: StructType) if isMapStruct(st) => 4
              case _ => 0
            }
          val sl = shape(l, cl); val sr = shape(r, cr)
          def ids(p: Column, f: String) =
            transform(p.getField(f), x => x.getField("id"))
          /** path identity = node+rel id sequences; traversal direction is
            * not significant (TCK Comparison1 [14]) so the reversed
            * sequence is the same path
            */
          def pathEq(pa: Column, pb: Column): Column =
            (ids(pa, "nodes") === ids(pb, "nodes") &&
              ids(pa, "rels") === ids(pb, "rels")) ||
              (ids(pa, "nodes") === reverse(ids(pb, "nodes")) &&
                ids(pa, "rels") === reverse(ids(pb, "rels")))
          /** entity struct vs runtime variant: null → null; a BOXED entity
            * of the same kind compares by id; anything else is false
            */
          def entVsVariant(ent: Column, kind: Int, v: Column): Column = {
            val js = v.getField("s")
            val jsT = get_json_object(js, "$.t").cast(IntegerType)
            val jsId = get_json_object(js, "$.id").cast(LongType)
            val want = if (kind == 2) Values.T_EDGE else Values.T_NODE
            when(ent.isNull || v.isNull, lit(null).cast(BooleanType))
              .when(Values.tag(v) === Values.T_BOXED && jsT === want,
                jsId === ent.getField("id"))
              .otherwise(lit(false))
          }
          /** path struct vs runtime variant: unbox {nodes, rels} JSON. */
          def pathVsVariant(p: Column, v: Column): Column = {
            val idsT = ArrayType(StructType(Seq(StructField("id", LongType))))
            val unboxed = from_json(v.getField("s"), StructType(Seq(
              StructField("nodes", idsT), StructField("rels", idsT))))
            when(p.isNull || v.isNull, lit(null).cast(BooleanType))
              .when(Values.tag(v) === Values.T_BOXED &&
                unboxed.getField("nodes").isNotNull, pathEq(p, unboxed))
              .otherwise(lit(false))
          }
          val eqc = (sl, sr) match {
            case (3, 3) => pathEq(cl, cr)
            case (a, b) if a == b && (a == 1 || a == 2) =>
              when(cl.isNull || cr.isNull, lit(null).cast(BooleanType))
                .otherwise(cl.getField("id") === cr.getField("id"))
            case (a, 0) if a == 1 || a == 2 => entVsVariant(cl, a, cr)
            case (0, b) if b == 1 || b == 2 => entVsVariant(cr, b, cl)
            case (3, 0) => pathVsVariant(cl, cr)
            case (0, 3) => pathVsVariant(cr, cl)
            case (a, b) if a == 4 || b == 4 =>
              mapEq(cl, typeOf(frame, l, cl).getOrElse(Values.variantType),
                cr, typeOf(frame, r, cr).getOrElse(Values.variantType))
            case (a, b) if a != b =>
              // node vs edge vs path: distinct kinds are never equal,
              // null operands stay ternary
              when(cl.isNull || cr.isNull, lit(null).cast(BooleanType))
                .otherwise(lit(false))
            case _ => Values.eq(cl, cr)
          }
          vBool(if (op == "=") eqc else !eqc)
        } else op match {
          case "OR" => or(t(l), t(r))
          case "XOR" => xor(t(l), t(r))
          case "AND" => and(t(l), t(r))
          case "<" | "<=" | ">" | ">=" =>
            val (a, b) = (t(l), t(r))
            def mapStructOf(e: Ast.Expr, c: Column): Option[StructType] =
              typeOf(frame, e, c).collect {
                case st: StructType
                    if !isVariantStruct(st) && isMapStruct(st) => st
              }
            // two MAP operands order key-count-first, then keys, then
            // values semantically (the reference's Map_Compare,
            // map.c:208, test_map.py test05) via [[mapOrderKey]]; other
            // entity/path-struct operands are not orderable → ternary
            // null (SI_VALUES_ARE_COMPARABLE DISJOINT); lambda-binding
            // aware so comprehension bodies over entity lists hit it too
            val structOperand = Seq((l, a), (r, b)).exists { case (e, c) =>
              typeOf(frame, e, c).exists {
                case st: StructType if !isVariantStruct(st) => true
                case _ => false
              }
            }
            (mapStructOf(l, a), mapStructOf(r, b)) match {
              case (Some(sa), Some(sb)) =>
                val (ja, jb) = (mapOrderKey(a, sa), mapOrderKey(b, sb))
                vBool(op match {
                  case "<" => ja < jb
                  case "<=" => ja <= jb
                  case ">" => ja > jb
                  case ">=" => ja >= jb
                })
              case _ if structOperand => vNull
              case _ => vBool(op match {
                case "<" => lt(a, b)
                case "<=" => lte(a, b)
                case ">" => gt(a, b)
                case ">=" => gte(a, b)
              })
            }
          case "+" =>
            // typed entity/path arrays (collect(n), nodes(p)) concatenate
            // with variant lists — box their elements into the variant
            // encoding first ([a] + collect(n) + [b], TCK Match4 [4])
            def variantize(e: Ast.Expr, c: Column): Column =
              typeOf(frame, e, c) match {
                case Some(ArrayType(et: StructType, _))
                    if et.fieldNames.contains("props") =>
                  Values.vArr(transform(c, x => Values.sBoxed(
                    if (et.fieldNames.contains("reltype")) boxEdge(x)
                    else boxNode(x))))
                case Some(ArrayType(et: StructType, _))
                    if et.fieldNames.contains("nodes") =>
                  Values.vArr(transform(c, x => Values.sBoxed(to_json(x))))
                case _ => c
              }
            val (a, b) = (variantize(l, t(l)), variantize(r, t(r)))
            when(Values.isTemporal(a) || Values.isTemporal(b),
              temporalFn("add", a, b)).otherwise(add(a, b))
          case "-" =>
            val (a, b) = (t(l), t(r))
            when(Values.isTemporal(a) || Values.isTemporal(b),
              temporalFn("sub", a, b)).otherwise(sub(a, b))
          case "*" =>
            val (a, b) = (t(l), t(r))
            when(Values.tag(a) === Values.T_DURATION ||
              Values.tag(b) === Values.T_DURATION,
              temporalFn("mul", a, b)).otherwise(mul(a, b))
          case "/" =>
            val (a, b) = (t(l), t(r))
            when(Values.tag(a) === Values.T_DURATION ||
              Values.tag(b) === Values.T_DURATION,
              temporalFn("div", a, b)).otherwise(div(a, b))
          case "%" => Values.mod(t(l), t(r))
          case "^" =>
            val a = num(t(l)); val b = num(t(r))
            when(a.isNull || b.isNull, vNull).otherwise(vFloat(pow(a, b)))
          case "IN" =>
            r match {
              case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
                  Ast.LitBool(_) | _: Ast.MapLit => throw TranslateError(
                s"InvalidArgumentType: IN expects a list, got: $r")
              case _ => ()
            }
            vBool(Values.in(t(l), t(r)))
          case "STARTSWITH" =>
            strPred(t(l), t(r))((a, b) => a.startsWith(b))
          case "ENDSWITH" =>
            strPred(t(l), t(r))((a, b) => a.endsWith(b))
          case "CONTAINS" =>
            strPred(t(l), t(r))((a, b) => a.contains(b))
          case other => throw TranslateError(s"unknown operator $other")
        }

      case Ast.Not(x) =>
        x match {
          case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
              _: Ast.ListLit | _: Ast.MapLit => throw TranslateError(
            s"InvalidArgumentType: NOT expects a boolean, got: $x")
          case _ => ()
        }
        Values.not(t(x))
      case Ast.Neg(x) =>
        val c = t(x)
        when(Values.tag(c) === Values.T_DURATION,
          temporalFn("mul", c, vInt(lit(-1L)))).otherwise(neg(c))
      case Ast.IsNull(x, negated) =>
        val c = t(x).isNull
        vBool(if (negated) !c else c)

      case Ast.HasLabel(inner @ Ast.HasLabel(_, _), label) =>
        // chained expression-context labels conjoin: `a:A:B` parses as
        // HasLabel(HasLabel(a,A),B) — rewrite to a:A AND a:B (Graph5 [3])
        @annotation.tailrec def root(e: Ast.Expr): Ast.Expr = e match {
          case Ast.HasLabel(t2, _) => root(t2)
          case t2 => t2
        }
        t(Ast.Bin("AND", inner, Ast.HasLabel(root(inner), label)))

      case Ast.HasLabel(target, label) =>
        // node labels are ':'-joined lists → membership; edge types stay
        // single-valued → equality
        def ofEntity(e: Column, fld: Column, isEdge: Boolean): Column =
          when(e.isNull, vNull)
            .otherwise(vBool(coalesce(
              if (isEdge) fld === lit(label)
              else Values.labelHas(fld, label), lit(false))))
        target match {
          case Ast.Variable(n) if frame.has(n) && frame.vars(n) != KValue =>
            val e = frame.col(n)
            val isEdge = frame.vars(n) == KEdge
            ofEntity(e, if (isEdge) e.getField("reltype")
              else e.getField("label"), isEdge)
          case other =>
            val c = t(other)
            typeOf(frame, other, c) match {
              case Some(s: StructType) if s.fieldNames.contains("props") =>
                val isEdge = s.fieldNames.contains("reltype")
                ofEntity(c, if (isEdge)
                  c.getField("reltype") else c.getField("label"), isEdge)
              case _ =>
                // variant target: null → null (TCK Graph5 [5]); a boxed
                // entity answers from its tagged JSON; anything else is a
                // runtime type error
                val js = c.getField("s")
                val lbl = coalesce(get_json_object(js, "$.label"),
                  get_json_object(js, "$.reltype"))
                when(c.isNull, vNull)
                  .when(Values.tag(c) === Values.T_BOXED && lbl.isNotNull,
                    vBool(Values.labelHas(lbl, label) ||
                      lbl === lit(label)))
                  .otherwise(vBool(raise_error(lit(
                    "Type mismatch: label predicate on a non-entity"))
                    .cast(BooleanType)))
            }
        }

      case Ast.CaseExpr(scrut, whens, otherwise) =>
        val els = otherwise.map(t).getOrElse(vNull)
        scrut match {
          case Some(s) =>
            val sv = t(s)
            whens.foldRight(els) { case ((w, r), acc) =>
              when(Values.isTrue(vBool(Values.eq(sv, t(w)))), t(r))
                .otherwise(acc)
            }
          case None =>
            whens.foldRight(els) { case ((w, r), acc) =>
              when(Values.isTrue(t(w)), t(r)).otherwise(acc)
            }
        }

      case Ast.Subscript(target, idx) =>
        val tc = t(target)
        typeOf(frame, target, tc) match {
          case Some(ArrayType(et: StructType, _)) if !isVariantStruct(et) =>
            // raw typed array (collect(entity/path) temps, nodes(p)):
            // negative index from the end, OOB → typed null
            val i = t(idx).getField("i")
            val n = size(tc)
            val pos = when(i >= 0, i + 1).otherwise(n + i + 1)
            when(tc.isNull || i.isNull || pos < 1 || pos > n,
              lit(null).cast(et))
              .otherwise(try_element_at(tc, pos.cast(IntegerType)))
          case Some(st: StructType) if st.fieldNames.contains("props") =>
            // dynamic property access n[expr] (`graph_entity.c` GETPROP)
            element_at(tc.getField("props"), t(idx).getField("s"))
          case Some(st: StructType) if isMapStruct(st) =>
            val fields = st.fields.filter(_.name != EmptyMapMarker)
            idx match {
              case Ast.LitString(kname) if fields.exists(f =>
                    f.name == kname && !isVariantStruct(f.dataType)) =>
                // static key hitting a nested-map field: return the typed
                // inner struct (≡ static access m.a)
                tc.getField(kname)
              case _ =>
                // a dynamic key cannot select among mixed variant /
                // nested-map fields in one column type — raise rather
                // than silently nulling the nested values
                val nested = fields.filter(f => !isVariantStruct(f.dataType))
                if (nested.nonEmpty) throw TranslateError(
                  "dynamic access to nested map values unsupported " +
                    s"(keys: ${nested.map(_.name).mkString(", ")}); " +
                    "use static access m.key")
                // a non-string key is a type error (`map_funcs.c` checks
                // T_STRING; test_map.py test06: map[0] raises), a null
                // key nulls out
                val kv = t(idx)
                val k = when(kv.isNotNull &&
                    Values.tag(kv) =!= Values.T_STRING,
                  raise_error(lit("Type mismatch: map key must be a " +
                    "string")).cast(StringType))
                  .otherwise(kv.getField("s"))
                fields.foldLeft(vNull) { (acc, f) =>
                  when(k === f.name, tc.getField(f.name)).otherwise(acc)
                }
            }
          case _ =>
            // resolve WITH-aliased literals (WITH 3.14 AS idx ... l[idx]
            // is a compile-time type error per TCK List1)
            val idxRes = idx match {
              case Ast.Variable(n) => ctx.constVars.getOrElse(n, idx)
              case other => other
            }
            idxRes match {
              case Ast.LitFloat(_) | Ast.LitString(_) | Ast.LitBool(_) |
                  _: Ast.ListLit | _: Ast.MapLit => throw TranslateError(
                s"ListElementAccessByNonInteger: list index must be an " +
                  s"integer, got: $idxRes")
              case _ => ()
            }
            val ic = t(idx)
            // string key on a boxed map/entity: dynamic property lookup —
            // parse the tagged-JSON property bag to map<string, variant>
            // and index it (map-valued parameters, Map2; get_json_object
            // paths are compile-time strings, so a runtime key must go
            // through from_json). Wrong index type on a map/list and
            // subscripting a scalar are runtime type errors (TCK List1,
            // Map2 [3]/[5]).
            val js = tc.getField("s")
            val bag = coalesce(get_json_object(js, "$.m"),
              get_json_object(js, "$.props"))
            val key = ic.getField("s")
            when(tc.isNull || ic.isNull, vNull)
              .when(tag(tc) === T_BOXED && tag(ic) === T_STRING,
                element_at(from_json(bag,
                  MapType(StringType, Values.variantType)), key))
              .when(tag(tc) === T_BOXED && bag.isNotNull,
                vStr(raise_error(lit("Type mismatch: map access by " +
                  "non-string key")).cast(StringType)))
              .when(tag(tc) === T_ARRAY && tag(ic) =!= T_INT,
                vStr(raise_error(lit("Type mismatch: list index must be " +
                  "an integer")).cast(StringType)))
              .when(tag(tc) =!= T_ARRAY && tag(tc) =!= T_BOXED,
                vStr(raise_error(lit("Type mismatch: subscript target is " +
                  "not a list or map")).cast(StringType)))
              .otherwise(subscript(tc, ic))
        }

      case Ast.SliceExpr(target, from, to) =>
        val tgt = t(target)
        val arr = tgt.getField("arr")
        val n = size(arr)
        // clamp to the list bounds (`l[-5..]` is the whole list, not a
        // wrapped index); a null bound nulls the whole slice
        def norm(c: Column) =
          greatest(least(when(c >= 0, c).otherwise(n + c), n), lit(0))
        val fromV = from.map(f => num(t(f)).cast(IntegerType))
        val toV = to.map(x => num(t(x)).cast(IntegerType))
        val lo = fromV.map(norm).getOrElse(lit(0))
        val hi = toV.map(norm).getOrElse(n)
        val boundNull =
          (fromV.map(_.isNull).toSeq ++ toV.map(_.isNull).toSeq)
            .reduceOption(_ || _).getOrElse(lit(false))
        when(tgt.isNull || boundNull, vNull)
          .otherwise(vArr(slice(arr, lo + 1, greatest(hi - lo, lit(0)))))

      case Ast.ListComprehension(v, list, where, projTo) =>
        val src = t(list)
        typeOf(frame, list, src) match {
          case Some(ArrayType(et: StructType, _)) if !isVariantStruct(et) =>
            // raw typed source (collect(entity/path) temps, nodes(p)):
            // bind the lambda variable with its struct kind so entity/path
            // functions resolve inside the body (TCK List12
            // `[x IN collect(p) | head(nodes(x))]`)
            val kind: Kind =
              if (et.fieldNames.toSeq == Seq("nodes", "rels")) KPath
              else if (et.fieldNames.contains("src")) KEdge
              else if (et.fieldNames.contains("props")) KNode
              else KValue
            def bind(x: Column) = frame.copy(
              vars = frame.vars + (v -> kind),
              bindings = frame.bindings + (v -> x),
              bindingTypes = frame.bindingTypes + (v -> et))
            val filtered = where match {
              case Some(p) =>
                filter(src, x => Values.isTrue(trExpr(ctx, bind(x), p)))
              case None => src
            }
            projTo match {
              case Some(p) =>
                // body producing an entity/path struct stays raw; scalar
                // bodies re-enter the variant list model
                val raw = staticTypeOf(frame.copy(
                  bindingTypes = frame.bindingTypes + (v -> et)), p)
                  .exists(dt => !isVariantStruct(dt))
                if (raw) transform(filtered, x => trExpr(ctx, bind(x), p))
                else vArr(transform(filtered,
                  x => Values.narrow(trExpr(ctx, bind(x), p))))
              case None => filtered
            }
          case _ =>
            // list-valued projections nest (Values.narrow keeps the list
            // branch up to Values.MaxNest levels; beyond raises loudly)
            val arr0 = src.getField("arr")
            val roots = where.toList ::: projTo.toList
            val (layers, rw) = layerPlan(roots.map(e => (e, "")))
            def bindE(x: Column): Frame = frame.copy(
              vars = frame.vars + (v -> KValue),
              bindings = frame.bindings + (v -> x))
            if (layers.nonEmpty) {
              // nested body: in-lambda layering (see lambdaAcc)
              val (acc, bind) = lambdaAcc(ctx, frame, v, arr0, layers)
              val wIdx = if (where.isDefined) Some(0) else None
              val pIdx = projTo.map(_ => if (where.isDefined) 1 else 0)
              val filtered = wIdx match {
                case Some(i) => filter(acc,
                  y => Values.isTrue(trExpr(ctx, bind(y), rw(i)._1)))
                case None => acc
              }
              val projected = pIdx match {
                case Some(i) => transform(filtered,
                  y => Values.narrow(trExpr(ctx, bind(y), rw(i)._1)))
                case None => transform(filtered,
                  y => Values.narrow(y.getField("__e")))
              }
              vArr(projected)
            } else {
              // shallow body — pre-widen ONCE so the body dispatches on a
              // LEAF element (binding v → widen(x) would re-embed the widen
              // tree at every operand reference of the combinator)
              val arr = transform(arr0, x => Values.widen(x))
              val filtered = where match {
                case Some(p) =>
                  filter(arr,
                    x => Values.isTrue(trExpr(ctx, bindE(x), p)))
                case None => arr
              }
              val projected = projTo match {
                case Some(p) =>
                  transform(filtered, x =>
                    Values.narrow(trExpr(ctx, bindE(x), p)))
                case None => transform(filtered, x => Values.narrow(x))
              }
              vArr(projected)
            }
        }

      case Ast.Quantifier(kind, v, list, pred) =>
        val lc = t(list)
        val (src0, match0): (Column, Column => Column) =
          typeOf(frame, list, lc) match {
            case Some(ArrayType(et: StructType, _))
                if !isVariantStruct(et) =>
              // raw typed source (nodes(p)/relationships(p)/collect
              // temps): bind the lambda variable with its struct kind so
              // entity functions resolve in the predicate — same as the
              // list-comprehension typed path (test13 path filtering,
              // `any(node IN nodes(p) WHERE …)`)
              val k: Kind =
                if (et.fieldNames.toSeq == Seq("nodes", "rels")) KPath
                else if (et.fieldNames.contains("src")) KEdge
                else if (et.fieldNames.contains("props")) KNode
                else KValue
              def bind(x: Column) = frame.copy(
                vars = frame.vars + (v -> k),
                bindings = frame.bindings + (v -> x),
                bindingTypes = frame.bindingTypes + (v -> et))
              (lc, (x: Column) => Values.isTrue(trExpr(ctx, bind(x), pred)))
            case _ =>
              val arr0 = lc.getField("arr")
              val (layers, rw) = layerPlan(List((pred, "")))
              if (layers.nonEmpty) {
                val (acc, bind) = lambdaAcc(ctx, frame, v, arr0, layers)
                (acc, (y: Column) =>
                  Values.isTrue(trExpr(ctx, bind(y), rw.head._1)))
              } else {
                val arr = transform(arr0, x => Values.widen(x))
                def bindE(x: Column): Frame = frame.copy(
                  vars = frame.vars + (v -> KValue),
                  bindings = frame.bindings + (v -> x))
                (arr,
                  (x: Column) => Values.isTrue(trExpr(ctx, bindE(x), pred)))
              }
          }
        kind match {
          case "any" => vBool(exists(src0, match0))
          case "all" => vBool(forall(src0, match0))
          case "none" => vBool(!exists(src0, match0))
          case "single" =>
            vBool(size(filter(src0, x => match0(x))) === 1)
        }

      case fn: Ast.Fn => trFn(ctx, frame, fn)

      case Ast.CountStar =>
        throw TranslateError("count(*) outside aggregation context")
      case other => throw TranslateError(s"unsupported expression: $other")
    }
  }


  /** SKIP/LIMIT take runtime-evaluated expressions in the reference
    * (`op_skip.c`/`op_limit.c`); we fold constant integer arithmetic.
    */
  /** SKIP/LIMIT operand (`ops/op_skip.c` evaluates its expression at
    * runtime): constant-fold the common shapes, else evaluate the
    * translated expression driver-side against a unit row — SKIP/LIMIT
    * expressions cannot reference variables per openCypher, so an empty
    * frame is the correct scope.
    */
  private def runtimeInt(ctx: Ctx, e: Ast.Expr, what: String): Int =
    try constInt(e, what)
    catch {
      case _: TranslateError =>
        val spark = ctx.graph.nodes.sparkSession
        val unit = spark.range(1).toDF()
        val v = trExpr(ctx, Frame(unit, Map.empty), e)
        val r = unit.select(
          when(Values.tag(v) === Values.T_INT, v.getField("i"))
            .otherwise(lit(null)).as("n")).head()
        if (r.isNullAt(0)) throw TranslateError(
          s"$what must evaluate to an integer, got: $e")
        val n = r.getLong(0)
        if (!n.isValidInt) throw TranslateError(s"$what out of range: $n")
        n.toInt
    }

  private def constInt(e: Ast.Expr, what: String): Int = {
    def eval(x: Ast.Expr): Option[Long] = x match {
      case Ast.LitInt(n) => Some(n)
      case Ast.Neg(a) => eval(a).map(-_)
      case Ast.Bin(op, a, b) =>
        for {
          l <- eval(a); r <- eval(b)
          v <- op match {
            case "+" => Some(l + r)
            case "-" => Some(l - r)
            case "*" => Some(l * r)
            case "/" if r != 0 => Some(l / r)
            case "%" if r != 0 => Some(l % r)
            case _ => None
          }
        } yield v
      case _ => None
    }
    eval(e) match {
      case Some(v) if v.isValidInt => v.toInt
      case Some(v) => throw TranslateError(s"$what out of range: $v")
      case None => throw TranslateError(
        s"$what must be a constant integer expression: $e")
    }
  }

  /** evaluate `body` with variable `v` bound to scalar-variant lambda arg. */
  private def lambdaExpr(ctx: Ctx, frame: Frame, v: String, x: Column,
      body: Ast.Expr): Column = {
    // bind v → widen(x) compositionally: enclosing lambdas' bindings stay
    // visible, so nested comprehensions can reference outer variables
    val f2 = frame.copy(vars = frame.vars + (v -> KValue),
      bindings = frame.bindings + (v -> Values.widen(x)))
    trExpr(ctx, f2, body)
  }

  private def strPred(a: Column, b: Column)(
      f: (Column, Column) => Column): Column = {
    import Values._
    when(a.isNull || b.isNull, lit(null).cast(BooleanType))
      .when(tag(a) === T_STRING && tag(b) === T_STRING,
        f(a.getField("s"), b.getField("s")))
      .otherwise(lit(null).cast(BooleanType)) match {
      case c => vBool(c)
    }
  }

  /** THE driver-constant → AST-literal ladder (every param surface —
    * wire prefix, client API, SET desugaring — routes through here so
    * type coverage can't diverge between them).
    */
  private[cypher] def constToAst(v: Any): Ast.Expr = v match {
    case v: Long => Ast.LitInt(v)
    case v: Int => Ast.LitInt(v.toLong)
    case v: Double => Ast.LitFloat(v)
    case v: String => Ast.LitString(v)
    case v: Boolean => Ast.LitBool(v)
    case null => Ast.LitNull
    case s: Seq[_] => Ast.ListLit(s.map(constToAst).toList)
    case m: Map[_, _] => Ast.MapLit(m.asInstanceOf[Map[String, Any]]
      .toList.map { case (k, v) => k -> constToAst(v) })
    case other => throw TranslateError(s"bad parameter value: $other")
  }

  /** Driver-side tagged-JSON encoding of a parameter value — the same
    * wire format [[Values.vBoxed]]/decodeBoxedJson speak, so map-valued
    * parameters ride the boxed-variant channel.
    */
  private def taggedJson(v: Any): String = {
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    v match {
      case null => "null"
      case x: Long => s"""{"t":${Values.T_INT},"i":$x}"""
      case x: Int => s"""{"t":${Values.T_INT},"i":$x}"""
      case x: Double => s"""{"t":${Values.T_FLOAT},"f":$x}"""
      case x: String => s"""{"t":${Values.T_STRING},"s":${jstr(x)}}"""
      case x: Boolean => s"""{"t":${Values.T_BOOL},"b":$x}"""
      case s: Seq[_] =>
        s.map(taggedJson).mkString(
          s"""{"t":${Values.T_ARRAY},"arr":[""", ",", "]}")
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].toList
          .map { case (k, x) => jstr(k) + ":" + taggedJson(x) }
          .mkString(s"""{"t":${Values.T_BOXED_MAP},"m":{""", ",", "}}")
      case other => throw TranslateError(s"bad param value: $other")
    }
  }

  /** A scalar-or-list parameter value as a variant column. */
  private[cypher] def scalarParam(v: Any): Column = {
    import Values._
    v match {
      case v: Long => vInt(lit(v))
      case v: Int => vInt(lit(v.toLong))
      case v: Double => vFloat(lit(v))
      case v: String => vStr(lit(v))
      case v: Boolean => vBool(lit(v))
      case null => vNull
      case s: Seq[_] if s.exists(_.isInstanceOf[Map[_, _]]) =>
        // list containing maps: elements box to tagged JSON
        vArr(array(s.map {
          case m: Map[_, _] => Values.sBoxed(lit(taggedJson(m)))
          case e => narrow(scalarParam(e))
        }: _*))
      case s: Seq[_] => vArr(array(s.map(e => narrow(scalarParam(e))): _*))
      case m: Map[_, _] => Values.vBoxed(lit(taggedJson(m)))
      case other => throw TranslateError(s"bad param value: $other")
    }
  }

  private def paramValue(ctx: Ctx, name: String): Column =
    ctx.paramBoxes.get(name) match {
      case Some(box) => org.apache.spark.sql.GraftColumn.column(
        graft.plans.ParamRef(box, Values.variantType))
      case None => ctx.params.get(name) match {
        case Some(v) => scalarParam(v) // one ladder for every param surface
        case None => throw TranslateError(s"missing parameter: $$$name")
      }
    }

  // ═══════════════════════ scalar function library ═════════════════════════
  /** SURVEY §2.6 function inventory (117 fns in
    * `src/arithmetic/funcs.c`) — each a Column composition.
    */
  /** Wrap a [[TemporalFn]] dispatch over variant columns. */
  private[cypher] def temporalFn(fn: String, args: Column*): Column =
    org.apache.spark.sql.GraftColumn.column(TemporalFn(fn,
      args.map(org.apache.spark.sql.GraftColumn.expression)))

  private def trFn(ctx: Ctx, frame: Frame, fn: Ast.Fn): Column = {
    import Values._
    def t(x: Ast.Expr): Column = trExpr(ctx, frame, x)
    /** component map argument → map<string, variant> column. */
    def componentMap(a: Ast.Expr): Option[Column] = a match {
      case Ast.MapLit(entries) =>
        Some(if (entries.isEmpty) map().cast(Values.propsType)
        else map(entries.flatMap { case (k, v) => Seq(lit(k), t(v)) }: _*))
      case other =>
        val c = t(other)
        typeOf(frame, other, c) match {
          case Some(s: StructType) if isMapStruct(s) =>
            val fields = s.fields.filter(_.name != EmptyMapMarker)
            if (!fields.forall(f => isVariantStruct(f.dataType)))
              throw TranslateError(
                "temporal component maps cannot carry nested maps")
            Some(if (fields.isEmpty) map().cast(Values.propsType)
            else map(fields.flatMap(f =>
              Seq(lit(f.name), c.getField(f.name))): _*))
          case _ => None
        }
    }
    def entity(x: Ast.Expr): Column = x match {
      case Ast.Variable(n) if frame.has(n) && frame.vars(n) != KValue =>
        frame.col(n)
      case f @ Ast.Fn("startnode" | "endnode", _, _) => trFn(ctx, frame, f)
      // a null literal / null-valued value var is a NULL entity (entity
      // functions null-propagate)
      case Ast.LitNull => lit(null).cast(nodeStructType)
      case Ast.Variable(n) if frame.has(n) &&
          dataTypeOf(frame, frame.col(n)).exists(dt => dt match {
            case s: StructType => s.fieldNames.contains("props")
            case _ => false
          }) => frame.col(n)
      case other => throw TranslateError(s"expected entity: $other")
    }
    def str1(f: Column => Column): Column = {
      val v = t(fn.args.head)
      when(v.isNull, vNull)
        .when(tag(v) === T_STRING, vStr(f(v.getField("s"))))
        .otherwise(vNull)
    }
    def num1(f: Column => Column, keepInt: Boolean = false): Column = {
      val v = t(fn.args.head)
      when(v.isNull, vNull)
        .when(tag(v) === T_INT && lit(keepInt),
          vInt(f(v.getField("i").cast(DoubleType)).cast(LongType)))
        .when(isNum(v), vFloat(f(num(v))))
        .otherwise(vNull)
    }

    fn.name match {
      // entity funcs (`entity_funcs.c:186-230`)
      // entity fns null-propagate: an unmatched OPTIONAL MATCH variable is
      // a NULL entity, and id(null)/labels(null)/type(null) are NULL
      case "id" =>
        val e = entity(fn.args.head)
        when(e.isNull, vNull).otherwise(vInt(e.getField("id")))
      case "labels" =>
        // unlabeled node → [] (not [null]); TCK Graph3 [1]. Multi-label
        // nodes list every component in creation order.
        val eOpt =
          try Some(entity(fn.args.head))
          catch { case _: TranslateError => None }
        eOpt match {
          case Some(e) =>
            when(e.isNull, vNull)
              .when(e.getField("label").isNull,
                vArr(array().cast(ArrayType(elemType))))
              .otherwise(vArr(transform(
                split(e.getField("label"), ":"), x => sStr(x))))
          case None =>
            // variant argument (labels() accepts Any, Graph3 [6]): a boxed
            // NODE answers from its tagged JSON; anything else errors
            val c = t(fn.args.head)
            val js = c.getField("s")
            val lbl = get_json_object(js, "$.label")
            when(c.isNull, vNull)
              .when(Values.tag(c) === Values.T_BOXED &&
                get_json_object(js, "$.t") === lit(Values.T_NODE.toString),
                when(lbl.isNull, vArr(array().cast(ArrayType(elemType))))
                  .otherwise(vArr(transform(split(lbl, ":"), x => sStr(x)))))
              .otherwise(vArr(raise_error(
                lit("Type mismatch: labels() expects a node"))
                .cast(ArrayType(elemType))))
        }
      case "type" =>
        fn.args.head match {
          case Ast.LitNull => vNull
          case Ast.Variable(v) if frame.vars.get(v).contains(KNode) =>
            throw TranslateError("type() expects a relationship, got a node")
          case a =>
            val c = t(a)
            typeOf(frame, a, c) match {
              case Some(st: StructType) if isVariantStruct(st) =>
                // variant-valued arg (e.g. list[0] on a mixed list): a
                // BOXED edge answers from its tagged JSON; anything else
                // is a runtime type error (reference `type()` Any-type
                // handling, TCK Graph4 [5])
                val rt = get_json_object(c.getField("s"), "$.reltype")
                when(c.isNull, vNull)
                  .when(Values.tag(c) === Values.T_BOXED && rt.isNotNull,
                    vStr(rt))
                  .otherwise(vStr(raise_error(lit(
                    "Type mismatch: type() expects a relationship"))
                    .cast(StringType)))
              case _ =>
                val e = entity(fn.args.head)
                when(e.isNull, vNull).otherwise(vStr(e.getField("reltype")))
            }
        }
      case "exists" => fn.args.head match {
        // exists() takes a property access or a pattern (the pattern form
        // is rewritten before trFn); bare variables/literals are a
        // compile-time error (TCK Graph9 [6] InvalidArgumentExpression)
        case Ast.Prop(Ast.Variable(n), _)
            if frame.has(n) && frame.vars(n) != KValue =>
          // null entity (OPTIONAL MATCH miss) → null, not false
          when(frame.col(n).isNull, vNull)
            .otherwise(vBool(t(fn.args.head).isNotNull))
        case Ast.Prop(tgt, key) =>
          // KEY existence, not value non-nullness: a literal map holding
          // {name: null} still HAS `name` (TCK Map4 [1]); a null map → null
          val tc = t(tgt)
          typeOf(frame, tgt, tc) match {
            case Some(s: StructType) if isMapStruct(s) =>
              when(tc.isNull, vNull).otherwise(vBool(lit(
                s.fieldNames.contains(key) && key != EmptyMapMarker)))
            case _ =>
              when(tc.isNull, vNull)
                .otherwise(vBool(t(fn.args.head).isNotNull))
          }
        case _: Ast.Subscript =>
          vBool(t(fn.args.head).isNotNull)
        case Ast.Variable(n) if frame.has(n) =>
          // bare variable: non-nullness (the reference accepts any
          // expression — EXISTS(b) over an OPTIONAL MATCH miss is false,
          // test_optional_match.py test16; computed expressions like
          // exists(n.num + 1) stay compile errors per TCK Graph9 [6])
          vBool(frame.col(n).isNotNull)
        case Ast.LitNull => vBool(lit(false)) // EXISTS(null) = false
        case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
            Ast.LitBool(_) =>
          vBool(lit(true)) // EXISTS(<literal>) = true (test_function_calls)
        case other => throw TranslateError(
          s"InvalidArgumentExpression: exists() expects a property " +
            s"access or pattern, got: $other")
      }
      case "keys" =>
        // property keys of an entity / key list of a map value
        fn.args.head match {
          case a @ Ast.Variable(n)
              if frame.has(n) && frame.vars(n) != KValue =>
            val e = entity(a)
            when(e.isNull, vNull).otherwise(vArr(transform(
              map_keys(coalesce(e.getField("props"),
                map().cast(Values.propsType))), k => sStr(k))))
          case a =>
            val c = t(a)
            typeOf(frame, a, c) match {
              case Some(s: StructType) if isMapStruct(s) =>
                vArr(array(s.fieldNames.filterNot(_ == EmptyMapMarker)
                  .map(k => sStr(lit(k))): _*))
              case Some(s: StructType) if s.fieldNames.contains("props") =>
                when(c.isNull, vNull).otherwise(vArr(transform(
                  map_keys(coalesce(c.getField("props"),
                    map().cast(Values.propsType))), k => sStr(k))))
              case _ =>
                // variant: boxed maps/entities expose keys through the
                // tagged JSON
                val js = c.getField("s")
                val keysOf = coalesce(
                  json_object_keys(get_json_object(js, "$.m")),
                  json_object_keys(get_json_object(js, "$.props")))
                when(c.isNull, vNull)
                  .when(tag(c) === T_BOXED && keysOf.isNotNull,
                    vArr(transform(keysOf, k => sStr(k))))
                  .otherwise(vNull)
            }
        }
      case "properties" =>
        fn.args.head match {
          case Ast.LitNull => vNull
          case a @ Ast.Variable(n)
              if frame.has(n) && frame.vars(n) != KValue =>
            val e = entity(a)
            // boxed map value (T_BOXED_MAP tagged JSON) — decodes to a
            // plain map, indistinguishable from a map literal
            when(e.isNull, vNull).otherwise(vBoxed(to_json(struct(
              lit(Values.T_BOXED_MAP).as("t"),
              coalesce(e.getField("props"),
                map().cast(Values.propsType)).as("m")))))
          case a =>
            val c = t(a)
            typeOf(frame, a, c) match {
              case Some(s: StructType) if isMapStruct(s) => c // already a map
              case Some(s: StructType) if s.fieldNames.contains("props") =>
                when(c.isNull, vNull).otherwise(vBoxed(to_json(struct(
                  lit(Values.T_BOXED_MAP).as("t"),
                  coalesce(c.getField("props"),
                    map().cast(Values.propsType)).as("m")))))
              case _ =>
                when(c.isNull, vNull)
                  .when(tag(c) === T_BOXED, c) // boxed map passes through
                  .otherwise(vStr(raise_error(lit(
                    "Type mismatch: properties() expects an entity or map"))
                    .cast(StringType)))
            }
        }
      case "toboolean" =>
        val v = t(fn.args.head)
        when(v.isNull, vNull)
          .when(tag(v) === T_BOOL, v)
          // a non-convertible STRING yields null; any non-bool/string TYPE
          // is a runtime TypeError (TCK TypeConversion1 [5])
          .when(tag(v) === T_STRING,
            when(lower(v.getField("s")) === "true", vBool(lit(true)))
              .when(lower(v.getField("s")) === "false", vBool(lit(false)))
              .otherwise(vNull))
          .otherwise(vBool(raise_error(lit(
            "TypeError: InvalidArgumentValue: toBoolean() requires a " +
              "boolean or a string")).cast(BooleanType)))
      // id-only node stubs: enough for id(startNode(r)) composition; full
      // entity hydration would need a join, which callers do via patterns
      case "startnode" | "endnode" => fn.args.head match {
        case Ast.LitNull => lit(null).cast(nodeStructType)
        case a =>
          val e = entity(a)
          val far = e.getField(if (fn.name == "startnode") "src" else "dst")
          // hydrate from any node variable already bound to that id (the
          // common `MATCH (a)-[r]-(b) ... startNode(r).k` shape needs
          // label/props, not just the id); fall back to an id-only stub —
          // full hydration would need a join, which callers do via patterns
          val stub = struct(far.as("id"),
            lit(null).cast(StringType).as("label"),
            lit(null).cast(Values.propsType).as("props"))
          val hydrated = frame.vars.toSeq.sortBy(_._1).collect {
            case (nv, KNode) => frame.col(nv)
          }.foldLeft(stub) { (acc, nc) =>
            when(nc.getField("id") === far, struct(
              nc.getField("id").as("id"), nc.getField("label").as("label"),
              nc.getField("props").as("props"))).otherwise(acc)
          }
          when(e.isNull, lit(null).cast(nodeStructType)).otherwise(hydrated)
      }
      // dynamic property access (`entity_funcs.c` property): key evaluated
      // at runtime, missing ≡ NULL (PROPERTY_NOTFOUND)
      case "property" =>
        val e = entity(fn.args.head)
        val k = t(fn.args(1))
        when(k.isNull, vNull)
          .otherwise(element_at(e.getField("props"), k.getField("s")))

      // path funcs (`path_funcs.c:266-289`) — raw entity arrays; a null
      // (variant-typed) argument null-propagates instead of failing to
      // resolve the path fields
      case "nodes" =>
        val c = t(fn.args.head)
        typeOf(frame, fn.args.head, c) match {
          case Some(s: StructType) if s.fieldNames.contains("nodes") =>
            c.getField("nodes")
          case _ => lit(null).cast(ArrayType(nodeStructType))
        }
      case "relationships" =>
        val c = t(fn.args.head)
        typeOf(frame, fn.args.head, c) match {
          case Some(s: StructType) if s.fieldNames.contains("rels") =>
            c.getField("rels")
          case _ => lit(null).cast(ArrayType(edgeStructType))
        }
      case "length" =>
        // length() takes a path; a node/relationship argument is a
        // compile-time type error (TCK Path3 [2]/[3]; size() covers lists)
        fn.args.head match {
          case Ast.Variable(n) if frame.has(n) &&
              (frame.vars(n) == KNode || frame.vars(n) == KEdge) =>
            throw TranslateError(
              "InvalidArgumentType: length() expects a path")
          case _ => ()
        }
        val c = t(fn.args.head)
        typeOf(frame, fn.args.head, c) match {
          case Some(s: StructType) if s.fieldNames.contains("rels") =>
            vInt(size(c.getField("rels")))
          case _ => vNull
        }

      // point/geo (`point_funcs.c:14,98`: haversine, EARTH_RADIUS 6378140)
      case "point" => fn.args.head match {
        case Ast.MapLit(entries) =>
          val m = entries.toMap
          val lat0 = num(t(m.getOrElse("latitude",
            throw TranslateError("point needs latitude"))))
          val lon0 = num(t(m.getOrElse("longitude",
            throw TranslateError("point needs longitude"))))
          // coordinate ranges are validated like the reference
          // (`point.c`: "latitude should be within the -90 to 90 range")
          val lat = when(lat0 < -90d || lat0 > 90d, raise_error(lit(
            "point: latitude should be within the -90 to 90 range"))
            .cast(DoubleType)).otherwise(lat0)
          val lon = when(lon0 < -180d || lon0 > 180d, raise_error(lit(
            "point: longitude should be within the -180 to 180 range"))
            .cast(DoubleType)).otherwise(lon0)
          vPoint(lat, lon)
        case other => throw TranslateError(s"point needs a map literal: $other")
      }
      case "latitude" => vFloat(pointLat(t(fn.args.head)))
      case "longitude" => vFloat(pointLon(t(fn.args.head)))
      case "distance" =>
        val a = t(fn.args.head); val b = t(fn.args(1))
        val lat1 = radians(pointLat(a)); val lon1 = radians(pointLon(a))
        val lat2 = radians(pointLat(b)); val lon2 = radians(pointLon(b))
        val sdlat = sin((lat2 - lat1) / 2)
        val sdlon = sin((lon2 - lon1) / 2)
        val h = sdlat * sdlat + cos(lat1) * cos(lat2) * sdlon * sdlon
        when(a.isNull || b.isNull, vNull)
          .otherwise(vFloat(lit(2.0 * 6378140.0) * asin(sqrt(h))))

      // conditional (`conditional_funcs.c`)
      case "coalesce" => coalesce(fn.args.map(t): _*)

      // string (`string_funcs.c:249-324`)
      case "tolower" => str1(lower)
      case "toupper" => str1(upper)
      case "trim" => str1(trim(_))
      case "ltrim" => str1(ltrim(_))
      case "rtrim" => str1(rtrim(_))
      case "reverse" => str1(reverse)
      case "left" => str1(s => s.substr(lit(1),
        lit(constantLong(fn.args(1)).toInt)))
      case "right" => str1(s => s.substr(
        length(s) - lit(constantLong(fn.args(1)).toInt - 1),
        lit(constantLong(fn.args(1)).toInt)))
      case "substring" =>
        // Cypher substring(s, start, len) is 0-based (`string_funcs.c`)
        val start = constantLong(fn.args(1)).toInt
        fn.args match {
          case List(_, _) => str1(s => s.substr(lit(start + 1), length(s)))
          case List(_, _, lenE) =>
            str1(s => s.substr(lit(start + 1), lit(constantLong(lenE).toInt)))
          case _ => throw TranslateError("substring arity")
        }
      case "replace" => fn.args match {
        case List(_, s1, s2) =>
          str1(s => regexp_replace(s,
            lit(java.util.regex.Pattern.quote(constantString(s1))),
            lit(java.util.regex.Matcher.quoteReplacement(constantString(s2)))))
        case _ => throw TranslateError("replace arity")
      }
      case "split" =>
        val sep = constantString(fn.args(1))
        val v = t(fn.args.head)
        when(v.isNull, vNull).otherwise(vArr(transform(
          split(v.getField("s"), java.util.regex.Pattern.quote(sep)),
          x => sStr(x))))
      case "tostring" =>
        // lists/maps/entities/paths are invalid (TCK TypeConversion4 [10])
        val v = t(fn.args.head)
        when(v.isNull, vNull)
          .when(Values.tag(v).isin(Values.T_ARRAY, Values.T_BOXED,
            Values.T_BOXED_MAP),
            vStr(raise_error(lit("InvalidArgumentValue: toString() " +
              "cannot convert a list, map, or entity")).cast(StringType)))
          .otherwise(vStr(render(v)))
      case "tojson" =>
        // `src/util/json_encoder.c`: entities render as typed objects;
        // relationship "start"/"end" inline the FULL endpoint nodes —
        // resolved from the path's own node array or any bound node
        // variable holding that id (the startNode() hydration trick),
        // falling back to an id-only stub when neither has it
        def labelsArr(e: Column): Column = concat(lit("\"labels\": ["),
          when(e.getField("label").isNull, lit(""))
            .otherwise(array_join(transform(split(e.getField("label"), ":"),
              x => Values.jsonStr(x)), ", ")), lit("]"))
        def nodeJson(e: Column, typed: Boolean): Column = concat(
          lit(if (typed) "{\"type\": \"node\", \"id\": " else "{\"id\": "),
          e.getField("id").cast(StringType), lit(", "), labelsArr(e),
          lit(", "), Values.propsJson(e.getField("props")), lit("}"))
        def resolveNode(idc: Column, pathNodes: Option[Column]): Column = {
          val stub = struct(idc.as("id"),
            lit(null).cast(StringType).as("label"),
            lit(null).cast(Values.propsType).as("props"))
          val fromVars = frame.vars.toSeq.sortBy(_._1).collect {
            case (nv, KNode) => frame.col(nv)
          }.foldLeft(stub) { (acc, nc) =>
            when(nc.getField("id") === idc, struct(
              nc.getField("id").as("id"), nc.getField("label").as("label"),
              nc.getField("props").as("props"))).otherwise(acc)
          }
          pathNodes.map(arr => coalesce(element_at(
            filter(arr, n => n.getField("id") === idc), 1), fromVars))
            .getOrElse(fromVars)
        }
        def edgeJson(e: Column, pathNodes: Option[Column]): Column = concat(
          lit("{\"type\": \"relationship\", \"id\": "),
          e.getField("id").cast(StringType),
          lit(", \"relationship\": "), Values.jsonStr(e.getField("reltype")),
          lit(", "), Values.propsJson(e.getField("props")),
          lit(", \"start\": "),
          nodeJson(resolveNode(e.getField("src"), pathNodes), typed = false),
          lit(", \"end\": "),
          nodeJson(resolveNode(e.getField("dst"), pathNodes), typed = false),
          lit("}"))
        def pathJson(p: Column): Column = {
          val nodes = p.getField("nodes")
          val nj = transform(nodes, n => nodeJson(n, typed = true))
          val rj = transform(p.getField("rels"),
            r => edgeJson(r, Some(nodes)))
          // interleave: n0, r0, n1, r1, …, nk
          val tailPairs = zip_with(rj,
            slice(nj, lit(2), greatest(size(nj) - 1, lit(0))),
            (r, n) => concat(r, lit(", "), n))
          when(p.isNull, lit(null).cast(StringType))
            .otherwise(concat(lit("["), concat_ws(", ",
              concat(array(element_at(nj, 1)), tailPairs)), lit("]")))
        }
        fn.args.head match {
          case Ast.Variable(nv) if frame.vars.get(nv).contains(KNode) =>
            vStr(nodeJson(frame.col(nv), typed = true))
          case Ast.Variable(nv) if frame.vars.get(nv).contains(KEdge) =>
            vStr(edgeJson(frame.col(nv), None))
          case a =>
            val c = t(a)
            typeOf(frame, a, c) match {
              case Some(st: StructType)
                  if st.fieldNames.contains("nodes") => vStr(pathJson(c))
              case Some(st: StructType) if !isVariantStruct(st) &&
                  isMapStruct(st) => vStr(mapStructJson(c, st))
              case _ => vStr(Values.jsonOf(c))
            }
        }

      // numeric (`numeric_funcs.c:144-203`)
      case "abs" => num1(abs, keepInt = true)
      case "ceil" => num1(ceil(_).cast(DoubleType))
      case "floor" => num1(floor(_).cast(DoubleType))
      case "round" => num1(round(_, 0))
      case "sqrt" => num1(sqrt)
      case "sign" => num1(signum, keepInt = true)
      case "rand" => vFloat(rand())
      case "randomuuid" => vStr(uuid())
      case "tointeger" =>
        // unparseable string → NULL (`numeric_funcs.c` toInteger; guard the
        // cast — ANSI mode would throw), string floats truncate: '2.9' → 2
        val v = t(fn.args.head)
        val s = v.getField("s")
        val numericStr = s.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)$")
        when(v.isNull, vNull)
          .when(tag(v) === T_INT, v)
          .when(tag(v) === T_FLOAT, vInt(v.getField("f").cast(LongType)))
          .when(tag(v) === T_STRING && numericStr,
            vInt(s.cast(DoubleType).cast(LongType)))
          .when(tag(v) === T_STRING, vNull) // unparseable string → NULL
          .otherwise(vInt(raise_error( // bool/list/map/entity/path: error
            lit("InvalidArgumentValue: toInteger() cannot convert " +
              "a boolean, list, map, or entity")).cast(LongType)))
      case "tofloat" =>
        val v = t(fn.args.head)
        val s = v.getField("s")
        val numericStr = s.rlike("^[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?$")
        when(v.isNull, vNull)
          .when(tag(v) === T_FLOAT, v)
          .when(tag(v) === T_INT, vFloat(v.getField("i").cast(DoubleType)))
          .when(tag(v) === T_STRING && numericStr,
            vFloat(s.cast(DoubleType)))
          .when(tag(v) === T_STRING, vNull) // unparseable string → NULL
          .otherwise(vFloat(raise_error(
            lit("InvalidArgumentValue: toFloat() cannot convert " +
              "a boolean, list, map, or entity")).cast(DoubleType)))

      // list (`list_funcs.c:222-263`)
      case "size" => fn.args.head match {
        // var-len relationship variable: raw edge-struct list, not variant
        case Ast.Variable(v) if frame.vars.get(v).contains(KRelList) =>
          vInt(size(frame.col(v)).cast(LongType))
        case a =>
          val c = t(a)
          typeOf(frame, a, c) match {
            // raw entity arrays (collect(n) temps, nodes(p)) — not variants
            case Some(_: ArrayType) =>
              vInt(when(c.isNull, lit(null)).otherwise(size(c)).cast(LongType))
            case _ => sizeOf(c)
          }
      }
      case "head" =>
        val v = t(fn.args.head)
        typeOf(frame, fn.args.head, v) match {
          // raw typed arrays (collect(entity/map) temps): element passes
          // through with its own type, not the variant encoding
          case Some(_: ArrayType) => try_element_at(v, lit(1))
          case _ => subscript(v, vInt(lit(0L)))
        }
      case "last" =>
        val v = t(fn.args.head)
        typeOf(frame, fn.args.head, v) match {
          case Some(_: ArrayType) => try_element_at(v, lit(-1))
          case _ => subscript(v, vInt(lit(-1L)))
        }
      case "tail" =>
        val v = t(fn.args.head)
        typeOf(frame, fn.args.head, v) match {
          case Some(_: ArrayType) =>
            when(v.isNull, v)
              .otherwise(slice(v, lit(2), greatest(size(v) - 1, lit(0))))
          case _ =>
            when(v.isNull, vNull)
              .otherwise(vArr(slice(v.getField("arr"), lit(2),
                greatest(size(v.getField("arr")) - 1, lit(0)))))
        }
      case "range" =>
        // non-integer arguments — INCLUDING null — are an ArgumentError
        // (`list_funcs.c` range validates INT64 and its type mask has no
        // T_NULL; test_list.py test03 expects `range(NULL, 5)` to error),
        // checked per-row before the sequence
        def intArg(e: Ast.Expr, what: String): Column = {
          val v = t(e)
          when(v.isNull || Values.tag(v) =!= Values.T_INT,
            raise_error(concat(lit(s"range(): $what must be an integer, got "),
              coalesce(Values.render(v), lit("null")))).cast(LongType))
            .otherwise(v.getField("i"))
        }
        val from = intArg(fn.args.head, "start")
        val to = intArg(fn.args(1), "end")
        val step = fn.args.drop(2).headOption
          .map(s => intArg(s, "step")).getOrElse(lit(1L))
        // range(0, -1) is the EMPTY list in Cypher; Spark's sequence
        // rejects inconsistent boundaries
        val empty = (step > 0 && to < from) || (step < 0 && to > from)
        when(from.isNull || to.isNull || step.isNull, vNull)
          .otherwise(vArr(when(empty, array().cast(ArrayType(Values.elemType)))
            .otherwise(transform(sequence(from, to, step), x => sInt(x)))))

      // temporal (`time_funcs.c:22`)
      case "timestamp" =>
        vInt(unix_millis(current_timestamp()))

      // ── temporal value family (extension; TCK Temporal1-10) ─────────────
      case name @ ("date" | "time" | "localtime" | "localdatetime" |
          "datetime" | "duration") =>
        fn.args match {
          case Nil => temporalFn(name)
          case List(a) => componentMap(a) match {
            case Some(m) => temporalFn(name, m)
            case None => temporalFn(name, t(a))
          }
          case _ => throw TranslateError(
            s"$name() takes at most one argument")
        }
      // clock selectors: statement/transaction/realtime share one clock in
      // a single-statement engine
      case name if name.endsWith(".statement") ||
          name.endsWith(".transaction") || name.endsWith(".realtime") =>
        val base = name.substring(0, name.indexOf('.'))
        fn.args match {
          case Nil => temporalFn(base)
          case List(a) => temporalFn(base, t(a))
          case _ => throw TranslateError(s"$name() takes at most one argument")
        }
      case name if name.endsWith(".truncate") =>
        val kind = name.substring(0, name.indexOf('.'))
        fn.args match {
          case List(unit, src) =>
            temporalFn(s"truncate_$kind", t(unit), t(src))
          case List(unit, src, ov) =>
            val m = componentMap(ov).getOrElse(throw TranslateError(
              s"$name overrides must be a map"))
            temporalFn(s"truncate_$kind", t(unit), t(src), m)
          case _ => throw TranslateError(
            s"$name(unit, temporal[, overrides]) arity")
        }
      case "duration.between" | "duration.inmonths" | "duration.indays" |
          "duration.inseconds" =>
        val k = fn.name.substring("duration.".length)
        fn.args match {
          case List(a, b) => temporalFn(k, t(a), t(b))
          case _ => throw TranslateError(s"${fn.name}(a, b) arity")
        }
      case "datetime.fromepoch" =>
        fn.args match {
          case List(s, n) => temporalFn("fromepoch", t(s), t(n))
          case _ => throw TranslateError("datetime.fromepoch(sec, nano) arity")
        }
      case "datetime.fromepochmillis" =>
        fn.args match {
          case List(ms) => temporalFn("fromepochmillis", t(ms))
          case _ => throw TranslateError("datetime.fromepochmillis(ms) arity")
        }

      case other =>
        throw TranslateError(s"unknown function: $other")
    }
  }

  private def constantLong(e: Ast.Expr): Long = e match {
    case Ast.LitInt(v) => v
    case other => throw TranslateError(s"expected int literal: $other")
  }
  private def constantString(e: Ast.Expr): String = e match {
    case Ast.LitString(v) => v
    case other => throw TranslateError(s"expected string literal: $other")
  }
}
