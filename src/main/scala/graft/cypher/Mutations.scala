package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph DML (SURVEY.md §2.5): CREATE / SET / DELETE / MERGE executed as
  * distributed DataFrame transforms over the session graph.
  *
  * The reference buffers pending changes per operator and commits at stream
  * end (`/root/reference/src/execution_plan/ops/op_create.c`, `op_update.c`,
  * `op_delete.c`, `op_merge.c`). Here each write clause derives a new
  * immutable (nodes, edges) pair with joins — exactly the shape a Delta
  * `MERGE INTO` / `UPDATE` / `DELETE` takes at scale, with `localCheckpoint`
  * standing in for the table rewrite. No collect loops: creation fan-out,
  * property updates and deletions all stay distributed.
  */
private[cypher] final class MutationRunner(session: CypherSession) {
  import Translator._

  private val spark = session.spark

  private var nodesCreated = 0L
  private var relsCreated = 0L
  private var propsSet = 0L
  private var nodesDeleted = 0L
  private var relsDeleted = 0L
  // first id this statement allocated (captured at the first CREATE/MERGE,
  // where the base is computed anyway) — lets DELETE net out entities the
  // same statement created (TCK Delete4 [3] "no side effects")
  private var stmtNodeBase = Long.MaxValue
  private var stmtEdgeBase = Long.MaxValue
  // bare variables DELETEd so far: later property/label reads must raise
  private val deletedVars = scala.collection.mutable.Set[String]()

  private def ctx(params: Map[String, Any]) =
    Ctx(session.graph, params, Some(session))


  /** Pattern properties a CREATE/MergeCreate stores per entity — the
    * reference's resultset_statistics counts them under properties_set.
    * Static count excluding literal NULL (a null-VALUED property is not
    * stored); a non-literal expression that evaluates to null at runtime
    * is still counted — acceptable drift on a diagnostics counter (the
    * literal fast path below counts exactly).
    */
  /** All variable names referenced anywhere in an expression tree
    * (generic Product walk, as Translator.exprVars).
    */
  private def referencedVars(e: Ast.Expr): Set[String] = {
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

  private def patternPropCount(pn: List[PendingNode],
      pe: List[PendingEdge]): Long =
    (pn.flatMap(_.pat.props) ++ pe.flatMap(_.rel.props)).count {
      case (_, Ast.LitNull) => false
      case _ => true
    }.toLong

  /** Execute a statement containing write clauses. Returns the RETURN
    * projection if present, else a one-row statistics frame
    * (≡ ResultSetStatistics, `src/resultset/resultset_statistics.h`).
    */
  def run(clauses: List[Ast.Clause], params: Map[String, Any]): DataFrame = {
    val unit = spark.range(1).select(lit(1).as("__unit"))
    var frame = Frame(unit, Map.empty)
    var returned: Option[DataFrame] = None
    mergeCreates(clauses).foreach {
      case m: Ast.Match => frame = translateMatch(ctx(params), frame, m)
      case u: Ast.Unwind => frame = translateUnwind(ctx(params), frame, u)
      case w: Ast.With =>
        checkDeletedAccess(Some(w.proj), w.where)
        frame = translateProjection(ctx(params), frame, w.proj, w.where,
          carryFlats = true)
      case c: Ast.CallProc => frame = translateCall(ctx(params), frame, c)
      case c: Ast.Create => frame = execCreate(frame, c.paths, params)
      case s: Ast.SetClause => frame = execSet(frame, s.items, params)
      case d: Ast.Delete => frame = execDelete(frame, d, params)
      case mg: Ast.Merge => frame = execMerge(frame, mg, params)
      case r: Ast.Return =>
        checkDeletedAccess(Some(r.proj), None)
        returned = Some(
          translateProjection(ctx(params), frame, r.proj, None).df)
      case _: Ast.CreateIndex | _: Ast.DropIndex =>
        throw Translator.TranslateError(
          "index DDL cannot be combined with other clauses")
    }
    returned.getOrElse(statsDf)
  }

  /** Fuse runs of consecutive CREATE clauses into one (`CREATE (a)
    * CREATE (a)-[:R]->(b) …` ≡ one multi-path CREATE): the TCK "Many
    * CREATE clauses" scenario is 972 clauses, and a commit (snapshot
    * checkpoint + stats jobs) PER CLAUSE is quadratic wall-clock where one
    * wide create is a single job set. A later clause whose property
    * expressions read a variable created earlier in the run still needs
    * that entity materialized — such a boundary flushes the run.
    */
  private def mergeCreates(clauses: List[Ast.Clause]): List[Ast.Clause] = {
    val out = scala.collection.mutable.ListBuffer[Ast.Clause]()
    var acc = scala.collection.mutable.ListBuffer[Ast.PathPat]()
    var created = Set.empty[String]
    def flush(): Unit = {
      if (acc.nonEmpty) out += Ast.Create(acc.toList)
      acc = scala.collection.mutable.ListBuffer()
      created = Set.empty
    }
    def refsWith(p: Ast.PathPat)(
        collect: PartialFunction[Ast.Expr, String]): Set[String] = {
      val refs = scala.collection.mutable.Set[String]()
      def scan(e: Ast.Expr): Unit = Ast.foreachExpr(e) { x =>
        if (collect.isDefinedAt(x)) refs += collect(x)
      }
      (p.head.props ++ p.tail.flatMap { case (r, n) => r.props ++ n.props })
        .foreach(kv => scan(kv._2))
      refs.toSet
    }
    // only `x.prop` READS of an entity raise — other references to a
    // same-clause created entity (id(x), the bare variable) are not the
    // reference's "undefined property" surface (test_graph_create.py
    // test05 covers property reads only)
    def propRefs(p: Ast.PathPat): Set[String] =
      refsWith(p) { case Ast.Prop(Ast.Variable(n), _) => n }
    // ANY reference to an entity created by an earlier clause in the
    // merged run (incl. id(x)) must flush so the entity materializes first
    def varRefs(p: Ast.PathPat): Set[String] =
      refsWith(p) { case Ast.Variable(n) => n }
    def boundVars(p: Ast.PathPat): Set[String] =
      ((p.head :: p.tail.map(_._2)).flatMap(_.variable) ++
        p.tail.flatMap(_._1.variable)).toSet
    // vars bound by EARLIER clauses (any kind): a property expression may
    // read those; reading a variable first bound by the SAME Create clause
    // is an error — its properties are not committed yet (the reference's
    // "undefined property", test_graph_create.py test05). Cross-CLAUSE
    // reads of created entities stay legal and flush the merged run so the
    // referenced entity is materialized first.
    var seenBound = Set.empty[String]
    def otherBound(cl: Ast.Clause): Set[String] = cl match {
      case m: Ast.Match =>
        m.paths.flatMap(p => boundVars(p) ++ p.pathVar).toSet
      case u: Ast.Unwind => Set(u.alias)
      case w: Ast.With => w.proj.items.flatMap { case (e, alias) =>
          alias.orElse(e match {
            case Ast.Variable(n) => Some(n)
            case _ => None
          })
        }.toSet
      case cp: Ast.CallProc =>
        cp.yields.map { case (n, a) => a.getOrElse(n) }.toSet
      case mg: Ast.Merge => boundVars(mg.path) ++ mg.path.pathVar
      case _ => Set.empty
    }
    clauses.foreach {
      case c: Ast.Create =>
        val clauseNew = c.paths.flatMap(boundVars).toSet -- seenBound
        c.paths.foreach { p =>
          val sameClause = propRefs(p).intersect(clauseNew)
          if (sameClause.nonEmpty) throw TranslateError(
            s"undefined property: ${sameClause.head} is created by this " +
              "clause and has no committed properties yet")
          if (varRefs(p).intersect(created).nonEmpty) flush()
          acc += p
          created ++= boundVars(p)
        }
        seenBound ++= c.paths.flatMap(boundVars)
      case other =>
        flush(); out += other; seenBound ++= otherBound(other)
    }
    flush()
    out.toList
  }

  /** Reading the properties/labels/type of an entity this statement already
    * DELETEd raises EntityNotFound (TCK Return2 [15]-[17]); returning the
    * bare (stale) entity row stays legal, matching the reference.
    */
  private def checkDeletedAccess(proj: Option[Ast.Projection],
      where: Option[Ast.Expr]): Unit = {
    if (deletedVars.isEmpty) return
    def raiseIt(): Nothing = throw TranslateError(
      "EntityNotFound: attempted to access a deleted entity " +
        "(DeletedEntityAccess)")
    def scan(e: Ast.Expr): Unit = Ast.foreachExpr(e) {
      case Ast.Prop(Ast.Variable(n), _) if deletedVars(n) => raiseIt()
      // type(r) of a deleted relationship stays readable (Return2 [14]);
      // only property/label reads raise
      case Ast.Fn(f, List(Ast.Variable(n)), _) if deletedVars(n) &&
        Set("labels", "properties")(f.toLowerCase) =>
        raiseIt()
      case Ast.HasLabel(Ast.Variable(n), _) if deletedVars(n) => raiseIt()
      case _ => ()
    }
    proj.foreach { pr =>
      pr.items.foreach(i => scan(i._1))
      pr.orderBy.foreach(si => scan(si.expr))
    }
    where.foreach(scan)
  }

  private def statsDf: DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      List(Row(nodesCreated, relsCreated, propsSet,
        nodesDeleted, relsDeleted)).asJava,
      StructType(Seq(
        StructField("nodes_created", LongType),
        StructField("relationships_created", LongType),
        StructField("properties_set", LongType),
        StructField("nodes_deleted", LongType),
        StructField("relationships_deleted", LongType))))
  }

  private val emptyProps: Column =
    map_from_arrays(array().cast(ArrayType(StringType)),
      array().cast(ArrayType(Values.variantType)))

  /** Evaluate a pattern prop map against a frame; null values dropped
    * (Cypher never stores null properties).
    */
  private def propsCol(c: Ctx, frame: Frame,
      props: List[(String, Ast.Expr)]): Column =
    if (props.isEmpty) emptyProps
    else if (props.forall(p => isPureLit(p._2))) {
      // all-literal prop map → ONE Catalyst Literal. A large CREATE (the
      // TCK movie graph is ~170 entities in one statement) otherwise
      // emits a map_from_arrays(struct...) tree per entity and the
      // generated code explodes past what Janino (and Spark's
      // CodeFormatter regex) can handle.
      val m = scala.collection.immutable.ListMap(props.flatMap {
        case (k, e) => Option(litRow(e, Values.MaxNest)).map(k -> _)
      }: _*)
      org.apache.spark.sql.GraftColumn.column(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          m, Values.propsType))
    } else map_filter(
      map_from_arrays(
        array(props.map { case (k, _) => lit(k) }: _*),
        array(props.map { case (_, e) => trExpr(c, frame, e) }: _*)),
      (_, v) => v.isNotNull)

  // ═══════════════════════════════ CREATE ══════════════════════════════════
  /** One pattern element scheduled for creation. */
  private case class PendingNode(name: String, pat: Ast.NodePat, slot: Int)
  private case class PendingEdge(name: String, rel: Ast.RelPat,
      srcVar: String, dstVar: String, slot: Int)

  /** Plan the unbound elements of CREATE/MERGE paths. */
  private def planPending(vars: Set[String], paths: List[Ast.PathPat]):
      (List[PendingNode], List[PendingEdge]) = {
    val newNodes = scala.collection.mutable.ArrayBuffer[PendingNode]()
    val newEdges = scala.collection.mutable.ArrayBuffer[PendingEdge]()
    var bound = vars
    paths.foreach { p =>
      def visit(np: Ast.NodePat): String = {
        val name = nameOf(np)
        if (!bound.contains(name)) {
          newNodes += PendingNode(name, np, newNodes.size)
          bound += name
        }
        name
      }
      var prev = visit(p.head)
      p.tail.foreach { case (rel, node) =>
        if (rel.varLen.isDefined)
          throw TranslateError("cannot create a var-length edge")
        if (rel.types.size != 1)
          throw TranslateError("created edge needs exactly one relationship type")
        if (rel.direction == 0)
          throw TranslateError(
            "Only directed relationships are supported in CREATE")
        val cur = visit(node)
        val (s, d) = if (rel.direction == -1) (cur, prev) else (prev, cur)
        newEdges += PendingEdge(nameOf(rel), rel, s, d, newEdges.size)
        prev = cur
      }
    }
    (newNodes.toList, newEdges.toList)
  }

  /** CREATE (`op_create.c` + `shared/create_functions.c`): per input row,
    * materialize the pattern's unbound elements with row-unique ids
    * (base + rowTag*K + slot — distributed id assignment, no driver loop),
    * append to the graph, and extend the frame with the new bindings.
    */
  private def execCreate(frame0: Frame, paths: List[Ast.PathPat],
      params: Map[String, Any]): Frame = {
    val c = ctx(params)
    // a node-position variable bound to a runtime VALUE may hold a boxed
    // node (an entity pulled back out of a list/map — `nodeList[i]`):
    // unbox it to a node struct so it acts as a bound endpoint instead of
    // silently shadowing a fresh node. Non-entity runtime values unbox to
    // null and hit the null-endpoint error below.
    var frame = frame0
    paths.flatMap(p => (p.head :: p.tail.map(_._2)).flatMap(_.variable))
      .distinct
      .filter(v => frame0.vars.get(v).contains(KValue))
      .foreach { v =>
        val vc = frame.col(v)
        val unboxed = when(vc.isNull, lit(null).cast(nodeStructType))
          .when(Values.tag(vc) === Values.T_BOXED &&
            get_json_object(vc.getField("s"), "$.t") === Values.T_NODE,
            from_json(vc.getField("s"), nodeStructType))
          .otherwise(lit(null).cast(nodeStructType))
        frame = Frame(frame.df.withColumn(v, unboxed),
          frame.vars + (v -> (KNode: Kind)))
      }
    val (pn, pe) = planPending(
      frame.vars.filter(_._2 != KValue).keySet, paths)
    // a property expression may not read a PROPERTY of an entity created
    // by this same CREATE — its properties are not committed yet (the
    // reference errors with "undefined property", test_graph_create.py
    // test05). Only `x.prop` reads raise; other references to the
    // same-clause entity (id(x), the variable itself) are not the error
    // surface the reference tests.
    val pendingNames = (pn.map(_.name) ++ pe.map(_.name)).toSet
    def pendingPropReads(x: Any): Set[String] = x match {
      case Ast.Prop(Ast.Variable(v), _) if pendingNames(v) => Set(v)
      case p: Product => p.productIterator.flatMap(pendingPropReads).toSet
      case l: Iterable[_] => l.flatMap(pendingPropReads).toSet
      case _ => Set.empty
    }
    (pn.flatMap(_.pat.props) ++ pe.flatMap(_.rel.props)).foreach {
      case (_, e) =>
        val bad = pendingPropReads(e)
        if (bad.nonEmpty) throw TranslateError(
          s"undefined property: ${bad.head} is created by this clause")
    }
    // Literal fast path: a standalone CREATE (unit input row, no bound
    // vars) whose props are all literals — the TCK movie graph and "Many
    // CREATE clauses" shape (100s of fused clauses) — builds the new
    // entities DRIVER-SIDE as a LocalRelation. The general path would emit
    // one struct expression per entity into a single projection: at ~1000
    // entities that generated method exceeds Janino's 64KB limit, whole-
    // stage codegen falls back to interpreted eval, and the plan costs
    // minutes. The reference buffers creates driver-side for the same
    // reason (shared/create_functions.c). Data parallelism is irrelevant
    // here: the input is literally ONE row of constants.
    //
    // vars.isEmpty alone is NOT a unit-row proof: `MATCH () CREATE ()`
    // binds nothing yet carries one row PER MATCH (CREATE must create one
    // node per input row — TCK Create3 [2]). The plan must literally be
    // the translator's unit relation (Project over Range(0,1)).
    if (frame.vars.isEmpty && isUnitRelation(frame.df) &&
        pn.forall(_.pat.props.forall(p => isPureLit(p._2))) &&
        pe.forall(_.rel.props.forall(p => isPureLit(p._2))))
      return execCreateLiteral(pn, pe)
    val rid = "__create_rid"
    // materialize the tag: ids must be stable across re-evaluation
    val tagged = session.track(frame.df
      .withColumn(rid, monotonically_increasing_id())
      .localCheckpoint(true))
    val rows = tagged.count()
    session.profileRecord("Create", rows)

    // a relationship endpoint bound earlier in the query must resolve for
    // every record: creating from a null (an unmatched OPTIONAL MATCH
    // variable) is an error and NOTHING commits (reference commands.md:
    // "attempting to create a relation with a null endpoint will cause an
    // error … no changes to the graph are committed")
    val boundEntities = frame.vars.filter(_._2 != KValue).keySet
    val endpointVars = pe.flatMap(e => Seq(e.srcVar, e.dstVar))
      .distinct.filter(boundEntities)
    if (endpointVars.nonEmpty && tagged
        .filter(endpointVars.map(v => col(v).isNull).reduce(_ || _))
        .limit(1).count() > 0)
      throw TranslateError(
        "cannot create a relationship with a null endpoint")

    val nodeBase = session.nodeIdBase
    val edgeBase = session.edgeIdBase
    if (stmtNodeBase == Long.MaxValue) stmtNodeBase = nodeBase
    if (stmtEdgeBase == Long.MaxValue) stmtEdgeBase = edgeBase
    def nodeId(slot: Int): Column =
      lit(nodeBase) + col(rid) * pn.size + slot
    def edgeId(slot: Int): Column =
      lit(edgeBase) + col(rid) * pe.size + slot

    var df = tagged
    var vars = frame.vars
    // bind new node structs first (edges reference them); ONE select per
    // phase — chained withColumn re-analyzes the whole plan per entity,
    // which is O(entities²) on the TCK movie-graph-sized CREATE
    if (pn.nonEmpty) {
      val nodeFrame = Frame(df, vars)
      df = df.select(df.columns.map(df(_)) ++ pn.map(n => struct(
        nodeId(n.slot).as("id"),
        lit(n.pat.label.orNull).cast(StringType).as("label"),
        propsCol(c, nodeFrame, n.pat.props).as("props")).as(n.name)): _*)
      vars ++= pn.map(_.name -> (KNode: Kind))
    }
    if (pe.nonEmpty) {
      val edgeFrame = Frame(df, vars)
      df = df.select(df.columns.map(df(_)) ++ pe.map(e => struct(
        edgeId(e.slot).as("id"),
        df(e.srcVar).getField("id").as("src"),
        df(e.dstVar).getField("id").as("dst"),
        lit(e.rel.types.head).as("reltype"),
        propsCol(c, edgeFrame, e.rel.props).as("props")).as(e.name)): _*)
      vars ++= pe.map(_.name -> (KEdge: Kind))
    }

    // one explode over an array of the new structs, not an entity-count-
    // wide union (a 170-way unionByName is a 170-branch plan)
    val newNodeDf =
      if (pn.isEmpty) None
      else Some(df.select(explode(
          array(pn.map(n => df(n.name)): _*)).as("__new"))
        .select(col("__new.id").as("id"), col("__new.label").as("label"),
          col("__new.props").as("props")))
    val newEdgeDf =
      if (pe.isEmpty) None
      else Some(df.select(explode(
          array(pe.map(e => df(e.name)): _*)).as("__new"))
        .select(col("__new.id").as("id"), col("__new.src").as("src"),
          col("__new.dst").as("dst"), col("__new.reltype").as("reltype"),
          col("__new.props").as("props")))

    nodesCreated += rows * pn.size
    relsCreated += rows * pe.size
    // properties_set counts STORED values only: a prop expression that
    // evaluates to null per row stores nothing (propsCol map_filters it)
    // and must not count (test_graph_create.py test04). All-literal
    // patterns count statically; expression props read the materialized
    // map sizes (the frame is already checkpointed — this scans only the
    // created structs, not the upstream plan).
    val allLitProps = (pn.flatMap(_.pat.props) ++ pe.flatMap(_.rel.props))
      .forall(p => isPureLit(p._2))
    if (allLitProps || rows == 0L)
      propsSet += rows * patternPropCount(pn, pe)
    else {
      val sizes = (pn.map(n => df(n.name)) ++ pe.map(e => df(e.name)))
        .map(en => coalesce(sum(size(en.getField("props"))), lit(0L)))
      propsSet += df.agg(sizes.reduce(_ + _).as("__np")).head.getLong(0)
    }
    session.commit(
      newNodeDf.map(n => session.graph.nodes.unionByName(n,
        allowMissingColumns = true)).getOrElse(session.graph.nodes),
      newEdgeDf.map(e => session.graph.edges.unionByName(e,
        allowMissingColumns = true)).getOrElse(session.graph.edges))
    Frame(session.track(df.drop(rid).localCheckpoint(true)), vars)
  }

  /** True iff the frame's plan is the translator's pristine unit input —
    * a projection straight over a single-element Range — i.e. CREATE is
    * the statement's first cardinality-carrying clause. Any preceding
    * MATCH/UNWIND/WITH produces a different plan shape (even when it
    * binds no variables) and must take the per-input-row general path.
    */
  private def isUnitRelation(df: DataFrame): Boolean =
    df.queryExecution.logical match {
      case org.apache.spark.sql.catalyst.plans.logical.Project(_,
          r: org.apache.spark.sql.catalyst.plans.logical.Range) =>
        r.numElements == BigInt(1)
      case _ => false
    }

  /** [[execCreate]]'s all-literal driver-side path: new entities become
    * `Row`s in a LocalRelation (no per-entity Catalyst expressions at all),
    * ids are `base + slot` (the rid term is 0 on the unit row).
    */
  private def execCreateLiteral(pn: List[PendingNode],
      pe: List[PendingEdge]): Frame = {
    import scala.jdk.CollectionConverters._
    session.profileRecord("Create", 1L) // literal path: ONE unit input row
    val nodeBase = session.nodeIdBase
    val edgeBase = session.edgeIdBase
    if (stmtNodeBase == Long.MaxValue) stmtNodeBase = nodeBase
    if (stmtEdgeBase == Long.MaxValue) stmtEdgeBase = edgeBase
    def propsMap(props: List[(String, Ast.Expr)]): Any =
      scala.collection.immutable.ListMap(props.flatMap {
        case (k, e) => Option(litRow(e, Values.MaxNest)).map(k -> _)
      }: _*)
    val idOf = pn.map(n => n.name -> (nodeBase + n.slot)).toMap
    val nodeRows = pn.map(n =>
      Row(nodeBase + n.slot, n.pat.label.orNull, propsMap(n.pat.props)))
    val edgeRows = pe.map(e =>
      Row(edgeBase + e.slot, idOf(e.srcVar), idOf(e.dstVar),
        e.rel.types.head, propsMap(e.rel.props)))
    val newNodes =
      if (pn.isEmpty) None
      else Some(spark.createDataFrame(nodeRows.asJava, nodeStructType))
    val newEdges =
      if (pe.isEmpty) None
      else Some(spark.createDataFrame(edgeRows.asJava, edgeStructType))
    nodesCreated += pn.size
    relsCreated += pe.size
    // exact: propsMap dropped null-valued literals
    propsSet += (nodeRows.map(_.get(2)) ++ edgeRows.map(_.get(4)))
      .map(_.asInstanceOf[scala.collection.immutable.ListMap[_, _]].size)
      .sum
    session.commit(
      newNodes.map(n => session.graph.nodes.unionByName(n,
        allowMissingColumns = true)).getOrElse(session.graph.nodes),
      newEdges.map(e => session.graph.edges.unionByName(e,
        allowMissingColumns = true)).getOrElse(session.graph.edges))
    // downstream frame: ONE local row with each created entity bound as a
    // struct column (same bindings the expression path produces); a
    // LocalRelation of literals is already re-evaluation-stable, so no
    // checkpoint is needed
    val frameSchema = StructType(
      pn.map(n => StructField(n.name, nodeStructType)) ++
        pe.map(e => StructField(e.name, edgeStructType)))
    val frameRow = Row.fromSeq(nodeRows ++ edgeRows)
    val df = spark.createDataFrame(List(frameRow).asJava, frameSchema)
    Frame(df,
      pn.map(_.name -> (KNode: Kind)).toMap ++
        pe.map(_.name -> (KEdge: Kind)))
  }

  // ════════════════════════════════ SET ════════════════════════════════════
  /** SET (`op_update.c` + `shared/update_functions.c`): build a distributed
    * (entity id, key, value) update set, reduce last-write-wins, merge into
    * the props map with a left join — the Delta `UPDATE`/`MERGE` shape.
    * `SET x.k = null` removes the property (reference semantics).
    */
  /** Scala constant → AST literal (param-map desugaring; lists are valid
    * property values — Translator.constToAst is the single ladder).
    */
  private def astOf(v: Any): Ast.Expr = Translator.constToAst(v)

  private def paramMap(params: Map[String, Any], p: String,
      ctx: String): Map[String, Any] =
    params.get(p) match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case Some(other) => throw TranslateError(
        s"$ctx $$$p needs a map parameter, got: $other")
      case None => throw TranslateError(s"missing parameter: $$$p")
    }

  private def execSet(frame: Frame, items0: List[Ast.SetItem],
      params: Map[String, Any]): Frame = {
    // `SET n += $props` / `SET n = $props` desugar now that the map is
    // known (reference wire map params, test_entity_update.py:110)
    val itemsAll = items0.flatMap {
      case Ast.SetItem(tgt, None,
          Ast.Fn("__merge_param", List(Ast.Param(p)), _)) =>
        paramMap(params, p, "SET +=").toList.map { case (k, v) =>
          Ast.SetItem(tgt, Some(k), astOf(v))
        }
      case Ast.SetItem(tgt, None, Ast.Param(p)) =>
        List(Ast.SetItem(tgt, None, Ast.MapLit(
          paramMap(params, p, "SET =").toList.map { case (k, v) =>
            k -> astOf(v)
          })))
      case it => List(it)
    }
    // every SET target must be a bound variable (TCK UndefinedVariable)
    itemsAll.foreach {
      case Ast.SetItem(Ast.Variable(n), _, _) if !frame.vars.contains(n) =>
        throw TranslateError(s"UndefinedVariable: $n is not defined")
      case _ => ()
    }
    val c = ctx(params)
    // label writes (SET n:L / REMOVE n:L): the label column is a
    // ':'-joined ORDERED label list. Each write appends a missing label /
    // drops a matching one; multiple writes per node fold in statement
    // order (SET n:A:B on an unlabeled node yields "A:B").
    val (labelItems, items) = itemsAll.partition(_.key.contains(Ast.LabelKey))
    if (labelItems.nonEmpty) {
      // a SET item may expand to several labels — the ':' parse keeps one
      // item per label, so statement position is the item index
      val writes = labelItems.zipWithIndex.map { case (it, idx) =>
        val n = it.target match {
          case Ast.Variable(v) => v
          case other => throw TranslateError(
            s"label SET target must be a variable: $other")
        }
        if (!frame.vars.get(n).contains(KNode)) throw TranslateError(
          s"label SET target must be a node: $n")
        it.value match {
          case Ast.LitString(l) => frame.df.select(
            frame.col(n).getField("id").as("__id"),
            lit(l).as("__l"), lit(false).as("__rm"), lit(idx).as("__o"))
          case Ast.Fn("__remove_label", List(Ast.LitString(l)), _) =>
            frame.df.select(frame.col(n).getField("id").as("__id"),
              lit(l).as("__l"), lit(true).as("__rm"), lit(idx).as("__o"))
          case other => throw TranslateError(
            s"SET label expects a literal label, got: $other")
        }
      }.reduce(_ unionByName _).filter(col("__id").isNotNull)
        .dropDuplicates("__id", "__l", "__rm", "__o")
      // one row per node: its writes ordered by statement position (struct
      // ordering sorts on the leading __o field)
      val perNode = writes.groupBy(col("__id"))
        .agg(array_sort(collect_list(struct(col("__o"), col("__l"),
          col("__rm")))).as("__ws"))
      val nodes2 = session.graph.nodes
        .join(perNode, col("id") === col("__id"), "left_outer")
        .withColumn("label", {
          val cur = when(col("label").isNull,
            array().cast(ArrayType(StringType)))
            .otherwise(split(col("label"), ":"))
          val folded = aggregate(col("__ws"), cur, (acc, w) =>
            when(w.getField("__rm"),
              filter(acc, x => x =!= w.getField("__l")))
              .otherwise(when(array_contains(acc, w.getField("__l")), acc)
                .otherwise(concat(acc, array(w.getField("__l"))))))
          when(col("__ws").isNull, col("label"))
            .when(size(folded) === 0, lit(null).cast(StringType))
            .otherwise(array_join(folded, ":"))
        })
        .drop("__id", "__ws")
      propsSet += writes.count()
      session.commit(nodes2, session.graph.edges)
    }
    // Property writes: per target variable, the items fold IN STATEMENT
    // ORDER into one map expression evaluated per matched row — the
    // reference applies pending updates sequentially
    // (update_functions.c), so `SET n.v3 = 3, n = {v: 1}, n += {v2: 2},
    // n.v4 = 4` loses v3 to the replacement (test_entity_update.py
    // test08), and replacement/per-key/merge items mix freely in one
    // clause. Shapes: `n.k = v` upserts one key (NULL removes it);
    // `n = {map}` / `n = $map` / `n = mapValue` / `n = entity` replaces
    // the whole bag; `n += {...}` desugared to per-key items upstream.
    items.foreach { it =>
      it.target match {
        case Ast.Variable(_) => ()
        case other => throw TranslateError(s"SET target must be a variable: $other")
      }
    }
    val targets = items.collect {
      case Ast.SetItem(Ast.Variable(n), _, _) => n
    }.distinct
    def itemsFor(n: String): List[Ast.SetItem] = items.filter {
      case Ast.SetItem(Ast.Variable(v), _, _) => v == n
      case _ => false
    }
    /** A whole-bag value as a props map: literal map, entity property
      * bag, or a FLAT typed map value (a struct of variant fields — a
      * nested map field has no variant form in the props encoding).
      */
    def asPropsMap(value: Ast.Expr): Column = value match {
      case ml: Ast.MapLit =>
        if (ml.entries.isEmpty) emptyProps
        else map(ml.entries.flatMap { case (k, v) =>
          Seq(lit(k), trExpr(c, frame, v))
        }: _*)
      case Ast.Variable(src)
          if frame.vars.get(src).exists(k => k == KNode || k == KEdge) =>
        coalesce(frame.col(src).getField("props"), emptyProps)
      case other =>
        val col0 = trExpr(c, frame, other)
        frame.df.select(col0).schema.head.dataType match {
          case st: StructType
              if st.fieldNames.forall(_ == Translator.EmptyMapMarker) ||
                st.fields.forall(f => f.name == Translator.EmptyMapMarker ||
                  f.dataType == Values.variantType) =>
            val fields = st.fieldNames
              .filterNot(_ == Translator.EmptyMapMarker)
            if (fields.isEmpty) emptyProps
            else map(fields.toSeq.flatMap(f =>
              Seq(lit(f), col0.getField(f))): _*)
          case _: MapType => col0
          case _ => throw TranslateError(
            s"SET <entity> = requires a map or entity, got: $value")
        }
    }
    // Per-row write EFFECT, composable across rows: (replace?, delta)
    // where delta's NULL-valued entries mark key REMOVALS. A row's items
    // fold left into one effect; rows then fold SEQUENTIALLY per entity
    // (the reference applies updates record by record), so
    // `UNWIND [{a:1},{b:2}] AS m MATCH (n) SET n += m` accumulates BOTH
    // keys and duplicate writes count once.
    case class Eff(rep: Column, delta: Column)
    def upsert(acc: Column, k: Column, v: Column): Column =
      map_concat(map_filter(acc, (kk, _) => kk =!= k), map(k, v))
    def overlay(acc: Column, m: Column): Column =
      map_concat(
        map_filter(acc, (kk, _) => !array_contains(map_keys(m), kk)), m)
    def applyItemEff(acc: Eff, it: Ast.SetItem): Eff = it match {
      case Ast.SetItem(_, Some(k), value) =>
        Eff(acc.rep, upsert(acc.delta, lit(k), trExpr(c, frame, value)))
      // `n += <map expr>`: merge — keys absent from the map keep their
      // values, NULL-valued entries remove theirs
      case Ast.SetItem(_, None, Ast.Fn("__merge_value", List(e), _)) =>
        Eff(acc.rep, overlay(acc.delta, asPropsMap(e)))
      // `n = <map expr>`: whole-bag replacement resets everything before
      case Ast.SetItem(_, None, value) =>
        Eff(lit(true),
          map_filter(asPropsMap(value), (_, vv) => vv.isNotNull))
    }
    def writesFor(kind: Kind): Option[DataFrame] = {
      // one order tag assigned on the frame BEFORE the per-target split,
      // so multi-target writes share one row order; the per-target leg
      // index tiebreaks two targets binding the same entity in one row
      // (item order within the clause). monotonically_increasing_id is
      // statement order for narrow pipelines (UNWIND → SET, the shape
      // the reference pins); past an exchange, match-row order is
      // engine-defined in both systems.
      val tagged = frame.df.withColumn("__ord", monotonically_increasing_id())
      val kindTargets =
        targets.filter(n => frame.vars.get(n).contains(kind))
      val ws = kindTargets.zipWithIndex.map { case (n, leg) =>
        val eff = itemsFor(n).foldLeft(
          Eff(lit(false), emptyProps))(applyItemEff)
        tagged.select(frame.col(n).getField("id").as("__id"),
            col("__ord"), lit(leg).as("__leg"),
            eff.rep.as("__rep"), eff.delta.cast(Values.propsType).as("__delta"))
          .filter(col("__id").isNotNull)
      }
      ws.reduceOption(_ unionByName _)
    }
    def applyProps(table: DataFrame, rs: DataFrame): DataFrame = {
      // INNER join: a write row whose entity no longer exists (deleted
      // earlier in this statement) sets nothing and counts nothing
      val withOrig = rs.join(
        table.select(col("id").as("__tid"), col("props").as("__torig")),
        col("__id") === col("__tid"))
      // Sequential per-entity fold in (__ord, __leg) order: state starts
      // at the stored map and each write row applies its effect to the
      // RUNNING state. properties_set counts each row's adds + removals
      // vs that running state — UNWIND range(1,10000) SET a.v = ctr
      // counts 10000 (test_timeout.py test03), a write that leaves the
      // current value intact sets nothing (test_entity_update.py
      // test03/test06), and duplicate writes (UNWIND [1,1]) count once.
      val orig = coalesce(col("__torig"), emptyProps)
      val accType = StructType(Seq(
        StructField("st", Values.propsType.asInstanceOf[MapType]),
        StructField("cnt", LongType)))
      def step(acc: Column, w: Column): Column = {
        val st = acc.getField("st")
        val delta = w.getField("__delta")
        val rep = w.getField("__rep")
        val ns = map_filter(
          when(rep, delta).otherwise(overlay(st, delta)),
          (_, vv) => vv.isNotNull)
        // counts derive from (st, delta) so the (large) new-state tree is
        // referenced exactly once — the optimizer walks this expression
        // per rule and the variant types make every duplicate expensive
        val adds = filter(map_entries(delta),
          e => e.getField("value").isNotNull &&
            !(element_at(st, e.getField("key")) <=> e.getField("value")))
        // removals: explicit null-valued delta keys present in the state,
        // plus (replace only) every state key absent from the delta
        val remMarkers = filter(map_entries(delta),
          e => e.getField("value").isNull &&
            element_at(st, e.getField("key")).isNotNull)
        // element_at(delta, k).isNull covers both "absent from the
        // replacement map" and "explicit null marker after a replace"
        val rems = when(rep,
          size(filter(map_keys(st),
            k => element_at(delta, k).isNull)))
          .otherwise(size(remMarkers))
        struct(ns.as("st"),
          (acc.getField("cnt") + size(adds) + rems).as("cnt"))
      }
      // array_sort with an explicit (__ord, __leg) comparator: sort_array
      // cannot order structs that carry a MAP field (the delta)
      def cmp(l: Column, r: Column): Column =
        when(l.getField("__ord") < r.getField("__ord"), -1)
          .when(l.getField("__ord") > r.getField("__ord"), 1)
          .when(l.getField("__leg") < r.getField("__leg"), -1)
          .when(l.getField("__leg") > r.getField("__leg"), 1)
          .otherwise(0)
      val perId = withOrig.groupBy("__id").agg(
          array_sort(collect_list(struct(
            col("__ord"), col("__leg"), col("__rep"), col("__delta"))),
            cmp).as("__ws"),
          first(orig).as("__orig"))
        .select(col("__id"),
          aggregate(col("__ws"),
            struct(col("__orig").cast(Values.propsType).as("st"),
              lit(0L).as("cnt")).cast(accType),
            step).as("__acc"))
        .select(col("__id"), col("__acc.st").as("__npw"),
          col("__acc.cnt").as("__cnt"))
      val nset = perId.agg(sum(col("__cnt"))).head()
      propsSet += (if (nset.isNullAt(0)) 0L else nset.getLong(0))
      val joined = table.join(
        perId.select(col("__id"), col("__npw").as("__np")),
        table("id") === col("__id"), "left_outer")
      joined.withColumn("props",
          when(col("__np").isNull, col("props")).otherwise(col("__np")))
        .drop("__id", "__np")
    }

    val nodeWrites = writesFor(KNode)
    val edgeWrites = writesFor(KEdge)
    val newNodes = nodeWrites.map(applyProps(session.graph.nodes, _))
      .getOrElse(session.graph.nodes)
    val newEdges = edgeWrites.map(applyProps(session.graph.edges, _))
      .getOrElse(session.graph.edges)
    session.commit(newNodes, newEdges)

    // rebind updated vars so a following RETURN sees the new props/label
    val touched = itemsAll.collect {
      case Ast.SetItem(Ast.Variable(n), _, _) => n
    }.toSet
    val labelTouched = labelItems.collect {
      case Ast.SetItem(Ast.Variable(n), _, _) => n
    }.toSet
    var df = frame.df
    touched.foreach { n =>
      val kind = frame.vars(n)
      val table = if (kind == KNode) session.graph.nodes else session.graph.edges
      val fresh = table.select(col("id").as("__fid"), col("props").as("__fp"),
        (if (kind == KNode) col("label") else lit(null).cast(StringType))
          .as("__fl"))
      df = df.join(fresh, df(n).getField("id") === col("__fid"), "left_outer")
        .withColumn(n,
          if (kind == KNode && labelTouched(n))
            col(n).withField("props", col("__fp"))
              .withField("label", col("__fl"))
          else col(n).withField("props", col("__fp")))
        .drop("__fid", "__fp", "__fl")
    }
    Frame(df, frame.vars)
  }

  // ═══════════════════════════════ DELETE ══════════════════════════════════
  /** Boxed-path JSON shape (only the ids matter for deletion). */
  private val pathIdsType = StructType(Seq(
    StructField("nodes", ArrayType(StructType(Seq(
      StructField("id", LongType))))),
    StructField("rels", ArrayType(StructType(Seq(
      StructField("id", LongType)))))))

  /** DELETE / DETACH DELETE (`op_delete.c`): edges first, then nodes, with
    * implicit deletion of edges touching deleted nodes — all anti-joins.
    * Targets may be arbitrary expressions evaluating to entities
    * (`DELETE friends[$i]`, `DELETE m.key`, `DELETE nodes(p)[0]` — the
    * reference evaluates operands in `op_delete.c` too); entities pulled
    * back out of lists/maps arrive as boxed tagged-JSON variants and
    * dispatch on their runtime tag.
    */
  private def execDelete(frame: Frame, d: Ast.Delete,
      params: Map[String, Any]): Frame = {
    val c = ctx(params)
    val nodeIdDfs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    val edgeIdDfs = scala.collection.mutable.ArrayBuffer[DataFrame]()
    def addVariant(vc: Column): Unit = {
      // runtime dispatch: boxed node / boxed edge / boxed path / null.
      // A non-null non-entity value raises like the reference
      // ("Delete type mismatch", test_graph_deletion.py test11); nulls
      // stay no-ops (test_null_handling test04 / TCK Delete5)
      val js = when(Values.tag(vc) === Values.T_BOXED, vc.getField("s"))
      val t = get_json_object(js, "$.t")
      val isEntity = Values.tag(vc) === Values.T_BOXED &&
        (t === Values.T_NODE.toString || t === Values.T_EDGE.toString ||
          (t.isNull && get_json_object(js, "$.nodes").isNotNull))
      nodeIdDfs += frame.df
        .select(when(vc.isNotNull && !isEntity,
          raise_error(lit("Delete type mismatch: expected a node or " +
            "relationship")).cast(LongType)).as("id"))
        .filter(col("id").isNotNull)
      nodeIdDfs += frame.df
        .select(js.as("js"), t.as("t"))
        .filter(col("t") === Values.T_NODE.toString)
        .select(get_json_object(col("js"), "$.id").cast(LongType).as("id"))
        .filter(col("id").isNotNull)
      edgeIdDfs += frame.df
        .select(js.as("js"), t.as("t"))
        .filter(col("t") === Values.T_EDGE.toString)
        .select(get_json_object(col("js"), "$.id").cast(LongType).as("id"))
        .filter(col("id").isNotNull)
      // boxed path: {"nodes":[…],"rels":[…]} (no "t" tag)
      val pathJs = frame.df
        .select(js.as("js"), t.as("t"))
        .filter(col("t").isNull &&
          get_json_object(col("js"), "$.nodes").isNotNull)
        .select(from_json(col("js"), pathIdsType).as("p"))
      nodeIdDfs += pathJs.select(explode(col("p.nodes")).as("x"))
        .select(col("x.id").as("id")).filter(col("id").isNotNull)
      edgeIdDfs += pathJs.select(explode(col("p.rels")).as("x"))
        .select(col("x.id").as("id")).filter(col("id").isNotNull)
    }
    def addExpr(e: Ast.Expr): Unit = {
      // static rejection of shapes that can NEVER yield an entity —
      // compile-time SyntaxError per openCypher (Delete1 [8], Delete2 [5],
      // Delete6 [2]); container lookups / function calls stay runtime-typed
      e match {
        case _: Ast.HasLabel => throw TranslateError(
          "InvalidDelete: DELETE cannot remove a label")
        case _: Ast.Bin | _: Ast.Not | _: Ast.Neg | _: Ast.IsNull |
          _: Ast.LitInt | _: Ast.LitFloat | _: Ast.LitString |
          _: Ast.LitBool | _: Ast.Quantifier | _: Ast.PatternPred =>
          throw TranslateError(
            s"InvalidArgumentType: DELETE target must be an entity: $e")
        case _ => ()
      }
      val vc = trExpr(c, frame, e)
      typeOf(frame, e, vc) match {
        case Some(st: StructType) if st.fieldNames.contains("nodes") =>
          nodeIdDfs += frame.df.select(explode(vc.getField("nodes")).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
          edgeIdDfs += frame.df.select(explode(vc.getField("rels")).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
        case Some(st: StructType) if st.fieldNames.contains("props") =>
          val dst = if (st.fieldNames.contains("reltype")) edgeIdDfs
            else nodeIdDfs
          dst += frame.df.select(vc.getField("id").as("id"))
            .filter(col("id").isNotNull)
        case Some(st: StructType) if Translator.isVariantStruct(st) =>
          addVariant(vc)
        case Some(ArrayType(et: StructType, _))
            if et.fieldNames.contains("props") =>
          // typed entity array (collect(n) temp): delete every element
          val dst = if (et.fieldNames.contains("reltype")) edgeIdDfs
            else nodeIdDfs
          dst += frame.df.select(explode(vc).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
        case _ =>
          throw TranslateError(s"DELETE target must be an entity: $e")
      }
    }
    d.exprs.foreach {
      case Ast.Variable(n) => frame.vars.get(n) match {
        // null entities (OPTIONAL MATCH misses) are no-ops, not deletions
        case Some(KNode) =>
          nodeIdDfs += frame.df.select(frame.col(n).getField("id").as("id"))
            .filter(col("id").isNotNull)
        case Some(KEdge) =>
          edgeIdDfs += frame.df.select(frame.col(n).getField("id").as("id"))
            .filter(col("id").isNotNull)
        case Some(KPath) =>
          // DELETE p deletes the path's nodes and relationships
          // (explode of a NULL path's arrays emits no rows — null-safe)
          val pc = frame.col(n)
          nodeIdDfs += frame.df.select(explode(pc.getField("nodes")).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
          edgeIdDfs += frame.df.select(explode(pc.getField("rels")).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
        case Some(KRelList) =>
          edgeIdDfs += frame.df
            .select(explode(frame.col(n)).as("x"))
            .select(col("x.id").as("id")).filter(col("id").isNotNull)
        case Some(KValue) =>
          // a KValue variable may carry a RAW entity/path struct (a
          // projected nodes(p)[0] / relationships(p)[0], test13) rather
          // than a variant — dispatch on the actual column type
          val vc = frame.col(n)
          frame.df.select(vc).schema.head.dataType match {
            case st: StructType if st.fieldNames.contains("nodes") =>
              nodeIdDfs += frame.df
                .select(explode(vc.getField("nodes")).as("x"))
                .select(col("x.id").as("id")).filter(col("id").isNotNull)
              edgeIdDfs += frame.df
                .select(explode(vc.getField("rels")).as("x"))
                .select(col("x.id").as("id")).filter(col("id").isNotNull)
            case st: StructType if st.fieldNames.contains("props") =>
              val dst = if (st.fieldNames.contains("reltype")) edgeIdDfs
                else nodeIdDfs
              dst += frame.df.select(vc.getField("id").as("id"))
                .filter(col("id").isNotNull)
            case _ => addVariant(vc)
          }
        case _ => throw TranslateError(s"DELETE target must be an entity: $n")
      }
      case other => addExpr(other)
    }
    // record bare-variable targets so later clauses reading their
    // properties/labels raise EntityNotFound (TCK Return2 [15]-[17])
    deletedVars ++= d.exprs.collect { case Ast.Variable(n)
      if frame.vars.get(n).exists(k => k == KNode || k == KEdge) => n }
    val nodes = session.graph.nodes
    val edges = session.graph.edges
    val edgeCount = edges.count()
    // netting created-then-deleted entities (TCK Delete4 [3] expects a
    // CREATE+DELETE of the same node to report NO side effects): ids at or
    // above the statement-start watermark were created by this statement
    val nodeWatermark = if (nodesCreated > 0) stmtNodeBase else Long.MaxValue
    val edgeWatermark = if (relsCreated > 0) stmtEdgeBase else Long.MaxValue

    var newEdges = edges
    edgeIdDfs.reduceOption(_ union _).foreach { ids =>
      val del = ids.distinct()
      newEdges = newEdges.join(del, Seq("id"), "left_anti")
    }
    var newNodes = nodes
    nodeIdDfs.reduceOption(_ union _).foreach { rawIds =>
      val ids = session.track(rawIds.distinct().localCheckpoint(true))
      val total = ids.count()
      val createdHere = if (nodeWatermark == Long.MaxValue) 0L
        else ids.filter(col("id") >= nodeWatermark).count()
      nodesCreated -= createdHere
      nodesDeleted += total - createdHere
      newNodes = newNodes.join(ids, Seq("id"), "left_anti")
      // implicit edge deletion for deleted endpoints
      newEdges = newEdges
        .join(ids.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(ids.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
    }
    val createdEdgesBefore = if (edgeWatermark == Long.MaxValue) 0L
      else edges.filter(col("id") >= edgeWatermark).count()
    session.commit(newNodes, newEdges)
    val createdEdgesAfter = if (edgeWatermark == Long.MaxValue) 0L
      else session.graph.edges.filter(col("id") >= edgeWatermark).count()
    val createdEdgesDel = createdEdgesBefore - createdEdgesAfter
    relsCreated -= createdEdgesDel
    relsDeleted +=
      (edgeCount - session.graph.edges.count()) - createdEdgesDel
    frame
  }

  // ═══════════════════════════════ MERGE ═══════════════════════════════════
  /** MERGE (`op_merge.c`, three-stream match/create dance): per input row,
    * match the whole pattern; rows with no match create the full unbound
    * portion — deduplicated on the evaluated pattern keys so identical
    * pending patterns create once (`op_merge_create.c` dedup). ON MATCH /
    * ON CREATE SET run on the respective branches.
    */
  private def execMerge(frame: Frame, m0: Ast.Merge,
      params: Map[String, Any]): Frame = {
    // an undirected edge in MERGE matches either direction but CREATES a
    // single outgoing edge (reference `ast_validations.c:706-707`; CREATE
    // proper still rejects undirected, `:815`) — the MATCH phase sees the
    // original pattern, the create phase a direction-normalized one
    val m = m0.copy(path = m0.path.copy(tail = m0.path.tail.map {
      case (rel, node) if rel.direction == 0 =>
        (rel.copy(direction = 1), node)
      case other => other
    }))
    // compile-time validations (ast_validations.c MERGE checks):
    // ON MATCH / ON CREATE may only reference pattern or prior variables,
    // and a bound variable cannot impose new label/prop predicates
    val declared = frame.vars.keySet ++
      (m0.path.head :: m0.path.tail.map(_._2)).flatMap(_.variable) ++
      m0.path.tail.flatMap(_._1.variable) ++ m0.path.pathVar
    def rootVar(e: Ast.Expr): Option[String] = e match {
      case Ast.Variable(v) => Some(v)
      case Ast.Prop(t, _) => rootVar(t)
      case _ => None
    }
    (m0.onMatch ++ m0.onCreate).foreach { si =>
      rootVar(si.target).foreach { v =>
        if (!declared.contains(v)) throw TranslateError(
          s"UndefinedVariable: $v not defined")
      }
    }
    (m0.path.head :: m0.path.tail.map(_._2)).foreach { np =>
      np.variable.foreach { v =>
        if (frame.vars.contains(v) &&
            (np.label.nonEmpty || np.props.nonEmpty))
          throw TranslateError(
            s"VariableAlreadyBound: MERGE cannot impose new predicates " +
              s"on bound variable $v")
      }
    }
    // merging on a NULL property value can never match NOR create a
    // property (Cypher stores no null properties) — reject like the
    // reference (TCK MergeReadOwnWrites)
    (m0.path.head.props ++ m0.path.tail.flatMap { case (r, n) =>
      r.props ++ n.props
    }).foreach {
      case (k, Ast.LitNull) => throw TranslateError(
        s"MERGE cannot use a null property value for '$k'")
      case _ => ()
    }
    val c = ctx(params)
    val rid = "__merge_rid"
    val tagged = session.track(frame.df
      .withColumn(rid, monotonically_increasing_id())
      .localCheckpoint(true))
    val seed = Frame(tagged, frame.vars)
    val (matched, _) = translatePath(c, seed, m0.path)
    val matchedRids = matched.df.select(matched.col(rid)).distinct()
    val misses = tagged.join(matchedRids, Seq(rid), "left_anti")

    val (pn, pe) = planPending(
      frame.vars.filter(_._2 != KValue).keySet, List(m.path))
    if (pn.isEmpty && pe.isEmpty)
      throw TranslateError("MERGE pattern is fully bound")

    // evaluated create-keys: bound endpoint ids + every pattern prop value
    val missFrame = Frame(misses, frame.vars)
    val boundEndpoints = pe.flatMap(e => List(e.srcVar, e.dstVar))
      .filter(frame.vars.contains).distinct
    // a null bound endpoint (unmatched OPTIONAL MATCH variable) can
    // neither match nor create — error like CREATE does (reference
    // tests/flow/test_null_handling.py test02; nothing commits)
    if (boundEndpoints.nonEmpty && tagged
        .filter(boundEndpoints.map(v => col(v).isNull).reduce(_ || _))
        .limit(1).count() > 0)
      throw TranslateError(
        "cannot merge a relationship with a null endpoint")
    val keyCols = scala.collection.mutable.LinkedHashMap[String, Column]()
    boundEndpoints.zipWithIndex.foreach { case (v, i) =>
      keyCols(s"__kb_$i") = missFrame.col(v).getField("id")
    }
    // undirected MERGE between two bound nodes: symmetric input rows
    // (x,y)/(y,x) must dedup to ONE created edge — canonicalize the
    // endpoint key pair (and hence the created edge's direction) to
    // (min id, max id); ordered keys would create an edge per ordering
    if (m0.path.tail.size == 1 && m0.path.tail.head._1.direction == 0 &&
        boundEndpoints.size == 2) {
      val a = missFrame.col(boundEndpoints(0)).getField("id")
      val b = missFrame.col(boundEndpoints(1)).getField("id")
      keyCols("__kb_0") = least(a, b)
      keyCols("__kb_1") = greatest(a, b)
    }
    pn.foreach { n =>
      n.pat.props.zipWithIndex.foreach { case ((_, e), i) =>
        keyCols(s"__kn_${n.slot}_$i") = trExpr(c, missFrame, e)
      }
    }
    pe.foreach { e =>
      e.rel.props.zipWithIndex.foreach { case ((_, ex), i) =>
        keyCols(s"__ke_${e.slot}_$i") = trExpr(c, missFrame, ex)
      }
    }

    val missKeyed = misses.select(
      (misses.columns.map(misses(_)) ++
        keyCols.map { case (n, col) => col.as(n) }).toSeq: _*)
    val distinctKeys = missKeyed.select(keyCols.keys.map(col).toSeq: _*)
      .distinct()
      .withColumn("__crid", monotonically_increasing_id())
      .localCheckpoint(true)
      .transform(session.track)
    val created = distinctKeys.count()

    // build created entities on the distinct key set
    val nodeBase = session.nodeIdBase
    val edgeBase = session.edgeIdBase
    if (stmtNodeBase == Long.MaxValue) stmtNodeBase = nodeBase
    if (stmtEdgeBase == Long.MaxValue) stmtEdgeBase = edgeBase
    var ck = distinctKeys
    val boundIdOf = boundEndpoints.zipWithIndex
      .map { case (v, i) => v -> col(s"__kb_$i") }.toMap
    pn.foreach { n =>
      val props =
        if (n.pat.props.isEmpty) emptyProps
        else map_filter(map_from_arrays(
          array(n.pat.props.map { case (k, _) => lit(k) }: _*),
          array(n.pat.props.zipWithIndex.map { case (_, i) =>
            col(s"__kn_${n.slot}_$i")
          }: _*)), (_, v) => v.isNotNull)
      ck = ck.withColumn(n.name, struct(
        (lit(nodeBase) + col("__crid") * pn.size + n.slot).as("id"),
        lit(n.pat.label.orNull).cast(StringType).as("label"),
        props.as("props")))
    }
    pe.foreach { e =>
      val props =
        if (e.rel.props.isEmpty) emptyProps
        else map_filter(map_from_arrays(
          array(e.rel.props.map { case (k, _) => lit(k) }: _*),
          array(e.rel.props.zipWithIndex.map { case (_, i) =>
            col(s"__ke_${e.slot}_$i")
          }: _*)), (_, v) => v.isNotNull)
      def endpoint(v: String): Column =
        if (frame.vars.contains(v)) boundIdOf(v)
        else ck(v).getField("id")
      ck = ck.withColumn(e.name, struct(
        (lit(edgeBase) + col("__crid") * pe.size + e.slot).as("id"),
        endpoint(e.srcVar).as("src"),
        endpoint(e.dstVar).as("dst"),
        lit(e.rel.types.head).as("reltype"),
        props.as("props")))
    }

    val newNodeDf = pn.map(n => ck.select(
      ck(n.name).getField("id").as("id"),
      ck(n.name).getField("label").as("label"),
      ck(n.name).getField("props").as("props"))).reduceOption(_ unionByName _)
    val newEdgeDf = pe.map(e => ck.select(
      ck(e.name).getField("id").as("id"),
      ck(e.name).getField("src").as("src"),
      ck(e.name).getField("dst").as("dst"),
      ck(e.name).getField("reltype").as("reltype"),
      ck(e.name).getField("props").as("props"))).reduceOption(_ unionByName _)
    nodesCreated += created * pn.size
    relsCreated += created * pe.size
    // stored-values-only counting, as in execCreate: null-evaluating
    // expression props are filtered out of the map and must not count
    val mcAllLit = (pn.flatMap(_.pat.props) ++ pe.flatMap(_.rel.props))
      .forall(p => isPureLit(p._2))
    if (mcAllLit || created == 0L)
      propsSet += created * patternPropCount(pn, pe)
    else {
      val sizes = (pn.map(n => ck(n.name)) ++ pe.map(e => ck(e.name)))
        .map(en => coalesce(sum(size(en.getField("props"))), lit(0L)))
      propsSet += ck.agg(sizes.reduce(_ + _).as("__np")).head.getLong(0)
    }
    session.commit(
      newNodeDf.map(n => session.graph.nodes.unionByName(n,
        allowMissingColumns = true)).getOrElse(session.graph.nodes),
      newEdgeDf.map(e => session.graph.edges.unionByName(e,
        allowMissingColumns = true)).getOrElse(session.graph.edges))

    // bind created entities back to miss rows via the key columns
    val patVars = (pn.map(_.name) ++ pe.map(_.name))
    var createdBind = missKeyed.join(ck, keyCols.keys.toSeq)
    // MERGE p = (...): the matched side bound the path in translatePath;
    // assemble the created side's path struct from the pattern sequence
    // (TCK Merge1 [13] / Merge5 [10])
    m0.path.pathVar.foreach { pv =>
      val nodeCols = (m.path.head :: m.path.tail.map(_._2))
        .map(np => createdBind(nameOf(np)))
      val relCols = m.path.tail.map { case (r, _) => createdBind(nameOf(r)) }
      val rels =
        if (relCols.isEmpty) array().cast(ArrayType(edgeStructType))
        else array(relCols: _*)
      createdBind = createdBind.withColumn(pv,
        struct(array(nodeCols: _*).as("nodes"), rels.as("rels")))
    }
    val newVars: Map[String, Kind] = frame.vars ++
      pn.map(_.name -> (KNode: Kind)) ++ pe.map(_.name -> (KEdge: Kind)) ++
      (m.path.head :: m.path.tail.map(_._2)).flatMap(_.variable)
        .map(_ -> (KNode: Kind)) ++
      m.path.tail.flatMap(_._1.variable).map(_ -> (KEdge: Kind)) ++
      m0.path.pathVar.map(_ -> (KPath: Kind))

    val outCols = (frame.vars.keys.toSeq ++ patVars ++
      (newVars.keySet -- frame.vars.keySet -- patVars).toSeq).distinct
        .filter(v => matched.df.columns.contains(v))
    val matchedOut = matched.df.select(outCols.map(matched.df(_)): _*)
    val createdOut = createdBind.select(outCols.map(createdBind(_)): _*)
    var result = Frame(session.track(matchedOut.unionByName(createdOut)
      .localCheckpoint(true)), newVars)

    if (m.onMatch.nonEmpty && !matched.df.isEmpty) {
      val mf = Frame(matched.df, newVars)
      execSet(mf, m.onMatch, params)
      result = refresh(result)
    }
    if (m.onCreate.nonEmpty && created > 0) {
      val cf = Frame(createdBind, newVars)
      execSet(cf, m.onCreate, params)
      result = refresh(result)
    }
    result
  }

  /** Re-join entity props (and node labels — ON CREATE/ON MATCH can SET
    * labels too) from the committed graph.
    */
  private def refresh(frame: Frame): Frame = {
    var df = frame.df
    frame.vars.foreach { case (n, kind) =>
      if (kind != KValue && df.columns.contains(n)) {
        val table =
          if (kind == KNode) session.graph.nodes else session.graph.edges
        val fresh = table.select(col("id").as("__fid"),
          col("props").as("__fp"),
          (if (kind == KNode) col("label")
           else lit(null).cast(StringType)).as("__fl"))
        df = df.join(fresh, df(n).getField("id") === col("__fid"), "left_outer")
          .withColumn(n,
            if (kind == KNode)
              col(n).withField("props", col("__fp"))
                .withField("label", col("__fl"))
            else col(n).withField("props", col("__fp")))
          .drop("__fid", "__fp", "__fl")
      }
    }
    Frame(df, frame.vars)
  }
}
