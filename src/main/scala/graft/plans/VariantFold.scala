package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.BooleanType

/** Catalyst optimizer rules that dissolve the Cypher variant/property-map
  * layer into native column expressions.
  *
  * The property graph is exposed as *views* over typed relational tables:
  * `props` is a `CreateMap` with literal keys whose values are variant
  * structs built from native columns (GraphBuilder). The translator accesses
  * properties as `element_at(props, 'key')` and fields via `.getField` over
  * conditional variant constructors (`when(c.isNull, null).otherwise(
  * struct(...))`). Local rewrites make the whole stack constant-fold:
  *
  *   1. `ElementAt(CreateMap(literal keys), literal key)` → the matching
  *      value expression (or typed null when absent ≡ PROPERTY_NOTFOUND,
  *      reference `src/graph/entities/graph_entity.h:24,76`).
  *   2. `GetStructField(CaseWhen/If)` → pushed into the branches, where the
  *      built-in SimplifyExtractValueOps collapses
  *      `GetStructField(CreateNamedStruct)` to the underlying column.
  *   3. CASE fact propagation: inside a branch value its condition is known
  *      TRUE; in later branches a *null-free* earlier condition is known
  *      FALSE (a null condition also skips the branch, hence the null-free
  *      restriction). Known facts substitute matching subexpressions with
  *      literals — `isnull(x)` checks collapse branch by branch.
  *   4. Predicate context (Filter conditions, where NULL ≡ FALSE):
  *      `coalesce(c, false)` unwraps, null-literal boolean values become
  *      false, `CASE WHEN isnull(x) THEN false ELSE p END` becomes
  *      `isnotnull(x) AND p`, and the left conjunct of `AND` is assumed true
  *      on the right.
  *
  * Net effect: a Cypher filter like `o.totalprice > 300000` compiles to
  * `isnotnull(o_totalprice) AND 300000.0 < o_totalprice` — pruned, pushed
  * into the parquet scan, codegen'd — the Spark-native analogue of the
  * reference compiling property accesses to direct attribute lookups. Runs
  * inside the operator-optimization fixed-point batch (injected via
  * [[GraftExtensions]]), interleaving with constant folding, filter pushdown
  * and column pruning until fixed point.
  */
object VariantFoldRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val folded = plan.transformAllExpressions {
      case e: ElementAt => foldMapLookup(e).getOrElse(e)
      case GetStructField(cw: CaseWhen, ordinal, name) =>
        CaseWhen(
          cw.branches.map { case (c, v) =>
            (c, GetStructField(v, ordinal, name))
          },
          cw.elseValue.map(GetStructField(_, ordinal, name)))
      case GetStructField(If(p, t, f), ordinal, name) =>
        If(p, GetStructField(t, ordinal, name),
          GetStructField(f, ordinal, name))
      // inline the two SimplifyExtractValueOps/ConstantFolding cases this
      // rule's own rewrites expose, so a single top-down pass folds a whole
      // construct-then-extract chain (fewer whole-batch iterations)
      case g @ GetStructField(cns: CreateNamedStruct, ordinal, _) =>
        cns.valExprs(ordinal)
      case g @ GetStructField(Literal(null, _), _, _) =>
        Literal.create(null, g.dataType)
      // null-checks distribute over conditionals: the branches fold to
      // literals (isnull(null)=true, isnull(struct(...))=false via child
      // nullability), letting column pruning drop the variant struct that
      // the null-guard was the last whole-value reference to
      case IsNull(cw: CaseWhen) =>
        CaseWhen(cw.branches.map { case (c, v) => (c, IsNull(v)) },
          Some(IsNull(cw.elseValue.getOrElse(Literal.create(null,
            cw.dataType)))))
      case IsNotNull(cw: CaseWhen) =>
        CaseWhen(cw.branches.map { case (c, v) => (c, IsNotNull(v)) },
          Some(IsNotNull(cw.elseValue.getOrElse(Literal.create(null,
            cw.dataType)))))
      case IsNull(e) if !e.nullable => Literal.FalseLiteral
      case IsNotNull(e) if !e.nullable => Literal.TrueLiteral
      case IsNull(Literal(null, _)) => Literal.TrueLiteral
      case IsNotNull(Literal(null, _)) => Literal.FalseLiteral
      case cw: CaseWhen => cleanupCase(propagateFacts(cw))
    }
    folded.transform {
      case f @ Filter(cond, child) =>
        val simplified = predicate(cond)
        if (simplified.fastEquals(cond)) f else Filter(simplified, child)
    }
  }

  private def foldMapLookup(e: ElementAt): Option[Expression] =
    (stripNullFilter(e.left), e.right) match {
      case (CreateMap(kvs, _), key: Literal) =>
        val pairs = kvs.grouped(2).collect { case Seq(k, v) => (k, v) }.toSeq
        if (pairs.forall(_._1.isInstanceOf[Literal])) {
          Some(pairs
            .find { case (k, _) =>
              val kl = k.asInstanceOf[Literal]
              kl.dataType == key.dataType && kl.value == key.value
            }
            .map(_._2)
            .getOrElse(Literal.create(null, e.dataType)))
        } else None
      case _ => None
    }

  /** `map_filter(m, (k,v) -> isnotnull(v))` is an identity for LOOKUPS: a
    * key the filter removes had a null value, and a missing-key lookup is
    * null too (≡ PROPERTY_NOTFOUND). GraphStore's restored props views
    * wrap their lazy CreateMap this way so whole-map consumers see the
    * original key set; stripping the wrapper here lets per-key lookups
    * fold to the underlying storage column.
    */
  private def stripNullFilter(m: Expression): Expression = m match {
    case MapFilter(inner, LambdaFunction(IsNotNull(v), args, _))
        if args.lastOption.exists(v.semanticEquals) => inner
    case other => other
  }

  // ── runtime-fact engine (rewrite 3/4) ─────────────────────────────────────
  /** (expr, value): `expr` is known to evaluate to `value` in this scope. */
  private type Facts = Seq[(Expression, Boolean)]

  /** Close a fact over boolean/null-check structure. */
  private def expand(f: Expression, v: Boolean): Facts = f match {
    case Not(g) => expand(g, !v)
    case And(a, b) if v => ((f, v)) +: (expand(a, true) ++ expand(b, true))
    case Or(a, b) if !v => ((f, v)) +: (expand(a, false) ++ expand(b, false))
    case IsNull(x) => Seq((f, v), (IsNotNull(x), !v))
    case IsNotNull(x) => Seq((f, v), (IsNull(x), !v))
    case _ => Seq((f, v))
  }

  /** Boolean expressions that can never evaluate to NULL. */
  private def nullFree(e: Expression): Boolean = e match {
    case IsNull(_) | IsNotNull(_) => true
    case Literal(v, BooleanType) => v != null
    case And(a, b) => nullFree(a) && nullFree(b)
    case Or(a, b) => nullFree(a) && nullFree(b)
    case Not(a) => nullFree(a)
    // Catalyst nullability is an upper bound on null production: a
    // non-nullable expression (isnan, array_contains over non-null input,
    // …) never evaluates to NULL
    case _ => !e.nullable
  }

  private def subst(e: Expression, facts0: Facts): Expression = {
    val facts = facts0.filter(_._1.deterministic)
    if (facts.isEmpty) e
    else e.transformUp {
      case x if x.dataType == BooleanType =>
        facts.find(_._1.semanticEquals(x))
          .map(f => Literal(f._2)).getOrElse(x)
    }
  }

  /** Rewrite 3: substitute facts established by CASE evaluation order. */
  private def propagateFacts(cw: CaseWhen): CaseWhen = {
    var accFalse: Facts = Nil
    val newBranches = cw.branches.map { case (c, v) =>
      val c2 = subst(c, accFalse)
      val v2 = subst(v, accFalse ++ expand(c2, true))
      if (nullFree(c2)) accFalse = accFalse ++ expand(c2, false)
      (c2, v2)
    }
    CaseWhen(newBranches, cw.elseValue.map(subst(_, accFalse)))
  }

  /** Always-sound CASE cleanup (value context): drop false-condition
    * branches, truncate at the first true condition, and collapse the
    * null-guard identity `CASE WHEN isnull(x) THEN null ELSE x END → x`.
    */
  private def cleanupCase(cw: CaseWhen): Expression = {
    var bs = cw.branches.filterNot(_._1 == Literal.FalseLiteral)
    var els = cw.elseValue
    val i = bs.indexWhere(_._1 == Literal.TrueLiteral)
    if (i >= 0) { els = Some(bs(i)._2); bs = bs.take(i) }
    // a TRAILING branch whose value equals the else value is a no-op
    // whatever its condition evaluates to (true → same value; false or
    // null → falls through to else → same value)
    while (bs.nonEmpty && els.exists(e =>
        e.deterministic && e.semanticEquals(bs.last._2)))
      bs = bs.init
    (bs, els) match {
      case (Seq(), Some(e)) => e
      case (Seq(), None) => Literal.create(null, cw.dataType)
      case (Seq((IsNull(x), Literal(null, _))), Some(e))
          if e.semanticEquals(x) => e
      // boolean identity forms (null-free condition required: CASE skips a
      // null condition to ELSE, a bare boolean would yield null instead)
      case (Seq((c, Literal(true, BooleanType))),
          Some(Literal(false, BooleanType))) if nullFree(c) => c
      case (Seq((c, Literal(false, BooleanType))),
          Some(Literal(true, BooleanType))) if nullFree(c) => Not(c)
      case _ => CaseWhen(bs, els)
    }
  }

  /** Rewrite 4: boolean simplification valid only where NULL ≡ FALSE
    * (filter conditions and the conditions of conditionals within them).
    */
  private def predicate(e: Expression): Expression = e match {
    case Coalesce(Seq(c, Literal(false, BooleanType))) => predicate(c)
    case Literal(null, BooleanType) => Literal.FalseLiteral
    case And(l, r) =>
      val l2 = predicate(l)
      // left conjunct assumed true on the right: sound in predicate context
      // (if l is not TRUE the AND can never be TRUE regardless of r)
      And(l2, predicate(subst(r, expand(l2, true))))
    case Or(l, r) => Or(predicate(l), predicate(r))
    case Not(c) => Not(c) // NOT(null)=null≡false but NOT(false)=true — keep
    case If(p, t, f) => If(predicate(p), predicate(t), predicate(f))
    case cw: CaseWhen if cw.dataType == BooleanType =>
      var bs = cw.branches.map { case (c, v) => (predicate(c), predicate(v)) }
      var els = cw.elseValue.map(predicate).getOrElse(Literal.FalseLiteral)
      bs = bs.filterNot(_._1 == Literal.FalseLiteral)
      val i = bs.indexWhere(_._1 == Literal.TrueLiteral)
      if (i >= 0) { els = bs(i)._2; bs = bs.take(i) }
      // peel leading `WHEN <null-free cond> THEN false` into negated
      // conjuncts: CASE WHEN isnull(x) THEN false ELSE p ≡ isnotnull(x)
      // AND p; CASE WHEN isnan(x) THEN false ELSE p ≡ NOT isnan(x) AND p.
      // Splitting into an AND lets the pushable conjuncts reach the
      // parquet scan (the CASE as a whole never pushes).
      val conjuncts = scala.collection.mutable.ArrayBuffer[Expression]()
      while (bs.nonEmpty && bs.head._2 == Literal.FalseLiteral &&
          (notNullOperands(bs.head._1).nonEmpty || nullFree(bs.head._1))) {
        val ops = notNullOperands(bs.head._1)
        if (ops.nonEmpty) conjuncts ++= ops.map(IsNotNull(_))
        else conjuncts += Not(bs.head._1)
        bs = bs.tail
      }
      val core: Expression =
        if (bs.isEmpty) els else CaseWhen(bs, Some(els))
      if (conjuncts.isEmpty) core
      else And(conjuncts.reduce(And), predicate(subst(core,
        conjuncts.toSeq.flatMap(expand(_, true)))))
    case other => other
  }

  /** Operands known non-null when `cond` (a pure null-check tree) is false:
    * NOT(IsNull(e)) ⇒ e; NOT(a OR b) ⇒ both sides.
    */
  private def notNullOperands(cond: Expression): Seq[Expression] = cond match {
    case IsNull(e) => Seq(e)
    case Or(l, r) =>
      val ls = notNullOperands(l); val rs = notNullOperands(r)
      if (ls.nonEmpty && rs.nonEmpty) ls ++ rs else Nil
    case _ => Nil
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`): registers the engine's
  * Catalyst rules.
  */
object GraftExtensions {
  /** Idempotently register the engine's functions on an existing session
    * (fallback for sessions built without `withExtensions` — the optimizer
    * rules are a performance layer, but `graft_dot` is load-bearing for the
    * similarity operators).
    */
  def ensureFunctions(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val dotId =
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")
    if (!reg.functionExists(dotId)) {
      reg.registerFunction(dotId,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(exprs(0), exprs(1)))
    }
    val phId =
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash")
    if (!reg.functionExists(phId)) {
      reg.registerFunction(phId,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[PolyHash].getName, "graft_polyhash"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          PolyHash(exprs.head))
    }
    val shId = new org.apache.spark.sql.catalyst.FunctionIdentifier(
      "graft_shingle_hashes")
    if (!reg.functionExists(shId)) {
      reg.registerFunction(shId,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[ShingleHashes].getName, "graft_shingle_hashes"),
        shingleBuilder)
    }
    val fpId =
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fingerprint")
    if (!reg.functionExists(fpId)) {
      reg.registerFunction(fpId,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[Fingerprint].getName, "graft_fingerprint"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          Fingerprint(exprs.head))
    }
    val icId = new org.apache.spark.sql.catalyst.FunctionIdentifier(
      "graft_intersect_count")
    if (!reg.functionExists(icId)) {
      reg.registerFunction(icId,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[IntersectCount].getName, "graft_intersect_count"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          IntersectCount(exprs(0), exprs(1)))
    }
  }

  /** `graft_shingle_hashes(text, k)` — k must be an integer literal (it is
    * baked into the generated code).
    */
  private[plans] val shingleBuilder
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression = { exprs =>
    val k = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) =>
        v.toInt
      case other => throw new IllegalArgumentException(
        s"graft_shingle_hashes: k must be an integer literal, got $other")
    }
    ShingleHashes(exprs.head, k)
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // interleaves with constant folding / pushdown to fixed point
    ext.injectOptimizerRule(_ => VariantFoldRule)
    // cross-operator construct-then-extract elimination (same batch: its
    // pushed-down extractions fold via VariantFoldRule + constant folding)
    ext.injectOptimizerRule(_ => ExtractPushdownRule)
    // one-shot after operator optimization (its own internal fixed point)
    ext.injectPreCBORule(_ => ProjectCseRule)
    // native codegen'd expressions for the pipeline operators
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_polyhash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[PolyHash].getName, "graft_polyhash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        PolyHash(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "graft_shingle_hashes"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      GraftExtensions.shingleBuilder))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_fingerprint"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[Fingerprint].getName, "graft_fingerprint"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Fingerprint(exprs.head)))
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "graft_intersect_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[IntersectCount].getName, "graft_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntersectCount(exprs(0), exprs(1))))
  }
}
