package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-graph command facade — the engine's analogue of the reference's
  * module command table (`/root/reference/src/module.c:132-172`):
  *
  * | Reference         | Here                         |
  * |-------------------|------------------------------|
  * | GRAPH.QUERY g q   | `query(g, q)`                |
  * | GRAPH.RO_QUERY    | `roQuery(g, q)`              |
  * | GRAPH.EXPLAIN     | `explain(g, q)`              |
  * | GRAPH.PROFILE     | `profile(g, q)`              |
  * | GRAPH.BULK        | `bulk(g, nodes, edges)`      |
  * | GRAPH.DELETE      | `delete(g)`                  |
  * | GRAPH.LIST        | `list`                       |
  * | GRAPH.SLOWLOG     | `slowlog`                    |
  * | GRAPH.CONFIG      | `configGet` / `configSet`    |
  *
  * Graphs are created on first reference (as in the reference, where
  * GRAPH.QUERY against a missing key creates the graph). Each graph is a
  * [[CypherSession]]; at scale its node/edge tables live as Parquet/Delta
  * and `bulk` points the session at them without copying.
  */
class Graft(val spark: SparkSession) {

  private val graphs =
    scala.collection.concurrent.TrieMap[String, CypherSession]()

  /** SLOW_LOG_SIZE (`slow_log.h:9`). */
  private val SlowLogSize = 10

  // keyed by (graph, query): MAX observed latency — the reference dedupes
  // identical queries keeping the worst run, holds the SLOW_LOG_SIZE
  // slowest, and a new query evicts the fastest entry only when slower
  // (`slow_log.c` SlowLog_Add's min-heap)
  private val log =
    scala.collection.mutable.LinkedHashMap[(String, String), Double]()

  private def slowlogAdd(graph: String, q: String, sec: Double): Unit =
    log.synchronized {
      log.get((graph, q)) match {
        case Some(prev) => if (sec > prev) log((graph, q)) = sec
        case None if log.size < SlowLogSize => log((graph, q)) = sec
        case None =>
          val (mink, minv) = log.minBy(_._2)
          if (minv < sec) { log.remove(mink); log((graph, q)) = sec }
      }
    }

  private def session(graph: String): CypherSession =
    graphs.getOrElseUpdate(graph, new CypherSession(spark))

  /** The named graph's session, for per-graph options
    * (e.g. [[CypherSession.edgeUniquenessScope]]).
    */
  def sessionFor(graph: String): CypherSession = session(graph)

  /** GRAPH.CONFIG — the reference's runtime-settable options
    * (`src/configuration/config.c:20-47`, `RUNTIME_CONFIGS` in `config.h`).
    * `RESULTSET_SIZE` caps read-query result frames (−1 ≡ unlimited,
    * `RESULTSET_SIZE_UNLIMITED`); `TIMEOUT` (ms, 0 ≡ none) cancels eager
    * executions (mutations, PROFILE) via Spark job-group cancellation —
    * the Spark analogue of the reference's cron-armed query timeout
    * (`cmd_query.c:97-118`). Read-only fields report session facts.
    */
  private val conf = scala.collection.concurrent.TrieMap[String, Long](
    "RESULTSET_SIZE" -> -1L,
    "TIMEOUT" -> 0L,
    // the reference default UINT32_MAX ≡ unbounded queue
    // (test_pending_queries_limit.py test01 pins the value)
    "MAX_QUEUED_QUERIES" -> 4294967295L,
    "QUERY_MEM_CAPACITY" -> 0L)

  /** Every GET-able field, in the reference's enum order
    * (`config.h:17-30`; names `config.c:20-47`). Only the four fields in
    * `conf` are runtime-settable (RUNTIME_CONFIGS, `config.h:36-43`);
    * the rest report fixed session facts.
    */
  private val ConfigFields: Seq[String] = Seq("TIMEOUT", "CACHE_SIZE",
    "ASYNC_DELETE", "OMP_THREAD_COUNT", "THREAD_COUNT", "RESULTSET_SIZE",
    "MAINTAIN_TRANSPOSED_MATRICES", "VKEY_MAX_ENTITY_COUNT",
    "MAX_QUEUED_QUERIES", "QUERY_MEM_CAPACITY")

  def configGet(key: String): Long = key.toUpperCase match {
    case "THREAD_COUNT" | "OMP_THREAD_COUNT" =>
      spark.sparkContext.defaultParallelism.toLong
    case "CACHE_SIZE" => 256L // AST LRU capacity, CypherSession.astCache
    case "ASYNC_DELETE" => 0L // GRAPH.DELETE is a synchronous map removal
    // the reversed adjacency is always maintained (edges_rev stored
    // table / dst-keyed expand views — the transpose-matrix analogue)
    case "MAINTAIN_TRANSPOSED_MATRICES" => 1L
    // virtual-key chunking doesn't exist here (parquet tables, not RDB
    // payload slices); report the reference default shape
    case "VKEY_MAX_ENTITY_COUNT" => 100000L
    case k => conf.getOrElse(k, throw new IllegalArgumentException(
      s"Unknown configuration field: $key"))
  }

  /** GRAPH.CONFIG GET * — every field, enum order (`cmd_config.c:11-29`). */
  def configGetAll: Seq[(String, Long)] = ConfigFields.map(f => f -> configGet(f))

  def configSet(key: String, value: Long): Unit = configSet(Seq(key -> value))

  /** Multi-field SET with the reference's ATOMIC semantics
    * (`cmd_config.c:75-110`): every field is validated in a dry-run pass
    * first — one unknown / non-runtime / invalid entry fails the whole
    * command and nothing is modified.
    */
  def configSet(pairs: Seq[(String, Long)]): Unit = {
    pairs.foreach { case (key, value) =>
      val k = key.toUpperCase
      if (!ConfigFields.contains(k)) throw new IllegalArgumentException(
        s"Unknown configuration field: $key")
      if (!conf.contains(k)) throw new IllegalArgumentException(
        "Field can not be re-configured")
      // positive-integer fields (_Config_ParsePositiveInteger); a
      // negative RESULTSET_SIZE means unlimited and is accepted
      if (k != "RESULTSET_SIZE" && value < 0)
        throw new IllegalArgumentException("Failed to set config value")
    }
    pairs.foreach { case (k, v) => conf(k.toUpperCase) = v }
  }

  /** GRAPH.CONFIG wire dispatch (`cmd_config.c:124-153`): GET <name|*> /
    * SET <name value>... — unknown subcommands raise the reference's
    * message.
    */
  def config(subcommand: String, args: String*): Seq[(String, Long)] =
    subcommand.toUpperCase match {
      case "GET" =>
        require(args.length == 1, "GRAPH.CONFIG GET takes one field")
        if (args.head == "*") configGetAll
        else Seq(args.head -> configGet(args.head))
      case "SET" =>
        require(args.length % 2 == 0 && args.nonEmpty,
          "GRAPH.CONFIG SET takes field/value pairs")
        configSet(args.grouped(2).map { case Seq(k, v) =>
          k -> (try v.toLong catch { case _: NumberFormatException =>
            throw new IllegalArgumentException("Failed to set config value")
          })
        }.toSeq)
        Nil
      case _ => throw new IllegalArgumentException(
        "Unknown subcommand for GRAPH.CONFIG")
    }

  /** Run `f` under a job group guarded by the runtime limits: a timer
    * cancels after TIMEOUT ms, and a listener cancels once the group's
    * tasks have consumed more than QUERY_MEM_CAPACITY bytes (per-task
    * peak execution memory + spill + result bytes — the Spark analogue of
    * the reference's per-query allocator accounting, `rmalloc.c:50`).
    * No-op wrapper when neither limit is set.
    */
  private def withTimeout[A](f: => A): A = {
    val ms = conf("TIMEOUT")
    val cap = conf("QUERY_MEM_CAPACITY")
    if (ms <= 0 && cap <= 0) return f
    val group = s"graft-guard-${System.nanoTime()}"
    val sc = spark.sparkContext
    sc.setJobGroup(group, "graft query under runtime limits", true)
    val timer = new java.util.Timer(true)
    // written by the Timer thread, read by the query thread — needs the
    // happens-before edge (a stale read would surface a timed-out query
    // as a raw SparkException instead of the reference-shaped error)
    val timedOut = new java.util.concurrent.atomic.AtomicBoolean(false)
    if (ms > 0) {
      // cancelJobGroup only reaches jobs ALREADY submitted — a query still
      // translating/compiling when the deadline fires would start its job
      // afterwards and run to completion. Re-cancel periodically until the
      // query returns, so a late-starting job still dies (the reference's
      // cron-armed timeout keeps firing the same way, cmd_query.c:97-118).
      // Fixed-DELAY at 150ms: fixed-rate would burst missed ticks and a
      // 20ms period floods the DAGScheduler event loop for the whole
      // overdue remainder; the late-submit race window stays bounded.
      timer.schedule(new java.util.TimerTask {
        def run(): Unit = { timedOut.set(true); sc.cancelJobGroup(group) }
      }, ms, 150L)
    }
    val memTripped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val used = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = if (cap <= 0) None else {
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (Option(js.properties).exists(
              _.getProperty("spark.jobGroup.id") == group))
            js.stageIds.foreach(sid => stages.add(sid))
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (stages.contains(te.stageId) && te.taskMetrics != null) {
            val m = te.taskMetrics
            val b = m.peakExecutionMemory + m.memoryBytesSpilled +
              m.resultSize
            if (used.addAndGet(b) > cap &&
              memTripped.compareAndSet(false, true))
              sc.cancelJobGroup(group)
          }
      }
      sc.addSparkListener(l)
      Some(l)
    }
    try f
    catch {
      case _: org.apache.spark.SparkException if memTripped.get() =>
        throw Translator.TranslateError(
          "Query's mem consumption exceeded capacity " +
            s"(${used.get()} > $cap bytes)")
      case e: org.apache.spark.SparkException if ms > 0 && timedOut.get() =>
        throw Translator.TranslateError(
          s"Query timed out after ${ms}ms: ${e.getMessage.take(120)}")
    } finally {
      timer.cancel()
      listener.foreach(sc.removeSparkListener)
      sc.clearJobGroup()
    }
  }

  /** GRAPH.QUERY — run a Cypher statement (reads and writes). */
  /** Queries currently inside [[query]] — the first THREAD_COUNT of them
    * hold "executor" slots, the rest are the pending queue the reference
    * bounds with MAX_QUEUED_QUERIES (`cmd_dispatcher.c` rejects with this
    * exact message when the thread pool's queue is full).
    *
    * APPROXIMATION: read queries return lazy frames, so a slot is held
    * through translation only — the bound applies to concurrently
    * *dispatching* queries, not executing+queued work like the
    * reference's thread-pool queue (a caller that defers collect() can
    * under-trip the limit). Mutations execute eagerly inside the slot,
    * so the write path matches the reference's accounting exactly.
    */
  private val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)

  def query(graph: String, cypher: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val cur = inFlight.incrementAndGet()
    try {
      val limit = conf("MAX_QUEUED_QUERIES")
      val queued = cur - spark.sparkContext.defaultParallelism
      if (queued > limit)
        throw new IllegalStateException("Max pending queries exceeded")
      val t0 = System.nanoTime()
      val s = session(graph)
      val isMut = Graft.isMutation(parse(s, cypher)) // one cached parse
      val out = withTimeout(s.run(cypher, params))
      slowlogAdd(graph, cypher, (System.nanoTime() - t0) / 1e9)
      val cap = conf("RESULTSET_SIZE")
      if (cap >= 0 && !isMut)
        out.limit(math.min(cap, Int.MaxValue.toLong).toInt)
      else out
    } finally inFlight.decrementAndGet()
  }

  /** Current schema version of `graph` — the value a client caches and
    * passes back as GRAPH.QUERY's `version` argument. Moves only on
    * schema ADDITIONS (new label / relationship type / attribute key),
    * not on plain writes (`graphcontext.c:202-219`,
    * `tests/flow/test_graph_versioning.py`).
    */
  def graphVersion(graph: String): Long = session(graph).schemaVersion

  /** GRAPH.QUERY with the client's cached `version` (wire arg
    * `version N`, `cmd_dispatcher.c:44-92`): a stale version rejects
    * BEFORE executing, replying "version mismatch" + the current version
    * so the client can refresh its schema cache.
    */
  def query(graph: String, cypher: String, params: Map[String, Any],
      version: Long): DataFrame = {
    if (version < 0)
      throw new IllegalArgumentException(
        "Failed to parse graph version value")
    val cur = session(graph).schemaVersion
    if (version != cur) throw Graft.VersionMismatch(cur)
    query(graph, cypher, params)
  }

  /** GRAPH.RO_QUERY — rejects mutating statements
    * (`src/commands/cmd_query.c` read-only path).
    */
  def roQuery(graph: String, cypher: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    if (Graft.isMutation(parse(session(graph), cypher)))
      throw Translator.TranslateError("graph.RO_QUERY cannot mutate")
    query(graph, cypher, params)
  }

  /** Parse through the session's AST LRU cache (run() re-uses the entry, so
    * the mutation check costs no extra parse).
    */
  private def parse(s: CypherSession, cypher: String): Ast.Query =
    s.parse(CypherParser.splitParams(cypher)._2)

  /** GRAPH.EXPLAIN — compile only, never execute
    * (`src/commands/cmd_explain.c` prints the op tree without running it).
    * Read queries show the Catalyst plan the translator produced; mutating
    * queries render the compile-time operator tree from the AST — the
    * mutation runner (which commits eagerly) is never invoked.
    */
  def explain(graph: String, cypher: String): String = {
    val s = session(graph)
    val ast = parse(s, cypher)
    if (Graft.isMutation(ast)) Graft.mutationPlan(ast)
    else s.run(cypher).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** GRAPH.EXPLAIN, reference wire shape: the operator tree rendered with
    * the reference's op names and indentation (`cmd_explain.c` /
    * `execution_plan_debug.c`) so flow-test plan assertions
    * (`tests/flow/test_optimizations_plan.py`) port verbatim. Mirrors the
    * translator's real decisions (statistics-driven anchor reversal, id
    * seeks, bound-variable chaining); [[explain]] stays the Spark-native
    * deep form (the physical Catalyst plan that actually executes).
    */
  def explainOps(graph: String, cypher: String): String = {
    val s = session(graph)
    // mutations included: PlanRender compiles the op tree (op_merge.h's
    // three-stream Merge, Create/Update/Delete over their match pipeline)
    // without executing anything
    PlanRender.render(s, parse(s, cypher))
  }

  /** GRAPH.PROFILE — EXECUTES the query (reference parity:
    * `execution_plan.c:435-463` wraps ops with timers and runs the plan,
    * mutations included) and returns the physical operator tree annotated
    * with per-op runtime metrics, in the reference's
    * `Op | Records produced: n, Execution time: t ms` shape. AQE is
    * disabled for the profiled run so the executed tree is the final one
    * and its SQLMetrics are directly readable.
    */
  def profile(graph: String, cypher: String): String = {
    val s = session(graph)
    val ast = parse(s, cypher)
    val rendered = PlanRender.render(s, ast)
    val t0 = System.nanoTime()
    if (Graft.isMutation(ast)) {
      // execute under the write lock as usual; write ops record their
      // input-row counts into the session's profile sink
      val sink = scala.collection.concurrent.TrieMap[String, Long]()
      s.profileSink = Some(sink)
      try withTimeout(s.run(cypher))
      finally s.profileSink = None
      Graft.annotateWriteProfile(rendered, sink.toMap,
        (System.nanoTime() - t0) / 1e6)
    } else {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key, "true")
      spark.conf.set(key, "false")
      try {
        val df = query(graph, cypher)
        // the eager (profiled) execution runs under TIMEOUT too — query()
        // only covers plan construction for reads. Execute THIS
        // QueryExecution's physical plan directly (a df.write would build
        // a separate execution whose metrics the plan below never sees).
        val resultRows = withTimeout(df.queryExecution.toRdd.count())
        Graft.annotateReadProfile(rendered,
          df.queryExecution.executedPlan, (System.nanoTime() - t0) / 1e6,
          resultRows)
      } finally spark.conf.set(key, prev)
    }
  }

  /** GRAPH.BULK — install externally built node/edge tables (schema:
    * nodes(id,label,props), edges(id,src,dst,reltype,props); see
    * `docs/bulk_spec.md`). No copy — the DataFrames become the graph.
    */
  def bulk(graph: String, nodes: DataFrame, edges: DataFrame): Unit =
    session(graph).setGraph(PropertyGraph(nodes, edges))

  def bulk(graph: String, g: PropertyGraph): Unit =
    session(graph).setGraph(g)

  /** Persist a graph's tables as bucketed parquet (the RDB-persistence
    * analogue, `src/serializers/encoder/v9` → [[graft.graph.GraphStore]]).
    */
  def save(graph: String, buckets: Int = 64): Unit = {
    val s = session(graph)
    graft.graph.GraphStore.save(s.graph, s"graft_$graph", buckets,
      s.propIndexList)
  }

  /** Restore a previously saved graph (co-bucketed expand joins at rest);
    * persisted index definitions are re-created on the session
    * (test_persistency.py test01: db.indexes() survives a reload).
    */
  def restore(graph: String): Unit = {
    val s = session(graph)
    s.setGraph(graft.graph.GraphStore.load(spark, s"graft_$graph"))
    graft.graph.GraphStore.loadIndexes(spark, s"graft_$graph")
      .foreach { case (l, p) => s.createIndex(l, p) }
  }

  /** GRAPH.DELETE. */
  def delete(graph: String): Unit = graphs.remove(graph)

  /** GRAPH.DELETE with the reply semantics racing deleters observe: true
    * for the ONE caller that removed the key, false for the rest
    * (test_concurrent_query.py test04 — exactly one "OK").
    */
  def deleteIfExists(graph: String): Boolean = graphs.remove(graph).isDefined

  /** GRAPH.LIST. */
  def list: Seq[String] = graphs.keys.toSeq.sorted

  /** GRAPH.SLOWLOG — (graph, query, seconds), slowest first. */
  def slowlog(n: Int = 10): Seq[(String, String, Double)] =
    log.synchronized {
      log.toSeq.map { case ((g, q), s) => (g, q, s) }.sortBy(-_._3).take(n)
    }

  /** GRAPH.SLOWLOG g RESET. */
  def slowlogReset(): Unit = log.synchronized(log.clear())
}

object Graft {

  /** Stale-client rejection of a versioned GRAPH.QUERY: carries the
    * current version exactly like the reference's 2-element reply
    * `["version mismatch" error, current]` (`cmd_dispatcher.c:88-92`).
    */
  final case class VersionMismatch(current: Long)
    extends RuntimeException("version mismatch")

  /** PROFILE annotation for READ statements: the reference-shaped op tree
    * (PlanRender) with per-op `Records produced` / `Execution time` taken
    * from the EXECUTED Catalyst plan's SQLMetrics
    * (`execution_plan.c:435-463` wraps ops with counters; here the
    * counters already exist — this maps them back onto the wire-shape op
    * names). Mapping is by op CATEGORY in tree order (rendered filters ↔
    * FilterExec counts, scans ↔ leaf scans, Unwind ↔ GenerateExec, joins/
    * traversals ↔ join execs, limits ↔ limit execs); a category whose
    * rendered-op and Catalyst-node counts disagree is left UNANNOTATED
    * rather than mislabeled (complex shapes — var-len traversals span
    * several joins). Results/Project/Sort/Distinct carry the top-of-plan
    * row count.
    */
  private[cypher] def annotateReadProfile(rendered: String,
      plan: org.apache.spark.sql.execution.SparkPlan,
      totalMs: Double, resultRows: Long): String = {
    import org.apache.spark.sql.execution._
    // pre-order (top-down) per-category (rows, timeMs) from the executed
    // plan, unwrapping codegen/input adapters and reused subtrees
    val buckets = scala.collection.mutable.Map[String,
      scala.collection.mutable.ArrayBuffer[(Long, Double)]]()
    def timeOf(p: SparkPlan): Double = p.metrics.collectFirst {
      case (k, m) if k.toLowerCase.contains("time") && m.value > 0 =>
        if (m.metricType == "nsTiming") m.value / 1e6 else m.value.toDouble
    }.getOrElse(0.0)
    val topRows: Option[Long] = Some(resultRows)
    def walk(p: SparkPlan): Unit = {
      val rows = p.metrics.get("numOutputRows").map(_.value)
      val cat = p match {
        case _: FilterExec => Some("filter")
        case _: GenerateExec => Some("unwind")
        case _ if p.nodeName.contains("Join") ||
          p.nodeName.contains("CartesianProduct") => Some("join")
        case _ if p.nodeName.contains("Limit") => Some("limit")
        case _ if p.nodeName.contains("Aggregate") => Some("agg")
        case _ if p.children.isEmpty => Some("scan")
        case _ => None
      }
      rows.foreach { r =>
        cat.foreach(c => buckets.getOrElseUpdate(c,
          scala.collection.mutable.ArrayBuffer()) += ((r, timeOf(p))))
      }
      p.children.foreach(walk)
      p match {
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => walk(a.executedPlan)
        case r: ReusedSubqueryExec => walk(r.child)
        case _ => ()
      }
    }
    walk(plan)
    val lines = rendered.linesIterator.toList
    def catOf(op: String): Option[String] = op match {
      case "Filter" => Some("filter")
      case "Unwind" => Some("unwind")
      case "Limit" | "Skip" => Some("limit")
      case "Aggregate" => Some("agg")
      case o if o.contains("Scan") || o.contains("Seek") => Some("scan")
      case o if o.contains("Traverse") || o.contains("Join") ||
        o.contains("Expand") || o.contains("Cartesian") ||
        o.contains("Apply") => Some("join")
      case _ => None
    }
    def opName(line: String): String = line.trim.split(" \\| ").head
    def depthOf(l: String): Int =
      (l.length - l.dropWhile(_ == ' ').length) / 4
    // Apply-family INNER subtrees (every child subtree after the first)
    // dissolve into the join's build side — their rendered ops have no
    // standalone Catalyst execution and must neither consume nor carry a
    // category count (the reference executes them per-record; a mapped
    // count here would mislabel the OUTER side's metrics).
    val innerApply = Array.fill(lines.length)(false)
    lines.zipWithIndex.foreach { case (l, i) =>
      if (opName(l).contains("Apply")) {
        val d = depthOf(l)
        var j = i + 1
        var childSeen = 0
        while (j < lines.length && depthOf(lines(j)) > d) {
          if (depthOf(lines(j)) == d + 1) childSeen += 1
          if (childSeen >= 2) innerApply(j) = true
          j += 1
        }
      }
    }
    val renderedCats = lines.zipWithIndex.map { case (l, i) =>
      if (innerApply(i)) None else catOf(opName(l))
    }
    // per-category mapping, in confidence order: (a) rendered count ==
    // catalyst count → positional; (b) agg with catalyst == 2× rendered →
    // partial/final pairs, take the FINAL (pre-order first of each pair);
    // (c) every catalyst candidate carries the SAME row count → the
    // ambiguity is harmless, annotate with that count; else omit.
    val usable: Map[String, IndexedSeq[(Long, Double)]] =
      buckets.toMap.flatMap { case (c, b) =>
        val n = renderedCats.count(_.contains(c))
        if (n == 0) None
        else if (n == b.size) Some(c -> b.toIndexedSeq)
        else if (c == "agg" && b.size == 2 * n)
          Some(c -> b.grouped(2).map(_.head).toIndexedSeq)
        else if (b.map(_._1).distinct.size == 1)
          Some(c -> IndexedSeq.fill(n)((b.head._1, b.map(_._2).max)))
        else None
      }
    val idx = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    lines.zip(renderedCats).map { case (line, cat) =>
      val note = cat.flatMap(c => usable.get(c).map { b =>
        val (r, t) = b(idx(c)); idx(c) += 1
        f"Records produced: $r, Execution time: $t%.3f ms"
      }).orElse {
        val op = opName(line)
        if (op == "Results" || op == "Project" || op == "Sort" ||
          op == "Distinct")
          topRows.map(r => f"Records produced: $r, " +
            f"Execution time: ${if (op == "Results") totalMs else 0.0}%.3f ms")
        else None
      }
      note.map(n => s"$line | $n").getOrElse(line)
    }.mkString("\n")
  }

  /** PROFILE annotation for WRITE statements: the write ops record their
    * input-row counts into the session's profile sink as they execute
    * (Create = rows of the materialized input frame — the records the op
    * processes AND passes through, `op_create.c` semantics); the op
    * DIRECTLY feeding a write op carries the same count (its output IS
    * the write's input). Ops with no recorded count stay unannotated.
    */
  private[cypher] def annotateWriteProfile(rendered: String,
      sink: Map[String, Long], totalMs: Double): String = {
    val lines = rendered.linesIterator.toList
    def depth(l: String): Int = (l.length - l.dropWhile(_ == ' ').length) / 4
    def opName(line: String): String = line.trim.split(" \\| ").head
    val out = lines.zipWithIndex.map { case (line, i) =>
      val op = opName(line)
      val fromSink = sink.get(op)
        // the direct producer below a recorded write op shares its count
        .orElse(if (i > 0 && sink.contains(opName(lines(i - 1))) &&
          depth(line) == depth(lines(i - 1)) + 1)
          sink.get(opName(lines(i - 1))) else None)
      val note = fromSink.map(r => f"Records produced: $r, " +
        f"Execution time: ${if (op == "Results") totalMs else 0.0}%.3f ms")
        .orElse(if (op == "Results")
          Some(f"Execution time: $totalMs%.3f ms") else None)
      note.map(n => s"$line | $n").getOrElse(line)
    }
    out.mkString("\n")
  }

  /** True iff any statement part contains a write clause. */
  def isMutation(ast: Ast.Query): Boolean =
    ast.parts.exists(_.clauses.exists {
      case _: Ast.Create | _: Ast.Merge | _: Ast.SetClause | _: Ast.Delete |
           _: Ast.CreateIndex | _: Ast.DropIndex =>
        true
      case _ => false
    })

  /** Compile-time operator tree for a mutating statement, rendered without
    * executing anything — op names follow the reference
    * (`src/execution_plan/ops/op.h:19-54`; tree shape as
    * `cmd_explain.c` prints it: root first, source ops indented below).
    */
  def mutationPlan(ast: Ast.Query): String = {
    def pat(p: Ast.PathPat): String = {
      val head = p.head.label.fold("()")(l => s"(:$l)")
      p.tail.map { case (r, n) =>
        val t = r.types.mkString("|")
        val star = r.varLen.fold("")(_ => "*")
        s"-[:$t$star]-${if (r.direction >= 0) ">" else ""}" +
          n.label.fold("()")(l => s"(:$l)")
      }.mkString(head, "", "")
    }
    def opOf(c: Ast.Clause): List[String] = c match {
      case m: Ast.Match =>
        val scan = m.paths.map(pat).mkString(", ")
        val filter = m.where.map(_ => List("Filter")).getOrElse(Nil)
        val traverse =
          if (m.optional) List(s"Optional", s"ConditionalTraverse [$scan]")
          else if (m.paths.exists(_.tail.nonEmpty))
            List(s"ConditionalTraverse [$scan]")
          else Nil
        filter ++ traverse :+ s"NodeByLabelScan | AllNodeScan [$scan]"
      case u: Ast.Unwind => List(s"Unwind [${u.alias}]")
      case _: Ast.With => List("Project")
      case c: Ast.Create => List(s"Create [${c.paths.map(pat).mkString(", ")}]")
      case m: Ast.Merge =>
        List(s"Merge [${pat(m.path)}]", "MergeCreate", "Argument")
      case _: Ast.SetClause => List("Update")
      case d: Ast.Delete => List(if (d.detach) "Delete [detach]" else "Delete")
      case i: Ast.CreateIndex =>
        List(s"Create Index [:${i.label}(${i.props.mkString(", ")})]")
      case i: Ast.DropIndex => List(s"Drop Index [:${i.label}(${i.prop})]")
      case p: Ast.CallProc => List(s"ProcedureCall [${p.name}]")
      case _: Ast.Return => List("Results", "Project")
    }
    val clauses = ast.parts.head.clauses
    val ops = clauses.reverse.flatMap(opOf)
    val withRoot = if (clauses.exists(_.isInstanceOf[Ast.Return])) ops
      else "Results" :: ops
    withRoot.zipWithIndex
      .map { case (op, i) => "    " * i + op }.mkString("\n")
  }
}
