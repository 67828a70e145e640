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

  private val log =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Double)]()

  private def session(graph: String): CypherSession =
    graphs.getOrElseUpdate(graph, new CypherSession(spark))

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
    "MAX_QUEUED_QUERIES" -> -1L,
    "QUERY_MEM_CAPACITY" -> 0L)

  def configGet(key: String): Long = key.toUpperCase match {
    case "THREAD_COUNT" | "OMP_THREAD_COUNT" =>
      spark.sparkContext.defaultParallelism.toLong
    case "CACHE_SIZE" => 256L // AST LRU capacity, CypherSession.astCache
    case k => conf.getOrElse(k, throw new IllegalArgumentException(
      s"Unknown configuration field: $key"))
  }

  def configSet(key: String, value: Long): Unit = {
    val k = key.toUpperCase
    if (!conf.contains(k)) throw new IllegalArgumentException(
      s"Field '$key' is not a runtime-settable configuration")
    conf(k) = value
  }

  /** Run `f` under a job group that a timer cancels after the configured
    * TIMEOUT; no-op wrapper when TIMEOUT=0.
    */
  private def withTimeout[A](f: => A): A = {
    val ms = conf("TIMEOUT")
    if (ms <= 0) f
    else {
      val group = s"graft-timeout-${System.nanoTime()}"
      val sc = spark.sparkContext
      sc.setJobGroup(group, "graft query under TIMEOUT", true)
      val timer = new java.util.Timer(true)
      timer.schedule(new java.util.TimerTask {
        def run(): Unit = sc.cancelJobGroup(group)
      }, ms)
      try f
      catch {
        case e: org.apache.spark.SparkException =>
          throw Translator.TranslateError(
            s"Query timed out after ${ms}ms: ${e.getMessage.take(120)}")
      } finally { timer.cancel(); sc.clearJobGroup() }
    }
  }

  /** GRAPH.QUERY — run a Cypher statement (reads and writes). */
  def query(graph: String, cypher: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val t0 = System.nanoTime()
    val s = session(graph)
    val isMut = Graft.isMutation(parse(s, cypher)) // one cached parse
    val out = withTimeout(s.run(cypher, params))
    log.add((graph, cypher, (System.nanoTime() - t0) / 1e9))
    val cap = conf("RESULTSET_SIZE")
    if (cap >= 0 && !isMut)
      out.limit(math.min(cap, Int.MaxValue.toLong).toInt)
    else out
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
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try {
      val df = query(graph, cypher)
      // the eager (profiled) execution runs under TIMEOUT too — query()
      // only covers plan construction for reads
      withTimeout(df.write.format("noop").mode("overwrite").save())
      val sb = new StringBuilder
      def fmt(p: org.apache.spark.sql.execution.SparkPlan, d: Int): Unit = {
        val rows = p.metrics.get("numOutputRows").map(_.value)
        val timeNs = p.metrics.collectFirst {
          case (k, m) if k.toLowerCase.contains("time") && m.value > 0 =>
            // SQLMetric timing unit is ns or ms depending on metric type;
            // treat metricType "timing" as ms, "nsTiming" as ns
            if (m.metricType == "nsTiming") m.value / 1e6 else m.value.toDouble
        }
        val notes = rows.map(r => s"Records produced: $r").toSeq ++
          timeNs.map(t => f"Execution time: $t%.3f ms").toSeq
        sb.append("    " * d).append(p.nodeName)
        if (notes.nonEmpty) sb.append(" | ").append(notes.mkString(", "))
        sb.append("\n")
        p.children.foreach(fmt(_, d + 1))
      }
      fmt(df.queryExecution.executedPlan, 0)
      sb.toString
    } finally spark.conf.set(key, prev)
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
  def save(graph: String, buckets: Int = 64): Unit =
    graft.graph.GraphStore.save(session(graph).graph, s"graft_$graph", buckets)

  /** Restore a previously saved graph (co-bucketed expand joins at rest). */
  def restore(graph: String): Unit =
    session(graph).setGraph(
      graft.graph.GraphStore.load(spark, s"graft_$graph"))

  /** GRAPH.DELETE. */
  def delete(graph: String): Unit = graphs.remove(graph)

  /** GRAPH.LIST. */
  def list: Seq[String] = graphs.keys.toSeq.sorted

  /** GRAPH.SLOWLOG — (graph, query, seconds), slowest first. */
  def slowlog(n: Int = 10): Seq[(String, String, Double)] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq.sortBy(-_._3).take(n)
  }

  /** GRAPH.SLOWLOG g RESET. */
  def slowlogReset(): Unit = log.clear()
}

object Graft {

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
      case i: Ast.CreateIndex => List(s"Create Index [:${i.label}(${i.prop})]")
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
