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

  /** GRAPH.QUERY — run a Cypher statement (reads and writes). */
  def query(graph: String, cypher: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val t0 = System.nanoTime()
    val out = session(graph).run(cypher, params)
    log.add((graph, cypher, (System.nanoTime() - t0) / 1e9))
    out
  }

  /** GRAPH.RO_QUERY — rejects mutating statements
    * (`src/commands/cmd_query.c` read-only path).
    */
  def roQuery(graph: String, cypher: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val ast = CypherParser.parse(cypher).fold(
      e => throw Translator.TranslateError(e), identity)
    val mutates = ast.parts.exists(_.clauses.exists {
      case _: Ast.Create | _: Ast.Merge | _: Ast.SetClause | _: Ast.Delete =>
        true
      case _ => false
    })
    if (mutates)
      throw Translator.TranslateError("graph.RO_QUERY cannot mutate")
    query(graph, cypher, params)
  }

  /** GRAPH.EXPLAIN — the Catalyst plan (formatted) without executing. */
  def explain(graph: String, cypher: String): String =
    session(graph).run(cypher).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** GRAPH.PROFILE — execute and return the plan annotated with runtime
    * metrics (rows, time) per operator.
    */
  def profile(graph: String, cypher: String): String = {
    val df = query(graph, cypher)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan.toString
  }

  /** GRAPH.BULK — install externally built node/edge tables (schema:
    * nodes(id,label,props), edges(id,src,dst,reltype,props); see
    * `docs/bulk_spec.md`). No copy — the DataFrames become the graph.
    */
  def bulk(graph: String, nodes: DataFrame, edges: DataFrame): Unit =
    session(graph).setGraph(PropertyGraph(nodes, edges))

  def bulk(graph: String, g: PropertyGraph): Unit =
    session(graph).setGraph(g)

  /** GRAPH.DELETE. */
  def delete(graph: String): Unit = graphs.remove(graph)

  /** GRAPH.LIST. */
  def list: Seq[String] = graphs.keys.toSeq.sorted

  /** GRAPH.SLOWLOG — (graph, query, seconds), slowest first. */
  def slowlog(n: Int = 10): Seq[(String, String, Double)] = {
    import scala.jdk.CollectionConverters._
    log.asScala.toSeq.sortBy(-_._3).take(n)
  }
}
