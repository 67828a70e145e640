package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented capability (one entry per operator
  * from SURVEY.md §2 plus the pipeline extensions); `oracleSql` carries the
  * DuckDB-equivalent SQL for each SQL-expressible entry.
  */
object SparkEntry {

  /** All implemented capabilities, one QueryDef each. */
  def allDefs: Seq[QueryDef] =
    operators.RelationalQueries.defs ++
      operators.GraphQueries.defs ++
      operators.PipelineQueries.defs ++
      operators.StreamQueries.defs ++
      operators.CypherQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Customer order volume by nation — scan + broadcast join + shuffle join +
    * aggregate + top-k, the minimum end-to-end slice of SURVEY §7.2.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val n = Tables.nation(spark, dir)
    c.join(o, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
      .groupBy(n("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(o("o_totalprice")), 2).as("revenue"))
      .orderBy(col("revenue").desc)
  }

  /** Plan cache: one translated/analyzed DataFrame per (session, query,
    * dir) — re-invoking a query re-executes the same plan (no result
    * caching) instead of rebuilding + re-analyzing it. The Spark-side
    * analogue of the reference's execution-plan cache
    * (`src/commands/execution_ctx.c:79-87`). Scoped per live session via a
    * weak map: a stopped session's entries (and any persisted RDDs they pin)
    * become collectable instead of being retained for the process lifetime.
    */
  private val planCaches = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private def cacheFor(s: SparkSession) = planCaches.synchronized {
    var m = planCaches.get(s)
    if (m == null) {
      m = scala.collection.concurrent.TrieMap.empty
      planCaches.put(s, m)
    }
    m
  }

  /** Drop every cached plan for the session (both this registry's and the
    * Cypher pipeline's) — used by Bench between warm-up and timed runs so
    * timed executions rebuild plans and re-materialize operator-internal
    * caches from scratch.
    */
  def clearPlanCache(s: SparkSession): Unit = {
    planCaches.synchronized { planCaches.remove(s) }
    operators.CypherQueries.clearPlanCache(s)
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map { d =>
      d.name -> ((s: SparkSession, dir: String) =>
        cacheFor(s).getOrElseUpdate((d.name, dir), d.fn(s, dir)))
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
