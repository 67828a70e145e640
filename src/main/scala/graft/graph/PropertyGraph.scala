package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The engine's property-graph currency: two DataFrames.
  *
  * Mirrors the reference's data model (`/root/reference/src/graph/graph.h:69-78`):
  * node/edge DataBlock row stores + per-label/per-reltype sparse matrices.
  * Spark-first re-expression (SURVEY.md §1.6):
  *   - label matrix      ≡ `nodes.filter($"label" === L)` (at scale: `label`
  *     is a partition column → partition pruning, no row filter)
  *   - relation matrix   ≡ `edges.filter($"reltype" === R)`
  *   - adjacency matrix  ≡ `edges.select(src, dst)`
  *   - transpose         ≡ column swap (free)
  *
  * Schema contract:
  *   nodes: id Long, label String, props Map[String, String-encoded value]*
  *   edges: id Long, src Long, dst Long, reltype String, props …
  * (*extra typed columns are allowed and pass through; `props` is optional —
  * graphs built from typed relational tables keep their native columns.)
  *
  * Scale: at 100 TB both tables live as Parquet/Delta bucketed by id (nodes)
  * and src (edges, plus a dst-bucketed transpose copy for reverse expansion —
  * the same trade the reference makes storing explicit transposes,
  * `graph.h:72-73`).
  */
final case class PropertyGraph(nodes: DataFrame, edges: DataFrame,
    byLabel: Map[String, DataFrame] = Map.empty,
    byReltype: Map[String, DataFrame] = Map.empty,
    /** The dst-bucketed transpose copy when the graph is backed by a
      * [[GraphStore]] (≡ the reference's stored transposed matrices,
      * `graph.h:72-73`): reverse (`<-`) expansion joins co-locate on it
      * without a shuffle. None on dynamic/mutated graphs — the translator
      * then falls back to a column swap of `edges` (same values, one
      * exchange at scale).
      */
    edgesRev: Option[DataFrame] = None,
    /** Property-key catalog when the graph is backed by a [[GraphStore]]
      * (read from `_meta` at load): lets schema-version seeding use
      * metadata instead of a distinct map_keys scan — at 100 TB the scan
      * is a full-table job, the catalog a driver-side read. None on
      * dynamic graphs (small; the scan fallback is cheap there).
      */
    propKeyCatalog: Option[Seq[String]] = None) {

  /** Per-label scan. When the graph carries a prebuilt per-label view
    * (GraphBuilder supplies the pre-union source tables — the analogue of
    * the reference's per-label matrices, `graph.h:74`), a label scan is
    * that single table: the analyzed plan never contains the all-labels
    * union, which keeps Catalyst analysis/optimization cost proportional
    * to the labels a query touches, not the whole catalog.
    */
  def nodesByLabel(label: String): DataFrame =
    byLabel.getOrElse(label,
      // membership, not equality: the label column is a ':'-joined ordered
      // label list (multi-label nodes), and a `(n:A:B)` pattern conjoins.
      // Big graphs (GraphBuilder/GraphCsv/GraphStore) carry prebuilt
      // byLabel views, so this fallback only runs on dynamic graphs.
      nodes.filter(graft.cypher.Values.labelHas(col("label"), label)))

  def edgesByType(reltype: String): DataFrame =
    byReltype.getOrElse(reltype, edges.filter(col("reltype") === reltype))

  /** Multi-type scan ([:R|S]): union of per-type views when all are
    * prebuilt, else one isin filter over the edge table.
    */
  def edgesByTypes(reltypes: Seq[String]): DataFrame =
    if (reltypes.isEmpty) edges
    else if (reltypes.forall(byReltype.contains))
      reltypes.map(byReltype).reduce(_ unionByName _)
    else edges.filter(col("reltype").isin(reltypes: _*))

  /** The transpose copy filtered to `reltypes`, when the graph carries one
    * (a reltype filter preserves the dst bucketing, so reverse expansion
    * joins stay co-located).
    */
  def edgesByTypesRev(reltypes: Seq[String]): Option[DataFrame] =
    edgesRev.map(r =>
      if (reltypes.isEmpty) r else r.filter(col("reltype").isin(reltypes: _*)))

  /** Out-degree per node (reference `entity_funcs.c:186-230` outdegree). */
  def outDegrees: DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_degree"))

  def inDegrees: DataFrame =
    edges.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_degree"))

  /** Graph statistics (≡ `src/graph/graph_statistics.c` per-label node /
    * per-type edge counts): computed once per graph version with a single
    * map-side-combined groupBy each, then served from the driver — the
    * `reduceCount` O(1) answer path (`optimizations/reduce_count.c:13-40`).
    * At scale these come from Delta table metadata / partition stats.
    */
  @transient private var statsCache
      : Option[(Map[String, Long], Map[String, Long])] = None

  private def stats: (Map[String, Long], Map[String, Long]) = synchronized {
    statsCache.getOrElse {
      val s = (
        nodes.groupBy("label").count().collect()
          .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
          .toMap,
        edges.groupBy("reltype").count().collect()
          .map(r => Option(r.getString(0)).getOrElse("") -> r.getLong(1))
          .toMap)
      statsCache = Some(s)
      s
    }
  }

  def labelCounts: Map[String, Long] = stats._1
  def reltypeCounts: Map[String, Long] = stats._2

  /** Statistics if ALREADY computed for this graph version, else None —
    * consumers that only want to OPPORTUNISTICALLY use stats (join-order
    * heuristics) must not trigger the counting job on a cold read path.
    */
  private[graft] def statsPeek
      : Option[(Map[String, Long], Map[String, Long])] =
    synchronized(statsCache)
  def nodeCount: Long = labelCounts.values.sum
  def edgeCount: Long = reltypeCounts.values.sum

  /** Carry computed statistics over from a prior version when the change
    * provably didn't touch counts (point property writes): keeps the
    * stats-served count path job-free across hot writes.
    */
  private[graft] def seedStatsFrom(prev: PropertyGraph): PropertyGraph =
    synchronized {
      if (statsCache.isEmpty) statsCache = prev.synchronized {
        prev.statsCache
      }
      this
    }

  /** Install exact statistics computed on the driver (point deletes know
    * precisely which labels/reltypes they removed).
    */
  private[graft] def seedStats(lc: Map[String, Long],
      rc: Map[String, Long]): PropertyGraph = synchronized {
    statsCache = Some((lc, rc))
    this
  }

  private[graft] def statsIfComputed
      : Option[(Map[String, Long], Map[String, Long])] =
    synchronized(statsCache)
}

object PropertyGraph {

  /** Event-chain graph over the `events` table: one node per event, one edge
    * from each event to the user's next event (by ts, event_id). Gives real
    * directed chains for traversal/path testing with a SQL-derivable
    * topology (window lead), so every traversal op gets a DuckDB oracle.
    */
  def eventChain(spark: SparkSession, dir: String): PropertyGraph = {
    val ev = Tables.events(spark, dir)
    val nodes = ev.select(
      col("event_id").as("id"),
      col("event_type").as("label"),
      col("user_id"),
      col("value"))
    // Window shuffles once on user_id — the natural edge-build partitioning;
    // at scale user_id is the bucketing key so this is shuffle-free.
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val edges = ev
      .withColumn("dst", lead(col("event_id"), 1).over(w))
      .filter(col("dst").isNotNull)
      .select(
        col("event_id").as("id"),
        col("event_id").as("src"),
        col("dst"),
        lit("next").as("reltype"),
        col("user_id"))
    PropertyGraph(nodes, edges)
  }
}
