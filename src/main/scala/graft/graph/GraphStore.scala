package graft.graph

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Graph persistence at rest: bucketed Parquet tables (SURVEY §2.1 — the
  * reference's RDB serialization, `src/serializers/encoder/v9`, replaced
  * wholesale by the lake format).
  *
  * Layout (the scale contract from `PropertyGraph`'s scaladoc):
  *   - `<name>_nodes`      bucketed+sorted by `id`
  *   - `<name>_edges`      bucketed+sorted by `src`
  *   - `<name>_edges_rev`  the same edges bucketed by `dst` — the explicit
  *     transpose copy, the trade the reference makes storing transposed
  *     matrices (`src/graph/graph.h:72-73`): reverse expansion
  *     `(a)<-[:R]-(b)` co-locates against node buckets without a shuffle.
  *
  * With all tables sharing one bucket count, every expand join
  * (`nodes.id = edges.src`, or `= edges_rev.dst`) is bucket-co-located:
  * Catalyst plans a SortMergeJoin with NO Exchange on either side
  * (asserted in GraphStoreSpec). On a 1000-executor cluster this is the
  * difference between a per-hop full shuffle of the edge table and a
  * purely local join per bucket.
  *
  * The bucketing metadata lives in the session catalog; production
  * deployments back it with a persistent metastore (or Delta, where
  * clustering keys serve the same role).
  */
object GraphStore {

  /** Persist `g` as `<name>_{nodes,edges,edges_rev}` bucketed tables. */
  def save(g: PropertyGraph, name: String, buckets: Int = 64): Unit = {
    // nodes are additionally PARTITIONED by label (the PropertyGraph
    // scaladoc's "label is a partition column" scale contract): a label
    // scan then prunes to that label's directories before any row is read
    // — the stored analogue of the reference's per-label matrices. Label
    // cardinality is bounded (':'-joined ordered label sets), and the id
    // bucketing nests inside each partition directory, so expand joins
    // keep their co-location.
    g.nodes.write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy("label")
      .bucketBy(buckets, "id").sortBy("id")
      .saveAsTable(s"${name}_nodes")
    g.edges.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(s"${name}_edges")
    g.edges.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, "dst").sortBy("dst")
      .saveAsTable(s"${name}_edges_rev")
  }

  /** Load a stored graph; `edges` is the src-bucketed copy and `edgesRev`
    * the dst-bucketed transpose — the translator's reverse expansions
    * then co-locate without a shuffle.
    */
  def load(spark: SparkSession, name: String): PropertyGraph = {
    // partitionBy moves `label` to the END of the stored schema; restore
    // the engine's positional contract (id, label, props, extras…) — the
    // projection is alias-free, so partition pruning and the id bucketing
    // pass straight through it
    val t = spark.table(s"${name}_nodes")
    val lead = Seq("id", "label", "props").filter(t.columns.contains)
    val nodes = t.select(
      (lead ++ t.columns.filterNot(lead.contains)).map(t.apply): _*)
    PropertyGraph(nodes,
      spark.table(s"${name}_edges"),
      edgesRev = Some(spark.table(s"${name}_edges_rev")))
  }

  /** The dst-bucketed transpose copy, for reverse (`<-`) expansion. */
  def loadReverse(spark: SparkSession, name: String) =
    spark.table(s"${name}_edges_rev")

  /** Drop the three tables (ignoring absent ones). */
  def drop(spark: SparkSession, name: String): Unit =
    Seq("_nodes", "_edges", "_edges_rev").foreach { s =>
      spark.sql(s"DROP TABLE IF EXISTS $name$s")
    }
}
