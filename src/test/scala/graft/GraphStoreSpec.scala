package graft

import graft.graph.{GraphBuilder, GraphStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed at-rest graph storage: round-trip fidelity and the scale
  * contract — expand joins over co-bucketed tables plan WITHOUT a shuffle
  * on either side.
  */
class GraphStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  test("save/load round-trip preserves nodes and edges; expand join is shuffle-free") {
    val g = GraphBuilder.tpch(spark, sfDir)
    GraphStore.save(g, "gs_tpch", buckets = 4)
    try {
      val loaded = GraphStore.load(spark, "gs_tpch")
      assert(loaded.nodes.count() == g.nodes.count())
      assert(loaded.edges.count() == g.edges.count())

      // co-located expand: nodes.id = edges.src, both bucketed ×4
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val expand = loaded.nodes
          .join(loaded.edges, loaded.nodes("id") === loaded.edges("src"))
        val plan = expand.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"expand join shuffled:\n$plan")
        assert(expand.count() == g.edges.count())

        // reverse expansion against the dst-bucketed transpose copy
        val rev = GraphStore.loadReverse(spark, "gs_tpch")
        val revExpand = loaded.nodes
          .join(rev, loaded.nodes("id") === rev("dst"))
        val revPlan = revExpand.queryExecution.executedPlan.toString
        assert(!revPlan.contains("Exchange"), s"reverse expand shuffled:\n$revPlan")
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }

      // property values survive the round trip
      val name = loaded.nodes.filter(col("label") === "Nation")
        .select(element_at(col("props"), "name").getField("s"))
        .orderBy(col("id")).limit(1).head().getString(0)
      assert(name != null && name.nonEmpty)
    } finally GraphStore.drop(spark, "gs_tpch")
  }
}
