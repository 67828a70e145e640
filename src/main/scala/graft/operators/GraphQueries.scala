package graft.operators

import graft.QueryDef
import graft.graph.{GraphOps, PropertyGraph}
import org.apache.spark.sql.functions._

/** Graph traversal capabilities (SURVEY.md §2.2) exercised on the
  * event-chain PropertyGraph, each with a DuckDB oracle (recursive CTEs give
  * the var-len/shortest-path ground truth).
  */
object GraphQueries {

  /** Shared oracle CTE: the event-chain edge list (must stay in sync with
    * PropertyGraph.eventChain).
    */
  private val edgesCte =
    """edges AS (
      |  SELECT event_id AS src,
      |         lead(event_id) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS dst,
      |         user_id
      |  FROM events QUALIFY dst IS NOT NULL
      |)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_graph_edges",
      s"WITH $edgesCte SELECT src, dst, user_id FROM edges") { (s, dir) =>
      // Graph construction: adjacency from an event log via window lead —
      // one shuffle on user_id, the graph's natural bucketing key.
      PropertyGraph.eventChain(s, dir).edges.select("src", "dst", "user_id")
    },

    QueryDef(
      "q_graph_labels",
      "SELECT DISTINCT event_type AS label FROM events") { (s, dir) =>
      // db.labels procedure (`src/procedures/procedure.c:29-42`).
      PropertyGraph.eventChain(s, dir).nodes.select("label").distinct()
    },

    QueryDef(
      "q_graph_degree",
      s"""WITH $edgesCte
         |SELECT CAST(deg AS BIGINT) AS out_degree, count(*) AS n_nodes
         |FROM (SELECT coalesce(d.cnt, 0) AS deg
         |      FROM events ev LEFT JOIN (
         |        SELECT src, count(*) AS cnt FROM edges GROUP BY src) d
         |        ON d.src = ev.event_id)
         |GROUP BY 1""".stripMargin) { (s, dir) =>
      // outdegree (`entity_funcs.c:186-230`) + distribution.
      val g = PropertyGraph.eventChain(s, dir)
      val deg = g.outDegrees
      g.nodes.join(deg, g.nodes("id") === deg("id"), "left_outer")
        .select(coalesce(col("out_degree"), lit(0L)).as("out_degree"))
        .groupBy("out_degree").agg(count(lit(1)).as("n_nodes"))
    },

    QueryDef(
      "q_graph_two_hop",
      s"""WITH $edgesCte
         |SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
         |FROM edges e1 JOIN edges e2 ON e2.src = e1.dst""".stripMargin) { (s, dir) =>
      // Fixed-length 2-hop pattern (a)-[]->(b)-[]->(c): traversal = join
      // chain (SURVEY §2.2 — AlgebraicExpression MUL ≡ join).
      val e = PropertyGraph.eventChain(s, dir).edges.select("src", "dst")
      val e1 = e.select(col("src").as("a"), col("dst").as("b"))
      val e2 = e.select(col("src").as("b2"), col("dst").as("c"))
      e1.join(e2, e1("b") === e2("b2")).select("a", "b", "c")
    },

    QueryDef(
      "q_graph_varlen",
      s"""WITH RECURSIVE $edgesCte,
         |reach AS (
         |  SELECT e.src AS start, e.dst AS node, 1 AS hops
         |  FROM edges e JOIN events s
         |    ON s.event_id = e.src AND s.event_type = 'signup'
         |  UNION ALL
         |  SELECT r.start, e.dst, r.hops + 1
         |  FROM reach r JOIN edges e ON e.src = r.node
         |  WHERE r.hops < 4
         |)
         |SELECT start, node, CAST(min(hops) AS INT) AS hops
         |FROM reach GROUP BY start, node""".stripMargin) { (s, dir) =>
      // CondVarLenTraverse `*1..4` (`ops/op_cond_var_len_traverse.c`) —
      // BFS frontier-join loop with per-iteration lineage cuts.
      val g = PropertyGraph.eventChain(s, dir)
      val sources = g.nodesByLabel("signup").select("id")
      GraphOps.varLenExpand(sources, g.edges, 1, 4)
        .select(col("start"), col("node"), col("hops").cast("int").as("hops"))
    },

    QueryDef(
      "q_graph_shortest_path",
      s"""WITH RECURSIVE $edgesCte,
         |reach AS (
         |  SELECT e.src AS start, e.dst AS node, 1 AS hops
         |  FROM edges e JOIN events s
         |    ON s.event_id = e.src AND s.event_type = 'signup'
         |  UNION ALL
         |  SELECT r.start, e.dst, r.hops + 1
         |  FROM reach r JOIN edges e ON e.src = r.node
         |  WHERE r.hops < 6
         |)
         |SELECT r.start, r.node, CAST(min(r.hops) AS INT) AS hops
         |FROM reach r JOIN events t
         |  ON t.event_id = r.node AND t.event_type = 'purchase'
         |GROUP BY r.start, r.node""".stripMargin) { (s, dir) =>
      // shortestPath (`path_funcs.c:108-190`, LAGraph BFS push-pull) —
      // unweighted BFS distances from signup events to purchase events.
      val g = PropertyGraph.eventChain(s, dir)
      val sources = g.nodesByLabel("signup").select("id")
      val targets = g.nodesByLabel("purchase").select("id")
      GraphOps.shortestPaths(sources, g.edges, targets, 6)
        .select(col("start"), col("node"), col("hops").cast("int").as("hops"))
    },

    QueryDef(
      "q_graph_components",
      """SELECT event_id AS id,
        |       min(event_id) OVER (PARTITION BY user_id) AS component
        |FROM events""".stripMargin) { (s, dir) =>
      // Connected components via GraphX Pregel. Oracle exploits the known
      // topology: each user's events form exactly one chain, and GraphX
      // labels a component by its smallest vertex id.
      val g = PropertyGraph.eventChain(s, dir)
      GraphOps.connectedComponents(g)
    },

    QueryDef(
      "q_graph_pagerank",
      // GraphX staticPageRank semantics, unrolled as 10 SQL power-iteration
      // CTEs: init 1.0, r_{k+1} = 0.15 + 0.85·Σ_{u→v} r_k(u)/outdeg(u)
      // (dangling mass not redistributed), final ranks normalized to sum N.
      // Determined empirically against GraphX output (diff 0.0 at 6 dp).
      s"""WITH $edgesCte,
         |outdeg AS (SELECT src, count(*) AS c FROM edges GROUP BY 1),
         |r0 AS (SELECT event_id AS id, 1.0 AS r FROM events),
         |${(1 to 10).map { k =>
             s"""r$k AS (
                |  SELECT n.event_id AS id, 0.15 + 0.85 * coalesce(s.m, 0) AS r
                |  FROM events n LEFT JOIN (
                |    SELECT e.dst AS id, sum(p.r / d.c) AS m
                |    FROM edges e JOIN r${k - 1} p ON p.id = e.src
                |    JOIN outdeg d ON d.src = e.src GROUP BY 1) s
                |  ON s.id = n.event_id)""".stripMargin
           }.mkString(",\n")}
         |SELECT id,
         |  round(r * (SELECT count(*) FROM events) / (SELECT sum(r) FROM r10),
         |        6) AS pagerank
         |FROM r10""".stripMargin) { (s, dir) =>
      // algo.pageRank procedure (`src/procedures/proc_pagerank.c:202`) via
      // GraphX staticPageRank.
      val g = PropertyGraph.eventChain(s, dir)
      GraphOps.pageRank(g, 0.15, 10)
        .select(col("id"), round(col("pagerank"), 6).as("pagerank"))
    })
}
