package graft.operators

import graft.QueryDef
import graft.cypher.{CypherParser, CypherSession, Translator, Values}
import graft.graph.GraphBuilder
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** End-to-end Cypher pipeline (parse → translate → Catalyst → execute)
  * over the TPC-H property graph, each query oracle-checked by equivalent
  * SQL in DuckDB — the engine's `GRAPH.QUERY` surface under the driver's
  * correctness gate.
  */
object CypherQueries {

  /** Translated-plan cache (≡ the reference's execution-plan cache,
    * `src/commands/execution_ctx.c:79-87`): translation + Catalyst analysis
    * of a Cypher query is driver-side constant cost — cache the resulting
    * DataFrame per (graph dir, query). Re-executing a cached DataFrame
    * re-runs the job (no result caching), skipping re-translate/re-optimize.
    * Weak-keyed per session so stopped sessions drop their entries.
    */
  private val planCaches = new java.util.WeakHashMap[SparkSession,
    scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  private[graft] def clearPlanCache(s: SparkSession): Unit =
    planCaches.synchronized { planCaches.remove(s) }

  private def run(s: SparkSession, dir: String, cypher: String): DataFrame = {
    val cache = planCaches.synchronized {
      var m = planCaches.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty
        planCaches.put(s, m)
      }
      m
    }
    cache.getOrElseUpdate((dir, cypher), {
      val g = GraphBuilder.tpchStored(s, dir)
      val ast = CypherParser.parse(cypher).fold(
        err => throw new IllegalArgumentException(err), identity)
      Translator.translate(g, ast)
    })
  }

  /** Session-based runner (CALL procedures, mutations, count fast path):
    * executes statements in order, returns the last result.
    */
  private def runS(s: SparkSession, dir: Option[String],
      statements: String*): DataFrame = {
    val sess = new CypherSession(s)
    dir.foreach(d => sess.setGraph(GraphBuilder.tpchStored(s, d)))
    statements.init.foreach(sess.run(_))
    sess.run(statements.last)
  }

  // variant → native projections (driver compares native parquet values)
  private def asLong(name: String): Column =
    col(s"`$name`").getField("i").as(name)
  private def asDouble(name: String): Column =
    col(s"`$name`").getField("f").as(name)
  private def asString(name: String): Column =
    col(s"`$name`").getField("s").as(name)

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_cypher_label_scan",
      """SELECT c_custkey AS ck, c_name AS name FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer {mktsegment: 'BUILDING'})
          |RETURN c.custkey AS ck, c.name AS name""".stripMargin)
        .select(asLong("ck"), asString("name"))
    },

    QueryDef(
      "q_cypher_expand",
      """SELECT c_custkey AS ck, o_orderkey AS ok,
        |       round(o_totalprice, 2) AS price
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |WHERE o_totalprice > 300000""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer)-[:PLACED]->(o:Order)
          |WHERE o.totalprice > 300000
          |RETURN c.custkey AS ck, o.orderkey AS ok,
          |       round(o.totalprice * 100) / 100 AS price""".stripMargin)
        .select(asLong("ck"), asLong("ok"), asDouble("price"))
    },

    QueryDef(
      "q_cypher_agg",
      """SELECT n_name AS nation, count(*) AS n_cust,
        |       round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
          |RETURN n.name AS nation, count(*) AS n_cust,
          |       round(sum(c.acctbal) * 100) / 100 AS bal""".stripMargin)
        .select(asString("nation"), asLong("n_cust"), asDouble("bal"))
    },

    QueryDef(
      "q_cypher_two_hop",
      """SELECT c_custkey AS ck, r_name AS region
        |FROM customer
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(r:Region)
          |RETURN c.custkey AS ck, r.name AS region""".stripMargin)
        .select(asLong("ck"), asString("region"))
    },

    QueryDef(
      "q_cypher_optional",
      """SELECT c_custkey AS ck, CAST(coalesce(oc.cnt, 0) AS BIGINT) AS n_orders
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt FROM orders
        |  WHERE o_totalprice > 300000 GROUP BY 1) oc
        |ON oc.o_custkey = c.c_custkey""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer)
          |OPTIONAL MATCH (c)-[:PLACED]->(o:Order) WHERE o.totalprice > 300000
          |RETURN c.custkey AS ck, count(o) AS n_orders""".stripMargin)
        .select(asLong("ck"), asLong("n_orders"))
    },

    QueryDef(
      "q_cypher_topk",
      """SELECT o_orderkey AS ok, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (o:Order)
          |RETURN o.orderkey AS ok,
          |       round(o.totalprice * 100) / 100 AS price
          |ORDER BY o.totalprice DESC, o.orderkey LIMIT 10""".stripMargin)
        .select(asLong("ok"), asDouble("price"))
    },

    QueryDef(
      "q_cypher_varlen",
      """SELECT c_custkey AS ck, r_regionkey AS rk
        |FROM customer
        |JOIN nation ON n_nationkey = c_nationkey
        |JOIN region ON r_regionkey = n_regionkey""".stripMargin) { (s, dir) =>
      // *2 over IN_NATION|IN_REGION from a Customer lands exactly on Region
      run(s, dir,
        """MATCH (c:Customer)-[:IN_NATION|IN_REGION*2]->(r:Region)
          |RETURN c.custkey AS ck, r.regionkey AS rk""".stripMargin)
        .select(asLong("ck"), asLong("rk"))
    },

    QueryDef(
      "q_cypher_semi",
      """SELECT c_custkey AS ck FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin) { (s, dir) =>
      // pattern predicate → left_semi join (SemiApply)
      run(s, dir,
        """MATCH (c:Customer)
          |WHERE (c)-[:PLACED]->(:Order {status: 'F'})
          |RETURN c.custkey AS ck""".stripMargin)
        .select(asLong("ck"))
    },

    QueryDef(
      "q_cypher_or_pattern",
      """SELECT c_custkey AS ck FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |   OR c.c_acctbal > 9000""".stripMargin) { (s, dir) =>
      // pattern predicate OR value predicate → ApplyMultiplexer shape:
      // semi-join key set per pattern, boolean flag column, value filter
      run(s, dir,
        """MATCH (c:Customer)
          |WHERE (c)-[:PLACED]->(:Order {status: 'F'}) OR c.acctbal > 9000
          |RETURN c.custkey AS ck""".stripMargin)
        .select(asLong("ck"))
    },

    QueryDef(
      "q_cypher_union",
      """SELECT c_name AS name FROM customer WHERE c_acctbal > 9000
        |UNION
        |SELECT s_name FROM supplier WHERE s_acctbal > 9000""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (c:Customer) WHERE c.acctbal > 9000 RETURN c.name AS name
          |UNION
          |MATCH (su:Supplier) WHERE su.acctbal > 9000 RETURN su.name AS name""".stripMargin)
        .select(asString("name"))
    },

    QueryDef(
      "q_cypher_count_stats",
      "SELECT count(*) AS c FROM customer") { (s, dir) =>
      // served from graph statistics, no scan (reduceCount fast path)
      runS(s, Some(dir), "MATCH (c:Customer) RETURN count(c) AS c")
        .select(asLong("c"))
    },

    QueryDef(
      "q_cypher_named_path",
      """SELECT c_custkey AS ck, CAST(1 AS BIGINT) AS len FROM customer
        |UNION ALL
        |SELECT c_custkey AS ck, CAST(2 AS BIGINT) AS len FROM customer""".stripMargin) { (s, dir) =>
      // 1 hop lands on Nation, 2 hops on Region — one path row each
      run(s, dir,
        """MATCH p = (c:Customer)-[:IN_NATION|IN_REGION*1..2]->(x)
          |RETURN c.custkey AS ck, length(p) AS len""".stripMargin)
        .select(asLong("ck"), asLong("len"))
    },

    QueryDef(
      "q_cypher_call_labels",
      """SELECT label FROM (VALUES ('Customer'), ('Nation'), ('Order'),
        |  ('Part'), ('Region'), ('Supplier')) t(label)""".stripMargin) { (s, dir) =>
      runS(s, Some(dir),
        "CALL db.labels() YIELD label RETURN label ORDER BY label")
        .select(asString("label"))
    },

    QueryDef(
      "q_cypher_self_join",
      // BASELINE index_node_lookup query shape (`tests/benchmarks/
      // index_node_lookup.yml`: MATCH (a) WITH a MATCH (b) WHERE a.age =
      // b.age AND a <> b RETURN a, collect(b)) — value self-join + entity
      // inequality; count form for the hash gate.
      """SELECT a.c_custkey AS ck, count(*) AS n_peers
        |FROM customer a JOIN customer b
        |  ON b.c_acctbal = a.c_acctbal AND b.c_custkey <> a.c_custkey
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (a:Customer) WITH a MATCH (b:Customer)
          |WHERE a.acctbal = b.acctbal AND a <> b
          |RETURN a.custkey AS ck, count(b) AS n_peers""".stripMargin)
        .select(asLong("ck"), asLong("n_peers"))
    },

    QueryDef(
      "q_cypher_bfs",
      // algo.BFS from customer 1, 3 levels, over every relationship class —
      // oracle: recursive CTE over the same id-spaced edge union
      // (GraphBuilder id bases: order +1e8, nation +2e8, region +3e8,
      // supplier +4e8, part +5e8).
      """WITH RECURSIVE edges AS (
        |  SELECT o_custkey AS src, o_orderkey + 100000000 AS dst FROM orders
        |  UNION ALL
        |  SELECT c_custkey, c_nationkey + 200000000 FROM customer
        |  UNION ALL
        |  SELECT s_suppkey + 400000000, s_nationkey + 200000000 FROM supplier
        |  UNION ALL
        |  SELECT n_nationkey + 200000000, n_regionkey + 300000000 FROM nation
        |  UNION ALL
        |  SELECT l_orderkey + 100000000, l_partkey + 500000000 FROM lineitem),
        |reach AS (
        |  SELECT dst AS node, 1 AS level FROM edges WHERE src = 1
        |  UNION
        |  SELECT e.dst, r.level + 1
        |  FROM reach r JOIN edges e ON e.src = r.node
        |  WHERE r.level < 3)
        |SELECT node AS nid, CAST(min(level) AS BIGINT) AS level
        |FROM reach GROUP BY node""".stripMargin) { (s, dir) =>
      runS(s, Some(dir),
        """CALL algo.BFS(1, 3) YIELD node, level
          |RETURN id(node) AS nid, level""".stripMargin)
        .select(asLong("nid"), asLong("level"))
    },

    QueryDef(
      "q_cypher_mutation",
      "SELECT CAST(10 AS BIGINT) AS flagged, CAST(30 AS BIGINT) AS total") { (s, dir) =>
      // graph DML round-trip on a scratch graph: CREATE fan-out via UNWIND,
      // SET on a matched subset, MERGE idempotency, count read-back
      runS(s, None,
        "UNWIND range(0, 29) AS x CREATE (:T {v: x % 3})",
        "MATCH (t:T) WHERE t.v = 0 SET t.flag = true",
        "MERGE (t:T {v: 1})", // all exist — creates nothing
        """MATCH (t:T) WITH t.flag AS f
          |RETURN count(f) AS flagged, count(*) AS total""".stripMargin)
        .select(asLong("flagged"), asLong("total"))
    },

    QueryDef(
      "q_cypher_fulltext",
      """SELECT CAST(p_partkey AS BIGINT) AS pk FROM part
        |WHERE ' ' || p_name || ' ' LIKE '% red %'""".stripMargin) { (s, dir) =>
      runS(s, Some(dir),
        "CALL db.idx.fulltext.createNodeIndex('Part', 'name')",
        """CALL db.idx.fulltext.queryNodes('Part', 'red')
          |YIELD node RETURN node.partkey AS pk""".stripMargin)
        .select(asLong("pk"))
    },

    QueryDef(
      "q_cypher_shortest",
      """SELECT c_custkey AS ck, CAST(2 AS BIGINT) AS len
        |FROM customer WHERE c_custkey < 100""".stripMargin) { (s, dir) =>
      // shortest route Customer→Region is always the 2-hop via Nation
      // (enumeration would also emit nothing longer here, but the rank
      // guarantees exactly one row per endpoint pair)
      run(s, dir,
        """MATCH p = shortestPath(
          |  (c:Customer)-[:IN_NATION|IN_REGION*1..3]->(r:Region))
          |WHERE c.custkey < 100
          |RETURN c.custkey AS ck, length(p) AS len""".stripMargin)
        .select(asLong("ck"), asLong("len"))
    },

    QueryDef(
      "q_cypher_degree",
      """SELECT n_name AS name,
        |  (SELECT count(*) FROM customer WHERE c_nationkey = n_nationkey)
        |  + (SELECT count(*) FROM supplier WHERE s_nationkey = n_nationkey)
        |  AS deg
        |FROM nation""".stripMargin) { (s, dir) =>
      // indegree/outdegree (`entity_funcs.c:186-230`) resolve to a
      // left-joined degree view (groupBy src/dst + count)
      run(s, dir,
        """MATCH (n:Nation)
          |RETURN n.name AS name, indegree(n) AS deg""".stripMargin)
        .select(asString("name"), asLong("deg"))
    },

    QueryDef(
      "q_cypher_case",
      """SELECT o_orderkey AS ok,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket
        |FROM orders WHERE o_orderkey < 1000""".stripMargin) { (s, dir) =>
      // searched CASE (`conditional_funcs.c:83-88`)
      run(s, dir,
        """MATCH (o:Order) WHERE o.orderkey < 1000
          |RETURN o.orderkey AS ok,
          |       CASE WHEN o.totalprice > 300000 THEN 'big'
          |            WHEN o.totalprice > 150000 THEN 'mid'
          |            ELSE 'small' END AS bucket""".stripMargin)
        .select(asLong("ok"), asString("bucket"))
    },

    QueryDef(
      "q_cypher_with_chain",
      """SELECT n_name AS nation, cnt FROM (
        |  SELECT n_name, count(*) AS cnt
        |  FROM customer JOIN nation ON n_nationkey = c_nationkey
        |  WHERE c_acctbal > 0 GROUP BY 1)
        |WHERE cnt > 50""".stripMargin) { (s, dir) =>
      // WITH-segmented pipeline: aggregate → filter on the aggregate
      // (plan segments at WITH, `execution_plan.c:50-103`)
      run(s, dir,
        """MATCH (c:Customer)-[:IN_NATION]->(n:Nation)
          |WHERE c.acctbal > 0
          |WITH n.name AS nation, count(*) AS cnt
          |WHERE cnt > 50
          |RETURN nation, cnt""".stripMargin)
        .select(asString("nation"), asLong("cnt"))
    },

    QueryDef(
      "q_cypher_edge_props",
      """SELECT o_orderkey AS ok, p_partkey AS pk,
        |       round(l_extendedprice, 2) AS price
        |FROM lineitem
        |JOIN orders ON o_orderkey = l_orderkey
        |JOIN part ON p_partkey = l_partkey
        |WHERE l_quantity >= 49""".stripMargin) { (s, dir) =>
      run(s, dir,
        """MATCH (o:Order)-[l:CONTAINS]->(p:Part)
          |WHERE l.quantity >= 49
          |RETURN o.orderkey AS ok, p.partkey AS pk,
          |       round(l.extendedprice * 100) / 100 AS price""".stripMargin)
        .select(asLong("ok"), asLong("pk"), asDouble("price"))
    })
}
