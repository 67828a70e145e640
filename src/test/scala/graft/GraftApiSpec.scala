package graft

import graft.cypher.{Graft, Translator}
import org.scalatest.funsuite.AnyFunSuite

/** GRAPH.* command-surface parity (`/root/reference/src/module.c:132-172`). */
class GraftApiSpec extends AnyFunSuite {
  import SparkTestSession._

  test("query / list / delete lifecycle") {
    val g = new Graft(spark)
    g.query("social", "CREATE (:P {name:'ann'})-[:KNOWS]->(:P {name:'bob'})")
    g.query("other", "CREATE (:X {v:1})")
    assert(g.list == Seq("other", "social"))
    val r = g.query("social",
      "MATCH (a:P)-[:KNOWS]->(b:P) RETURN count(*) AS c")
    assert(r.select(r("c").getField("i")).head().getLong(0) == 1L)
    g.delete("other")
    assert(g.list == Seq("social"))
  }

  test("roQuery rejects mutations") {
    val g = new Graft(spark)
    g.query("g1", "CREATE (:P {v:1})")
    intercept[Translator.TranslateError] {
      g.roQuery("g1", "CREATE (:P {v:2})")
    }
    assert(g.roQuery("g1", "MATCH (p:P) RETURN count(*) AS c").count() == 1)
  }

  test("explain shows the physical plan without executing") {
    val g = new Graft(spark)
    g.query("g2", "CREATE (:P {v:1})")
    val plan = g.explain("g2", "MATCH (p:P) WHERE p.v > 0 RETURN p.v AS v")
    assert(plan.contains("Physical Plan"))
  }

  test("explain of a mutating query compiles the op tree without mutating") {
    val g = new Graft(spark)
    g.query("g5", "CREATE (:P {v:1})")
    val plan = g.explain("g5",
      "MATCH (p:P) CREATE (p)-[:MADE]->(:Q {w: 2})")
    assert(plan.contains("Create"))
    // the graph is untouched: no Q node, no MADE edge
    val r = g.roQuery("g5", "MATCH (q:Q) RETURN count(q) AS c")
    assert(r.select(r("c").getField("i")).head().getLong(0) == 0L)
    val merge = g.explain("g5", "MERGE (:P {v: 99})")
    assert(merge.contains("Merge"))
    assert(g.roQuery("g5", "MATCH (p:P) RETURN count(p) AS c")
      .select(org.apache.spark.sql.functions.col("c.i")).head().getLong(0) == 1L)
  }

  test("profile executes and reports operator metrics; slowlog records") {
    val g = new Graft(spark)
    g.query("g3", "CREATE (:P {v:1})")
    val prof = g.profile("g3", "MATCH (p:P) RETURN p.v AS v")
    assert(prof.contains("Records produced:"))
    assert(g.slowlog().nonEmpty)
    g.slowlogReset()
    assert(g.slowlog().isEmpty)
  }

  test("config get/set: RESULTSET_SIZE caps read results, unknown key rejected") {
    val g = new Graft(spark)
    g.query("g6", "UNWIND range(1, 10) AS i CREATE (:P {v: i})")
    assert(g.configGet("RESULTSET_SIZE") == -1L)
    assert(g.configGet("THREAD_COUNT") > 0L)
    g.configSet("RESULTSET_SIZE", 3L)
    assert(g.query("g6", "MATCH (p:P) RETURN p.v AS v").count() == 3)
    g.configSet("RESULTSET_SIZE", -1L)
    assert(g.query("g6", "MATCH (p:P) RETURN p.v AS v").count() == 10)
    intercept[IllegalArgumentException] { g.configGet("NO_SUCH_FIELD") }
    intercept[IllegalArgumentException] { g.configSet("THREAD_COUNT", 1L) }
  }

  test("CREATE/DROP INDEX lifecycle: DDL stats, db.indexes, staleness") {
    val g = new Graft(spark)
    g.query("gi", "UNWIND range(1, 50) AS i CREATE (:P {v: i})")
    val created = g.query("gi", "CREATE INDEX ON :P(v)")
    assert(created.select("indices_created").head().getLong(0) == 1L)
    // duplicate create is a no-op
    assert(g.query("gi", "CREATE INDEX ON :P(v)")
      .select("indices_created").head().getLong(0) == 0L)
    // the indexed view serves filtered label scans with identical results
    val r = g.roQuery("gi", "MATCH (p:P) WHERE p.v > 40 RETURN count(*) AS c")
    assert(r.select(r("c").getField("i")).head().getLong(0) == 10L)
    // db.indexes lists it
    val idx = g.roQuery("gi", "CALL db.indexes() YIELD type, label")
    assert(idx.count() == 1)
    // writes invalidate and rebuild: new rows are visible through the index
    g.query("gi", "UNWIND range(51, 60) AS i CREATE (:P {v: i})")
    val r2 = g.roQuery("gi", "MATCH (p:P) WHERE p.v > 40 RETURN count(*) AS c")
    assert(r2.select(r2("c").getField("i")).head().getLong(0) == 20L)
    // explain renders without executing; RO_QUERY rejects the DDL
    assert(g.explain("gi", "DROP INDEX ON :P(v)").contains("Drop Index"))
    intercept[Translator.TranslateError] {
      g.roQuery("gi", "CREATE INDEX ON :P(w)")
    }
    assert(g.query("gi", "DROP INDEX ON :P(v)")
      .select("indices_deleted").head().getLong(0) == 1L)
    assert(g.roQuery("gi", "CALL db.indexes() YIELD type, label").count() == 0)
    // post-drop mutations must be visible (a stale cached index view would
    // hide them — regression for the dropped-last-index overlay bug)
    g.query("gi", "UNWIND range(61, 70) AS i CREATE (:P {v: i})")
    val r3 = g.roQuery("gi", "MATCH (p:P) WHERE p.v > 40 RETURN count(*) AS c")
    assert(r3.select(r3("c").getField("i")).head().getLong(0) == 30L)
  }

  test("index DDL cannot be UNIONed with a read part") {
    val g = new Graft(spark)
    g.query("gu", "CREATE (:U {v: 1})")
    intercept[IllegalArgumentException] {
      g.query("gu", "CREATE INDEX ON :U(v) UNION MATCH (n:U) RETURN n.v AS v")
    }
  }

  test("save/restore persists a graph through bucketed storage") {
    val g = new Graft(spark)
    g.query("gp", "UNWIND range(1, 5) AS i CREATE (:P {v: i})-[:T]->(:Q {w: i})")
    g.save("gp", buckets = 2)
    try {
      val g2 = new Graft(spark)
      g2.restore("gp")
      val r = g2.roQuery("gp", "MATCH (:P)-[:T]->(q:Q) RETURN count(q) AS c")
      assert(r.select(r("c").getField("i")).head().getLong(0) == 5L)
    } finally graft.graph.GraphStore.drop(spark, "graft_gp")
  }

  test("bulk installs external tables as a graph") {
    val g = new Graft(spark)
    g.bulk("tpch", graft.graph.GraphBuilder.tpchStored(spark, sfDir))
    val r = g.roQuery("tpch", "MATCH (n:Nation) RETURN count(n) AS c")
    assert(r.select(r("c").getField("i")).head().getLong(0) == 25L)
  }

  test("serve: stats-count point reads are memoized and mutation-invalidated") {
    val s = new graft.cypher.CypherSession(spark)
    s.run("UNWIND range(1, 4) AS i CREATE (:SV {v: i})")
    val q = "MATCH (n:SV) RETURN count(n) AS c"
    def count(): Long = s.serve(q).head.getStruct(0).getLong(1)
    assert(count() == 4L)
    assert(count() == 4L) // served from the memoized row
    s.run("CREATE (:SV {v: 99})") // version bump must invalidate
    assert(count() == 5L)
    // non-fast-path queries still serve correct results
    val full = s.serve("MATCH (n:SV) WHERE n.v > 2 RETURN count(n) AS c")
    assert(full.head.getStruct(0).getLong(1) == 3L)
  }
}
