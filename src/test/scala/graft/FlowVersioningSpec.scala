package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_graph_versioning.py`: the wire-protocol graph
  * version moves exactly when the SCHEMA grows — a new label, relationship
  * type, or attribute key — and plain writes that reuse existing schema
  * leave it unchanged. A client passing a stale version with its query is
  * rejected with "version mismatch" + the current version
  * (`cmd_dispatcher.c:82-92`, `graphcontext.c:202-219`).
  */
class FlowVersioningSpec extends AnyFunSuite {
  import SparkTestSession._

  private val id = "GraphVersion"

  test("versioned queries: label / reltype / attribute additions bump") {
    val g = new Graft(spark)
    var version = g.graphVersion(id)

    // helper: run with the client's cached version; returns the server's
    // current version on mismatch (the reference's 2-element error reply)
    def runV(q: String): Option[Long] =
      try { g.query(id, q, Map.empty, version); None }
      catch { case Graft.VersionMismatch(cur) => Some(cur) }

    // ── test01: labels ────────────────────────────────────────────────────
    // unlabeled node: no version change
    assert(runV("CREATE ()").isEmpty)
    assert(runV("RETURN 1").isEmpty)
    // new label L: version moves — next versioned query is rejected
    assert(runV("CREATE (:L)").isEmpty) // write itself runs (version was fresh at dispatch)
    val afterLabel = runV("RETURN 1")
    assert(afterLabel.isDefined, "new label must bump the version")
    version = afterLabel.get
    // existing label: no change
    assert(runV("CREATE (:L)").isEmpty)
    assert(runV("RETURN 1").isEmpty)

    // ── test02: relationship types ────────────────────────────────────────
    assert(runV("CREATE ()-[:R]->()").isEmpty)
    val afterRel = runV("RETURN 1")
    assert(afterRel.isDefined, "new reltype must bump the version")
    version = afterRel.get
    assert(runV("CREATE ()-[:R]->()").isEmpty)
    assert(runV("RETURN 1").isEmpty)

    // ── test03: attribute keys ────────────────────────────────────────────
    assert(runV("CREATE ({v: 1})").isEmpty)
    val afterAttr = runV("RETURN 1")
    assert(afterAttr.isDefined, "new node attribute must bump the version")
    version = afterAttr.get
    // existing attribute on a node: no change
    assert(runV("CREATE ({v: 1})").isEmpty)
    // new attribute introduced on an EDGE: bumps
    assert(runV("CREATE ()-[:R {q: 1}]->()").isEmpty)
    val afterEdgeAttr = runV("RETURN 1")
    assert(afterEdgeAttr.isDefined, "new edge attribute must bump")
    version = afterEdgeAttr.get
    // edge reusing a node-introduced attribute key: no change (the
    // reference's attribute map is graph-global, not per-entity-kind)
    assert(runV("CREATE ()-[:R {v: 1}]->()").isEmpty)
    assert(runV("RETURN 1").isEmpty)
  }

  test("version argument validation and determinism") {
    val g = new Graft(spark)
    // negative versions are a parse error (reference _read_flags)
    intercept[IllegalArgumentException] {
      g.query("gv2", "RETURN 1", Map.empty, -1L)
    }
    // same statement sequence on two graphs ⇒ same version (the
    // cluster-wide replica guarantee the reference gets from seeded hash)
    g.query("gv3", "CREATE (:A {x: 1})-[:T]->(:B)")
    g.query("gv4", "CREATE (:A {x: 1})-[:T]->(:B)")
    assert(g.graphVersion("gv3") == g.graphVersion("gv4"))
    assert(g.graphVersion("gv3") != 0L)
  }
}
