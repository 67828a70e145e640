package graft

import graft.cypher.CypherSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

/** Mutation fuzzer — the write-path companion of [[FuzzSpec]] (the
  * reference covers these invariants example-by-example in its flow tests,
  * e.g. the merge/update/delete suites under `tests/flow/`; here they are
  * enforced METAMORPHICALLY over generated statement sequences):
  *
  *   1. **statistics ≡ graph delta**: after every statement, the session's
  *      reported `nodes_created/deleted` and `relationships_created/
  *      deleted` counters, folded into a test-side model, equal the live
  *      `count(n)` / `count(r)` of the graph — the statistics row can
  *      never drift from the data;
  *   2. **merge idempotence**: re-running the SAME `MERGE` statement
  *      creates nothing (`nodes_created = relationships_created = 0`) and
  *      leaves both counts unchanged;
  *   3. **delete-then-count**: after `[DETACH] DELETE` by predicate, a
  *      `MATCH` with the same predicate finds zero rows, and a DETACH'd
  *      node leaves no dangling edges (edge count equals the model);
  *   4. **set visibility**: `SET n.mark = k` reports `properties_set` equal
  *      to the matched row count, and the new value is immediately readable
  *      by an equality filter on the same session;
  *   5. **no-op soundness**: a mutation whose MATCH finds nothing reports
  *      all-zero statistics and changes no counts.
  *
  * Deterministic (fixed ScalaCheck seeds → identical corpus every run).
  * Each case runs an independent CypherSession (mutations are
  * session-scoped state); 4 worker threads exercise concurrent sessions
  * over one SparkSession, ≥500 generated statements total.
  */
class MutationFuzzSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Cases = 40
  private val StepsPerCase = 13 // ≥ 520 generated statements

  // ───────────────────────── statement generator ──────────────────────────

  /** One generated mutation step: the statement plus its invariant class. */
  private sealed trait Step { def text: String }
  private case class Create(text: String) extends Step
  private case class CreateEdge(text: String) extends Step
  private case class MergeStmt(text: String) extends Step
  private case class SetMark(text: String, pred: String, k: Int) extends Step
  private case class DeleteEdge(text: String, pred: String) extends Step
  private case class DetachNode(text: String, pred: String) extends Step
  private case class Noop(text: String) extends Step

  private val genK = Gen.choose(0, 9)

  private val genStep: Gen[Step] = Gen.frequency(
    3 -> genK.map(k => Create(
      s"CREATE (:N {num: $k, name: 'x$k'})")),
    2 -> Gen.zip(genK, genK).map { case (k1, k2) => CreateEdge(
      s"MATCH (a:N {num: $k1}), (b:M {num: $k2}) " +
        s"CREATE (a)-[:R {w: ${k1 + k2}}]->(b)") },
    2 -> genK.map(k => MergeStmt(s"MERGE (x:N {num: $k})")),
    1 -> genK.map(k => MergeStmt(
      s"MERGE (x:M {num: $k}) ON CREATE SET x.fresh = true " +
        "ON MATCH SET x.seen = true")),
    1 -> Gen.zip(genK, genK).map { case (k1, k2) => MergeStmt(
      s"MATCH (a:N {num: $k1}), (b:M {num: $k2}) " +
        s"MERGE (a)-[:R {w: 777}]->(b)") },
    2 -> Gen.zip(genK, Gen.choose(0, 2)).map { case (k, m) =>
      SetMark(s"MATCH (n:N) WHERE n.num % 3 = $m SET n.mark = $k",
        s"n.mark = $k AND n.num % 3 = $m", k) },
    1 -> genK.map(k => SetMark(
      s"MATCH (n:M) WHERE n.num = $k SET n += {tag: 't$k'}",
      s"n.tag = 't$k' AND n.num = $k", k)),
    1 -> genK.map(k => SetMark(
      s"MATCH ()-[r:R]->() WHERE r.w = $k SET r.seen = $k",
      s"__edge_pred r.seen = $k AND r.w = $k", k)),
    1 -> genK.map(k => SetMark(
      s"MATCH (n:N) WHERE n.num = $k SET n.mark = null",
      s"__removed n.mark IS NULL AND n.num = $k", k)),
    2 -> genK.map(k => DeleteEdge(
      s"MATCH ()-[r:R]->() WHERE r.w = $k DELETE r", s"r.w = $k")),
    1 -> genK.map(k => DetachNode(
      s"MATCH (n:M) WHERE n.num = $k DETACH DELETE n", s"n.num = $k")),
    1 -> Gen.const(Noop(
      "MATCH (n:Ghost) WHERE n.num = -999 DETACH DELETE n")))

  // ────────────────────────────── harness ─────────────────────────────────

  private case class Stats(nc: Long, rc: Long, ps: Long, nd: Long, rd: Long)

  private def runStats(s: CypherSession, q: String): Stats = {
    val r = s.run(q).collect().head
    Stats(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
  }

  private def nodeCount(s: CypherSession): Long =
    s.rows(s.run("MATCH (n) RETURN count(n) AS n")).head("n")
      .asInstanceOf[Long]
  private def edgeCount(s: CypherSession): Long =
    s.rows(s.run("MATCH ()-[r]->() RETURN count(r) AS n")).head("n")
      .asInstanceOf[Long]

  private def runCase(caseId: Int, steps: Seq[Step],
      failures: ConcurrentLinkedQueue[String]): Unit = {
    val s = new CypherSession(spark)
    // seed graph: 6 N nodes, 6 M nodes, 6 R edges
    s.run("""UNWIND range(0, 5) AS i
            |CREATE (:N {num: i})-[:R {w: i}]->(:M {num: i})""".stripMargin)
    var nodes = 12L
    var edges = 6L
    steps.zipWithIndex.foreach { case (step, i) =>
      val label = s"case $caseId step $i: ${step.text}"
      try {
        val st = runStats(s, step.text)
        nodes += st.nc - st.nd
        edges += st.rc - st.rd
        // invariant 1: statistics fold ≡ live graph counts, every step
        val (n, e) = (nodeCount(s), edgeCount(s))
        assert(n == nodes, s"node count $n != model $nodes")
        assert(e == edges, s"edge count $e != model $edges")
        step match {
          case MergeStmt(text) =>
            // invariant 2: merge idempotence (second run creates nothing;
            // ON MATCH SET may set properties, counts must hold)
            val st2 = runStats(s, text)
            assert(st2.nc == 0 && st2.rc == 0,
              s"re-MERGE created ${st2.nc} nodes / ${st2.rc} rels")
            assert(nodeCount(s) == nodes && edgeCount(s) == edges,
              "re-MERGE changed counts")
          case SetMark(_, pred, _) if pred.startsWith("__edge_pred ") =>
            // edge SET visibility: the written edge property is readable
            // through a relationship pattern on the same session
            val p = pred.stripPrefix("__edge_pred ")
            val vis = s.rows(s.run(
              s"MATCH ()-[r:R]->() WHERE $p RETURN count(r) AS n"))
              .head("n").asInstanceOf[Long]
            assert(st.ps >= vis,
              s"properties_set ${st.ps} < visible edge-marked rows $vis")
          case SetMark(_, pred, _) if pred.startsWith("__removed ") =>
            // SET n.p = null REMOVES the property: every matched node must
            // read the property as NULL immediately after
            val p = pred.stripPrefix("__removed ")
            val matched = s.rows(s.run(
              s"MATCH (n:N) WHERE ${p.replaceFirst("n\\.mark IS NULL AND ", "")} " +
                "RETURN count(n) AS n")).head("n").asInstanceOf[Long]
            val nulled = s.rows(s.run(
              s"MATCH (n:N) WHERE $p RETURN count(n) AS n"))
              .head("n").asInstanceOf[Long]
            assert(nulled == matched,
              s"property removal not visible: $nulled of $matched null")
          case SetMark(_, pred, _) =>
            // invariant 4: the SET is visible to an immediate read, and
            // properties_set covered every matched row
            val vis = s.rows(s.run(
              s"MATCH (n) WHERE ${pred.replace("r.", "n.")} " +
                "RETURN count(n) AS n")).head("n").asInstanceOf[Long]
            assert(st.ps >= vis,
              s"properties_set ${st.ps} < visible marked rows $vis")
          case DeleteEdge(_, pred) =>
            val left = s.rows(s.run(
              s"MATCH ()-[r:R]->() WHERE $pred RETURN count(r) AS n"))
              .head("n").asInstanceOf[Long]
            assert(left == 0, s"deleted-edge predicate still matches $left")
          case DetachNode(_, pred) =>
            val left = s.rows(s.run(
              s"MATCH (n:M) WHERE $pred RETURN count(n) AS n"))
              .head("n").asInstanceOf[Long]
            assert(left == 0, s"detach-deleted predicate still matches $left")
          case Noop(_) =>
            // invariant 5
            assert(st == Stats(0, 0, 0, 0, 0), s"no-op reported $st")
          case _ => ()
        }
      } catch {
        case e: Throwable =>
          failures.add(s"$label\n  -> ${Option(e.getMessage)
            .getOrElse(e.getClass.getName).linesIterator.take(2)
            .mkString(" / ").take(300)}")
      }
    }
  }

  test("concurrent writers on ONE session: racing point writes + general " +
    "mutations serialize without lost updates") {
    // the single-writer discipline (reference `cmd_query.c:156-170`: one
    // graph, many clients, writers serialized) fuzzed with REAL thread
    // interleavings: 8 threads × 32 statements against one session, mixing
    // the point-write overlay (SET by id, point DELETE), general commits
    // (CREATE folds the overlay into a snapshot mid-race), and a SHARED
    // MERGE pattern (atomicity: racing merges of the same key must create
    // exactly one node). Assertions are interleaving-independent.
    val s = new CypherSession(spark)
    s.run("UNWIND range(0, 3) AS i CREATE (:Hot {v: 0, slot: i})")
    val hotIds = s.rows(s.run("MATCH (h:Hot) RETURN h.slot AS s, id(h) AS i"))
      .map(r => r("s").asInstanceOf[Long] -> r("i").asInstanceOf[Long])
      .toMap
    val T = 8
    val OpsPerThread = 32 // ≥ 256 interleaved statements
    sealed trait COp
    case class Inc(slot: Long) extends COp
    case class CreateOwn(i: Int) extends COp
    case class DeleteOwn(i: Int) extends COp // deletes own earlier create
    case class SharedMerge(k: Int) extends COp
    val genOp: Gen[COp] = Gen.frequency(
      5 -> Gen.choose(0L, 3L).map(Inc),
      3 -> Gen.choose(0, 1000).map(CreateOwn),
      1 -> Gen.const(DeleteOwn(0)),
      2 -> Gen.choose(0, 2).map(SharedMerge))
    val params = Gen.Parameters.default
    val plans: Seq[(Int, Seq[COp])] = (0 until T).map { t =>
      (t, (0 until OpsPerThread).flatMap(i =>
        genOp.apply(params, Seed(7000L * t + i))))
    }
    val failures = new ConcurrentLinkedQueue[String]()
    val pool = Executors.newFixedThreadPool(T)
    val results = new ConcurrentLinkedQueue[(Int, Int, Int)]() // t, created, deleted
    plans.foreach { case (t, ops) =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          var created = List.empty[Int]
          var nCreated = 0
          var nDeleted = 0
          ops.zipWithIndex.foreach { case (op, i) =>
            try op match {
              case Inc(slot) =>
                s.run(s"MATCH (n) WHERE id(n) = ${hotIds(slot)} " +
                  "SET n.v = n.v + 1")
              case CreateOwn(k) =>
                s.run(s"CREATE (:C$t {i: ${t * 100000 + i}, k: $k})")
                created ::= t * 100000 + i
                nCreated += 1
              case DeleteOwn(_) => created match {
                case h :: rest =>
                  s.run(s"MATCH (n:C$t {i: $h}) DELETE n")
                  created = rest
                  nDeleted += 1
                case Nil => ()
              }
              case SharedMerge(k) =>
                s.run(s"MERGE (:Shared {k: $k})")
            } catch {
              case e: Throwable => failures.add(
                s"thread $t op $i $op -> ${Option(e.getMessage)
                  .getOrElse(e.getClass.getName).take(200)}")
            }
          }
          results.add((t, nCreated, nDeleted))
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES),
      "concurrent fuzz pool timed out")
    import scala.jdk.CollectionConverters._
    assert(failures.isEmpty, s"${failures.size} racing statements failed; " +
      s"first 3:\n${failures.asScala.take(3).mkString("\n")}")
    // no lost updates: every Inc landed exactly once per its slot
    val incs = plans.flatMap(_._2).collect { case Inc(sl) => sl }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vNow = s.rows(s.run("MATCH (h:Hot) RETURN h.slot AS s, h.v AS v"))
      .map(r => r("s").asInstanceOf[Long] -> r("v").asInstanceOf[Long])
      .toMap
    incs.foreach { case (slot, n) =>
      assert(vNow(slot) == n, s"slot $slot: ${vNow(slot)} != $n increments")
    }
    // racing MERGEs of one key created exactly one node per distinct key
    val sharedKeys = plans.flatMap(_._2).collect { case SharedMerge(k) => k }
      .toSet
    val sharedCount = s.rows(s.run(
      "MATCH (x:Shared) RETURN count(x) AS c")).head("c")
    assert(sharedCount == sharedKeys.size.toLong,
      s"shared MERGE atomicity: $sharedCount nodes for " +
        s"${sharedKeys.size} keys")
    // per-thread net creates (interleaving-independent: own label)
    results.asScala.foreach { case (t, nc, nd) =>
      val n = s.rows(s.run(s"MATCH (n:C$t) RETURN count(n) AS c")).head("c")
      assert(n == (nc - nd).toLong, s"thread $t: $n != ${nc - nd}")
    }
    // statistics ≡ data after the race: stats-served count vs full scan
    val scanN = s.rows(s.run("MATCH (n) RETURN count(n) AS c")).head("c")
      .asInstanceOf[Long]
    val model = 4L + sharedKeys.size +
      results.asScala.map { case (_, nc, nd) => (nc - nd).toLong }.sum
    assert(scanN == model, s"post-race node count $scanN != model $model")
  }

  test(s"mutation fuzz: $Cases sessions x $StepsPerCase generated " +
    "statements, statistics == graph delta") {
    val params = Gen.Parameters.default
    val cases = (0 until Cases).map { c =>
      (c, (0 until StepsPerCase).flatMap { i =>
        genStep.apply(params, Seed(1000L * c + i)) // deterministic corpus
      })
    }
    assert(cases.map(_._2.size).sum >= Cases * StepsPerCase * 95 / 100,
      "generator mostly total")
    val failures = new ConcurrentLinkedQueue[String]()
    val pool = Executors.newFixedThreadPool(4)
    cases.foreach { case (c, steps) =>
      pool.submit(new Runnable {
        override def run(): Unit = runCase(c, steps, failures)
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(20, TimeUnit.MINUTES),
      "mutation fuzz pool timed out")
    import scala.jdk.CollectionConverters._
    val fs = failures.asScala.toSeq
    assert(fs.isEmpty,
      s"${fs.size} mutation fuzz steps failed; first 5:\n" +
        fs.take(5).mkString("\n\n"))
  }
}
