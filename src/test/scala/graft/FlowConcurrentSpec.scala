package graft

import graft.cypher.Graft
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_concurrent_query.py` (the engine-level
  * scenarios: 01 concurrent aggregation, 02 concurrent neighbors, 03
  * concurrent writes, 04 concurrent GRAPH.DELETE with exactly one winner,
  * 05's GRAPH.DELETE-under-readers variant, 09 multiple readers after a
  * big write). Tests 05's Redis DEL/FLUSHALL arms and 06-08 race Redis
  * KEYSPACE commands (RENAME / SET over the module key) — there is no
  * keyspace here, so they have no analogue.
  */
class FlowConcurrentSpec extends AnyFunSuite {
  import SparkTestSession._

  private val People =
    Seq("Roi", "Alon", "Ailon", "Boaz", "Tal", "Omri", "Ori")
  private val ClientCount = 16

  private def populate(g: Graft, gid: String): Unit = {
    g.query(gid, People.map(p => s"(:person {name:'$p'})")
      .mkString("CREATE ", ", ", ""))
    g.query(gid,
      """MATCH (a:person), (b:person) WHERE a.name <> b.name
        |CREATE (a)-[:know]->(b)""".stripMargin)
  }

  /** Run `body` on ClientCount threads; returns per-thread outcomes. */
  private def fanOut[A](body: Int => A): Seq[Either[Throwable, A]] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(ClientCount)
    val fs = (0 until ClientCount).map { i =>
      pool.submit(new java.util.concurrent.Callable[Either[Throwable, A]] {
        override def call(): Either[Throwable, A] =
          try Right(body(i)) catch { case t: Throwable => Left(t) }
      })
    }
    val out = fs.map(_.get())
    pool.shutdown()
    out
  }

  test("01/02 concurrent aggregation and neighbor reads stay consistent") {
    val g = new Graft(spark)
    val gid = "conc_read"
    populate(g, gid)
    val sess = g.sessionFor(gid)
    val agg = fanOut { _ =>
      (1 to 3).forall { _ =>
        sess.rows(g.query(gid, "MATCH (p:person) RETURN count(p) AS c"))
          .head("c") == People.length.toLong
      }
    }
    assert(agg.forall(_ == Right(true)), agg.filter(_.isLeft).toString)
    val expected = People.length * (People.length - 1)
    val nbr = fanOut { _ =>
      (1 to 3).forall { _ =>
        sess.rows(g.query(gid,
          "MATCH (p:person)-[know]->(n:person) RETURN n.name AS name"))
          .length == expected
      }
    }
    assert(nbr.forall(_ == Right(true)), nbr.filter(_.isLeft).toString)
  }

  test("03 concurrent writes: every CREATE lands with its stats") {
    val g = new Graft(spark)
    val gid = "conc_write"
    populate(g, gid)
    val sess = g.sessionFor(gid)
    val res = fanOut { i =>
      (1 to 3).forall { _ =>
        val st = sess.rows(g.query(gid, s"""CREATE (c:country {id:"$i"})"""))
        st.head("nodes_created") == 1L && st.head("properties_set") == 1L
      }
    }
    assert(res.forall(_ == Right(true)), res.filter(_.isLeft).toString)
    assert(sess.rows(g.query(gid,
      "MATCH (c:country) RETURN count(c) AS c")).head("c") ==
      (ClientCount * 3).toLong)
  }

  test("04 concurrent GRAPH.DELETE: exactly one winner") {
    val g = new Graft(spark)
    val gid = "conc_del"
    populate(g, gid)
    val res = fanOut(_ => g.deleteIfExists(gid))
    assert(res.count(_ == Right(true)) == 1, res.toString)
  }

  test("05 GRAPH.DELETE while readers execute: reads complete, graph empty") {
    val g = new Graft(spark)
    val gid = "conc_read_del"
    populate(g, gid)
    val sess = g.sessionFor(gid)
    val q = "UNWIND (range(0, 10000)) AS x WITH x AS x " +
      "WHERE (x / 900) = 1 RETURN x"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(ClientCount)
    val fs = (0 until ClientCount).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Seq[Map[String, Any]]] {
        override def call(): Seq[Map[String, Any]] =
          sess.rows(g.query(gid, q))
      })
    }
    g.delete(gid)
    val outs = fs.map(_.get())
    pool.shutdown()
    // every reader finished with the expected first row (900..1799 pass
    // the filter; the reference asserts the first value)
    outs.foreach(rows => assert(rows.head("x") == 900L, rows.take(2)))
    // the graph is gone — a fresh session answers 0
    assert(g.sessionFor(gid).rows(
      g.query(gid, "MATCH (n) RETURN count(n) AS c")).head("c") == 0L)
  }

  test("09 multiple readers after a big write (reference issue #890)") {
    val g = new Graft(spark)
    val gid = "conc_890"
    g.query(gid, "UNWIND (range(0,999)) AS x CREATE ()-[:R]->()")
    val sess = g.sessionFor(gid)
    val res = fanOut { _ =>
      sess.rows(g.query(gid, "MATCH (n)-[r:R]->(m) RETURN n, r, m")).length
    }
    assert(res.forall(_ == Right(1000)), res.filter(_ != Right(1000)).toString)
  }
}
