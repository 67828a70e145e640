package graft

import graft.cypher.CypherSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.{ConcurrentLinkedQueue, Executors, TimeUnit}

/** Random-query fuzzer — the ScalaCheck analogue of the reference's query
  * fuzz harness (`tests/fuzz/`): generate random pattern/predicate/
  * projection trees over a small seeded graph and check METAMORPHIC
  * invariants that must hold for ANY read query, rather than fixed
  * expected values:
  *
  *   1. the query runs (every generated query is inside the declared
  *      surface — any crash is an engine bug);
  *   2. `LIMIT n` returns `min(n, |Q|)` rows;
  *   3. `DISTINCT` never increases the row count and is idempotent;
  *   4. appending `AND false` to the WHERE yields zero rows;
  *   5. `RETURN count(*)` equals the materialized row count;
  *   6. demoting the pattern tail to OPTIONAL MATCH never reduces the
  *      row count below either the anchor count or the strict-match
  *      count.
  *
  * Deterministic: queries are drawn from a fixed ScalaCheck seed, so the
  * gate replays the identical corpus every run (a found bug stays
  * reproducible; new randomness belongs in a bumped seed, not a flaky
  * gate). 8 worker threads over one immutable graph session — read-only
  * queries share the translator safely, as the TCK runner does.
  */
class FuzzSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Cases = 200 // x5 derived queries per case = 1000 queries

  private lazy val sess: CypherSession = {
    val s = new CypherSession(spark)
    // small dense graph: 3 labels, 2 rel types, fan-out, prop-less nodes,
    // numeric + string props, parallel edges
    s.run(
      """UNWIND range(0, 9) AS i
        |CREATE (a:A {num: i, name: 'a' + toString(i % 3)})
        |       -[:R {w: i}]->
        |       (b:B {num: i * 2, name: 'b' + toString(i % 4)})
        |       -[:S {w: i % 4}]->
        |       (c:C {num: i % 5, name: 'c' + toString(i % 2)})""".stripMargin)
    s.run("MATCH (a:A), (c:C) WHERE a.num = c.num CREATE (a)-[:R {w: 99}]->(c)")
    s.run("MATCH (b:B), (a:A) WHERE b.num = a.num + 4 CREATE (b)-[:S {w: -1}]->(a)")
    s.run("CREATE (:A), (:B), (:C {num: 42})") // prop-less / outlier nodes
    s
  }

  // ─────────────────────────── query generator ───────────────────────────

  private case class Q(matchPat: String, anchorPat: String,
      tailPat: Option[String], where: Option[String], items: Seq[String],
      orderBy: Option[String], vars: Seq[String])

  private val genLabel = Gen.option(Gen.oneOf("A", "B", "C"))
  private val genRelType = Gen.option(Gen.oneOf("R", "S"))

  private def nodePat(v: String, label: Option[String]): String =
    label.map(l => s"($v:$l)").getOrElse(s"($v)")

  private def relPat(e: String, t: Option[String], varLen: Boolean,
      left: Boolean): String = {
    val ty = t.map(":" + _).getOrElse("")
    val vl = if (varLen) "*1..2" else ""
    val body = if (ty.isEmpty && vl.isEmpty) "" else s"[$e$ty$vl]"
    if (left) s"<-$body-" else s"-$body->"
  }

  private def genPred(vars: Seq[String]): Gen[String] = {
    val simple = for {
      v <- Gen.oneOf(vars)
      p <- Gen.frequency(
        4 -> Gen.choose(-1, 12).map(k => s"$v.num < $k"),
        3 -> Gen.choose(0, 9).map(k => s"$v.num = $k"),
        2 -> Gen.oneOf("a", "b", "c").flatMap(pfx =>
          Gen.choose(0, 3).map(k => s"$v.name = '$pfx$k'")),
        2 -> Gen.const(s"$v.num IS NULL"),
        2 -> Gen.const(s"$v.num IS NOT NULL"),
        1 -> Gen.choose(0, 4).map(k => s"$v.num % 3 = $k % 3"))
    } yield p
    Gen.frequency(
      5 -> simple,
      2 -> Gen.zip(simple, simple).map { case (a, b) => s"($a AND $b)" },
      2 -> Gen.zip(simple, simple).map { case (a, b) => s"($a OR $b)" },
      1 -> simple.map(p => s"(NOT $p)"))
  }

  private val genQ: Gen[Q] = for {
    hops <- Gen.frequency(3 -> 0, 4 -> 1, 3 -> 2)
    labels <- Gen.listOfN(hops + 1, genLabel)
    types <- Gen.listOfN(hops, genRelType)
    lefts <- Gen.listOfN(hops, Gen.prob(0.3))
    varLens <- Gen.listOfN(hops, Gen.prob(0.15))
    vars = (0 to hops).map(i => s"v$i")
    anchor = nodePat("v0", labels.head)
    tail = (0 until hops).map { i =>
      relPat(s"e$i", types(i), varLens(i), lefts(i)) +
        nodePat(s"v${i + 1}", labels(i + 1))
    }.mkString
    where <- Gen.option(genPred(vars))
    nItems <- Gen.choose(1, 3)
    rawItems <- Gen.listOfN(nItems,
      Gen.oneOf[Gen[String]](
        Gen.oneOf(vars).map(v => s"$v.num"),
        Gen.oneOf(vars).map(v => s"$v.name"),
        Gen.oneOf(vars).map(v => s"id($v)"),
        Gen.oneOf(vars).map(v => s"labels($v)"),
        // arithmetic / conditional projections: variant arithmetic kernels
        // and CASE under the zero-fallback codegen gate
        Gen.zip(Gen.oneOf(vars), Gen.oneOf(vars)).map {
          case (a, b) => s"$a.num + $b.num * 2"
        },
        Gen.oneOf(vars).map(v =>
          s"CASE WHEN $v.num > 4 THEN 'hi' ELSE $v.name END"),
        Gen.oneOf(vars).map(v => s"coalesce($v.num, -1)"),
        Gen.oneOf(vars).map(v => s"size($v.name)")).flatMap(g => g))
    items = rawItems.zipWithIndex.map { case (it, i) => s"$it AS c$i" }
    orderBy <- Gen.option(
      Gen.choose(0, rawItems.size - 1).map(i => s"c$i"))
  } yield Q(anchor + tail, anchor, if (hops == 0) None else Some(tail),
    where, items, orderBy, vars)

  private def text(q: Q, distinct: Boolean = false,
      limit: Option[Int] = None, extraAnd: Option[String] = None,
      countStar: Boolean = false): String = {
    val whereParts = q.where.toSeq ++ extraAnd.toSeq
    val whereCl =
      if (whereParts.isEmpty) "" else s" WHERE ${whereParts.mkString(" AND ")}"
    val ret =
      if (countStar) "count(*) AS n"
      else (if (distinct) "DISTINCT " else "") + q.items.mkString(", ")
    val order =
      if (countStar) ""
      else q.orderBy.filter(_ => limit.isDefined) // order only with limit
        .map(o => s" ORDER BY $o").getOrElse("")
    val lim = limit.map(n => s" LIMIT $n").getOrElse("")
    s"MATCH ${q.matchPat}$whereCl RETURN $ret$order$lim"
  }

  private def optionalText(q: Q): Option[String] = q.tailPat.map { tail =>
    val whereCl = q.where.map(w => s" WHERE $w").getOrElse("")
    // WHERE after OPTIONAL MATCH filters the expansion (engine semantics:
    // predicate belongs to the optional part)
    s"MATCH ${q.anchorPat} OPTIONAL MATCH (v0)$tail$whereCl " +
      s"RETURN ${q.items.mkString(", ")}"
  }

  test("store round-trip: restored typed-column graph answers the fuzz " +
    "corpus identically to the in-memory graph") {
    // the GraphStore unfold/rebuild path (typed native columns, literal
    // re-baked tags, map_filter props view) fenced BROADLY: 100 generated
    // pattern/predicate/projection trees must return the same multiset of
    // rows from the restored graph as from the live one — including the
    // prop-less nodes (null storage columns ⇒ absent keys) and IS NULL
    // predicates over them
    val params = Gen.Parameters.default
    val queries = (0 until 100).flatMap(i => genQ.apply(params, Seed(42L + i)))
    sess // force graph setup
    graft.graph.GraphStore.save(sess.graph, "fuzz_store", buckets = 4)
    // same zero-fallback gate as the metamorphic corpus: the stored view's
    // map_filter/typed-column plans must not silently demote to
    // interpreted eval (the suite's standing invariant)
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val stored = new CypherSession(spark)
      stored.setGraph(graft.graph.GraphStore.load(spark, "fuzz_store"))
      def canon(s: CypherSession, q: String): Seq[String] =
        s.rows(s.run(q)).map(_.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString("|")).sorted
      val failures = new ConcurrentLinkedQueue[String]()
      val pool = Executors.newFixedThreadPool(8)
      queries.foreach { q =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val t = text(q)
            try {
              val mem = canon(sess, t)
              val st = canon(stored, t)
              assert(mem == st,
                s"rows diverge: mem ${mem.size} vs stored ${st.size}; " +
                  s"first diff: ${mem.diff(st).headOption.orElse(
                    st.diff(mem).headOption)}")
            } catch {
              case e: Throwable => failures.add(s"$t\n  -> ${Option(
                e.getMessage).getOrElse(e.getClass.getName).linesIterator
                .take(2).mkString(" / ").take(300)}")
            }
          }
        })
      }
      pool.shutdown()
      assert(pool.awaitTermination(15, TimeUnit.MINUTES),
        "store-equivalence pool timed out")
      import scala.jdk.CollectionConverters._
      val fs = failures.asScala.toSeq
      assert(fs.isEmpty,
        s"${fs.size}/${queries.size} store-equivalence cases failed; " +
          s"first 5:\n${fs.take(5).mkString("\n\n")}")
    } finally {
      prevFallback match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
      graft.graph.GraphStore.drop(spark, "fuzz_store")
    }
  }

  test(s"fuzz: $Cases random query trees x 5 metamorphic invariants") {
    val params = Gen.Parameters.default
    val queries = (0 until Cases).flatMap { i =>
      genQ.apply(params, Seed(42L + i)) // deterministic corpus
    }
    assert(queries.size >= Cases * 95 / 100, "generator mostly total")
    sess // force graph setup on the main thread
    // Codegen-fallback gate: a Janino overflow silently demotes a query to
    // interpreted eval — correct results, catastrophic at scale. Running
    // the corpus with fallback DISABLED turns any such demotion into a
    // test failure (round 10: an adaptive eq dispatch put 87/1000 corpus
    // queries into interpreted eval while every value-level test stayed
    // green; this gate is what would have caught it).
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
    val failures = new ConcurrentLinkedQueue[String]()
    val pool = Executors.newFixedThreadPool(8)
    queries.foreach { q =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          val base = text(q)
          try {
            val n = sess.run(base).count()
            val lim = math.min(3L, n)
            assert(sess.run(text(q, limit = Some(3))).count() == lim,
              s"LIMIT 3 != min(3, $n)")
            val nd = sess.run(text(q, distinct = true)).count()
            assert(nd <= n, s"DISTINCT grew rows: $nd > $n")
            assert(sess.run(text(q, extraAnd = Some("false"))).count() == 0L,
              "WHERE ... AND false returned rows")
            val cs = sess.rows(sess.run(text(q, countStar = true)))
              .head("n").asInstanceOf[Long]
            assert(cs == n, s"count(*) $cs != materialized $n")
            optionalText(q).foreach { ot =>
              val anchors = sess.run(s"MATCH ${q.anchorPat} RETURN v0").count()
              val no = sess.run(ot).count()
              assert(no >= anchors,
                s"OPTIONAL rows $no < anchor rows $anchors")
              assert(no >= n, s"OPTIONAL rows $no < strict-match rows $n")
            }
          } catch {
            case e: Throwable =>
              failures.add(s"$base\n  -> ${Option(e.getMessage)
                .getOrElse(e.getClass.getName).linesIterator.take(2)
                .mkString(" / ").take(300)}")
          }
        }
      })
    }
    pool.shutdown()
    assert(pool.awaitTermination(15, TimeUnit.MINUTES), "fuzz pool timed out")
    import scala.jdk.CollectionConverters._
    val fs = failures.asScala.toSeq
    assert(fs.isEmpty,
      s"${fs.size}/${queries.size} fuzz cases failed; first 5:\n" +
        fs.take(5).mkString("\n\n"))
    } finally {
      // the session is SHARED with every later suite: a leaked
      // fallback=false would turn benign codegen overflows elsewhere into
      // hard failures
      prevFallback match {
        case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
        case None => spark.conf.unset("spark.sql.codegen.fallback")
      }
    }
  }
}
