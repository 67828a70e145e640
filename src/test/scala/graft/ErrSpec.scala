package graft

import graft.cypher.{CypherSession, Translator}
import org.scalatest.funsuite.AnyFunSuite

/** Error-path parity: the reference rejects invalid queries at compile time
  * (`src/ast/ast_validations.c`) and treats missing properties as NULL
  * (`graph_entity.h:24,76` PROPERTY_NOTFOUND ≡ NULL).
  */
class ErrSpec extends AnyFunSuite {
  import SparkTestSession._

  private def err(s: CypherSession, q: String): String =
    intercept[Translator.TranslateError](s.run(q).collect()).getMessage

  test("compile-time rejections carry specific messages") {
    val s = new CypherSession(spark)
    s.run("CREATE (:E {v: 1})")
    assert(err(s, "MATCH (a:E) RETURN b").contains("b not defined"))
    assert(err(s, "MATCH (a:E) RETURN nosuchfn(a.v)")
      .contains("unknown function: nosuchfn"))
    assert(err(s, "CALL db.nope() YIELD x RETURN x")
      .contains("unknown procedure: db.nope"))
    assert(err(s, "MATCH (a:E RETURN a").contains("parse error"))
  }

  test("missing property is NULL, not an error (PROPERTY_NOTFOUND)") {
    val s = new CypherSession(spark)
    s.run("CREATE (:E {v: 1})")
    val r = s.rows(s.run("MATCH (a:E) RETURN a.nosuch AS x"))
    assert(r == Seq(Map("x" -> null)))
  }
}
