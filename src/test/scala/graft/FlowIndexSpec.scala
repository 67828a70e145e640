package graft

import graft.cypher.Graft
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Port of `tests/flow/test_index_create.py`: index-DDL accounting — each
  * property is its own index, `indices_created` counts only the NEW ones,
  * and duplicates (pre-existing or repeated within one statement) are
  * no-ops.
  */
class FlowIndexSpec extends AnyFunSuite {
  import SparkTestSession._

  private def created(df: DataFrame): Long =
    df.select("indices_created").head().getLong(0)

  test("test01 fulltext index creation counts new per-property indexes") {
    val g = new Graft(spark)
    val id = "index_ft"
    def c(call: String): Long = created(g.query(id, call))
    // create an index over L:v0
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v0')") == 1L)
    // create an index over L:v1
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v1')") == 1L)
    // L:v1 exists, L:v2 is new
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v1', 'v2')") == 1L)
    // all of v0, v1, v2 exist
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v0', 'v1', 'v2')")
      == 0L)
    // order doesn't matter
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v2', 'v1', 'v0')")
      == 0L)
    // two new properties at once
    assert(c("CALL db.idx.fulltext.createNodeIndex('L', 'v3', 'v4')") == 2L)
  }

  test("test02 multi-property exact-match index creation counts") {
    val g = new Graft(spark)
    val id = "index_em"
    def c(ddl: String): Long = created(g.query(id, ddl))
    // index over person:age and person:name
    assert(c("CREATE INDEX ON :person(age, name)") == 2L)
    // both already exist
    assert(c("CREATE INDEX ON :person(age, name)") == 0L)
    // only height is new (age repeated within the statement too)
    assert(c("CREATE INDEX ON :person(age, age, name, height)") == 1L)
    // only gender is new (gender repeated within the statement)
    assert(c("CREATE INDEX ON :person(gender, gender, name, height)") == 1L)
  }

  test("index DDL error shapes: drop missing, duplicate drops") {
    val g = new Graft(spark)
    val id = "index_err"
    g.query(id, "CREATE (:P {v: 1})")
    assert(created(g.query(id, "CREATE INDEX ON :P(v)")) == 1L)
    // deleting an index reports -... via indices_deleted; a second drop
    // of the same index is a no-op (0 deleted)
    val d1 = g.query(id, "DROP INDEX ON :P(v)")
    assert(d1.select("indices_deleted").head().getLong(0) == 1L)
    val d2 = g.query(id, "DROP INDEX ON :P(v)")
    assert(d2.select("indices_deleted").head().getLong(0) == 0L)
  }
}
