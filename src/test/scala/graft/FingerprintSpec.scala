package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native codegen'd `graft_fingerprint`
  * ([[graft.plans.Fingerprint]]) value-identical to the composed
  * higher-order pipeline it replaced in [[graft.text.TextOps.fingerprint]]
  * — the optimization must not move a single hash value (q_doc_fingerprint
  * is a rows+schema+hash oracle gate).
  */
class FingerprintSpec extends AnyFunSuite {
  import SparkTestSession._

  /** The pre-optimization formulation, verbatim. */
  private def composed(text: org.apache.spark.sql.Column) =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  test("native fingerprint ≡ composed HOF pipeline on edge-case strings") {
    import SparkTestSession.implicits._
    val rows = Seq(
      "hello world",
      "", // split("") = [""], ascii("") = 0 → fp 0
      "a",
      "Ä ö mixed ümlauts",       // 2-byte UTF-8
      "日本語テキスト",            // 3-byte UTF-8
      "astral 😀 pair", // surrogate pair (single code point)
      "  leading and trailing  ",
      "punct!?;:,.",
      (1 to 500).map(i => s"tok$i").mkString(" ")) // long doc
    val df = rows.toDF("text")
    val got = df.select(
      graft.text.TextOps.fingerprint(col("text")).as("native"),
      composed(col("text")).as("composed")).collect()
    got.zip(rows).foreach { case (r, s) =>
      assert(r.getLong(0) == r.getLong(1),
        s"fingerprint mismatch for '$s': native=${r.getLong(0)} " +
          s"composed=${r.getLong(1)}")
    }
  }

  test("native fingerprint is NULL for NULL text (composed parity)") {
    import SparkTestSession.implicits._
    val df = Seq(Option("x"), None).toDF("text")
    val got = df.select(
        graft.text.TextOps.fingerprint(col("text")).as("native"),
        composed(col("text")).as("composed"))
      .collect()
    got.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("fingerprint matches on the sf0.001 documents corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        graft.text.TextOps.fingerprint(col("text")).as("native"),
        composed(col("text")).as("composed"))
      .filter(!(col("native") <=> col("composed")))
      .count()
    assert(diff == 0L)
  }
}
