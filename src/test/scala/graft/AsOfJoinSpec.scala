package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

/** AsOfJoin semantics: most-recent-at-or-before pick, >= tie handling,
  * null for rows with no prior right row, key isolation.
  */
class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bandJoin matches exactly the rows within ±band, once each") {
    import SparkTestSession.implicits._
    import graft.operators.RangeJoin
    val left = Seq((1L, "u", 100L), (2L, "u", 500L), (3L, "v", 100L))
      .toDF("id", "k", "t")
    // right rows at 95 (in band of l1), 210 (out), 410/499/600 around l2
    val right = Seq(("u", 95L), ("u", 210L), ("u", 410L), ("u", 499L),
      ("u", 600L), ("w", 100L)).toDF("k", "t")
    val out = RangeJoin.bandJoin(left, right, "k", "t", band = 100L)
      .groupBy("id").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.col("range_ts")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 3L, 3L -> 0L))
  }

  test("picks latest right row at-or-before each left ts, per key") {
    import SparkTestSession.implicits._
    val left = Seq(
      (1L, "u1", 10L), (2L, "u1", 20L), (3L, "u1", 5L),
      (4L, "u2", 10L)).toDF("id", "k", "t")
    val right = Seq(
      ("u1", 10L, 1.0), ("u1", 15L, 2.0),
      ("u2", 99L, 9.0)).toDF("k", "t", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("v"))
      .select("id", "asof_v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0)) // tie: left t=10 sees right t=10 (>=)
    assert(out(2L) == Some(2.0)) // latest of {10, 15} before 20
    assert(out(3L) == None)      // no right row at or before t=5
    assert(out(4L) == None)      // u2's only right row is later
  }

  test("a matched right row with NULL payload yields NULL, not an older value") {
    import SparkTestSession.implicits._
    val left = Seq((1L, "u", 12L)).toDF("id", "k", "t")
    val right = Seq(
      ("u", 5L, Some(7.0)), ("u", 10L, None)).toDF("k", "t", "v")
    // ASOF picks the t=10 row whose v IS NULL — per-column carry-forward
    // would leak 7.0 from t=5 (DuckDB ASOF JOIN divergence)
    val out = AsOfJoin.leftAsOf(left, right, "k", "t", Seq("v"))
      .select("asof_v").head()
    assert(out.isNullAt(0))
  }
}
