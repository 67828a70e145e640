package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query executes on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      withClue(s"$name: ") { assert(n >= 0) }
    }
  }

  test("oracle entries only exist for registered queries") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
  }

  // ── plan-shape assertions (scale hygiene) ─────────────────────────────────
  private def executedPlan(name: String): SparkPlan =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan

  test("q_scan_project pushes filters into the parquet scan") {
    val plan = executedPlan("q_scan_project").toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("GreaterThan(l_discount"), plan)
    // column pruning: only the referenced columns are read
    assert(!plan.contains("l_shipdate"), plan)
  }

  test("q_expand_join broadcasts the nation dim") {
    val plan = executedPlan("q_expand_join").toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("q_topk compiles to TakeOrderedAndProject (no full sort)") {
    val plan = executedPlan("q_topk").toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q_semi_join plans a semi join, not inner+distinct") {
    val plan = executedPlan("q_semi_join").toString
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q1_agg uses partial aggregation (map-side combine)") {
    val plan = executedPlan("q1_agg").toString
    assert(plan.contains("partial_"), plan)
  }
}
