package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's relational operator surface (SURVEY.md §2) re-expressed as
  * idiomatic Spark DataFrame plans over the TESTDATA tables, each paired with
  * a DuckDB oracle.
  *
  * Reference ops covered here (cites into /root/reference/):
  *  - AllNodeScan / NodeByLabelScan / NodeByIdSeek / IndexScan
  *    (`src/execution_plan/ops/op_all_node_scan.c`, `op_node_by_label_scan.c`,
  *    `op_node_by_id_seek.c`, `op_index_scan.c`) → parquet scans with
  *    predicate pushdown + column pruning (filters reach `PushedFilters`).
  *  - ConditionalTraverse / ExpandInto (`op_conditional_traverse.c`,
  *    `op_expand_into.c`) → equi-joins; small dims broadcast.
  *  - CartesianProduct / ValueHashJoin / Join(UNION) / Apply / SemiApply /
  *    AntiSemiApply / Optional (`op_cartesian_product.c`,
  *    `op_value_hash_join.c`, `op_join.c`, `op_apply.c`, `op_semi_apply.c`,
  *    `op_optional.c`) → crossJoin / join / unionByName / decorrelated join /
  *    left_semi / left_anti / left_outer.
  *  - Project / Aggregate / Sort / Distinct / Skip / Limit / Unwind
  *    (`op_project.c`, `op_aggregate.c`, `op_sort.c`, `op_distinct.c`,
  *    `op_skip.c`, `op_limit.c`, `op_unwind.c`) → select / groupBy.agg /
  *    orderBy (top-k = TakeOrderedAndProject) / dropDuplicates / offset /
  *    limit / explode.
  *  - Aggregate functions (`src/arithmetic/aggregate_funcs/agg_funcs.c:385-495`):
  *    sum, avg, min, max, count, collect, stDev/stDevP,
  *    percentileDisc/Cont, count(DISTINCT).
  *
  * Scale notes (100 TB target): every query here is a declarative plan —
  * Catalyst handles pushdown, partial aggregation, join strategy. Joins
  * against `nation`/`region` are explicitly `broadcast()`; fact-fact joins
  * (orders ⋈ lineitem) shuffle on the join key, which is the correct plan at
  * scale (both sides bucketed by orderkey in a production deployment). AQE
  * (enabled in the session) handles skew and post-shuffle coalescing.
  *
  * Float determinism vs the oracle: any aggregate over doubles is wrapped in
  * `round(_, k)` on BOTH sides so summation-order differences between Spark
  * and DuckDB cannot flip the comparison hash.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ── Scans / projection / filter pushdown ────────────────────────────────
    QueryDef(
      "q_scan_project",
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_discount > 0.05 AND l_quantity < 10") { (s, dir) =>
      // Filter + projection both reach the parquet scan (PushedFilters /
      // ReadSchema) — verified via .explain in RelationalSpec.
      t(s, dir, "lineitem")
        .filter(col("l_discount") > 0.05 && col("l_quantity") < 10)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    QueryDef(
      "q_id_seek",
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_orderkey BETWEEN 100 AND 120") { (s, dir) =>
      // NodeByIdSeek ≡ range predicate on the (sorted) key → row-group skip
      // via parquet min/max stats.
      t(s, dir, "orders")
        .filter(col("o_orderkey").between(100, 120))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },

    QueryDef(
      "q_label_scan",
      "SELECT c_custkey, c_name, c_acctbal FROM customer " +
        "WHERE c_mktsegment = 'BUILDING'") { (s, dir) =>
      // NodeByLabelScan ≡ categorical filter (at scale: a partition column →
      // partition pruning instead of a row filter).
      t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    },

    // ── Joins / traversal shapes ────────────────────────────────────────────
    QueryDef(
      "q_expand_join",
      """SELECT c.c_custkey, o.o_orderkey, n.n_name, o.o_totalprice
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey""".stripMargin) { (s, dir) =>
      // ConditionalTraverse: (customer)-[:placed]->(order), plus a hop to the
      // nation dim. nation is broadcast (25 rows at any SF); customer⋈orders
      // shuffles on custkey — co-partitionable/bucketable at scale.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val n = t(s, dir, "nation")
      c.join(o, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        .select(c("c_custkey"), o("o_orderkey"), n("n_name"), o("o_totalprice"))
    },

    QueryDef(
      "q_semi_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_totalprice > 200000)""".stripMargin) { (s, dir) =>
      // SemiApply / ExpandInto existence check → left_semi join (no
      // duplication, build side only carries the key).
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    QueryDef(
      "q_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
      // AntiSemiApply (`WHERE NOT (pattern)`) → left_anti join.
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    QueryDef(
      "q_optional_match",
      """SELECT c.c_custkey, CAST(coalesce(oc.cnt, 0) AS BIGINT) AS order_cnt
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey
        |) oc ON oc.o_custkey = c.c_custkey""".stripMargin) { (s, dir) =>
      // OPTIONAL MATCH → left_outer join; aggregate runs BEFORE the join
      // (partial aggregation shrinks the shuffle).
      val c = t(s, dir, "customer")
      val oc = t(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("cnt"))
      c.join(oc, c("c_custkey") === oc("o_custkey"), "left_outer")
        .select(c("c_custkey"), coalesce(oc("cnt"), lit(0L)).as("order_cnt"))
    },

    QueryDef(
      "q_cartesian",
      "SELECT r_name, n_name FROM region CROSS JOIN nation") { (s, dir) =>
      // CartesianProduct of disconnected patterns (both sides tiny dims →
      // BroadcastNestedLoopJoin; a big-big cross product is a plan smell the
      // translator avoids, as the reference's optimizer does).
      t(s, dir, "region").crossJoin(t(s, dir, "nation"))
        .select("r_name", "n_name")
    },

    QueryDef(
      "q_value_hash_join",
      """SELECT s.s_suppkey, c.c_custkey, s.s_nationkey
        |FROM supplier s JOIN customer c
        |  ON s.s_nationkey = c.c_nationkey""".stripMargin) { (s, dir) =>
      // ValueHashJoin: equi-join on expression values between two disjoint
      // streams (`op_value_hash_join.c:33-104`). Catalyst broadcasts the
      // smaller supplier side.
      val sup = t(s, dir, "supplier")
      val c = t(s, dir, "customer")
      sup.join(c, sup("s_nationkey") === c("c_nationkey"))
        .select(sup("s_suppkey"), c("c_custkey"), sup("s_nationkey"))
    },

    QueryDef(
      "q_apply_decorrelated",
      """SELECT c_custkey, c_nationkey, c_acctbal FROM customer c
        |WHERE c_acctbal = (SELECT max(c2.c_acctbal) FROM customer c2
        |                   WHERE c2.c_nationkey = c.c_nationkey)""".stripMargin) { (s, dir) =>
      // Apply (correlated subquery) decorrelated to aggregate + self-join —
      // what the reference's Argument/Apply tap does per-record, done
      // set-at-a-time (`op_apply.c:31-85` → join-based decorrelation).
      val c = t(s, dir, "customer")
      val mx = t(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(max("c_acctbal").as("max_bal"))
      c.join(broadcast(mx),
          c("c_nationkey") === mx("nk") && c("c_acctbal") === mx("max_bal"))
        .select(c("c_custkey"), c("c_nationkey"), c("c_acctbal"))
    },

    // ── Union / distinct ────────────────────────────────────────────────────
    QueryDef(
      "q_union_distinct",
      "SELECT c_nationkey AS nk FROM customer UNION " +
        "SELECT s_nationkey FROM supplier") { (s, dir) =>
      // Join op (UNION plumbing, `op_join.c`) + Distinct: unionByName +
      // dropDuplicates (map-side partial dedup before the shuffle).
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .dropDuplicates()
    },

    QueryDef(
      "q_union_all",
      """SELECT nk, count(*) AS cnt FROM (
        |  SELECT c_nationkey AS nk FROM customer
        |  UNION ALL SELECT s_nationkey FROM supplier) u
        |GROUP BY nk""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .unionByName(t(s, dir, "supplier").select(col("s_nationkey").as("nk")))
        .groupBy("nk").agg(count(lit(1)).as("cnt"))
    },

    QueryDef(
      "q_distinct",
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer") { (s, dir) =>
      t(s, dir, "customer").select("c_mktsegment", "c_nationkey").distinct()
    },

    // ── Aggregation ─────────────────────────────────────────────────────────
    QueryDef(
      "q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      // TPC-H Q1 shape — the reference's single-phase hash aggregate
      // (`op_aggregate.c:81-154`); Spark runs it partial→final with codegen.
      t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus").agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        count(lit(1)).as("count_order"))
    },

    QueryDef(
      "q_count_distinct",
      """SELECT count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps,
        |       count(*) AS n_rows
        |FROM lineitem""".stripMargin) { (s, dir) =>
      // count(DISTINCT x) — reference dedups per-aggregate via a hash set
      // (`agg_funcs.c:488`); Spark expands to a two-phase distinct aggregate.
      t(s, dir, "lineitem").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
    },

    QueryDef(
      "q_approx_distinct",
      """SELECT l_returnflag,
        |       count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_suppkey) AS exact_supps,
        |       true AS parts_ok, true AS supps_ok
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      // HLL++ approximate count-distinct: the sketch path for the 100 TB
      // case where exact distinct's shuffle is the bottleneck — partial
      // sketches merge map-side, constant memory per group. The sketch
      // value is engine-specific, so the oracle gates the ERROR BOUND: the
      // approx must land within 5% of the exact (rsd configured 2%), and
      // the exact counts themselves hash-match DuckDB.
      def ok(approx: Column, exact: Column): Column =
        (abs(approx - exact) / exact) <= 0.05
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("a_parts"),
        approx_count_distinct(col("l_suppkey"), 0.02).as("a_supps"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
        .select(col("l_returnflag"),
          col("exact_parts"), col("exact_supps"),
          ok(col("a_parts"), col("exact_parts")).as("parts_ok"),
          ok(col("a_supps"), col("exact_supps")).as("supps_ok"))
    },

    QueryDef(
      "q_approx_quantile",
      """SELECT l_returnflag, true AS p50_ok, true AS p99_ok
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      // Approximate percentiles (Greenwald-Khanna): mergeable quantile
      // sketch vs q_percentile's exact path. The sketch value is
      // engine-specific, so the oracle gates the RANK error bound: with
      // accuracy 1000 the rank error is ≤ n/1000, far inside the ±0.02
      // rank window checked here (approx p50 ∈ [exact p48, exact p52]).
      val x = col("l_extendedprice")
      def win(p: Double, lo: Double, hi: Double, nm: String): Seq[Column] = Seq(
        approx_percentile(x, lit(p), lit(1000)).as(s"a_$nm"),
        expr(s"percentile(l_extendedprice, ${lo})").as(s"lo_$nm"),
        expr(s"percentile(l_extendedprice, ${hi})").as(s"hi_$nm"))
      t(s, dir, "lineitem").groupBy("l_returnflag")
        .agg(win(0.5, 0.48, 0.52, "p50").head,
          (win(0.5, 0.48, 0.52, "p50").tail ++ win(0.99, 0.97, 0.995, "p99")): _*)
        .select(col("l_returnflag"),
          col("a_p50").between(col("lo_p50"), col("hi_p50")).as("p50_ok"),
          col("a_p99").between(col("lo_p99"), col("hi_p99")).as("p99_ok"))
    },

    QueryDef(
      "q_collect",
      """SELECT o_custkey,
        |       string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |         AS order_keys
        |FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey""".stripMargin) { (s, dir) =>
      // collect(x) (`agg_funcs.c:483`) → collect_list; sorted + serialized to
      // a string for a deterministic oracle compare (the driver's row hash
      // can't handle array cells).
      t(s, dir, "orders").filter(col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",")
          .as("order_keys"))
    },

    QueryDef(
      "q_minmax",
      """SELECT o_orderpriority, round(min(o_totalprice), 2) AS min_price,
        |       round(max(o_totalprice), 2) AS max_price,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").groupBy("o_orderpriority").agg(
        round(min("o_totalprice"), 2).as("min_price"),
        round(max("o_totalprice"), 2).as("max_price"),
        min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
    },

    QueryDef(
      "q_percentile",
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5)  AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      // percentileCont (`agg_funcs.c:451`). l_quantity holds integer-valued
      // doubles, so the interpolated quantiles are exactly representable →
      // bit-exact vs the oracle.
      t(s, dir, "lineitem").groupBy("l_returnflag").agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"))
    },

    QueryDef(
      "q_stddev",
      """SELECT o_orderpriority,
        |  round(stddev_samp(o_totalprice), 2) AS sd_samp,
        |  round(stddev_pop(o_totalprice), 2) AS sd_pop
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      // stDev / stDevP (`agg_funcs.c:463,471`).
      t(s, dir, "orders").groupBy("o_orderpriority").agg(
        round(stddev_samp("o_totalprice"), 2).as("sd_samp"),
        round(stddev_pop("o_totalprice"), 2).as("sd_pop"))
    },

    QueryDef(
      "q_having",
      """SELECT c_nationkey, count(*) AS n_cust FROM customer
        |GROUP BY c_nationkey HAVING count(*) > 5""".stripMargin) { (s, dir) =>
      t(s, dir, "customer").groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_cust"))
        .filter(col("n_cust") > 5)
    },

    QueryDef(
      "q_rollup",
      """SELECT n_name, c_mktsegment, count(*) AS cnt
        |FROM customer JOIN nation ON n_nationkey = c_nationkey
        |GROUP BY ROLLUP (n_name, c_mktsegment)""".stripMargin) { (s, dir) =>
      // Beyond the reference (no grouping sets there) — free on Spark.
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      c.join(broadcast(n), n("n_nationkey") === c("c_nationkey"))
        // rollup(String*) trips Spark 4.1's DetectAmbiguousSelfJoin after a
        // join; Column refs resolve cleanly.
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
    },

    QueryDef(
      "q_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin) {
      (s, dir) =>
      // CUBE grouping sets (also beyond the reference's surface).
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          round(sum(col("o_totalprice")), 2).as("total"))
    },

    // ── Sort / limit / skip / top-k ─────────────────────────────────────────
    QueryDef(
      "q_topk",
      """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
      // Sort+Limit → top-k heap in the reference (`op_sort.c:44-66`); in
      // Spark orderBy.limit compiles to TakeOrderedAndProject (per-partition
      // heaps, no full sort shuffle).
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
    },

    QueryDef(
      "q_skip_limit",
      """SELECT o_orderkey, o_custkey FROM orders
        |ORDER BY o_orderkey LIMIT 15 OFFSET 25""".stripMargin) { (s, dir) =>
      // Skip (`op_skip.c`) + Limit (`op_limit.c`) → offset/limit.
      t(s, dir, "orders").orderBy("o_orderkey")
        .offset(25).limit(15)
        .select("o_orderkey", "o_custkey")
    },

    // ── Unwind / explode ────────────────────────────────────────────────────
    QueryDef(
      "q_unwind",
      """SELECT o_orderkey, unnest(generate_series(1, 3)) AS i
        |FROM orders WHERE o_orderkey < 50""".stripMargin) { (s, dir) =>
      // Unwind (`op_unwind.c:53-111`) → explode(sequence(...)).
      t(s, dir, "orders").filter(col("o_orderkey") < 50)
        .select(col("o_orderkey"),
          explode(sequence(lit(1L), lit(3L))).as("i"))
    },

    // ── Window functions (beyond the reference's surface) ───────────────────
    QueryDef(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    },

    QueryDef(
      "q_window_ntile",
      // ranking-family window functions over one shuffle/sort: ntile,
      // percent_rank, cume_dist, first/last value frames
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  round(percent_rank() OVER w, 5) AS pr,
        |  round(cume_dist() OVER w, 5) AS cd,
        |  round(first_value(o_totalprice) OVER w, 2) AS top_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin) {
      (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 5).as("pr"),
        round(cume_dist().over(w), 5).as("cd"),
        round(first(col("o_totalprice")).over(w), 2).as("top_price"))
    },

    QueryDef(
      "q_window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum("o_totalprice").over(w), 2).as("running"))
    },

    QueryDef(
      "q_window_lag",
      """SELECT o_custkey, o_orderkey,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey
        |                        ORDER BY o_orderdate, o_orderkey) AS prev_key
        |FROM orders""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"))
    },

    // ── Scalar function surface (SURVEY §2.6) ───────────────────────────────
    QueryDef(
      "q_string_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substring(p_name, 1, 8) AS sub8,
        |  CAST(length(p_name) AS INT) AS len,
        |  reverse(p_type) AS rev,
        |  trim(concat('  ', p_brand, '  ')) AS trimmed,
        |  replace(p_type, ' ', '_') AS underscored,
        |  contains(p_type, 'BRASS') AS has_brass,
        |  starts_with(p_name, 'a') AS starts_a,
        |  ends_with(p_name, 's') AS ends_s
        |FROM part""".stripMargin) { (s, dir) =>
      // String funcs (`string_funcs.c:249-324`): toUpper/toLower/substring/
      // size/reverse/trim/replace/contains/startsWith/endsWith.
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        substring(col("p_name"), 1, 8).as("sub8"),
        length(col("p_name")).as("len"),
        reverse(col("p_type")).as("rev"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("trimmed"),
        regexp_replace(col("p_type"), " ", "_").as("underscored"),
        col("p_type").contains("BRASS").as("has_brass"),
        col("p_name").startsWith("a").as("starts_a"),
        col("p_name").endsWith("s").as("ends_s"))
    },

    QueryDef(
      "q_numeric_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  round(abs(l_extendedprice - 1000.0), 2) AS absdiff,
        |  CAST(ceil(l_quantity / 3.0) AS BIGINT) AS ceil3,
        |  CAST(floor(l_quantity / 3.0) AS BIGINT) AS floor3,
        |  round(sqrt(l_extendedprice), 4) AS sqrtp,
        |  CAST(sign(l_discount - 0.05) AS DOUBLE) AS sgn,
        |  l_partkey % 7 AS mod7
        |FROM lineitem WHERE l_orderkey < 100""".stripMargin) { (s, dir) =>
      // Numeric funcs (`numeric_funcs.c:144-203`): abs/ceil/floor/sqrt/sign/mod.
      t(s, dir, "lineitem").filter(col("l_orderkey") < 100).select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_extendedprice") - 1000.0), 2).as("absdiff"),
        ceil(col("l_quantity") / 3.0).as("ceil3"),
        floor(col("l_quantity") / 3.0).as("floor3"),
        round(sqrt(col("l_extendedprice")), 4).as("sqrtp"),
        signum(col("l_discount") - 0.05).cast("double").as("sgn"),
        (col("l_partkey") % 7).as("mod7"))
    },

    QueryDef(
      "q_case_when",
      """SELECT CASE WHEN o_totalprice > 300000 THEN 'big'
        |            WHEN o_totalprice > 100000 THEN 'mid'
        |            ELSE 'small' END AS bucket,
        |       count(*) AS cnt
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      // CASE (`conditional_funcs.c:83-88`) → when/otherwise.
      t(s, dir, "orders")
        .select(
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("cnt"))
    },

    QueryDef(
      "q_coalesce_nullif",
      """SELECT o_orderkey,
        |  coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status2,
        |  (nullif(o_orderstatus, 'O') IS NULL) AS was_open
        |FROM orders WHERE o_orderkey < 200""".stripMargin) { (s, dir) =>
      // coalesce + NULL handling (ternary logic, `boolean_funcs.c:184-247`).
      t(s, dir, "orders").filter(col("o_orderkey") < 200).select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN"))
          .as("status2"),
        nullif(col("o_orderstatus"), lit("O")).isNull.as("was_open"))
    },

    QueryDef(
      "q_in_list",
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')""".stripMargin) { (s, dir) =>
      // list `IN` (`list_funcs.c:222-263`).
      t(s, dir, "customer")
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
    },

    QueryDef(
      "q_date_funcs",
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |       CAST(month(o_orderdate) AS INT) AS mo,
        |       count(*) AS cnt,
        |       round(sum(o_totalprice), 2) AS revenue
        |FROM orders GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      // Temporal surface (reference only has timestamp(); we expose Spark's
      // full date toolkit as the natural extension).
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("revenue"))
    },

    QueryDef(
      "q_list_funcs",
      """SELECT o_orderkey,
        |  CAST(len(ks) AS INT) AS n,
        |  ks[1] AS head_k,
        |  array_to_string(list_slice(ks, 2, len(ks)), ',') AS tail_k,
        |  list_contains(ks, o_orderkey) AS has_self
        |FROM (SELECT o_orderkey,
        |        [o_orderkey, o_orderkey + 1, o_orderkey + 2] AS ks
        |      FROM orders WHERE o_orderkey < 30)""".stripMargin) { (s, dir) =>
      // List funcs (`list_funcs.c`): size/head/tail/subscript/contains over a
      // constructed array column; tail serialized (driver hash ∌ arrays).
      t(s, dir, "orders").filter(col("o_orderkey") < 30)
        .select(col("o_orderkey"),
          array(col("o_orderkey"), col("o_orderkey") + 1,
            col("o_orderkey") + 2).as("ks"))
        .select(
          col("o_orderkey"),
          size(col("ks")).as("n"),
          element_at(col("ks"), 1).as("head_k"),
          array_join(slice(col("ks"), 2, 2), ",").as("tail_k"),
          array_contains(col("ks"), col("o_orderkey")).as("has_self"))
    },

    QueryDef(
      "q_higher_order",
      """SELECT o_orderkey,
        |  array_to_string(list_transform(ks, x -> x * 2), ',') AS doubled,
        |  array_to_string(list_filter(ks, x -> x % 2 = 0), ',') AS evens,
        |  CAST(list_sum(ks) AS BIGINT) AS total
        |FROM (SELECT o_orderkey,
        |        [o_orderkey, o_orderkey + 1, o_orderkey + 2] AS ks
        |      FROM orders WHERE o_orderkey < 30)""".stripMargin) { (s, dir) =>
      // Comprehensions (`comprehension_funcs.c:193-213`):
      // [x IN list | e] → transform; [x IN list WHERE p] → filter;
      // reduce for aggregation over the list. List results serialized for the
      // driver's row hash.
      t(s, dir, "orders").filter(col("o_orderkey") < 30)
        .select(col("o_orderkey"),
          array(col("o_orderkey"), col("o_orderkey") + 1,
            col("o_orderkey") + 2).as("ks"))
        .select(
          col("o_orderkey"),
          array_join(transform(col("ks"), x => x * 2), ",").as("doubled"),
          array_join(filter(col("ks"), x => x % 2 === 0), ",").as("evens"),
          aggregate(col("ks"), lit(0L), (acc, x) => acc + x).as("total"))
    },

    QueryDef(
      "q_pivot",
      """SELECT o_orderpriority,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      // PIVOT (beyond the reference's surface, standard OLAP reshaping):
      // Spark's relational pivot with an explicit value list — one shuffle,
      // conditional partial aggregates, no per-value scan.
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
    },

    QueryDef(
      "q_salted_join",
      """WITH dim AS (
        |  SELECT event_type, count(*) AS type_total FROM events GROUP BY 1)
        |SELECT e.event_id, e.event_type, d.type_total
        |FROM events e JOIN dim d USING (event_type)""".stripMargin) { (s, dir) =>
      // Skew-salted equi-join: event_type has ~5 distinct values over the
      // whole fact table — the canonical hot-key join. Salting spreads each
      // hot key over 8 shuffle partitions; result ≡ the plain join (oracle).
      val events = t(s, dir, "events")
      val dim = events.groupBy("event_type")
        .agg(count(lit(1)).as("type_total"))
      Skew.saltedJoin(events.select("event_id", "event_type"), dim,
        "event_type", 8)
    },

    QueryDef(
      "q_skew_agg",
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      // Skew-safe count-distinct: two-level aggregation spreads a hot key's
      // values over the (key, value) hash space before the per-key count.
      Skew.twoPhaseCountDistinct(t(s, dir, "events"), "event_type", "user_id")
    })
}
