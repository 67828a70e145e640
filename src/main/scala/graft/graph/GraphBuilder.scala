package graft.graph

import graft.Tables
import graft.cypher.Values
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bulk graph construction from relational sources — the GRAPH.BULK
  * analogue (`/root/reference/src/bulk_insert/bulk_insert.c`): typed columns
  * become variant-encoded property bags, keys become node ids, foreign keys
  * become edges.
  *
  * Id allocation: disjoint ranges per entity class (sequential within),
  * mirroring the reference's per-DataBlock dense ids. At 100 TB this is a
  * deterministic key→id mapping, no global counter needed.
  */
object GraphBuilder {

  /** Per-dir graph cache. The graph is a *view* over the typed relational
    * parquet tables: `props` maps are built lazily from native columns, so
    * [[graft.plans.VariantFoldRule]] + Catalyst collapse every property
    * access back to the underlying column — label filters prune union
    * branches (a label scan reads only that label's source table), property
    * filters prune/push down into the parquet scan, unused properties are
    * never read. No data copy; this is the production shape for a graph
    * derived from relational data (the reference's GRAPH.BULK ingests copies
    * because its matrix store demands it — a columnar view doesn't).
    *
    * Caching the PropertyGraph instance also caches its statistics
    * (labelCounts etc.) and keeps DataFrame object identity for the
    * translated-plan cache.
    */
  private val stored = scala.collection.concurrent.TrieMap[String, PropertyGraph]()

  def tpchStored(spark: SparkSession, dir: String): PropertyGraph =
    stored.getOrElseUpdate(dir, tpch(spark, dir))

  val CUST_BASE = 0L
  val ORDER_BASE = 100000000L
  val NATION_BASE = 200000000L
  val REGION_BASE = 300000000L
  val SUPP_BASE = 400000000L
  val PART_BASE = 500000000L

  private def props(kvs: (String, Column)*): Column =
    map(kvs.flatMap { case (k, v) => Seq(lit(k), v) }: _*)

  /** TPC-H-ish property graph:
    * (:Customer)-[:PLACED]->(:Order)-[:CONTAINS {quantity, extendedprice}]->(:Part)
    * (:Customer|:Supplier)-[:IN_NATION]->(:Nation)-[:IN_REGION]->(:Region)
    */
  def tpch(spark: SparkSession, dir: String): PropertyGraph = {
    import Values._

    val customer = Tables.customer(spark, dir).select(
      (col("c_custkey") + CUST_BASE).as("id"),
      lit("Customer").as("label"),
      props(
        "custkey" -> vInt(col("c_custkey")),
        "name" -> vStr(col("c_name")),
        "mktsegment" -> vStr(col("c_mktsegment")),
        "acctbal" -> vFloat(col("c_acctbal"))).as("props"))

    val order = Tables.orders(spark, dir).select(
      (col("o_orderkey") + ORDER_BASE).as("id"),
      lit("Order").as("label"),
      props(
        "orderkey" -> vInt(col("o_orderkey")),
        "totalprice" -> vFloat(col("o_totalprice")),
        "status" -> vStr(col("o_orderstatus")),
        "priority" -> vStr(col("o_orderpriority"))).as("props"))

    val nation = Tables.nation(spark, dir).select(
      (col("n_nationkey") + NATION_BASE).as("id"),
      lit("Nation").as("label"),
      props(
        "nationkey" -> vInt(col("n_nationkey")),
        "name" -> vStr(col("n_name"))).as("props"))

    val region = Tables.region(spark, dir).select(
      (col("r_regionkey") + REGION_BASE).as("id"),
      lit("Region").as("label"),
      props(
        "regionkey" -> vInt(col("r_regionkey")),
        "name" -> vStr(col("r_name"))).as("props"))

    val supplier = Tables.supplier(spark, dir).select(
      (col("s_suppkey") + SUPP_BASE).as("id"),
      lit("Supplier").as("label"),
      props(
        "suppkey" -> vInt(col("s_suppkey")),
        "name" -> vStr(col("s_name")),
        "acctbal" -> vFloat(col("s_acctbal"))).as("props"))

    val part = Tables.part(spark, dir).select(
      (col("p_partkey") + PART_BASE).as("id"),
      lit("Part").as("label"),
      props(
        "partkey" -> vInt(col("p_partkey")),
        "name" -> vStr(col("p_name")),
        "brand" -> vStr(col("p_brand")),
        "size" -> vInt(col("p_size")),
        "retailprice" -> vFloat(col("p_retailprice"))).as("props"))

    val nodes = customer.unionByName(order).unionByName(nation)
      .unionByName(region).unionByName(supplier).unionByName(part)

    val emptyProps = map().cast(Values.propsType)

    // edge id ranges disjoint per relationship class
    val placed = Tables.orders(spark, dir).select(
      (col("o_orderkey") + 0L).as("id"),
      (col("o_custkey") + CUST_BASE).as("src"),
      (col("o_orderkey") + ORDER_BASE).as("dst"),
      lit("PLACED").as("reltype"),
      emptyProps.as("props"))

    val custNation = Tables.customer(spark, dir).select(
      (col("c_custkey") + 100000000L).as("id"),
      (col("c_custkey") + CUST_BASE).as("src"),
      (col("c_nationkey") + NATION_BASE).as("dst"),
      lit("IN_NATION").as("reltype"),
      emptyProps.as("props"))

    val suppNation = Tables.supplier(spark, dir).select(
      (col("s_suppkey") + 200000000L).as("id"),
      (col("s_suppkey") + SUPP_BASE).as("src"),
      (col("s_nationkey") + NATION_BASE).as("dst"),
      lit("IN_NATION").as("reltype"),
      emptyProps.as("props"))

    val nationRegion = Tables.nation(spark, dir).select(
      (col("n_nationkey") + 300000000L).as("id"),
      (col("n_nationkey") + NATION_BASE).as("src"),
      (col("n_regionkey") + REGION_BASE).as("dst"),
      lit("IN_REGION").as("reltype"),
      emptyProps.as("props"))

    // deterministic edge id from the natural key (stable across executions —
    // var-len traversal edge-uniqueness compares ids across join branches)
    val contains = Tables.lineitem(spark, dir).select(
      (col("l_orderkey") * 8 + col("l_linenumber") + 400000000L).as("id"),
      (col("l_orderkey") + ORDER_BASE).as("src"),
      (col("l_partkey") + PART_BASE).as("dst"),
      lit("CONTAINS").as("reltype"),
      props(
        "quantity" -> vFloat(col("l_quantity")),
        "extendedprice" -> vFloat(col("l_extendedprice")),
        "linenumber" -> vInt(col("l_linenumber"))).as("props"))

    val edges = placed.unionByName(custNation).unionByName(suppNation)
      .unionByName(nationRegion).unionByName(contains)

    // per-label / per-reltype views = the pre-union source tables (≡ the
    // reference's per-label and per-relation matrices): a label scan in a
    // query plan is one parquet source, never the whole-catalog union
    PropertyGraph(nodes, edges,
      byLabel = Map(
        "Customer" -> customer, "Order" -> order, "Nation" -> nation,
        "Region" -> region, "Supplier" -> supplier, "Part" -> part),
      byReltype = Map(
        "PLACED" -> placed,
        "IN_NATION" -> custNation.unionByName(suppNation),
        "IN_REGION" -> nationRegion,
        "CONTAINS" -> contains))
  }
}
