package graft

import graft.graph.{GraphBuilder, GraphStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed at-rest graph storage: round-trip fidelity and the scale
  * contract — expand joins over co-bucketed tables plan WITHOUT a shuffle
  * on either side.
  */
class GraphStoreSpec extends AnyFunSuite {
  import SparkTestSession._

  test("save/load round-trip preserves nodes and edges; expand join is shuffle-free") {
    val g = GraphBuilder.tpch(spark, sfDir)
    GraphStore.save(g, "gs_tpch", buckets = 4)
    try {
      val loaded = GraphStore.load(spark, "gs_tpch")
      assert(loaded.nodes.count() == g.nodes.count())
      assert(loaded.edges.count() == g.edges.count())

      // co-located expand: nodes.id = edges.src, both bucketed ×4
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val expand = loaded.nodes
          .join(loaded.edges, loaded.nodes("id") === loaded.edges("src"))
        val plan = expand.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"expand join shuffled:\n$plan")
        assert(expand.count() == g.edges.count())

        // reverse expansion against the dst-bucketed transpose copy
        val rev = GraphStore.loadReverse(spark, "gs_tpch")
        val revExpand = loaded.nodes
          .join(rev, loaded.nodes("id") === rev("dst"))
        val revPlan = revExpand.queryExecution.executedPlan.toString
        assert(!revPlan.contains("Exchange"), s"reverse expand shuffled:\n$revPlan")

        // the TRANSLATOR's orientation shape: traversal columns aliased at
        // the scan (__from = dst on the rev copy) must keep the bucketing
        // visible through the alias — the join stays exchange-free
        val oriented = rev.select(col("dst").as("__from"), col("id"))
        val viaAlias = loaded.nodes
          .join(oriented, loaded.nodes("id") === oriented("__from"))
        val aliasPlan = viaAlias.queryExecution.executedPlan.toString
        assert(!aliasPlan.contains("Exchange"),
          s"aliased reverse expand shuffled:\n$aliasPlan")

        // end-to-end: a Cypher reverse traversal over the stored graph
        // reads the transpose table (edgesRev plumbing), forward reads the
        // src copy
        assert(loaded.edgesRev.isDefined)
        val sess = new graft.cypher.CypherSession(spark)
        sess.setGraph(loaded)
        val revQ = sess.run(
          "MATCH (n:Nation)<-[:IN_NATION]-(c:Customer) RETURN count(c) AS n")
        val revQPlan = revQ.queryExecution.optimizedPlan.toString
        assert(revQPlan.contains("gs_tpch_edges_rev"),
          s"reverse cypher expansion did not read the transpose table:\n" +
            revQPlan.take(3000))
        // the restored graph carries the stored statistics snapshot, so the
        // translator may legally REVERSE a syntactically-forward pattern to
        // anchor at the smaller label (Nation) — and must then read the
        // transpose copy; either orientation must use a stored edge table
        val fwdQ = sess.run(
          "MATCH (c:Customer)-[:IN_NATION]->(n:Nation) RETURN count(c) AS n")
        val fwdPlan = fwdQ.queryExecution.optimizedPlan.toString
        assert(fwdPlan.contains("gs_tpch_edges"), // _edges or _edges_rev
          s"forward cypher expansion did not read a stored edge table:\n" +
            fwdPlan.take(3000))
        // restored statistics serve counts without a counting job
        assert(loaded.statsPeek.isDefined,
          "restored graph did not seed the stored statistics snapshot")
        // both orientations agree with the in-memory graph's edge count
        val en = g.edges.filter(col("reltype") === "IN_NATION")
        val cn = g.nodes.filter(col("label") === "Customer")
        val expected = en.join(cn, en("src") === cn("id"), "left_semi").count()
        assert(sess.rows(revQ).head("n") == expected)
        assert(sess.rows(fwdQ).head("n") == expected)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      }

      // one sorted file per (partition dir, bucket): an unshuffled
      // bucketed write sprays a file per bucket PER INPUT TASK, whose
      // file-open overhead measurably dominated serving at 10× scale
      val custDir = new java.io.File("spark-warehouse/gs_tpch_nodes/label=Customer")
      if (custDir.isDirectory) {
        val parts = custDir.listFiles.count(_.getName.endsWith(".parquet"))
        assert(parts <= 4, s"bucketed write sprayed $parts files for 4 buckets")
      }

      // property values survive the round trip
      val name = loaded.nodes.filter(col("label") === "Nation")
        .select(element_at(col("props"), "name").getField("s"))
        .orderBy(col("id")).limit(1).head().getString(0)
      assert(name != null && name.nonEmpty)

      // label scans PRUNE PARTITIONS: the stored nodes table is
      // partitioned by label, and the engine's label-membership predicate
      // (labelHas — array_contains over the split list) references only
      // the partition column, so it lands in PartitionFilters and no
      // other label's directories are read
      val labelScan = loaded.nodesByLabel("Nation")
      val scanPlan = labelScan.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[([^\\]]*)\\]".r
        .findFirstMatchIn(scanPlan).map(_.group(1)).getOrElse("")
      assert(pf.contains("label"),
        s"label predicate not pushed to partition pruning:\n" +
          scanPlan.take(3000))
      assert(labelScan.count() ==
        g.nodes.filter(col("label") === "Nation").count())
    } finally GraphStore.drop(spark, "gs_tpch")
  }

  test("multi-label and numeric-looking labels survive the store round trip") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // ':'-joined multi-label nodes plus a label that partition-column type
    // inference would load as a NUMBER (legal via backtick identifiers)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("label", StringType),
      StructField("props", graft.cypher.Values.propsType)))
    val mkProps = (v: Long) => Map("v" ->
      Row(graft.cypher.Values.T_INT, v, null, null, null, null))
    val nodes = spark.createDataFrame(List(
      Row(1L, "A", mkProps(1L)), Row(2L, "A:B", mkProps(2L)),
      Row(3L, "B", mkProps(3L)), Row(4L, "2024", mkProps(4L))).asJava,
      schema)
    val edges = spark.createDataFrame(List(
      Row(10L, 1L, 2L, "R", Map.empty[String, Row])).asJava,
      StructType(Seq(
        StructField("id", LongType), StructField("src", LongType),
        StructField("dst", LongType), StructField("reltype", StringType),
        StructField("props", graft.cypher.Values.propsType))))
    GraphStore.save(graft.graph.PropertyGraph(nodes, edges), "gs_ml",
      buckets = 2)
    try {
      val loaded = GraphStore.load(spark, "gs_ml")
      // label restored as STRING even when every value looks numeric-able
      assert(loaded.nodes.schema("label").dataType ==
        org.apache.spark.sql.types.StringType)
      // membership semantics: (n:B) matches both the plain and the
      // multi-label node; the composite partition value round-trips
      assert(loaded.nodesByLabel("B").count() == 2)
      assert(loaded.nodesByLabel("A:B").count() == 1)
      assert(loaded.nodesByLabel("2024").count() == 1)
      val v = loaded.nodesByLabel("2024")
        .select(element_at(col("props"), "v").getField("i")).head().getLong(0)
      assert(v == 4L)
    } finally GraphStore.drop(spark, "gs_ml")
  }

  test("pre-v2 stored tables (materialized props map, no meta) load unchanged") {
    import org.apache.spark.sql.SaveMode
    val g = GraphBuilder.tpch(spark, sfDir)
    // simulate the v1 layout: frames written directly, props as a
    // materialized map column, no _meta table
    g.nodes.write.mode(SaveMode.Overwrite).format("parquet")
      .partitionBy("label").bucketBy(4, "id").sortBy("id")
      .saveAsTable("gs_v1_nodes")
    g.edges.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(4, "src").sortBy("src").saveAsTable("gs_v1_edges")
    g.edges.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(4, "dst").sortBy("dst").saveAsTable("gs_v1_edges_rev")
    try {
      val loaded = GraphStore.load(spark, "gs_v1")
      // exactly ONE props column (no synthesized duplicate), values read
      assert(loaded.nodes.columns.count(_ == "props") == 1,
        loaded.nodes.columns.mkString(","))
      assert(loaded.nodes.count() == g.nodes.count())
      val name = loaded.nodes.filter(col("label") === "Nation")
        .select(element_at(col("props"), "name").getField("s"))
        .limit(1).head().getString(0)
      assert(name != null && name.nonEmpty)
    } finally GraphStore.drop(spark, "gs_v1")
  }

  test("typed-column projection: property access over a restored graph " +
      "folds to a pruned flat parquet column") {
    val g = GraphBuilder.tpch(spark, sfDir)
    GraphStore.save(g, "gs_typed", buckets = 4)
    try {
      val loaded = GraphStore.load(spark, "gs_typed")
      val sess = new graft.cypher.CypherSession(spark)
      sess.setGraph(loaded)
      val q = sess.run(
        """MATCH (o:Order) WHERE o.totalprice > 300000
          |RETURN o.orderkey AS ok""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      // the monomorphic FLOAT key was stored as a flat double column and
      // the filter folded to a native comparison pushed into the scan
      assert(plan.contains("PushedFilters: [IsNotNull(_p_totalprice)") ||
        plan.contains("GreaterThan(_p_totalprice"),
        s"totalprice filter not pushed to the parquet scan:\n${plan.take(3000)}")
      val read = "ReadSchema: struct<([^>]*)>".r
        .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
      assert(read.contains("_p_totalprice") && read.contains("_p_orderkey") &&
        !read.contains("_p_status") && !read.contains("props"),
        s"scan did not prune to the accessed typed columns: $read")
      // no generic variant map survives in the optimized plan
      assert(!q.queryExecution.optimizedPlan.toString.contains("map_filter"),
        "whole props map materialized for a per-key access")
      // values agree with the in-memory graph
      val memSess = new graft.cypher.CypherSession(spark)
      memSess.setGraph(g)
      val expect = memSess.rows(memSess.run(
        """MATCH (o:Order) WHERE o.totalprice > 300000
          |RETURN o.orderkey AS ok""".stripMargin))
        .map(_("ok").asInstanceOf[Long]).sorted
      assert(sess.rows(q).map(_("ok").asInstanceOf[Long]).sorted == expect)

      // whole-map consumers see the ORIGINAL key set (absent keys are not
      // resurrected as nulls by the global storage schema)
      val keysOfNation = sess.rows(sess.run(
        "MATCH (n:Nation) RETURN keys(n) AS ks LIMIT 1"))
        .head("ks").asInstanceOf[Seq[String]].toSet
      assert(keysOfNation == Set("nationkey", "name"),
        s"restored Nation key set wrong: $keysOfNation")
    } finally GraphStore.drop(spark, "gs_typed")
  }

  // ── incremental re-save ────────────────────────────────────────────────
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._
  import scala.jdk.CollectionConverters._

  private val nodeSchema = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("props", graft.cypher.Values.propsType)))
  private val edgeSchema = StructType(Seq(
    StructField("id", LongType), StructField("src", LongType),
    StructField("dst", LongType), StructField("reltype", StringType),
    StructField("props", graft.cypher.Values.propsType)))
  private def iProps(v: Long) = Map("v" ->
    Row(graft.cypher.Values.T_INT, v, null, null, null, null))

  private def mkGraph(aVal: Long => Long) = {
    val nodes = spark.createDataFrame(
      ((1L to 20L).map(i => Row(i, "A", iProps(aVal(i)))) ++
        (21L to 40L).map(i => Row(i, "B", iProps(i)))).toList.asJava,
      nodeSchema)
    val edges = spark.createDataFrame(
      ((1L to 19L).map(i => Row(100 + i, i, i + 1, "R",
        Map.empty[String, Row])) ++
        (21L to 39L).map(i => Row(100 + i, i, i + 1, "S",
          Map.empty[String, Row]))).toList.asJava, edgeSchema)
    graft.graph.PropertyGraph(nodes, edges)
  }

  test("incremental re-save rewrites only the touched label partition") {
    GraphStore.save(mkGraph(identity), "gs_inc", buckets = 2)
    try {
      def files(table: String): Set[String] = {
        spark.catalog.refreshTable(table)
        spark.table(table).inputFiles.toSet
      }
      val nodesBefore = files("gs_inc_nodes")
      val edgesBefore = files("gs_inc_edges")
      val revBefore = files("gs_inc_edges_rev")
      // mutate ONE :A node's property — only the label=A partition differs.
      // The diff must run NO scan over the stored data tables: stored-side
      // fingerprints come from _meta (persisted at save time), so only the
      // new side is hashed (one scan instead of two).
      val plans = java.util.Collections.synchronizedList(
        new java.util.ArrayList[String]())
      val ql = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit = plans.add(qe.executedPlan.toString)
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      }
      spark.listenerManager.register(ql)
      val r = try {
        val res = GraphStore.saveIncremental(mkGraph(i =>
          if (i == 7L) 700L else i), "gs_inc", buckets = 2)
        // listener delivery is async — give the bus a bounded drain
        val deadline = System.nanoTime() + 10e9.toLong
        while (plans.isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        Thread.sleep(500)
        res
      } finally spark.listenerManager.unregister(ql)
      import scala.jdk.CollectionConverters._
      val storedScans = plans.asScala.flatMap(_.linesIterator).filter(l =>
        l.contains("FileScan") && (l.contains("gs_inc_nodes") ||
          l.contains("gs_inc_edges")))
      assert(storedScans.isEmpty,
        s"diff scanned stored data tables:\n${storedScans.mkString("\n")}")
      assert(!r.full && r.nodeParts == 1 && r.edgeParts == 0, r.toString)
      // bounded rewrite: edge tables byte-untouched, nodes' B partition
      // byte-untouched, only label=A files replaced
      assert(files("gs_inc_edges") == edgesBefore)
      assert(files("gs_inc_edges_rev") == revBefore)
      val nodesAfter = files("gs_inc_nodes")
      val untouched = nodesAfter.intersect(nodesBefore)
      assert(untouched == nodesBefore.filter(_.contains("label=B")),
        s"expected exactly the B partition untouched:\n$untouched")
      assert(nodesAfter.size == nodesBefore.size)
      // the mutation landed and everything else round-trips
      val loaded = GraphStore.load(spark, "gs_inc")
      assert(loaded.nodes.count() == 40 && loaded.edges.count() == 38)
      val v7 = loaded.nodes.filter(col("id") === 7L)
        .select(element_at(col("props"), "v").getField("i")).head().getLong(0)
      assert(v7 == 700L)
      // bucket co-location survives the partition overwrite
      val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val expand = loaded.nodes
          .join(loaded.edges, loaded.nodes("id") === loaded.edges("src"))
        assert(!expand.queryExecution.executedPlan.toString
          .contains("Exchange"))
        assert(expand.count() == 38)
      } finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    } finally GraphStore.drop(spark, "gs_inc")
  }

  test("incremental re-save falls back to full save when the key catalog changes") {
    GraphStore.save(mkGraph(identity), "gs_inc2", buckets = 2)
    try {
      val withNewKey = {
        val nodes = spark.createDataFrame(
          ((1L to 20L).map(i => Row(i, "A", iProps(i) ++ Map("w" ->
            Row(graft.cypher.Values.T_INT, i * 2, null, null, null, null)))) ++
            (21L to 40L).map(i => Row(i, "B", iProps(i)))).toList.asJava,
          nodeSchema)
        graft.graph.PropertyGraph(nodes, mkGraph(identity).edges)
      }
      val r = GraphStore.saveIncremental(withNewKey, "gs_inc2", buckets = 2)
      assert(r.full, r.toString)
      val loaded = GraphStore.load(spark, "gs_inc2")
      val w = loaded.nodes.filter(col("id") === 3L)
        .select(element_at(col("props"), "w").getField("i")).head().getLong(0)
      assert(w == 6L)
    } finally GraphStore.drop(spark, "gs_inc2")
  }

  test("unfold avoids name collisions with existing typed columns") {
    // a pass-through column literally named like a generated storage
    // column, next to a props key that would generate that same name
    val nodes = spark.createDataFrame(
      List(Row(1L, "A", Map("x" ->
          Row(graft.cypher.Values.T_INT, 5L, null, null, null, null)), 42L),
        Row(2L, "A", Map("x" ->
          Row(graft.cypher.Values.T_INT, 6L, null, null, null, null)), 43L))
        .asJava,
      nodeSchema.add(StructField("_p_x", LongType)))
    val edges = spark.createDataFrame(
      List(Row(10L, 1L, 2L, "R", Map.empty[String, Row])).asJava, edgeSchema)
    GraphStore.save(graft.graph.PropertyGraph(nodes, edges), "gs_coll",
      buckets = 2)
    try {
      val loaded = GraphStore.load(spark, "gs_coll")
      assert(loaded.nodes.columns.distinct.length ==
        loaded.nodes.columns.length, loaded.nodes.columns.mkString(","))
      val row = loaded.nodes.filter(col("id") === 1L)
        .select(element_at(col("props"), "x").getField("i"), col("_p_x"))
        .head()
      assert(row.getLong(0) == 5L && row.getLong(1) == 42L)
    } finally GraphStore.drop(spark, "gs_coll")
  }

  test("empty-string labels and reltypes are rejected at save") {
    val nodes = spark.createDataFrame(
      List(Row(1L, "", iProps(1L))).asJava, nodeSchema)
    val edges = spark.createDataFrame(
      List.empty[Row].asJava, edgeSchema)
    intercept[IllegalArgumentException] {
      GraphStore.save(graft.graph.PropertyGraph(nodes, edges), "gs_empty",
        buckets = 2)
    }
  }

  test("reverse traversal without the transpose copy matches " +
      "(test_transpose_configurations.py parity)") {
    // the reference runs the same queries with MAINTAIN_TRANSPOSED_MATRICES
    // yes/no and asserts identical results — here: a stored graph queried
    // with and without its dst-bucketed `_edges_rev` copy (absent copy ⇒
    // the translator falls back to a column swap of the src-bucketed
    // table: same values, one extra exchange at scale, never different
    // rows)
    val s0 = new graft.cypher.CypherSession(spark)
    s0.run("""CREATE (v1:L {val: 'v1'}), (v2:L {val: 'v2'}),
      |(v3:L {val: 'v3'}),
      |(v1)-[:E]->(v2), (v2)-[:E]->(v3), (v1)-[:E]->(v3)""".stripMargin)
    GraphStore.save(s0.graph, "gs_transpose", buckets = 2)
    try {
      val loaded = GraphStore.load(spark, "gs_transpose")
      assert(loaded.edgesRev.isDefined)
      val queries = Seq(
        // test01: standard + transposed one-hop traversals
        "MATCH (a:L)-[:E]->(b) RETURN a.val AS a, b.val AS b ORDER BY a, b",
        "MATCH (a)-[:E]->(b:L) RETURN a.val AS a, b.val AS b ORDER BY a, b",
        // test02: bidirectional (E + transpose(E))
        "MATCH (a:L)-[:E]-(b:L) RETURN a.val AS a, b.val AS b ORDER BY a, b",
        // test03: repeated multiplication over the transpose
        """MATCH (a)-[:E*2]->(b:L {val: 'v3'})
          |RETURN a.val AS a, b.val AS b ORDER BY a, b""".stripMargin)
      val expected = Seq(
        Seq(("v1", "v2"), ("v1", "v3"), ("v2", "v3")),
        Seq(("v1", "v2"), ("v1", "v3"), ("v2", "v3")),
        Seq(("v1", "v2"), ("v1", "v3"), ("v2", "v1"), ("v2", "v3"),
          ("v3", "v1"), ("v3", "v2")),
        Seq(("v1", "v3")))
      val withRev = new graft.cypher.CypherSession(spark)
      withRev.setGraph(loaded)
      val noRev = new graft.cypher.CypherSession(spark)
      noRev.setGraph(loaded.copy(edgesRev = None))
      queries.zip(expected).foreach { case (q, exp) =>
        def run(sess: graft.cypher.CypherSession): Seq[(String, String)] =
          sess.rows(sess.run(q)).map(r =>
            (r("a").asInstanceOf[String], r("b").asInstanceOf[String]))
        val a = run(withRev)
        val b = run(noRev)
        assert(a == exp, s"with transpose copy: $q")
        assert(b == exp, s"WITHOUT transpose copy: $q")
      }
    } finally GraphStore.drop(spark, "gs_transpose")
  }
}
