package graft.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Traversal operators over a PropertyGraph, Spark-first.
  *
  * The reference implements these as GraphBLAS matrix expressions
  * (ConditionalTraverse `ops/op_conditional_traverse.c:127-180`, var-len
  * `ops/op_cond_var_len_traverse.c`, BFS `src/algorithms/LAGraph_bfs_pushpull.c`).
  * Here: one hop = one equi-join (Catalyst picks broadcast vs shuffle);
  * var-len/BFS = iterative frontier joins with per-iteration lineage cuts;
  * whole-graph analytics (pageRank, connected components) = GraphX.
  */
object GraphOps {

  /** (id) frame → RDD[(id, ())] without the Dataset encoder round-trip:
    * `toRdd` reads primitives straight off the physical rows (one less
    * deserializer plan + codegen compile per cold invocation).
    *
    * MEASURED NEGATIVE RESULT (r15, kept as documentation): coalescing
    * these RDDs to a Catalyst-size-derived partition count (~32 MB of
    * `stats.sizeInBytes` per partition) looked like the guide-§2 move
    * against per-superstep empty-task scheduling, but the byte estimate
    * wildly under-provisions GraphX's in-memory per-edge cost — at sf10
    * q_graph_pagerank went 14 s → ~150 s (near-serial supersteps over 10 M
    * edges on a handful of partitions) while sf0.1 improved only 2.84 →
    * 2.54 s, inside the cold spread. The per-iteration cost at bench scale
    * is job-submission/materialization overhead inside `staticPageRank`,
    * not task count. So: no coalesce — GraphX keeps the source
    * partitioning.
    */
  private def vertexRdd(df: DataFrame)
      : org.apache.spark.rdd.RDD[(Long, Unit)] =
    df.queryExecution.toRdd.map(r => (r.getLong(0), ()))

  /** (src, dst) frame → RDD[Edge] the same way. */
  private def edgeRdd(df: DataFrame)
      : org.apache.spark.rdd.RDD[Edge[Unit]] =
    df.queryExecution.toRdd.map(r => Edge(r.getLong(0), r.getLong(1), ()))

  /** One-hop expansion: ConditionalTraverse.
    * `bound` must carry a `node` column (the frontier endpoint); result
    * re-binds `node` to the neighbor and keeps all other bound columns.
    */
  def expand(bound: DataFrame, edges: DataFrame,
      direction: String = "out"): DataFrame = {
    val (from, to) = direction match {
      case "out" => ("src", "dst")
      case "in"  => ("dst", "src") // transpose ≡ column swap
      case _     => throw new IllegalArgumentException(direction)
    }
    val e = edges.select(col(from).as("__from"), col(to).as("__to"))
    bound.join(e, bound("node") === e("__from"))
      .drop("node").drop("__from")
      .withColumnRenamed("__to", "node")
  }

  /** ExpandInto: both endpoints bound — verify edge existence (left_semi on
    * the (src,dst) pair; no row duplication, `ops/op_expand_into.c`).
    */
  def expandInto(boundPairs: DataFrame, edges: DataFrame): DataFrame =
    boundPairs.join(
      edges.select(col("src"), col("dst")),
      boundPairs("a") === col("src") && boundPairs("b") === col("dst"),
      "left_semi")

  /** Variable-length expansion `*min..max` (CondVarLenTraverse):
    * reachability form — distinct (start, node) pairs with the minimum hop
    * count, sources = DataFrame with an `id` column.
    *
    * Iterative frontier join. Per iteration:
    *   - join frontier ⋈ edges on node==src (shuffle on the join key; at
    *     scale both sides hash-partitioned on the key so successive
    *     iterations reuse the partitioning)
    *   - drop already-visited (start,node) pairs — keeps frontiers minimal
    *     (BFS level-synchronous semantics, ≡ reference's all_neighbors mode)
    *   - [[graft.Checkpoints.materialize]] to cut lineage (localCheckpoint
    *     by default; `graft.checkpoint.reliable=true` for executor-loss
    *     resilience on real clusters);
    *     without it the plan doubles per hop and Catalyst analysis blows up.
    */
  def varLenExpand(sources: DataFrame, edges: DataFrame,
      minHops: Int, maxHops: Int): DataFrame = {
    require(minHops >= 0 && maxHops >= minHops, s"bad bounds $minHops..$maxHops")
    import graft.Checkpoints.materialize
    val e = edges.select(col("src"), col("dst"))
    // each hop's frontier is its own checkpointed generation; `visited` is
    // their UNION (a plan over checkpointed leaves). The previous shape
    // re-materialized visited∪frontier EVERY hop — an O(hops × |visited|)
    // re-write of blocks that were already at rest (guide §2.4: don't move
    // bytes that already sit where you need them). Held blocks total the
    // same |visited| either way; the per-hop checkpoint write of the whole
    // visited set is gone. materialize = localCheckpoint (non-resilient:
    // executor loss kills the query) or a reliable checkpoint under
    // graft.Checkpoints' knob.
    val frontiers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    frontiers += materialize(sources.select(col("id").as("start"),
      col("id").as("node"), lit(0).as("hops")))
    def visited: DataFrame = frontiers.reduce(_ unionByName _)
    var frontier = frontiers.head
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      // hops is constant within the hop, so deduping on (start, node) is
      // the same distinct — and keys the dedup exchange exactly like the
      // anti-join below (one shuffle of `next` serves both)
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(frontier("start"), e("dst").as("node"), lit(h).as("hops"))
        .dropDuplicates("start", "node")
      // anti-join against visited: BFS keeps first (= minimal) hop count.
      // The right side is re-aliased: `next` derives from the latest
      // frontier leaf, which also appears inside the visited union —
      // without fresh attribute ids hop 1 would be a same-attribute
      // self-join. Node ids are non-null by the graph schema contract, so
      // plain equality ≡ the null-safe form.
      val v = visited.select(col("start").as("__v_start"),
        col("node").as("__v_node"))
      frontier = materialize(next.join(v,
        next("start") === v("__v_start") && next("node") === v("__v_node"),
        "left_anti"))
      frontiers += frontier
    }
    visited.filter(col("hops").between(minHops, maxHops))
  }

  /** Unweighted single-source-set shortest path lengths: BFS until all
    * frontiers die or maxHops. Returns (start, node, hops) for nodes whose
    * label/predicate matches `isTarget` applied on the node id set.
    * (reference: shortestPath via LAGraph BFS push-pull,
    * `src/arithmetic/path_funcs/path_funcs.c:108-190`).
    */
  def shortestPaths(sources: DataFrame, edges: DataFrame, targets: DataFrame,
      maxHops: Int): DataFrame = {
    val reach = varLenExpand(sources, edges, 1, maxHops)
    val t = targets.select(col("id").as("__tid"))
    reach.join(t, reach("node") === col("__tid"), "left_semi")
      .groupBy("start", "node").agg(min("hops").as("hops"))
  }

  /** PageRank (reference: `src/algorithms/pagerank.c`,
    * `src/procedures/proc_pagerank.c:202`): the GraphX `staticPageRank`
    * recurrence — r₀ = 1, r_k(v) = reset + (1−reset)·Σ_{u→v} r_{k−1}(u)/
    * outdeg(u), dangling mass not redistributed, ranks normalized to sum N
    * — computed as a single-job RDD power iteration.
    *
    * Why not GraphX itself (the r14/r15 shape): `staticPageRank`
    * materializes every superstep — per iteration it caches a new graph,
    * runs a `foreachPartition` job over the edge set and unpersists the
    * previous generation, ~3 jobs × `iters` plus vertex-view shipping.
    * That per-iteration job overhead was the measured #1 cold cost of the
    * whole bench (2.8 s at sf0.1 where the data work is milliseconds;
    * profiled r15, deferred to r16). Here the weighted adjacency is
    * hash-partitioned ONCE (one shuffle map stage whose files every
    * iteration re-reads — Spark serves already-computed shuffle stages
    * from disk without recomputation), each iteration is exactly one
    * narrow co-partitioned zipPartitions lookup join + one combined
    * message shuffle (the same message movement GraphX does), and the
    * whole 10-iteration chain executes as ONE job when the result is
    * consumed — no per-iteration materialization, caching or plan
    * re-analysis at all. The per-vertex message sum matches the oracle's
    * arithmetic (Σ r/deg); summation order is partition-dependent exactly
    * as GraphX's was, and the emitted value rounds to 6 dp (the tolerance
    * the oracle was pinned at — DuckDB, GraphX and this loop agree there).
    *
    * Measured negative results that led here (kept for the record):
    * Catalyst power iteration [[pageRankDf]] 2.3× slower (per-iteration
    * plan/exchange overhead); GraphX input coalescing 10× worse at sf10.
    */
  def pageRank(graph: PropertyGraph, resetProb: Double = 0.15,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, s"pageRank needs at least one iteration ($iters)")
    val spark = graph.nodes.sparkSession
    import spark.implicits._
    val verts = vertexRdd(graph.nodes.select(col("id")))
    val edges = graph.edges.select(col("src"), col("dst"))
      .queryExecution.toRdd.map(r => (r.getLong(0), r.getLong(1)))
    // scale-adaptive partitioning: never fewer partitions than the source
    // layout supplies (the r15 GraphX-coalesce disaster), never fewer than
    // the cluster's parallelism when the source is a single small file
    val p = new org.apache.spark.HashPartitioner(
      spark.conf.getOption("spark.graft.pagerank.parts").map(_.toInt)
        .getOrElse {
          // scale-adaptive partition count from the edge plan's size
          // estimate (guide §2), NOT a local-core constant. Small graphs
          // get ~1 MB partitions: the loop's cost there is shuffle FILE
          // count, p files per map task per shuffle — the sampled stacks
          // were DiskBlockObjectWriter.initialize + mmap-concat, not
          // compute (p=32: 3.3 s at sf0.1; p=4: 0.8 s). Small branch:
          // ~256 KB of estimated bytes per partition; large branch: ~64 MB
          // partitions, never fewer than the cluster's cores.
          val bytes = graph.edges.queryExecution.optimizedPlan.stats
            .sizeInBytes.min(BigInt(Long.MaxValue)).toLong.max(1L)
          val cores = spark.sparkContext.defaultParallelism.toLong
          math.max(1L, math.min(bytes >> 18, math.max(cores, bytes >> 26)))
            .toInt
        })
    // ONE shuffle of the edge set. partitionBy(p) co-locates every edge of
    // a src, so outdeg is a partition-local count and the weighted
    // adjacency lives as three parallel primitive arrays — ONE element per
    // partition, persisted for the loop. Deliberately NO
    // reduceByKey/join/cogroup anywhere in the loop: their
    // ExternalAppendOnlyMap size-samples inserts through
    // SizeEstimator.estimate (reflection object-graph walks), which stack
    // samples showed as the dominant per-task cost of the previous shape
    // (~160–220 ms fixed per task regardless of partition count, ~7 s of
    // executor CPU per run on 86 k edges at sf0.1). All per-key state here
    // is primitive open-addressing maps ([[LongDoubleMap]]) — no boxing,
    // no size sampling; the trade is losing the spill safety net, bounded
    // by the per-partition working set the cogroup held in memory anyway
    // (p scales with the source partition count; override with
    // spark.graft.pagerank.parts).
    val contrib = edges.partitionBy(p).mapPartitions { it =>
      val sb = new scala.collection.mutable.ArrayBuilder.ofLong
      val db = new scala.collection.mutable.ArrayBuilder.ofLong
      while (it.hasNext) { val e = it.next(); sb += e._1; db += e._2 }
      val srcs = sb.result(); val dsts = db.result()
      val deg = new LongDoubleMap(srcs.length)
      var i = 0
      while (i < srcs.length) { deg.add(srcs(i), 1.0); i += 1 }
      val degs = new Array[Double](srcs.length)
      i = 0
      while (i < srcs.length) { degs(i) = deg.getOrElse(srcs(i), 0.0); i += 1 }
      Iterator.single((srcs, dsts, degs))
    }.persist(StorageLevel.MEMORY_AND_DISK)
    // map-side partial sums land in a primitive map, the explicit
    // partitionBy moves only the combined (dst, partial) records (the same
    // message volume reduceByKey shipped), and the reduce side merges into
    // a primitive map again
    def shuffleSum(r: org.apache.spark.rdd.RDD[(Long, Double)])
        : org.apache.spark.rdd.RDD[(Long, Double)] =
      r.partitionBy(p).mapPartitions({ it =>
        val m = new LongDoubleMap(1 << 10)
        while (it.hasNext) { val kv = it.next(); m.add(kv._1, kv._2) }
        m.iterator
      }, preservesPartitioning = true)
    // iterate on the message vector m_k(v) = Σ_{u→v} r_{k−1}(u)/deg(u);
    // r_{k−1}(src) reconstructs as reset + (1−reset)·m_{k−1}(src) (absent ⇒
    // no in-edges ⇒ the constant reset mass), so no dense vertex join runs
    // inside the loop. Iteration 1 inlines r₀ = 1.
    var msgs = shuffleSum(contrib.mapPartitions { it =>
      val (_, dsts, degs) = it.next()
      val out = new LongDoubleMap(dsts.length)
      var i = 0
      while (i < dsts.length) { out.add(dsts(i), 1.0 / degs(i)); i += 1 }
      out.iterator
    })
    for (_ <- 2 to iters) {
      val prev = msgs
      msgs = shuffleSum(contrib.zipPartitions(prev) { (cIt, mIt) =>
        val (srcs, dsts, degs) = cIt.next()
        val mm = new LongDoubleMap(1 << 10)
        while (mIt.hasNext) { val kv = mIt.next(); mm.add(kv._1, kv._2) }
        val out = new LongDoubleMap(dsts.length)
        var i = 0
        while (i < srcs.length) {
          val r = resetProb + (1 - resetProb) * mm.getOrElse(srcs(i), 0.0)
          out.add(dsts(i), r / degs(i))
          i += 1
        }
        out.iterator
      })
    }
    val ranks = verts.partitionBy(p).zipPartitions(msgs) { (vIt, mIt) =>
      val mm = new LongDoubleMap(1 << 10)
      while (mIt.hasNext) { val kv = mIt.next(); mm.add(kv._1, kv._2) }
      vIt.map { case (id, _) =>
        (id, resetProb + (1 - resetProb) * mm.getOrElse(id, 0.0))
      }
    }
    // one finalization job for (n, Σr); the DF below re-runs only the final
    // narrow stage — every shuffle map stage upstream is served from its
    // already-written files
    val (n, total) = ranks.map(_._2)
      .aggregate((0L, 0.0))(
        (acc, r) => (acc._1 + 1, acc._2 + r),
        (a, b) => (a._1 + b._1, a._2 + b._2))
    // iterations are spent (the aggregate above ran them); the consumer
    // below re-reads only the already-written message shuffle files
    contrib.unpersist(blocking = false)
    val scale = if (total == 0.0) 1.0 else n / total
    ranks.mapValues(_ * scale).toDF("id", "pagerank")
  }

  /** PageRank via GraphX — the r14/r15 implementation, kept as the
    * documented baseline [[pageRank]] replaced (staticPageRank semantics;
    * DiagPrAb pins the two ≡ at 6 dp).
    */
  def pageRankGraphX(graph: PropertyGraph, resetProb: Double = 0.15,
      iters: Int = 20): DataFrame = {
    val spark = graph.nodes.sparkSession
    import spark.implicits._
    val vRdd = vertexRdd(graph.nodes.select(col("id")))
    val eRdd = edgeRdd(graph.edges.select(col("src"), col("dst")))
    val g = XGraph(vRdd, eRdd, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    g.staticPageRank(iters, resetProb).vertices
      .toDF("id", "pagerank")
  }

  /** PageRank as a pure DataFrame power iteration — the same recurrence
    * [[pageRank]] computes (DiagPrAb verified the two ≡ at 6 dp over 1M
    * vertices), expressed in Catalyst so Tungsten + AQE run it:
    * `r_{k+1}(v) = reset + (1−reset)·Σ_{u→v} r_k(u)/outdeg(u)`, ranks
    * normalized to sum N at the end (GraphX `staticPageRank` convention,
    * dangling mass not redistributed). Two shuffles per iteration (the
    * message vector meets the src-partitioned contribution table, then a
    * partial-aggregated groupBy on dst); lineage is cut every few
    * iterations and superseded checkpoint blocks released as the
    * iteration advances. MEASURED SLOWER than the GraphX form (sf1:
    * 8.4 s vs 3.7 s cold — GraphX's once-partitioned graph + message-only
    * movement beats re-planned Catalyst joins per iteration); kept as the
    * documented negative result and for GraphX-less deployments.
    */
  def pageRankDf(graph: PropertyGraph, resetProb: Double = 0.15,
      iters: Int = 20): DataFrame = {
    require(iters >= 1, s"pageRankDf needs at least one iteration ($iters)")
    import graft.Checkpoints.{materialize, release}
    val edges = graph.edges.select(col("src"), col("dst"))
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("__c"))
    // contribution table, HASH-PARTITIONED BY src once: localCheckpoint
    // preserves outputPartitioning, so every iteration's join shuffles
    // ONLY the (small) message vector to meet it — the GraphX trade
    // (partition the graph once, move messages) in Catalyst terms.
    // materialize honors graft.Checkpoints' resilience knob.
    val contrib = materialize(edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("__c"))
      .repartition(col("src")))
    // iterate on the MESSAGE vector m_k(v) = Σ_{u→v} r_k(u)/outdeg(u)
    // instead of the full rank vector: rank_k(src) reconstructs as
    // reset + (1−reset)·coalesce(m_k(src), 0) — a vertex absent from m_k
    // has no in-edges and holds the constant reset rank, so the dense
    // per-iteration vertex join disappears (2 shuffles/iteration, not 3)
    var msgs: Option[DataFrame] = None // None ⇔ k=0 (all ranks = 1.0)
    var prevCkpt: Option[DataFrame] = None
    for (k <- 1 to iters) {
      val joined = msgs match {
        case None =>
          contrib.withColumn("__r", lit(1.0))
        case Some(m) =>
          contrib.join(m.withColumnRenamed("dst", "__mid"),
              col("src") === col("__mid"), "left")
            .withColumn("__r", lit(resetProb) +
              lit(1 - resetProb) * coalesce(col("__m"), lit(0.0)))
      }
      var next = joined
        .groupBy(col("dst"))
        .agg(sum(col("__r") / col("__c")).as("__m"))
      if (k % 4 == 0 || k == iters) {
        val ck = materialize(next)
        prevCkpt.foreach(release)
        prevCkpt = Some(ck)
        next = ck
      }
      msgs = Some(next)
    }
    val verts = graph.nodes.select(col("id"))
    val ranks = verts.join(
        msgs.get.withColumnRenamed("dst", "__mid"),
        verts("id") === col("__mid"), "left")
      .select(verts("id"), (lit(resetProb) +
        lit(1 - resetProb) * coalesce(col("__m"), lit(0.0))).as("__r"))
    val ranksCk = materialize(ranks)
    prevCkpt.foreach(release)
    // one finalization job: count + sum together (empty graph ⇒ null sum
    // ⇒ normalize by 1, yielding the correct empty frame)
    val stats = ranksCk.agg(count(lit(1)).as("n"), sum(col("__r")).as("t"))
      .head
    val n = stats.getLong(0).toDouble
    val total = if (stats.isNullAt(1) || stats.getDouble(1) == 0.0) 1.0
      else stats.getDouble(1)
    release(contrib)
    ranksCk.select(col("id"), (col("__r") * n / total).as("pagerank"))
  }

  /** Reference-parity PageRank (`src/algorithms/pagerank.c`, the LAGraph
    * formulation the reference's `algo.pageRank` procedure runs):
    * `r₀ = 1/n`, `t = 0.85·Σ_{u→v} r(u)/outdeg(u) + (0.15/n)·Σr`,
    * iterate until `‖r−t‖² < tol²` or `itermax`, then NORMALIZE to sum 1.
    * Differs from [[pageRank]] (GraphX `staticPageRank`, sum ≈ N) in the
    * teleport coupling to Σr — dangling mass decays into the teleport
    * term instead of being held — and in the normalized output; the flow
    * suite (`tests/flow/test_pagerank.py`) pins the resulting values.
    * Per iteration: one message join + groupBy (two shuffles) plus two
    * driver-scalar reduces (Σr, ‖r−t‖²) — the same per-iteration reduces
    * the reference performs; frames are cut through
    * [[graft.Checkpoints]], so the resilience knob applies.
    */
  def pageRankRef(graph: PropertyGraph, itermax: Int = 100,
      tol: Double = 1e-4): DataFrame = {
    import graft.Checkpoints.{materialize, release}
    val verts = graph.nodes.select(col("id"))
    val nL = verts.count()
    if (nL == 0L)
      return verts.select(col("id"), lit(0.0).as("pagerank"))
    val n = nL.toDouble
    val edges = graph.edges.select(col("src"), col("dst")).distinct()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("__c"))
    val contrib = materialize(edges.join(outdeg, "src")
      .select(col("src"), col("dst"), col("__c"))
      .repartition(col("src")))
    var r = materialize(verts.select(col("id"), lit(1.0 / n).as("__r")))
    var rdiff = Double.MaxValue
    var k = 0
    while (k < itermax && rdiff > tol * tol) {
      k += 1
      val rsum = r.agg(sum(col("__r"))).head.getDouble(0)
      val msgs = contrib.join(r.withColumnRenamed("id", "__rid"),
          col("src") === col("__rid"))
        .groupBy(col("dst"))
        .agg(sum(col("__r") / col("__c")).as("__m"))
      val t = materialize(verts.join(
          msgs.withColumnRenamed("dst", "__mid"),
          verts("id") === col("__mid"), "left")
        .select(verts("id"), (lit(0.85) * coalesce(col("__m"), lit(0.0)) +
          lit(0.15 / n) * lit(rsum)).as("__r")))
      rdiff = r.join(t.withColumnRenamed("id", "__tid")
          .withColumnRenamed("__r", "__t"), col("id") === col("__tid"))
        .agg(sum(pow(col("__r") - col("__t"), 2))).head.getDouble(0)
      release(r)
      r = t
    }
    val total = r.agg(sum(col("__r"))).head.getDouble(0)
    val out = r.select(col("id"),
      (col("__r") / lit(if (total == 0.0) 1.0 else total)).as("pagerank"))
    release(contrib)
    out
  }

  /** Connected components over a bare (src, dst) pair list; vertices are
    * the ids appearing in the pairs. Component label = the smallest vertex
    * id in the component (GraphX's convention).
    */
  def componentsOfPairs(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val eRdd = edgeRdd(pairs.select(col("src"), col("dst")))
    XGraph.fromEdges(eRdd, (), StorageLevel.MEMORY_AND_DISK,
        StorageLevel.MEMORY_AND_DISK)
      .connectedComponents().vertices.toDF("id", "component")
  }

  /** Connected components (undirected) via GraphX. */
  def connectedComponents(graph: PropertyGraph): DataFrame = {
    val spark = graph.nodes.sparkSession
    import spark.implicits._
    val vRdd = vertexRdd(graph.nodes.select(col("id")))
    val eRdd = edgeRdd(graph.edges.select(col("src"), col("dst")))
    val g = XGraph(vRdd, eRdd, (), StorageLevel.MEMORY_AND_DISK,
      StorageLevel.MEMORY_AND_DISK)
    g.connectedComponents().vertices.toDF("id", "component")
  }
}

/** Minimal primitive Long→Double accumulator map: open addressing, linear
  * probing, power-of-two capacity. Exists because the generic alternatives
  * both tax the pagerank hot loop: `reduceByKey`/`cogroup`'s
  * ExternalAppendOnlyMap size-samples inserts via SizeEstimator reflection
  * walks (the measured dominant cost), and
  * `scala.collection.mutable.LongMap` boxes its Double values on every
  * update. Single-task lifetime only — never serialized, never spills.
  */
private[graph] final class LongDoubleMap(expected: Int) {
  private[this] var cap = {
    var c = 8
    val target = math.min(1 << 29, math.max(1, expected)).toLong * 2
    while (c < target) c <<= 1
    c
  }
  private[this] var mask = cap - 1
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Double](cap)
  private[this] var occ = new Array[Boolean](cap)
  private[this] var n = 0

  // 64-bit odd-constant multiply + fold: spreads the sequential vertex ids
  // the HashPartitioner's modulo already grouped
  private def slot(k: Long): Int = {
    var h = k * -7046029254386353131L
    h ^= h >>> 32
    h.toInt & mask
  }

  /** vals(k) += v, inserting if absent. */
  def add(k: Long, v: Double): Unit = {
    var i = slot(k)
    while (occ(i) && keys(i) != k) i = (i + 1) & mask
    if (occ(i)) vals(i) += v
    else {
      occ(i) = true; keys(i) = k; vals(i) = v; n += 1
      if (n.toLong * 10 >= cap.toLong * 7) grow()
    }
  }

  def getOrElse(k: Long, d: Double): Double = {
    var i = slot(k)
    while (occ(i)) {
      if (keys(i) == k) return vals(i)
      i = (i + 1) & mask
    }
    d
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals; val oo = occ
    cap <<= 1; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Double](cap)
    occ = new Array[Boolean](cap); n = 0
    var i = 0
    while (i < ok.length) { if (oo(i)) add(ok(i), ov(i)); i += 1 }
  }

  def iterator: Iterator[(Long, Double)] = new Iterator[(Long, Double)] {
    private[this] var i = 0
    private def advance(): Unit = while (i < cap && !occ(i)) i += 1
    advance()
    def hasNext: Boolean = i < cap
    def next(): (Long, Double) = {
      val r = (keys(i), vals(i)); i += 1; advance(); r
    }
  }
}
