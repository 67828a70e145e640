package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** User-facing engine entry point: `GRAPH.QUERY` ≡ `session.run(cypher)`
  * (`/root/reference/src/commands/cmd_query.c`). Holds the session's
  * property graph; CREATE mutates it (append), read queries translate to
  * DataFrame plans.
  *
  * At scale the graph lives in bucketed Parquet/Delta tables and CREATE is a
  * transactional append (SURVEY §2.5); here mutation is in-memory
  * union+localCheckpoint with the same dataframes-in/dataframes-out shape.
  */
class CypherSession(val spark: SparkSession) {

  // Point lookups resolve via take(cap): with the default initial limit
  // scan of 1 partition, a match living in partition k costs up to
  // log4(k) SEQUENTIAL scale-up jobs — pure scheduler latency on the
  // point-op path. Scanning defaultParallelism partitions in the first
  // job keeps take() a single parallel round on any graph up to that
  // partition count (and still caps driver results).
  spark.conf.set("spark.sql.limit.initialNumPartitions",
    spark.sparkContext.defaultParallelism)

  /** Relationship-uniqueness scope for MATCH patterns.
    *
    *  - `"all"` (default): openCypher relationship isomorphism — every
    *    relationship in a pattern, named or anonymous, must bind a
    *    distinct edge (the TCK's uniqueness scenarios pin this).
    *  - `"named"`: the reference's documented behavior
    *    (`docs/known_limitations.md` "Relationship uniqueness in
    *    patterns") — a relationship that is never referenced elsewhere is
    *    a pure reachability test, so ANONYMOUS relationships do not
    *    participate in cross-edge uniqueness checks. Under this scope
    *    `MATCH (n)-[:act]->(m)<-[:act]-(a)` can bind the SAME edge to
    *    both anonymous slots (the imdb co-actor golden includes the
    *    anchor actor itself). Note: the reference's other half of that
    *    limitation — collapsing parallel anonymous edges to one
    *    reachability row — is NOT reproduced; per-edge multiplicity
    *    stays openCypher.
    *
    * Seeded from the session conf `graft.cypher.edgeUniquenessScope`.
    */
  @volatile var edgeUniquenessScope: String =
    spark.conf.get("graft.cypher.edgeUniquenessScope", "all")

  val nodeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("label", StringType),
    StructField("props", Values.propsType.asInstanceOf[MapType])))

  val edgeSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("reltype", StringType),
    StructField("props", Values.propsType.asInstanceOf[MapType])))

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(java.util.Collections.emptyList[Row](), schema)

  private var graphStore: PropertyGraph = PropertyGraph(
    emptyDf(nodeSchema), emptyDf(edgeSchema))

  /** Point writes only mark the overlay dirty; the overlay VIEW (base
    * filter ∪ pending local relation) is built lazily on the next read, so
    * a hot write burst is pure driver-map work (see [[PointWrite]]).
    */
  @volatile private[cypher] var overlayDirty = false

  def graph: PropertyGraph = {
    if (overlayDirty) writeLock.synchronized {
      if (overlayDirty) {
        graphStore = PointWrite.materialize(this, pointWrites, graphStore)
        overlayDirty = false
      }
    }
    graphStore
  }

  def graph_=(g: PropertyGraph): Unit = graphStore = g

  /** Serializes mutating statements (single-writer discipline). */
  private val writeLock = new Object

  // ── checkpoint lifecycle ──────────────────────────────────────────────────
  // Every eager/lazy localCheckpoint this session causes (graph snapshots,
  // row-id pins, var-len frontiers, merge id sets, fulltext indexes) is
  // TRACKED, and superseded blocks are unpersisted — on a long-lived session
  // the block store stays bounded at ~2 graph generations instead of growing
  // with every mutation/traversal (≡ Delta vacuuming old table versions).
  // Rotation is one generation DELAYED so a reader still draining a result
  // built just before a commit keeps its blocks.
  private val ckptCur =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()
  private var ckptOld =
    List.empty[org.apache.spark.rdd.RDD[_]]
  /** A tracked checkpoint ages out after exactly TWO rotations (cur → old →
    * released); when none are due, the statement boundary skips the
    * rotation's plan walk entirely — the point-write burst path (no
    * checkpoints at all) stays at its sub-0.1ms p50.
    */
  @volatile private var ckptRotationsDue = 0

  /** Track a checkpointed frame for later release. Returns `df`. */
  private[graft] def track(df: DataFrame): DataFrame = {
    org.apache.spark.sql.GraftRdd.checkpointedRdd(df).foreach { r =>
      ckptCur.add(r)
      ckptRotationsDue = 2
    }
    df
  }

  /** `df.localCheckpoint(eager)` + lifecycle tracking. */
  private[graft] def trackCkpt(df: DataFrame, eager: Boolean = true): DataFrame =
    track(df.localCheckpoint(eager))

  /** Read results handed out recently enough that a consumer may still be
    * draining them. Reads are lock-free, so a writer can rotate the block
    * store while another thread holds an undrained result frame referencing
    * a superseded snapshot — local checkpoints have no lineage, so losing
    * those blocks is a hard `CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND`, not a
    * recompute (the r13 TCK transient; CkptRotationSpec reproduces it).
    * Rotation treats the referenced RDDs of the last [[RecentReads]]
    * results as live; the pin is bounded — a frame older than
    * [[RecentReads]] subsequent reads ages out like a dropped table.
    */
  private val RecentReads = 16
  private val recentReads = new java.util.ArrayDeque[Set[Int]]()

  /** Register a result frame's referenced snapshots as rotation-live.
    * Returns `df`. Cheap: one logical-plan walk, no job.
    */
  private[cypher] def rememberRead(df: DataFrame): DataFrame = {
    val ids = org.apache.spark.sql.GraftRdd.referencedRdds(df)
      .map(_.id).toSet
    if (ids.nonEmpty) recentReads.synchronized {
      recentReads.addLast(ids)
      while (recentReads.size > RecentReads) recentReads.removeFirst()
    }
    df
  }

  private def recentReadIds: Set[Int] = recentReads.synchronized {
    import scala.jdk.CollectionConverters._
    recentReads.iterator.asScala.flatten.toSet
  }

  /** Unpersist the generation before last, excluding anything the live
    * snapshot still references (an untouched side skips re-checkpointing,
    * so a years-old RDD can legitimately back the current graph) and
    * anything a recently-served read may still be draining.
    */
  private def rotateCkpts(): Unit = {
    val live: Set[Int] =
      Seq(graphStore.nodes, graphStore.edges)
        .flatMap(org.apache.spark.sql.GraftRdd.referencedRdds)
        .map(_.id).toSet ++ recentReadIds
    ckptOld.foreach(r => if (!live.contains(r.id)) r.unpersist(blocking = false))
    val keep = ckptOld.filter(r => live.contains(r.id))
    ckptOld = keep
    var n = ckptCur.poll()
    val cur = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    while (n != null) { cur += n; n = ckptCur.poll() }
    ckptOld = ckptOld ++ cur.toList
  }

  /** Release EVERY block this session owns (both generations, the live
    * snapshot, index views, fulltext indexes). Call when the session is
    * done; subsequent reads against previously returned DataFrames will
    * recompute-fail, like reading a dropped table.
    */
  def release(): Unit = writeLock.synchronized {
    (ckptOld ++ Seq(graphStore.nodes, graphStore.edges)
      .flatMap(org.apache.spark.sql.GraftRdd.referencedRdds))
      .foreach(_.unpersist(blocking = false))
    ckptOld = Nil
    var n = ckptCur.poll()
    while (n != null) { n.unpersist(blocking = false); n = ckptCur.poll() }
    indexViews.values.foreach(_.unpersist(blocking = false))
    indexViews = Map.empty
    ftIndexes.values.foreach { case (_, _, df) =>
      org.apache.spark.sql.GraftRdd.checkpointedRdd(df)
        .foreach(_.unpersist(blocking = false))
    }
    ftIndexes.clear()
  }

  /** Pending point-write overlay (see [[PointWrite]]); mutated only under
    * [[writeLock]].
    */
  private val pointWrites = new PointWrite.State

  /** Test/diagnostic visibility into the point-write overlay: (live
    * pending rows, estimated pending bytes, WAL segments written this
    * epoch) — the byte-bound/spill contract is asserted through this.
    */
  private[graft] def pointOverlayInfo: (Int, Long, Int) =
    (pointWrites.pending.size, pointWrites.pendingBytes, pointWrites.walSeq)

  /** A point write landed in the pending map: bump the version and defer
    * the overlay view build to the next read.
    */
  private[cypher] def markPointWrite(): Unit = {
    overlayDirty = true
    graphVersion += 1
  }

  // id allocation is lazy: the max-id scan only runs when a mutation first
  // needs a fresh id, so read-only sessions never pay it
  private var nextNodeId: Option[Long] = Some(0L)
  private var nextEdgeId: Option[Long] = Some(0L)

  /** Install an externally built graph (e.g. GraphBuilder.tpch). */
  def setGraph(g: PropertyGraph): Unit = {
    graph = g
    nextNodeId = None
    nextEdgeId = None
    graphVersion += 1
    pointWrites.clear()
  }

  /** Replay a durable point-write WAL (`graft.pointwrite.walDir`) over
    * the current graph — call right after [[setGraph]] on a restored
    * base (ids must denote the same entities). Returns the number of
    * recovered upsert rows; 0 when no durable dir is configured or no
    * complete segment exists. See [[PointWrite]] for the idempotence and
    * single-writer contract.
    */
  def recoverPointWrites(): Long =
    writeLock.synchronized(PointWrite.recover(this, pointWrites))

  private def maxId(df: DataFrame): Long =
    if (df.isEmpty) -1L
    else df.agg(max("id")).head().getLong(0)

  private[cypher] def nodeIdBase: Long = nextNodeId.getOrElse {
    val v = maxId(graph.nodes) + 1; nextNodeId = Some(v); v
  }
  private[cypher] def edgeIdBase: Long = nextEdgeId.getOrElse {
    val v = maxId(graph.edges) + 1; nextEdgeId = Some(v); v
  }

  /** Append externally built node/edge rows to the graph (streaming ingest
    * / bulk increments; at scale: a Delta append per micro-batch). Schemas
    * must match nodeSchema/edgeSchema.
    */
  def append(nodes: DataFrame, edges: DataFrame): Unit =
    commit(graph.nodes.unionByName(nodes), graph.edges.unionByName(edges))

  /** Swap in a mutated graph; `localCheckpoint` materializes the new tables
    * (≡ the Delta table rewrite/commit at scale) and truncates lineage so
    * chained mutations don't stack plans.
    */
  private[cypher] def commit(nodes: DataFrame, edges: DataFrame): Unit = {
    // an untouched side (edge-only delete, node-only create) re-commits
    // the SAME frame — already materialized, skip the redundant checkpoint
    def ckpt(df: DataFrame, cur: DataFrame, overlaid: Boolean): DataFrame =
      if ((df eq cur) && !overlaid) df
      else {
        // a SMALL snapshot (Catalyst size estimate, no job) checkpoints
        // into few partitions: every subsequent point-write resolution is
        // a full sweep of these blocks, and 32 near-empty tasks cost more
        // scheduling than data (the delete-edge KPI's whole p50). Large
        // graphs keep their partitioning — the estimate errs 1000× before
        // a 4 MB cap misclassifies anything that needs parallel scans.
        // No partition-count probe: under AQE, `toRdd` would materialize
        // exchange stages whose work the checkpoint then re-runs, and
        // coalesce never INCREASES a partition count, so it is a plan-only
        // no-op when the frame is already narrow.
        val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val d = if (est < 4L * 1024 * 1024) df.coalesce(4) else df
        trackCkpt(d)
      }
    graph = PropertyGraph(
      ckpt(nodes, graph.nodes, pointWrites.nodesOverlaid),
      ckpt(edges, graph.edges, pointWrites.edgesOverlaid))
    nextNodeId = None
    nextEdgeId = None
    graphVersion += 1
    // the checkpoint folds any pending point-write overlay into the
    // materialized snapshot — the overlay is spent
    pointWrites.clear()
  }

  // ═══════════════════════ ad-hoc procedures ═══════════════════════════════
  /** User-registered table-valued procedures (CALL surface beyond the
    * reference's compiled-in registry, `src/procedures/procedure.c:29-42`).
    * Keyed case-insensitively like the built-ins.
    */
  private var adHocProcs: Map[String, Procedures.AdHocProc] = Map.empty

  /** Register a procedure from a TCK-style signature
    * (`test.proc(a :: INTEGER?) :: (out :: STRING?)`) and its defining
    * table (header = argument+output column names; rows = Scala values).
    */
  def registerProcedure(signature: String, header: Seq[String],
      rows: Seq[Seq[Any]]): Unit = {
    val (name, args, outs) = Procedures.parseSignature(signature)
    // normalize numeric cells (Int → Long) so boxed argument equality at
    // invoke time never misses on representation (`(1: Any) == (1L: Any)`
    // is false on the JVM)
    def norm(v: Any): Any = v match {
      case i: Int => i.toLong
      case other => other
    }
    adHocProcs += name.toLowerCase -> Procedures.AdHocProc(
      name, args, outs, header.toList, rows.map(_.toList.map(norm)).toList)
  }

  private[cypher] def adHocProc(name: String): Option[Procedures.AdHocProc] =
    adHocProcs.get(name.toLowerCase)

  /** Registered ad-hoc procedures, for `dbms.procedures()`. */
  private[cypher] def adHocProcList: Seq[Procedures.AdHocProc] =
    adHocProcs.values.toSeq.sortBy(_.name)

  /** Query-string → AST LRU cache (≡ the reference's execution-plan cache,
    * `src/commands/execution_ctx.c:79-87`; Catalyst plans re-derive from the
    * AST so caching the parse is the Spark-side equivalent).
    */
  private val astCache =
    new java.util.LinkedHashMap[String, Ast.Query](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Ast.Query]): Boolean = size > 256
    }

  private[cypher] def parse(query: String): Ast.Query = astCache.synchronized {
    Option(astCache.get(query)).getOrElse {
      val ast = CypherParser.parse(query) match {
        case Right(q) => q
        case Left(err) => throw Translator.TranslateError(err)
      }
      // semantic validation is a pure function of the AST — run it once
      // per unique query string here so point-write statements (tens of
      // thousands/s through [[run]]) don't re-walk the tree per execution;
      // only validated ASTs enter the cache
      Validate.check(ast)
      astCache.put(query, ast)
      ast
    }
  }

  /** Run a Cypher query. Mutating statements return an empty DataFrame with
    * a statistics-bearing schema; reads return the result frame.
    */
  def run(query: String, params: Map[String, Any] = Map.empty): DataFrame = {
    // `CYPHER k=v …` wire-prefix parameters; an explicit params map wins
    // on conflict (client API over wire syntax)
    val (prefix, body) = CypherParser.splitParams(query)
    val allParams = if (prefix.isEmpty) params else prefix ++ params
    val ast = parse(body) // validated on first parse (see [[parse]])
    ast.parts.head.clauses match {
      case List(Ast.CreateIndex(label, props)) =>
        require(ast.parts.size == 1, "index DDL cannot be UNIONed")
        // per-property accounting (test_index_create.py test02): each new
        // (label, prop) counts once; duplicates — pre-existing OR repeated
        // within the statement — are no-ops
        indicesFrame(props.count(p => createIndex(label, p)).toLong)
      case List(Ast.DropIndex(label, prop)) =>
        require(ast.parts.size == 1, "index DDL cannot be UNIONed")
        indicesFrame(if (dropIndex(label, prop)) -1 else 0)
      case List(cp: Ast.CallProc)
          if cp.name.equalsIgnoreCase("db.idx.fulltext.createnodeindex") &&
            cp.yields.isEmpty =>
        // standalone create call: surface the reference's DDL statistics
        // (indices_created counts NEW per-property fulltext indexes,
        // test_index_create.py test01) — invocation happens eagerly
        // during translation, which records the count on the session
        Translator.translate(indexedGraph, ast, allParams, Some(this))
        indicesFrame(lastIndicesCreated)
      case _ if Graft.isMutation(ast) =>
        require(ast.parts.size == 1, "mutations cannot be UNIONed")
        // single-writer / multi-reader (`src/commands/cmd_query.c:156-170`):
        // a mutation reads the current graph and commits a new snapshot —
        // two unserialized writers would each base on the same snapshot and
        // the second commit would erase the first (lost update). Reads stay
        // lock-free on the immutable snapshot they grabbed.
        writeLock.synchronized {
          // seed the schema-version known-set from the PRE-write graph:
          // seeding after the commit would classify this statement's own
          // additions as data-at-rest and miss the bump
          seedSchema()
          // statement boundary: blocks checkpointed TWO mutating
          // statements ago can no longer feed a promptly-consumed result —
          // release them (per-commit rotation would free pins a statement's
          // own RETURN still needs)
          if (ckptRotationsDue > 0) {
            rotateCkpts()
            ckptRotationsDue -= 1
          }
          val res = rememberRead(
            PointWrite.tryRun(this, pointWrites, ast, allParams)
            .orElse(PointWrite.tryDelete(this, pointWrites, ast, allParams,
              body))
            .getOrElse(new MutationRunner(this)
              .run(ast.parts.head.clauses, allParams)))
          // write landed — fold any new labels/types/attribute keys into
          // the wire-protocol schema version
          noteSchema(ast.parts.head.clauses, allParams)
          res
        }
      case _ => rememberRead(countFastPath(ast).getOrElse(
        Translator.translate(indexedGraph, ast, allParams, Some(this))))
    }
  }

  /** Point-read result cache for [[serve]]: query string → (graph version,
    * collected rows). Only stats-served counts land here — their answer is
    * exactly as fresh as the graph statistics, so the same version bump
    * that refreshes the statistics invalidates the cache.
    */
  private val servedCounts =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Array[Row])]()

  /** Point-read serving (the RESP-reply analogue of `GRAPH.QUERY` for a
    * read-only statement): returns the collected result rows. The
    * reference caches the result-producing plan per query string
    * (`src/commands/execution_ctx.c:79-87`) and answers count-only
    * patterns from graph statistics (`optimizations/reduce_count.c`); the
    * composition of the two — a version-stable answer served without
    * re-dispatch — is a memoized row per (query, graphVersion). Everything
    * else falls back to `run().collect()`.
    */
  def serve(query: String, params: Map[String, Any] = Map.empty): Array[Row] = {
    if (params.nonEmpty) return run(query, params).collect()
    val v = graphVersion
    val hit = servedCounts.get(query)
    if (hit != null && hit._1 == v) return hit._2
    val (prefix, body) = CypherParser.splitParams(query)
    if (prefix.isEmpty) {
      val ast = parse(body)
      if (!Graft.isMutation(ast)) {
        countFastPath(ast) match {
          case Some(df) =>
            val out = df.collect()
            if (servedCounts.size > 256) servedCounts.clear()
            servedCounts.put(query, (v, out))
            return out
          case None => ()
        }
      }
    }
    run(query, params).collect()
  }

  // ═══════════════════════ property indexes ════════════════════════════════
  /** Single-property node indexes (reference `src/index/index.c`; created
    * with `CREATE INDEX ON :Label(prop)`). Spark-first mapping: an index on
    * (label, prop) materializes the per-label scan as a CACHED view sorted
    * by the indexed property — Spark's in-memory columnar cache keeps
    * min/max stats per batch and prunes batches against pushed filters, so
    * an indexed equality/range filter becomes a batch-skipping scan (the
    * cached analogue of a B-tree range seek; at rest the same sort order
    * gives parquet row-group pruning / Z-order). Views install into the
    * graph's `byLabel` map, so every label scan the translator emits uses
    * them with no planner changes, and rebuild lazily when the graph
    * version moves (the reference reindexes on write).
    */
  private val propIndexes =
    scala.collection.mutable.LinkedHashSet[(String, String)]()
  private var indexedVersion = -1L
  private var indexViews: Map[String, DataFrame] = Map.empty

  private[cypher] def createIndex(label: String, prop: String): Boolean = {
    val added = propIndexes.add((label, prop))
    if (added) indexedVersion = -1L // force rebuild on next read
    added
  }

  private[cypher] def dropIndex(label: String, prop: String): Boolean = {
    val removed = propIndexes.remove((label, prop))
    if (removed) indexedVersion = -1L
    removed
  }

  /** (label, prop) pairs, creation order — for db.indexes. */
  def propIndexList: Seq[(String, String)] = propIndexes.toSeq

  /** The session graph with index-backed per-label views installed,
    * (re)built if stale. Sort key: the native column when the label view
    * carries one, else the decoded variant from the props map (struct
    * ordering groups by type tag then value — exactly the typed ordering
    * batch pruning needs).
    */
  private[cypher] def indexedGraph: PropertyGraph = {
    if (propIndexes.isEmpty) {
      // last index dropped: release the persisted views and stop overlaying
      // them (a stale overlay would hide post-drop mutations from scans)
      if (indexViews.nonEmpty) {
        indexViews.values.foreach(_.unpersist())
        indexViews = Map.empty
      }
      return graph
    }
    if (indexedVersion != graphVersion) {
      indexViews.values.foreach(_.unpersist())
      indexViews = propIndexes.toSeq.groupBy(_._1).map { case (label, lps) =>
        val base = graph.nodesByLabel(label)
        val sortCols = lps.map(_._2).distinct.flatMap { p =>
          if (base.columns.contains(p)) Some(col(p))
          else if (base.columns.contains("props"))
            Some(element_at(col("props"), p))
          else None
        }
        val view =
          if (sortCols.isEmpty) base
          else base.sortWithinPartitions(sortCols: _*)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        label -> view
      }
      indexedVersion = graphVersion
    }
    if (indexViews.isEmpty) graph
    else graph.copy(byLabel = graph.byLabel ++ indexViews)
  }

  private def indicesFrame(n: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      List(Row(math.max(n, 0L), math.max(-n, 0L))).asJava,
      StructType(Seq(
        StructField("indices_created", LongType),
        StructField("indices_deleted", LongType))))
  }

  // ═══════════════════════ fulltext indexes ════════════════════════════════
  /** Fulltext ≈ tokenized inverted-index DataFrame per label (the reference
    * delegates to RediSearch, `src/index/index.h:29`). Indexes are rebuilt
    * lazily when the graph version moves (reference reindexes on write).
    * At scale the index is a bucketed-by-token Delta table.
    */
  @volatile private var graphVersion = 0L
  private val ftIndexes =
    scala.collection.mutable.Map[String, (List[String], Long, DataFrame)]()

  /** Create/extend the fulltext index on `label`: `props` MERGE into any
    * existing indexed set (the reference counts each new per-property
    * index once and re-creating an existing one is a no-op,
    * `test_index_create.py` test01). Returns the number of NEW properties
    * indexed; the token table is (re)built only when that is non-zero.
    */
  private[cypher] def buildFulltextIndex(label: String,
      rawProps: List[String]): Int = {
    val existing = ftIndexes.get(label).map(_._1).getOrElse(Nil)
    val fresh = rawProps.distinct.filterNot(existing.contains)
    // nothing new AND the stored token table is current → true no-op;
    // a STALE entry must still rebuild (fulltextIndex's lazy-rebuild path
    // re-enters here with the existing props after a graph mutation)
    if (fresh.isEmpty && ftIndexes.get(label).exists(_._2 == graphVersion))
      return 0
    val props = existing ++ fresh
    val toks = graph.nodesByLabel(label)
      .select(col("id"), explode(array(props.map(p =>
        element_at(col("props"), p).getField("s")): _*)).as("text"))
      .filter(col("text").isNotNull)
      .select(col("id"),
        explode(split(lower(col("text")), "[^\\p{L}\\p{N}]+")).as("token"))
      .filter(length(col("token")) > 0)
      .distinct()
    // a rebuild supersedes the previous index checkpoint — release it
    ftIndexes.get(label).foreach { case (_, _, old) =>
      org.apache.spark.sql.GraftRdd.checkpointedRdd(old)
        .foreach(_.unpersist(blocking = false))
    }
    ftIndexes(label) = (props, graphVersion, trackCkpt(toks))
    fresh.length
  }

  /** DDL statistics of the most recent fulltext create call (read by the
    * standalone-CALL path in [[run]] to emit the reference's
    * indices_created result).
    */
  private[cypher] var lastIndicesCreated = 0L

  private[cypher] def fulltextIndex(label: String): Option[DataFrame] =
    ftIndexes.get(label).map { case (props, v, df) =>
      if (v == graphVersion) df
      else { buildFulltextIndex(label, props); ftIndexes(label)._3 }
    }

  private[cypher] def dropFulltextIndex(label: String): Unit =
    ftIndexes.remove(label)

  private[cypher] def fulltextLabels: Seq[String] =
    ftIndexes.keys.toSeq.sorted

  /** Indexed properties of a full-text index (db.indexes reporting). */
  private[cypher] def fulltextProps(label: String): List[String] =
    ftIndexes.get(label).map(_._1).getOrElse(Nil)

  // ═══════════════════════ schema version (wire protocol) ══════════════════
  /** Reference graph-version protocol (`graphcontext.c:202-219` folds,
    * `cmd_dispatcher.c:82-92` enforces): the version is a rolling hash
    * folded over each schema ADDITION — a new label, relationship type,
    * or attribute key — while plain writes that reuse existing schema do
    * not move it (`tests/flow/test_graph_versioning.py`). Clients pass
    * their cached version with a query; a mismatch rejects with
    * "version mismatch" + the current version.
    *
    * Spark-first internals, observable protocol preserved: the fold uses
    * MurmurHash3 (deterministic across JVMs — the same statement sequence
    * yields the same version cluster-wide, the property the reference
    * gets from seeded XXH32; the hash VALUES differ from the reference's).
    * Additions derive from the statement's static label/type/key set plus
    * parameter-map keys, so a mutation that binds zero rows still bumps —
    * the reference folds during execution; the divergence is invisible to
    * the protocol's purpose (client-side cache invalidation errs fresh).
    */
  @volatile private var schemaVer: Long = 0L
  private val knownSchema = scala.collection.mutable.HashSet[String]()
  private var schemaSeeded = false

  /** Current schema version (uint32 range, like the reference's XXH32). */
  def schemaVersion: Long = { seedSchema(); schemaVer }

  private def seedSchema(): Unit = synchronized {
    if (schemaSeeded) return
    schemaSeeded = true
    // a pre-existing graph's schema is data-at-rest, not an addition:
    // seed the known set WITHOUT moving the version (the reference
    // rebuilds its attribute rax from the RDB the same way) — labels and
    // types from the served statistics, attribute keys from one distinct
    // scan (at rest this comes from the store's column metadata)
    val g = graph
    g.labelCounts.keys.filter(_.nonEmpty)
      .flatMap(_.split(":")).foreach(l => knownSchema += s"L:$l")
    g.reltypeCounts.keys.filter(_.nonEmpty)
      .foreach(r => knownSchema += s"R:$r")
    g.propKeyCatalog match {
      case Some(keys) =>
        // stored graph: the at-rest key catalog (GraphStore _meta) is the
        // seed — a driver-side read, no scan
        keys.foreach(k => knownSchema += s"A:$k")
      case None if g.labelCounts.nonEmpty || g.reltypeCounts.nonEmpty =>
        val nk = g.nodes.select(explode(map_keys(col("props"))).as("k"))
        val ek = g.edges.select(explode(map_keys(col("props"))).as("k"))
        nk.unionByName(ek).distinct().collect()
          .foreach(r => knownSchema += s"A:${r.getString(0)}")
      case None => ()
    }
  }

  private def foldSchema(s: String): Unit =
    schemaVer = scala.util.hashing.MurmurHash3
      .stringHash(s, schemaVer.toInt).toLong & 0xFFFFFFFFL

  /** Fold any genuinely-new schema strings of a just-committed mutation
    * statement into the version (no-op when everything is known).
    */
  private[cypher] def noteSchema(clauses: List[Ast.Clause],
      params: Map[String, Any]): Unit = synchronized {
    seedSchema()
    val adds = scala.collection.mutable.LinkedHashSet[String]()
    def addLabel(l: String): Unit =
      l.split(":").filter(_.nonEmpty).foreach(x => adds += s"L:$x")
    def addRel(r: String): Unit = adds += s"R:$r"
    def addAttr(a: String): Unit = adds += s"A:$a"
    def walkPath(p: Ast.PathPat): Unit = {
      def node(n: Ast.NodePat): Unit = {
        n.label.foreach(addLabel); n.props.foreach(kv => addAttr(kv._1))
      }
      node(p.head)
      p.tail.foreach { case (r, n) =>
        r.types.foreach(addRel); r.props.foreach(kv => addAttr(kv._1))
        node(n)
      }
    }
    def setItem(it: Ast.SetItem): Unit = it match {
      case Ast.SetItem(_, Some(Ast.LabelKey), Ast.LitString(l)) =>
        addLabel(l)
      case Ast.SetItem(_, Some(Ast.LabelKey), _) => ()
      case Ast.SetItem(_, Some(k), _) => addAttr(k)
      case Ast.SetItem(_, None, Ast.MapLit(entries)) =>
        entries.foreach(kv => addAttr(kv._1))
      case Ast.SetItem(_, None, Ast.Param(p)) =>
        params.get(p) match {
          case Some(m: Map[_, _]) => m.keys.foreach(k => addAttr(k.toString))
          case Some(m: java.util.Map[_, _]) =>
            m.keySet.forEach(k => addAttr(k.toString))
          case _ => ()
        }
      case _ => ()
    }
    clauses.foreach {
      case c: Ast.Create => c.paths.foreach(walkPath)
      case m: Ast.Merge =>
        walkPath(m.path)
        m.onMatch.foreach(setItem); m.onCreate.foreach(setItem)
      case s: Ast.SetClause => s.items.foreach(setItem)
      case _ => ()
    }
    adds.toList.filterNot(knownSchema.contains).foreach { s =>
      knownSchema += s; foldSchema(s)
    }
  }

  /** GRAPH.PROFILE sink for write statements: while set (Graft.profile),
    * write ops record the row counts they process, keyed by rendered op
    * name; counts from fused clauses accumulate.
    */
  @volatile private[cypher] var profileSink:
    Option[scala.collection.concurrent.TrieMap[String, Long]] = None

  private[cypher] def profileRecord(op: String, rows: Long): Unit =
    profileSink.foreach { m =>
      m.updateWith(op) { prev => Some(prev.getOrElse(0L) + rows) }; ()
    }

  /** `reduceCount` (`optimizations/reduce_count.c:13-40`): a count-only
    * MATCH over a bare node or relationship pattern answers from graph
    * statistics — no scan, no shuffle. This is what makes
    * `MATCH (n:L) RETURN count(n)` competitive with the reference's 2ms
    * point reads (BASELINE entity_count.yml).
    */
  /** One-row variant frame over a LocalRelation: `ConvertToLocalRelation`
    * folds the projection, and collect() takes the driver-local
    * `executeCollect` fast path — NO Spark job per point read (a
    * `spark.range(1)` base would schedule a 1-task cluster job each call,
    * capping point-op throughput at the scheduler rate).
    */
  private val statFrameCache =
    scala.collection.concurrent.TrieMap[(Long, String), DataFrame]()

  private def statRow(c: Long, name: String): DataFrame = {
    // memoized per (count, alias): a DataFrame's QueryExecution analyzes
    // once and is reused, so repeated point reads are pure executeCollect —
    // the Spark-side analogue of the reference's cached execution plan.
    // Bounded: a mutating session observes many distinct counts; clear
    // rather than grow without bound (cf. astCache's LRU cap).
    if (statFrameCache.size > 64) statFrameCache.clear()
    statFrameCache.getOrElseUpdate((c, name),
      spark.createDataFrame(
          java.util.Collections.singletonList(Row(1)),
          StructType(Seq(StructField("__one", IntegerType))))
        .select(Values.vInt(lit(c)).as(name)))
  }

  /** Some((target, alias)) when `ast` is a stats-servable count — the
    * reference's `optimizations/reduce_count.c` shapes: `MATCH (n[:L])
    * RETURN count(n|*)` (Left(labelOpt)) and `MATCH ()-[r[:T|:U]]->()
    * RETURN count(r|*)` (Right(types)). Shape test only (no statistics
    * touched) — shared by the serving fast path and by PlanRender, whose
    * EXPLAIN then shows Results+Project with no scan/traverse/aggregate,
    * the exact plan the reference's flow tests assert.
    */
  private[cypher] def statsCountTarget(ast: Ast.Query)
      : Option[(Either[Option[String], List[String]], String)] = {
    def projCount(proj: Ast.Projection, countee: Option[String]):
        Option[String] = proj match {
      case Ast.Projection(false, List((item, alias)), Nil, None, None) =>
        item match {
          case Ast.CountStar => Some(alias.getOrElse("count(*)"))
          case Ast.Fn("count", List(Ast.Variable(v)), false)
              if countee.forall(_ == v) => Some(alias.getOrElse("count"))
          case _ => None
        }
      case _ => None
    }
    ast.parts match {
      case List(Ast.SingleQuery(List(Ast.Match(false, List(p), None),
          Ast.Return(proj)))) => p match {
        // MATCH (n[:L]) RETURN count(n)
        case Ast.PathPat(None, Ast.NodePat(v, label, Nil, _), Nil, false, _) =>
          projCount(proj, v).map(name => (Left(label), name))
        // MATCH ()-[r[:T|:U]]->() RETURN count(r) — multi-type sums the
        // per-type statistics like the reference's reduce_count
        case Ast.PathPat(None, Ast.NodePat(None, None, Nil, _),
            List((Ast.RelPat(rv, types, Nil, 1, None),
              Ast.NodePat(None, None, Nil, _))), false, _) =>
          projCount(proj, rv).map(name => (Right(types), name))
        case _ => None
      }
      case _ => None
    }
  }

  private def countFastPath(ast: Ast.Query): Option[DataFrame] =
    statsCountTarget(ast).map {
      case (Left(label), name) =>
        // label keys are ':'-joined label lists — a :L count sums every
        // key whose label set contains all requested components
        val c = label.map { l =>
          val parts = l.split(":").filter(_.nonEmpty).toSet
          graph.labelCounts.collect {
            case (k, n) if parts.subsetOf(k.split(":").toSet) => n
          }.sum
        }.getOrElse(graph.nodeCount)
        statRow(c, name)
      case (Right(Nil), name) => statRow(graph.edgeCount, name)
      case (Right(types), name) =>
        statRow(types.map(t => graph.reltypeCounts.getOrElse(t, 0L)).sum,
          name)
    }

  /** Decode a result DataFrame into Scala values (tests / client serving):
    * variants → Long/Double/String/Boolean/Seq/null; entities → Map.
    */
  def rows(df: DataFrame): Seq[Map[String, Any]] = {
    val cols = df.columns
    df.collect().toSeq.map { r =>
      cols.zipWithIndex.map { case (c, i) => c -> decode(r.get(i)) }.toMap
    }
  }

  private def decode(v: Any): Any = v match {
    case null => null
    case r: Row if r.schema != null &&
        r.schema.fieldNames.take(5).sameElements(
          Array("t", "i", "f", "s", "b")) =>
      decodeVariant(r)
    case r: Row if r.schema != null && r.schema.fieldNames.sameElements(
        Array("nodes", "rels")) => // path value
      Map("nodes" -> decode(r.get(0)), "rels" -> decode(r.get(1)))
    case r: Row if r.schema != null && r.schema.fieldNames.contains("props") =>
      r.schema.fieldNames.zipWithIndex.map { case (f, i) =>
        f -> decode(r.get(i))
      }.toMap
    case r: Row if r.schema != null => // typed map-value struct
      r.schema.fieldNames.zipWithIndex.collect {
        case (f, i) if f != Translator.EmptyMapMarker => f -> decode(r.get(i))
      }.toMap
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k -> decode(x) }.toMap
    case s: scala.collection.Seq[_] => s.map(decode).toList
    case other => other
  }

  private[cypher] def decodeVariant(r: Row): Any = {
    r.getInt(r.fieldIndex("t")) match {
      case Values.T_INT => r.getLong(r.fieldIndex("i"))
      case Values.T_FLOAT => r.getDouble(r.fieldIndex("f"))
      case Values.T_STRING => r.getString(r.fieldIndex("s"))
      case Values.T_BOOL => r.getBoolean(r.fieldIndex("b"))
      case Values.T_ARRAY =>
        val arr = r.getSeq[Row](r.fieldIndex("arr"))
        arr.map(e => if (e == null) null else decodeVariant(e)).toList
      case Values.T_POINT =>
        val arr = r.getSeq[Row](r.fieldIndex("arr"))
        Map("latitude" -> arr(0).getDouble(arr(0).fieldIndex("f")),
          "longitude" -> arr(1).getDouble(arr(1).fieldIndex("f")))
      case Values.T_BOXED =>
        CypherSession.decodeBoxedJson(r.getString(r.fieldIndex("s")))
      case t if t >= Values.T_DATE && t <= Values.T_DURATION =>
        // temporal values present as their canonical ISO string (the TCK's
        // expected-value language has no temporal literals — strings are
        // the exchange form)
        val i = r.fieldIndex("i"); val f = r.fieldIndex("f")
        val s = r.fieldIndex("s")
        TemporalOps.render(TemporalOps.fromFields(t,
          if (r.isNullAt(i)) 0L else r.getLong(i),
          if (r.isNullAt(f)) 0.0 else r.getDouble(f),
          if (r.isNullAt(s)) null else r.getString(s)))
      case _ => null
    }
  }
}

object CypherSession {
  /** Query/document tokenizer shared by index build and fulltext search. */
  def tokenize(q: String): Seq[String] =
    q.toLowerCase.split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq

  /** Parse a boxed tagged-JSON value (Values.T_BOXED — entities/maps/deep
    * lists carried inside list values) back to the decoded Scala shapes
    * `rows`/`decode` produce for inline values (entities → Map with
    * id/label/props keys, so result comparison can't tell boxed from
    * inline). Jackson ships with Spark.
    */
  private[cypher] def decodeBoxedJson(js: String): Any = {
    if (js == null) return null
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    decodeJsonNode(mapper.readTree(js))
  }

  private def decodeJsonNode(
      n: com.fasterxml.jackson.databind.JsonNode): Any = {
    import scala.jdk.CollectionConverters._
    if (n == null || n.isNull) return null
    def propsOf(p: com.fasterxml.jackson.databind.JsonNode): Any =
      if (p == null || p.isNull) Map.empty[String, Any]
      else p.fields().asScala.map(e =>
        e.getKey -> decodeJsonNode(e.getValue)).toMap
    // plain (untagged) shapes appear for typed-map struct VALUES —
    // nested maps and typed arrays serialize without a tag
    if (n.isArray)
      return n.elements().asScala.map(decodeJsonNode).toList
    if (!n.isObject || !n.has("t"))
      return (
        if (n.isTextual) n.asText()
        else if (n.isBoolean) n.asBoolean()
        else if (n.isIntegralNumber) n.asLong()
        else if (n.isNumber) n.asDouble()
        else if (n.isObject) n.fields().asScala
          .filter(_.getKey != Translator.EmptyMapMarker)
          .map(e => e.getKey -> decodeJsonNode(e.getValue)).toMap
        else null)
    n.get("t").asInt() match {
      case t if t >= Values.T_DATE && t <= Values.T_DURATION =>
        TemporalOps.render(TemporalOps.fromFields(t,
          Option(n.get("i")).filterNot(_.isNull).map(_.asLong()).getOrElse(0L),
          Option(n.get("f")).filterNot(_.isNull).map(_.asDouble()).getOrElse(0.0),
          Option(n.get("s")).filterNot(_.isNull).map(_.asText()).orNull))
      case Values.T_INT => n.get("i").asLong()
      case Values.T_FLOAT => n.get("f").asDouble()
      case Values.T_STRING => n.get("s").asText()
      case Values.T_BOOL => n.get("b").asBoolean()
      case Values.T_ARRAY =>
        val arr = n.get("arr")
        if (arr == null || arr.isNull) List.empty[Any]
        else arr.elements().asScala.map(decodeJsonNode).toList
      case Values.T_NODE => Map(
        "id" -> n.get("id").asLong(),
        "label" -> Option(n.get("label")).filterNot(_.isNull)
          .map(_.asText()).orNull,
        "props" -> propsOf(n.get("props")))
      case Values.T_EDGE => Map(
        "id" -> n.get("id").asLong(),
        "src" -> n.get("src").asLong(),
        "dst" -> n.get("dst").asLong(),
        "reltype" -> Option(n.get("reltype")).filterNot(_.isNull)
          .map(_.asText()).orNull,
        "props" -> propsOf(n.get("props")))
      case Values.T_BOXED_MAP =>
        val m = n.get("m")
        if (m == null || m.isNull) Map.empty[String, Any]
        else m.fields().asScala
          .filter(_.getKey != Translator.EmptyMapMarker)
          .map(e => e.getKey -> decodeJsonNode(e.getValue)).toMap
      case _ => null
    }
  }
}
