package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Point-write fast path: `MATCH (n[:L]) WHERE id(n) = <const> SET n.k = …`
  * evaluated on the driver against a pending-row overlay instead of a full
  * snapshot commit.
  *
  * The reference serves `updates_baseline` KPI-style writes as in-place
  * memory stores (`src/graph/entities/graph_entity.c` AttributeSet updates)
  * at tens of thousands of q/s; a per-statement snapshot commit
  * (localCheckpoint of the whole graph) costs ~1 s of fixed Spark-job
  * overhead regardless of data size, 4 orders of magnitude off. This path
  * is the Delta-style upsert buffer in miniature: hot rows live in a
  * driver-side pending map, reads see `base.filter(¬pending) ∪
  * localRelation(pending)` (constant-depth plan, no job to build), and
  * every [[CompactEvery]] writes — or any non-point mutation — the overlay
  * folds into a real checkpointed snapshot through the normal commit. At
  * 100 TB the pending map is a Delta write-ahead table and compaction is
  * `MERGE INTO`; the read shape is identical.
  */
private[cypher] object PointWrite {

  /** Overlay BYTE bound (not an op count): when the driver-held pending
    * map's estimated footprint crosses this, it spills to a local
    * write-ahead parquet segment and the map empties — sustained point
    * writes hold a FLAT driver footprint instead of growing per op or
    * paying a full-graph snapshot every N statements. The at-scale
    * analogue is the Delta write-ahead table this overlay miniaturizes:
    * spill = WAL append/compact, snapshot commit = MERGE INTO. Override
    * with spark conf `graft.pointwrite.maxOverlayBytes`.
    */
  private val DefaultMaxOverlayBytes = 1L << 20

  /** WAL-side safety valve (the upsert analogue of [[MaxDeletionIds]]):
    * each spill merge-rewrites the accumulated WAL into a new segment, so
    * a sustained SET workload over DISTINCT keys pays O(N²) write I/O and
    * disk across an epoch if nothing bounds it. Once the merged WAL
    * crosses this many bytes at rest, the next spill folds the overlay
    * into a real snapshot commit instead (one bounded MERGE-style
    * compaction, clears every segment). With the 1 MiB overlay spill unit
    * the worst case inside the valve is ~64 rewrites totalling ~2 GiB of
    * transient writes — the price of keeping the WAL a FLAT parquet scan
    * (the cached point-lookup plans must stay exchange-free). Override
    * with `graft.pointwrite.maxWalBytes`.
    */
  private val DefaultMaxWalBytes = 64L << 20

  /** Deletion vectors stay driver-held (bare longs — they gate the
    * resolve dedup and stats accounting, so they cannot leave the driver
    * without a per-op membership job); past this many ids the overlay
    * folds into a real snapshot commit instead (the safety valve — a
    * delete burst this size is batch work, not point work). Sized so the
    * read view's `¬ id IN (vector)` mask stays a cheap plan: the
    * optimizer converts the big In to an O(1)-per-row InSet, but the
    * LITERAL list is still built per materialize — 64k longs is a few MB
    * of transient expression tree, a 1M-id list would be hundreds.
    */
  private val MaxDeletionIds = 65536

  /** One buffered row: the schema-shaped Row for the overlay relation plus
    * its decoded props (so a rewrite of a hot key never re-decodes).
    */
  final case class Pending(row: Row, props: Map[String, Any])

  /** Per-session overlay state (guarded by the session's write lock).
    * `pending` is the upsert buffer; `deletedNodes`/`deletedEdges` are
    * deletion vectors (same design as Delta deletion vectors: reads filter
    * them out, compaction rewrites them away).
    */
  final class State {
    var base: Option[DataFrame] = None // nodes frame the overlay applies to
    var edgeBase: Option[DataFrame] = None // edges frame deletions apply to
    val pending = scala.collection.mutable.LinkedHashMap[Long, Pending]()
    val deletedNodes = scala.collection.mutable.LinkedHashSet[Long]()
    val deletedEdges = scala.collection.mutable.LinkedHashSet[Long]()
    /** Exact post-delete statistics (None until known; deletes without a
      * computed base leave it None and stats recompute lazily).
      */
    var stats: Option[(Map[String, Long], Map[String, Long])] = None
    var hasDeletes = false
    /** Query-string → cached parameterized point-delete plan (built against
      * the epoch's stable base frames; dies with them at the next commit).
      */
    val deletePlans =
      scala.collection.mutable.HashMap[String, DeletePlan]()
    /** Shared touching-edges plan for node deletes: the id-array box and
      * the `src∈ids ∨ dst∈ids` resolve over `edgeBase`.
      */
    var touchPlan: Option[(graft.plans.ParamBox, CachedResolve)] = None
    /** Write-ahead spill of the pending map (see [[DefaultMaxOverlayBytes]]):
      * parquet-backed upsert rows that shadow `base` and are shadowed by
      * the live `pending`/`deletedNodes`. `walDir` holds every segment
      * written this epoch (superseded segments may still back read plans
      * in flight, so files are only removed at commit/clear).
      */
    var walNodes: Option[DataFrame] = None
    var walDir: Option[java.nio.file.Path] = None
    var walSeq: Int = 0
    /** Bytes at rest of the CURRENT merged WAL segment (drives the
      * [[DefaultMaxWalBytes]] fold-to-commit valve).
      */
    var walBytes: Long = 0L
    /** Epoch-cached id-seek plans for the SET fast path's current-row
      * lookup (the reference's index point seek): (source frame the plan
      * was built from, id box, resolve). `walLookup` additionally keys on
      * the WAL segment it was built against.
      */
    var baseLookup: Option[(DataFrame, graft.plans.ParamBox,
      CachedResolve)] = None
    var walLookup: Option[(DataFrame, graft.plans.ParamBox,
      CachedResolve)] = None
    /** Estimated driver bytes held by `pending` (maintained per upsert). */
    var pendingBytes: Long = 0L
    def size: Int = pending.size + deletedNodes.size + deletedEdges.size
    def nodesOverlaid: Boolean = pending.nonEmpty || deletedNodes.nonEmpty ||
      walNodes.nonEmpty
    def edgesOverlaid: Boolean = deletedEdges.nonEmpty
    def clear(): Unit = {
      base = None; edgeBase = None; pending.clear()
      deletedNodes.clear(); deletedEdges.clear()
      stats = None; hasDeletes = false
      deletePlans.clear(); touchPlan = None
      baseLookup = None; walLookup = None
      walNodes = None; pendingBytes = 0L; walSeq = 0; walBytes = 0L
      // DEFERRED segment deletion (one-commit grace): DataFrames returned
      // to callers earlier in the epoch may still lazily reference the
      // segment files — deleting them here would fail those held plans
      // with FileNotFoundException on their next execution. Retiring the
      // dir aligns WAL-file lifetime with the session's snapshot-block
      // rotation (which already releases old checkpoint blocks two
      // mutating statements after a commit): a frame is executable for
      // one commit past its epoch, then invalid either way — callers
      // needing longer-lived results must materialize them. Dirs retired
      // a commit ago (and any leftovers at JVM exit) are reclaimed.
      walDir.foreach(retireWalDir)
      walDir = None
    }
  }

  /** A translated-once parameterized point-delete plan (≡ the reference's
    * execution-plan cache keyed on the query string,
    * `src/commands/execution_ctx.c:79-87`, with params bound per execution).
    *
    * Every resolve frame is EXCHANGE-FREE (scan → filter → project over a
    * stable checkpointed base): a join in a cached plan would freeze its
    * first binding's broadcast/shuffle materialization, and AQE would then
    * serve stale results on rebind. Single-hop patterns decompose instead
    * into endpoint-id resolves plus an edge resolve filtered by driver-bound
    * id arrays — the index-nested-loop shape of the reference's point seeks.
    */
  final case class DeletePlan(
      baseNodes: DataFrame, baseEdges: DataFrame,
      /** scalar parameter boxes, keyed by param name */
      boxes: Map[String, graft.plans.ParamBox],
      isNode: Boolean,
      /** node delete: (id, label) rows matching the pattern */
      nodeResolve: Option[CachedResolve],
      /** edge delete: constrained-endpoint id resolves; each execution runs
        * the resolve and binds the id array into its box (read by
        * `edgeResolve`'s filter, which already encodes the pattern's
        * direction — including both orientations for undirected)
        */
      endpointResolves: Seq[(graft.plans.ParamBox, CachedResolve)],
      /** edge delete: (id, reltype) rows matching under current bindings */
      edgeResolve: Option[CachedResolve])

  /** A resolve plan pinned at the RDD layer. `df.collect()` per execution
    * would re-run whole-stage source GENERATION (the variant-equality tree
    * is big — ~100 ms a call) even though Janino caches the compile;
    * `toRdd` pays codegen once, and each execution is then one job over the
    * compiled iterators. Each job re-serializes the task binary, so the
    * current [[graft.plans.ParamBox]] bindings ship with it. The per-
    * partition `take(cap+1)` bounds driver results the way the dropped
    * `limit(n)` node did — without CollectLimit's single-partition shuffle
    * (an exchange would freeze its first binding's materialization under
    * AQE reuse).
    */
  final class CachedResolve(df: DataFrame, cap: Int) {
    private val rdd = df.queryExecution.toRdd
    private val sc = df.sparkSession.sparkContext
    private val takeN = cap + 1
    /** rows (internal format), ≤ takeN per partition */
    def collectRows(): Array[org.apache.spark.sql.catalyst.InternalRow] = {
      val n = takeN
      sc.runJob(rdd,
        (it: Iterator[org.apache.spark.sql.catalyst.InternalRow]) =>
          it.take(n).map(_.copy()).toArray).flatten
    }
  }

  /** Fallback cap: a point delete that matches more ids than this goes to
    * the general snapshot-commit path (the driver should not hold
    * arbitrarily large vectors).
    */
  private val MaxPointIds = 10000

  /** Try to run `ast` as a point write. None ⇒ not this shape, use the
    * general mutation path. Must be called under the session write lock.
    */
  def tryRun(session: CypherSession, st: State, ast: Ast.Query,
      params: Map[String, Any]): Option[DataFrame] = {
    val (v, label, cond, items) = ast.parts match {
      case List(Ast.SingleQuery(List(
          Ast.Match(false, List(p), Some(c)), Ast.SetClause(its)))) =>
        p match {
          case Ast.PathPat(None, Ast.NodePat(Some(nv), lbl, Nil, _), Nil,
              false, _) => (nv, lbl, c, its)
          case _ => return None
        }
      case _ => return None
    }
    def asId(e: Ast.Expr): Option[Long] = e match {
      case Ast.LitInt(n) => Some(n)
      case Ast.Param(p) => params.get(p) match {
        case Some(n: Long) => Some(n)
        case Some(n: Int) => Some(n.toLong)
        case _ => None
      }
      case _ => None
    }
    val id = cond match {
      case Ast.Bin("=", Ast.Fn("id", List(Ast.Variable(`v`)), false), e) =>
        asId(e).getOrElse(return None)
      case Ast.Bin("=", e,
          Ast.Fn("id", List(Ast.Variable(`v`)), false)) =>
        asId(e).getOrElse(return None)
      case _ => return None
    }
    if (!items.forall {
      case Ast.SetItem(Ast.Variable(`v`), Some(_), e) =>
        evaluable(v, e, params)
      case _ => false
    }) return None

    // current row: pending overlay first, deletion vector, then a point
    // lookup — epoch-cached id seek where the graph shape allows, fresh
    // overlay-view plan otherwise
    val (curLabel, curProps) = st.pending.get(id) match {
      case Some(p) => (p.row.get(1), p.props)
      case None =>
        if (st.deletedNodes.contains(id)) return Some(stats(session, 0))
        val hits = lookupById(session, st, id).getOrElse(
          session.graph.nodes.filter(col("id") === id).take(2))
        if (hits.length != 1) {
          if (hits.isEmpty) return Some(stats(session, 0)) // matched nothing
          return None // duplicate id: not point-shaped, general path
        }
        val row = hits.head
        (row.get(1), Option(row.getMap[String, Row](2)).map(
          _.map { case (k, r) =>
            k -> (if (r == null) null else session.decodeVariant(r))
          }.toMap).getOrElse(Map.empty[String, Any]))
    }
    // ':'-membership semantics, same as Values.labelHas: a node labeled
    // "A:B" matches (n:B) — exact string equality would silently drop the
    // write on multi-label nodes
    def labelMatches(node: Any, want: String): Boolean = node match {
      case s: String =>
        val parts = s.split(":").toSet
        want.split(":").filter(_.nonEmpty).forall(parts)
      case _ => false
    }
    if (label.exists(l => !labelMatches(curLabel, l)))
      return Some(stats(session, 0))

    var props: Map[String, Any] = curProps
    items.foreach { case Ast.SetItem(_, Some(k), e) =>
      eval(v, e, props, params) match {
        case Some(null) => props -= k
        case Some(x) => props += k -> x
        case None => return None // dynamic value: general path
      }
    case _ => return None
    }

    val newProps = props.map { case (k, x) =>
      k -> Translator.litRow(Translator.constToAst(x), Values.MaxNest)
    }
    val newRow = Row(id, curLabel, newProps)

    if (st.base.isEmpty) st.base = Some(session.graph.nodes)
    st.pending.get(id).foreach(old =>
      st.pendingBytes -= estimateBytes(old)) // rewrite of a hot key
    val p = Pending(newRow, props)
    st.pending(id) = p
    st.pendingBytes += estimateBytes(p)
    session.markPointWrite() // overlay view builds lazily on next read
    if (st.pendingBytes > maxOverlayBytes(session)) spill(session, st)
    Some(stats(session, items.size))
  }

  /** True iff every given box is still referenced by a ParamRef in the
    * OPTIMIZED plan. Catalyst eagerly folds filters over LocalRelations
    * (`ConvertToLocalRelation`), and ParamRef is deterministic by design —
    * so a plan over a driver-local frame gets the box's CURRENT (null)
    * binding baked in at build time and would serve empty results for
    * every later binding. Any cached parameterized resolve must pass this
    * check or fall back to fresh per-execution plans.
    */
  private def paramsSurvive(df: DataFrame,
      boxes: Iterable[graft.plans.ParamBox]): Boolean = {
    if (boxes.isEmpty) return true
    val seen = scala.collection.mutable.HashSet[graft.plans.ParamBox]()
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case graft.plans.ParamRef(b, _) => seen += b
      case _ => ()
    }))
    boxes.forall(seen.contains)
  }

  private lazy val seekSchema = StructType(Seq(
    StructField("id", LongType), StructField("label", StringType),
    StructField("props", Values.propsType)))
  private lazy val seekFromInternal =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(seekSchema)

  /** Epoch-cached point lookup of a node row by id over the stable base
    * (plus the WAL segment when the overlay has spilled — WAL rows shadow
    * base rows): the resolve plan is built ONCE per epoch and the id is
    * bound per execution through a ParamBox, the same pattern as the
    * cached point deletes — the reference's index point seek, one cheap
    * job instead of a fresh plan+collect per cold key. None ⇒ the graph
    * is not in canonical (id, label, props) shape; the caller falls back
    * to a fresh overlay-view lookup.
    */
  private def lookupById(session: CypherSession, st: State,
      id: Long): Option[Array[Row]] = {
    import graft.plans.{ParamBox, ParamRef}
    if (st.base.isEmpty) st.base = Some(session.graph.nodes)
    val base = st.base.get
    val shapeOk = base.columns.take(3).sameElements(
      Seq("id", "label", "props")) &&
      base.schema("id").dataType == LongType &&
      base.schema("label").dataType == StringType &&
      base.schema("props").dataType == Values.propsType
    if (!shapeOk) return None
    def mkPlan(src: DataFrame): Option[(DataFrame, ParamBox,
        CachedResolve)] = {
      val b = new ParamBox("__seek_id")
      val c = org.apache.spark.sql.GraftColumn.column(ParamRef(b, LongType))
      val df = src.select(col("id"), col("label"), col("props"))
        .filter(col("id") === c)
      // a driver-local base folds the unbound box away — unusable as a
      // cached plan (see paramsSurvive); fall back to fresh lookups
      if (!paramsSurvive(df, Seq(b))) None
      else Some((src, b, new CachedResolve(df, 2)))
    }
    def toExternal(
        rows: Array[org.apache.spark.sql.catalyst.InternalRow]) =
      rows.map(r => seekFromInternal(r).asInstanceOf[Row])
    def cached(slot: () => Option[(DataFrame, ParamBox, CachedResolve)],
        set: Option[(DataFrame, ParamBox, CachedResolve)] => Unit,
        src: DataFrame): Option[(ParamBox, CachedResolve)] =
      slot() match {
        case Some((s, b, p)) if s eq src => Some((b, p))
        case _ =>
          val t = mkPlan(src)
          set(t)
          t.map { case (_, b, p) => (b, p) }
      }
    val walPlan = st.walNodes.flatMap(w =>
      cached(() => st.walLookup, st.walLookup = _, w))
    if (st.walNodes.nonEmpty && walPlan.isEmpty) return None // unusable
    val walHit: Option[Array[Row]] = walPlan.map { case (wb, wp) =>
      wb.value = id
      toExternal(wp.collectRows())
    }.filter(_.nonEmpty)
    walHit match {
      case some @ Some(_) => some
      case None =>
        cached(() => st.baseLookup, st.baseLookup = _, base).map {
          case (bb, bp) =>
            bb.value = id
            toExternal(bp.collectRows())
        }
    }
  }

  private def maxOverlayBytes(session: CypherSession): Long =
    session.spark.conf.getOption("graft.pointwrite.maxOverlayBytes")
      .map(_.toLong).getOrElse(DefaultMaxOverlayBytes)

  private def maxWalBytes(session: CypherSession): Long =
    session.spark.conf.getOption("graft.pointwrite.maxWalBytes")
      .map(_.toLong).getOrElse(DefaultMaxWalBytes)

  /** Optional DURABLE home for WAL segments (`graft.pointwrite.walDir`,
    * a local/shared filesystem directory, single writer). Unset ⇒
    * segments live in a JVM-temp dir and die with the session. Set ⇒
    * spills land there and [[recover]] can replay the newest segment
    * over a freshly restored graph after a crash — the miniature of the
    * Delta write-ahead table this overlay models. Replay is idempotent
    * (segments hold last-write-wins upsert rows keyed by id; deletions
    * ride the snapshot commit, never the WAL), so a crash between a
    * commit and the segment reclamation merely re-applies values the
    * snapshot already holds.
    */
  private def durableWalDir(
      session: CypherSession): Option[java.nio.file.Path] =
    session.spark.conf.getOption("graft.pointwrite.walDir")
      .map(java.nio.file.Paths.get(_))

  /** Replay the newest durable WAL segment over the session's CURRENT
    * graph (call right after `setGraph` on the restored base — ids must
    * mean the same entities). Returns the number of replayed upsert rows
    * (0 when no durable dir / no complete segment). Adopts the dir: its
    * segments become this epoch's WAL, shadowing base rows by id exactly
    * as live spills do.
    */
  def recover(session: CypherSession, st: State): Long = {
    val dir = durableWalDir(session).getOrElse(return 0L)
    val segs =
      try {
        import scala.jdk.CollectionConverters._
        if (!java.nio.file.Files.isDirectory(dir)) return 0L
        java.nio.file.Files.list(dir).iterator().asScala
          .flatMap { p =>
            val n = p.getFileName.toString
            if (n.startsWith("wal-") &&
                java.nio.file.Files.exists(p.resolve("_SUCCESS")))
              scala.util.Try(n.stripPrefix("wal-").toInt).toOption
                .map(_ -> p)
            else None
          }.toList
      } catch { case _: Throwable => Nil }
    if (segs.isEmpty) return 0L
    val (maxSeq, latest) = segs.maxBy(_._1)
    // the dir is live again: cancel any pending deferred deletion
    retiredWalDirs.remove(dir)
    val wal = session.spark.read.parquet(latest.toString)
    st.base = Some(session.graph.nodes)
    st.walDir = Some(dir)
    st.walSeq = maxSeq + 1
    st.walNodes = Some(wal)
    st.walBytes =
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(latest).iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } catch { case _: Throwable => 0L }
    session.markPointWrite()
    wal.count()
  }

  /** WAL dirs awaiting reclamation — grace period of one commit (see
    * [[State.clear]]); anything left is deleted at JVM exit.
    */
  private val retiredWalDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private def deleteDir(d: java.nio.file.Path): Unit =
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(d).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () } // temp-dir GC is best-effort

  private def retireWalDir(d: java.nio.file.Path): Unit = {
    // reclaim what the PREVIOUS commit retired, then enqueue this one
    var old = retiredWalDirs.poll()
    while (old != null) { deleteDir(old); old = retiredWalDirs.poll() }
    retiredWalDirs.add(d)
    ()
  }

  locally {
    sys.addShutdownHook {
      var d = retiredWalDirs.poll()
      while (d != null) { deleteDir(d); d = retiredWalDirs.poll() }
    }
    ()
  }

  /** Rough driver footprint of one buffered row (JVM object headers +
    * string payloads); only has to be order-of-magnitude right to bound
    * the overlay.
    */
  private def estimateBytes(p: Pending): Long =
    96L + p.props.iterator.map { case (k, v) =>
      40L + 2L * k.length + estimateValue(v)
    }.sum

  private def estimateValue(v: Any): Long = v match {
    case null => 8L
    case s: String => 48L + 2L * s.length
    case xs: Seq[_] => 48L + xs.iterator.map(estimateValue).sum
    case m: scala.collection.Map[_, _] =>
      64L + m.iterator.map { case (k, x) =>
        estimateValue(k) + estimateValue(x)
      }.sum
    case _ => 24L
  }

  /** Spill the pending map into the epoch's write-ahead parquet: merge
    * with the previous WAL segment (new rows shadow old by id), write a
    * NEW segment file, re-point the WAL view, empty the driver map. One
    * small Spark job per spill, amortized over the ops that filled the
    * byte bound; superseded segment files stay on disk until commit (a
    * read plan in flight may still reference them).
    *
    * Safety valve: once the merged WAL at rest crosses
    * [[maxWalBytes]], the overlay folds into a real snapshot commit
    * instead of spilling again — the merge-rewrite-per-spill I/O and the
    * retained superseded segments stay bounded per epoch.
    */
  private def spill(session: CypherSession, st: State): Unit = {
    import scala.jdk.CollectionConverters._
    val spark = session.spark
    if (st.walBytes > maxWalBytes(session)) {
      // commit reads the overlay view (base ∖ wal ∪ wal ∪ pending) and
      // checkpoints it; clear() then retires every segment
      session.commit(session.graph.nodes, session.graph.edges)
      return
    }
    val dir = st.walDir.getOrElse {
      val d = durableWalDir(session) match {
        case Some(p) =>
          // a fresh epoch adopting the durable dir: leftover segments are
          // a previous epoch's (spent on commit, or crash remains the
          // caller chose not to recover) — remove them so recovery can
          // never mix epochs
          retiredWalDirs.remove(p)
          deleteDir(p)
          java.nio.file.Files.createDirectories(p)
          p
        case None => java.nio.file.Files.createTempDirectory("graft-wal-")
      }
      st.walDir = Some(d); d
    }
    val newRows = spark.createDataFrame(
      st.pending.values.map(_.row).toList.asJava, session.nodeSchema)
    val merged = st.walNodes match {
      case Some(w) =>
        w.join(newRows.select(col("id")), Seq("id"), "left_anti")
          .unionByName(newRows)
      case None => newRows
    }
    val f = dir.resolve(s"wal-${st.walSeq}").toString
    st.walSeq += 1
    merged.coalesce(4).write.mode("overwrite").parquet(f)
    st.walNodes = Some(spark.read.parquet(f))
    // merged size at rest drives the fold-to-commit valve above
    st.walBytes =
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(f)).iterator()
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(java.nio.file.Files.size).sum
      } catch { case _: Throwable => st.walBytes }
    st.pending.clear()
    st.pendingBytes = 0L
    session.markPointWrite()
  }

  /** Point DELETE fast path: a single MATCH + DELETE of one bound
    * variable resolves the target ids with one distributed lookup, then
    * records them in the deletion vectors — no snapshot commit. Node
    * deletes implicitly delete touching edges (reference semantics,
    * `op_delete.c`). Falls back for multi-target deletes, paths, OPTIONAL
    * or >MaxPointIds matches.
    */
  def tryDelete(session: CypherSession, st: State, ast: Ast.Query,
      params: Map[String, Any], queryKey: String): Option[DataFrame] = {
    import Translator._
    val (m, del) = ast.parts match {
      case List(Ast.SingleQuery(List(mm: Ast.Match, d: Ast.Delete)))
          if !mm.optional => (mm, d)
      case _ => return None
    }
    val dv = del.exprs match {
      case List(Ast.Variable(n)) => n
      case _ => return None
    }
    // parameterized cached point path first: translate once per query
    // string, bind per execution (≡ execution_ctx.c plan cache)
    try {
      cachedDelete(session, st, m, dv, params, queryKey) match {
        case Some(out) => return Some(out)
        case None => ()
      }
    } catch { case _: Throwable => () } // any cached-path surprise → general
    val ctx = Ctx(session.graph, params, Some(session))
    val unit = session.spark.range(1).select(lit(1).as("__unit"))
    val frame =
      try translateMatch(ctx, Frame(unit, Map.empty), m)
      catch { case _: Throwable => return None }
    if (!frame.vars.get(dv).exists(k => k == KNode || k == KEdge))
      return None
    val isNode = frame.vars(dv) == KNode
    // dedup on the driver: a distinct() here is a 32-partition shuffle
    // per point delete; the row set is ≤ MaxPointIds by construction
    val raw = frame.df.select(
      frame.col(dv).getField("id").as("id"),
      (if (isNode) frame.col(dv).getField("label")
       else frame.col(dv).getField("reltype")).as("kind"))
      .filter(col("id").isNotNull).take(MaxPointIds + 1)
    // a full take means the match MAY be larger than the cap — bail
    // before deleting a silent subset
    if (raw.length > MaxPointIds) return None
    val rows = raw.groupBy(_.getLong(0)).map(_._2.head).toArray
    if (rows.isEmpty) return Some(delStats(session, 0, 0))

    // resolve touching edges (node case) BEFORE seeding any overlay state,
    // so every `return None` path leaves `st` untouched — a seeded-but-
    // bailed state would hand stale base frames to a later point write
    val touching: Array[org.apache.spark.sql.Row] =
      if (isNode) {
        val ids = rows.map(_.getLong(0))
        // implicit delete of touching edges; the id set is driver-small so
        // the OR predicate broadcasts, and at scale this path bails to the
        // anti-join general path at MaxPointIds anyway
        val rawTouch = session.graph.edges
          .filter(col("src").isin(ids: _*) || col("dst").isin(ids: _*))
          .select(col("id"), col("reltype")).take(MaxPointIds + 1)
        if (rawTouch.length > MaxPointIds) return None
        rawTouch.groupBy(_.getLong(0)).map(_._2.head).toArray
      } else Array.empty

    Some(applyDelete(session, st, rows, touching, isNode))
  }

  /** Record resolved deletions in the deletion vectors and return the
    * statistics frame — shared by the general and cached point-delete
    * paths. `rows` = (id, label|reltype) of the delete targets; `touching`
    * = (id, reltype) of implicitly deleted edges (node case).
    */
  private def applyDelete(session: CypherSession, st: State,
      rows: Array[Row], touching: Array[Row],
      isNode: Boolean): DataFrame = {
    if (st.base.isEmpty) st.base = Some(session.graph.nodes)
    if (st.edgeBase.isEmpty) st.edgeBase = Some(session.graph.edges)
    if (!st.hasDeletes) {
      st.stats = session.graph.statsIfComputed
      st.hasDeletes = true
    }
    def dec(m0: Option[(Map[String, Long], Map[String, Long])],
        nodeSide: Boolean, key: String): Option[(Map[String, Long],
          Map[String, Long])] =
      m0.map { case (lc, rc) =>
        if (nodeSide) (lc.updated(key, math.max(lc.getOrElse(key, 0L) - 1, 0L)), rc)
        else (lc, rc.updated(key, math.max(rc.getOrElse(key, 0L) - 1, 0L)))
      }

    var nDel = 0L
    var eDel = 0L
    if (isNode) {
      rows.foreach { r =>
        val id = r.getLong(0)
        if (!st.deletedNodes.contains(id)) {
          st.deletedNodes += id
          // keep the byte accounting in step with the map (a SET/DELETE
          // alternation would otherwise drift pendingBytes upward and
          // fire phantom spills)
          st.pending.remove(id).foreach(p =>
            st.pendingBytes -= estimateBytes(p))
          nDel += 1
          st.stats = dec(st.stats, nodeSide = true,
            Option(r.getString(1)).getOrElse(""))
        }
      }
      touching.foreach { r =>
        val id = r.getLong(0)
        if (!st.deletedEdges.contains(id)) {
          st.deletedEdges += id
          eDel += 1
          st.stats = dec(st.stats, nodeSide = false,
            Option(r.getString(1)).getOrElse(""))
        }
      }
    } else {
      rows.foreach { r =>
        val id = r.getLong(0)
        if (!st.deletedEdges.contains(id)) {
          st.deletedEdges += id
          eDel += 1
          st.stats = dec(st.stats, nodeSide = false,
            Option(r.getString(1)).getOrElse(""))
        }
      }
    }
    session.markPointWrite()
    // deletion-vector safety valve: ids past this volume are batch work —
    // fold the overlay into a real snapshot (clears the vectors)
    if (st.deletedNodes.size + st.deletedEdges.size >= MaxDeletionIds)
      session.commit(session.graph.nodes, session.graph.edges)
    delStats(session, nDel, eDel)
  }

  /** Constrained endpoint id sets above this size are not point-shaped —
    * the cached path bails to the general anti-join delete.
    */
  private val EndpointCap = 1024

  /** Const-expression shapes the cached plan supports in pattern props:
    * SCALARS only. List values (literal or bound) would need the full
    * variant equality, whose unprunable tree (zip_with/exists are
    * CodegenFallback) kicks the filter out of whole-stage codegen and
    * costs ~10 ms/task in interpreted setup — they take the general path.
    */
  private def cacheableConst(e: Ast.Expr): Boolean = e match {
    case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
        Ast.LitBool(_) | Ast.LitNull | Ast.Param(_) => true
    case Ast.Neg(x) => cacheableConst(x)
    case Ast.Bin("+" | "-" | "*" | "/" | "%", l, r) =>
      cacheableConst(l) && cacheableConst(r)
    case _ => false
  }

  /** Cypher equality specialized to a SCALAR right side (the bind-time
    * check rejects list/map params): small enough to stay inside
    * whole-stage codegen where the full [[Values.eq]] tree cannot
    * (its array branches carry higher-order functions). Semantics match
    * Values.eq on every scalar pair; a non-scalar stored value against a
    * scalar never compares equal (tag mismatch ⇒ false).
    */
  private def scalarEq(a: Column, b: Column): Column = {
    def tg(c: Column): Column = c.getField("t")
    val ia = a.getField("i"); val ib = b.getField("i")
    val fa = a.getField("f"); val fb = b.getField("f")
    val bothInt = tg(a) === Values.T_INT && tg(b) === Values.T_INT
    val bothFloat = tg(a) === Values.T_FLOAT && tg(b) === Values.T_FLOAT
    val numA = tg(a) === Values.T_INT || tg(a) === Values.T_FLOAT
    val numB = tg(b) === Values.T_INT || tg(b) === Values.T_FLOAT
    // mixed int/float: double-widening must not lose precision
    // (≡ Values.eq's round-trip check)
    val intSide = when(tg(a) === Values.T_INT, ia).otherwise(ib)
    val floatSide = when(tg(a) === Values.T_INT, fb).otherwise(fa)
    val mixedEq = when(abs(floatSide) > 9.223372036854775e18, lit(false))
      .otherwise(intSide.cast("double") === floatSide &&
        intSide === floatSide.cast("bigint"))
    when(a.isNull || b.isNull, lit(null).cast("boolean"))
      .when(bothInt, ia === ib)
      .when(bothFloat, fa === fb)
      .when(numA && numB, mixedEq)
      .when(tg(a) =!= tg(b), lit(false))
      .when(tg(a) === Values.T_STRING,
        a.getField("s") === b.getField("s"))
      .when(tg(a) === Values.T_BOOL,
        a.getField("b") === b.getField("b"))
      .otherwise(lit(false))
  }

  private def paramNames(e: Ast.Expr): Set[String] = e match {
    case Ast.Param(n) => Set(n)
    case Ast.Neg(x) => paramNames(x)
    case Ast.Bin(_, l, r) => paramNames(l) ++ paramNames(r)
    case Ast.ListLit(xs) => xs.flatMap(paramNames).toSet
    case _ => Set.empty
  }

  private lazy val toVariantInternal =
    org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(Values.variantType)

  /** Bind a driver parameter value into a box, in Catalyst internal form
    * of the variant encoding.
    */
  private def bindScalar(box: graft.plans.ParamBox, v: Any): Unit =
    box.value = toVariantInternal(
      Translator.litRow(Translator.constToAst(v), Values.MaxNest))

  /** The parameterized point-delete fast path. None ⇒ shape not covered or
    * state not eligible — fall through to the general path (always
    * correct, just slower).
    */
  private def cachedDelete(session: CypherSession, st: State, m: Ast.Match,
      dv: String, params: Map[String, Any],
      queryKey: String): Option[DataFrame] = {
    // pending/spilled SET rows are invisible to plans over the stable base
    if (st.pending.nonEmpty || st.walNodes.nonEmpty) return None
    if (m.where.nonEmpty) return None
    val path = m.paths match {
      case List(p @ Ast.PathPat(None, _, _, false, false)) => p
      case _ => return None
    }
    val dp = st.deletePlans.get(queryKey) match {
      case Some(p) if st.base.exists(_ eq p.baseNodes) &&
          st.edgeBase.exists(_ eq p.baseEdges) => p
      case _ =>
        buildDeletePlan(session, st, path, dv) match {
          case Some(b) => st.deletePlans.put(queryKey, b); b
          case None => return None
        }
    }
    // bind scalar params; list/map values need full variant equality →
    // general path (missing params → general path raises the error)
    dp.boxes.foreach { case (n, box) =>
      params.get(n) match {
        case Some(null) => bindScalar(box, null)
        case Some(v @ (_: Long | _: Int | _: Double | _: String |
            _: Boolean)) => bindScalar(box, v)
        case _ => return None
      }
    }
    execCachedDelete(session, st, dp)
  }

  private def buildDeletePlan(session: CypherSession, st: State,
      path: Ast.PathPat, dv: String): Option[DeletePlan] = {
    import graft.plans.{ParamBox, ParamRef}
    import org.apache.spark.sql.GraftColumn
    val head = path.head
    def propsOk(ps: List[(String, Ast.Expr)]): Boolean =
      ps.forall { case (_, e) => cacheableConst(e) }
    // seed the epoch's stable bases (inert while the overlay is empty)
    if (st.base.isEmpty) st.base = Some(session.graph.nodes)
    if (st.edgeBase.isEmpty) st.edgeBase = Some(session.graph.edges)
    val nodesB = st.base.get
    val edgesB = st.edgeBase.get

    def mkBoxes(ps: List[(String, Ast.Expr)]*): Map[String, ParamBox] =
      ps.flatten.flatMap { case (_, e) => paramNames(e) }.toSet
        .map((n: String) => n -> new ParamBox(n)).toMap

    def nodeFilter(np: Ast.NodePat,
        ctx: Translator.Ctx): DataFrame = {
      var d = nodesB
      np.label.foreach(l =>
        d = d.filter(Values.labelHas(col("label"), l)))
      np.props.foreach { case (k, e) =>
        d = d.filter(coalesce(scalarEq(element_at(col("props"), k),
          Translator.constantValue(ctx, e)), lit(false)))
      }
      d
    }

    def boxesFor(boxes: Map[String, graft.plans.ParamBox],
        ps: List[(String, Ast.Expr)]): Iterable[graft.plans.ParamBox] =
      ps.flatMap { case (_, e) => paramNames(e) }.toSet.flatMap(
        (n: String) => boxes.get(n))

    path.tail match {
      case Nil => // node delete: MATCH (n[:L] {…}) DELETE n
        if (!head.variable.contains(dv) || !propsOk(head.props)) return None
        val boxes = mkBoxes(head.props)
        val ctx = Translator.Ctx(session.graph, Map.empty, Some(session),
          paramBoxes = boxes)
        val ndf = nodeFilter(head, ctx).select(col("id"), col("label"))
        // a driver-local base folds unbound boxes away at build time —
        // the plan would serve the first binding forever; general path
        if (!paramsSurvive(ndf, boxesFor(boxes, head.props))) return None
        Some(DeletePlan(nodesB, edgesB, boxes, isNode = true,
          Some(new CachedResolve(ndf, MaxPointIds)),
          Nil, None))

      case List((rel, dstN)) => // edge delete: MATCH (…)-[e:T {…}]-(…) DELETE e
        if (!rel.variable.contains(dv) || rel.varLen.nonEmpty) return None
        if (!propsOk(head.props) || !propsOk(dstN.props) ||
          !propsOk(rel.props)) return None
        // a repeated node var would add a src=dst constraint we don't encode
        (head.variable, dstN.variable) match {
          case (Some(a), Some(b)) if a == b => return None
          case _ => ()
        }
        val boxes = mkBoxes(head.props, dstN.props, rel.props)
        val ctx = Translator.Ctx(session.graph, Map.empty, Some(session),
          paramBoxes = boxes)
        def constrained(np: Ast.NodePat): Boolean =
          np.label.nonEmpty || np.props.nonEmpty
        val arrT = ArrayType(LongType, containsNull = false)
        def contains(b: ParamBox, c: Column): Column =
          array_contains(GraftColumn.column(ParamRef(b, arrT)), c)
        def endpoint(np: Ast.NodePat, name: String)
            : Option[(ParamBox, CachedResolve)] =
          if (!constrained(np)) None
          else {
            val df = nodeFilter(np, ctx).select(col("id"))
            if (!paramsSurvive(df, boxesFor(boxes, np.props)))
              return None // driver-local base: general path (see above)
            Some((new ParamBox(name), new CachedResolve(df, EndpointCap)))
          }
        val headEnd = endpoint(head, "__ids_head")
        val dstEnd = endpoint(dstN, "__ids_dst")
        var e = edgesB
        rel.types match {
          case Nil => ()
          case List(t) => e = e.filter(col("reltype") === t)
          case ts => e = e.filter(col("reltype").isin(ts: _*))
        }
        rel.props.foreach { case (k, x) =>
          e = e.filter(coalesce(scalarEq(element_at(col("props"), k),
            Translator.constantValue(ctx, x)), lit(false)))
        }
        def and(cs: Seq[Column]): Option[Column] = cs.reduceOption(_ && _)
        val cond: Option[Column] = rel.direction match {
          case 0 => // undirected: either orientation matches
            val fwd = and(Seq(
              headEnd.map { case (b, _) => contains(b, col("src")) },
              dstEnd.map { case (b, _) => contains(b, col("dst")) }).flatten)
            val bwd = and(Seq(
              headEnd.map { case (b, _) => contains(b, col("dst")) },
              dstEnd.map { case (b, _) => contains(b, col("src")) }).flatten)
            (fwd, bwd) match {
              case (Some(f), Some(bk)) => Some(f || bk)
              case _ => None
            }
          case d =>
            val (srcSide, dstSide) =
              if (d == 1) (headEnd, dstEnd) else (dstEnd, headEnd)
            and(Seq(
              srcSide.map { case (b, _) => contains(b, col("src")) },
              dstSide.map { case (b, _) => contains(b, col("dst")) }).flatten)
        }
        cond.foreach(c => e = e.filter(c))
        val edf = e.select(col("id"), col("reltype"))
        // edge resolve references the rel-prop boxes AND the endpoint id
        // arrays — all must survive optimization (driver-local edge bases
        // fold them away; general path handles those correctly)
        if (!paramsSurvive(edf, boxesFor(boxes, rel.props) ++
            Seq(headEnd, dstEnd).flatten.map(_._1))) return None
        Some(DeletePlan(nodesB, edgesB, boxes, isNode = false, None,
          Seq(headEnd, dstEnd).flatten,
          Some(new CachedResolve(edf, MaxPointIds))))

      case _ => None // multi-hop: not point-shaped
    }
  }

  private val debugTimings = sys.env.contains("SPARK_GRAFT_POINT_DEBUG")
  @inline private def dbg[A](tag: String)(f: => A): A =
    if (!debugTimings) f
    else {
      val t0 = System.nanoTime(); val r = f
      System.err.println(
        f"[point] $tag: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
      r
    }

  private def execCachedDelete(session: CypherSession, st: State,
      dp: DeletePlan): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    // (id, str-kind) internal rows → dedup by id → external rows for the
    // shared bookkeeping
    def toRows(raw: Array[org.apache.spark.sql.catalyst.InternalRow],
        except: scala.collection.Set[Long]): Array[Row] = {
      val seen = scala.collection.mutable.LinkedHashMap[Long, Row]()
      raw.foreach { r =>
        val id = r.getLong(0)
        if (!except.contains(id) && !seen.contains(id))
          seen(id) = Row(id,
            if (r.isNullAt(1)) null else r.getUTF8String(1).toString)
      }
      seen.values.toArray
    }
    if (dp.isNode) {
      val raw = dbg("node resolve")(dp.nodeResolve.get.collectRows())
      if (raw.length > MaxPointIds) return None
      val rows = toRows(raw, st.deletedNodes)
      if (rows.isEmpty) return Some(delStats(session, 0, 0))
      val ids = rows.map(_.getLong(0))
      if (ids.length > EndpointCap) return None
      // shared touching-edges plan (src∈ids ∨ dst∈ids over the epoch base)
      val (tBox, tPlan) = st.touchPlan.getOrElse {
        import graft.plans.{ParamBox, ParamRef}
        val b = new ParamBox("__touch_ids")
        val c = org.apache.spark.sql.GraftColumn.column(
          ParamRef(b, ArrayType(LongType, containsNull = false)))
        val df = st.edgeBase.get
          .filter(array_contains(c, col("src")) ||
            array_contains(c, col("dst")))
          .select(col("id"), col("reltype"))
        // driver-local edge base: the unbound box folds away — general path
        if (!paramsSurvive(df, Seq(b))) return None
        val tp = (b, new CachedResolve(df, MaxPointIds))
        st.touchPlan = Some(tp)
        tp
      }
      tBox.value = new GenericArrayData(ids)
      val rawTouch = dbg("touch resolve")(tPlan.collectRows())
      if (rawTouch.length > MaxPointIds) return None
      val touching = toRows(rawTouch, st.deletedEdges)
      Some(dbg("applyDelete")(
        applyDelete(session, st, rows, touching, isNode = true)))
    } else {
      // resolve constrained endpoints, bind their id arrays
      for ((box, resolve) <- dp.endpointResolves) {
        val idRows = dbg("endpoint resolve")(resolve.collectRows())
        if (idRows.length > EndpointCap) return None
        val ids = idRows.map(_.getLong(0)).distinct
        if (ids.isEmpty) return Some(delStats(session, 0, 0))
        box.value = new GenericArrayData(ids)
      }
      val raw = dbg("edge resolve")(dp.edgeResolve.get.collectRows())
      if (raw.length > MaxPointIds) return None
      val rows = toRows(raw, st.deletedEdges)
      if (rows.isEmpty) return Some(delStats(session, 0, 0))
      Some(dbg("applyDelete")(
        applyDelete(session, st, rows, Array.empty, isNode = false)))
    }
  }

  /** Build the overlay view over the stable base: `base.filter(¬pending ∧
    * ¬deleted) ∪ localRelation(pending)`, edges minus deletion vector — a
    * constant-depth plan, no job. byLabel/byReltype views are dropped (a
    * prebuilt label view would bypass the overlay); compaction or any
    * general mutation restores the plain committed shape.
    */
  def materialize(session: CypherSession, st: State,
      cur: PropertyGraph): PropertyGraph = {
    if (st.pending.isEmpty && !st.hasDeletes && st.walNodes.isEmpty)
      return cur
    import scala.jdk.CollectionConverters._
    var nodes = st.base.getOrElse(cur.nodes)
    val nodeMask = (st.deletedNodes ++ st.pending.keys).toSeq
    // spilled upsert rows shadow the base (anti join against the WAL's id
    // column — WAL is overlay-sized, so this broadcasts), and are in turn
    // shadowed by the live pending map and the deletion vector
    st.walNodes.foreach { w =>
      nodes = nodes.join(w.select(col("id")), Seq("id"), "left_anti")
    }
    if (nodeMask.nonEmpty)
      nodes = nodes.filter(!col("id").isin(nodeMask: _*))
    st.walNodes.foreach { w =>
      val wClean =
        if (nodeMask.isEmpty) w
        else w.filter(!col("id").isin(nodeMask: _*))
      nodes = nodes.unionByName(wClean)
    }
    if (st.pending.nonEmpty)
      nodes = nodes.unionByName(session.spark.createDataFrame(
        st.pending.values.map(_.row).toList.asJava, session.nodeSchema))
    var edges = st.edgeBase.getOrElse(cur.edges)
    if (st.deletedEdges.nonEmpty)
      edges = edges.filter(!col("id").isin(st.deletedEdges.toSeq: _*))
    val pg = PropertyGraph(nodes, edges)
    (st.stats, st.hasDeletes) match {
      case (Some((lc, rc)), _) => pg.seedStats(lc, rc)
      case (None, false) => pg.seedStatsFrom(cur) // SET-only: counts intact
      case _ => pg // deletes with unknown base stats: recompute lazily
    }
  }

  /** Driver-evaluable SET value: literals, scalar parameters, the entity's
    * own properties, and arithmetic/concat over them.
    */
  private def evaluable(v: String, e: Ast.Expr,
      params: Map[String, Any]): Boolean = e match {
    case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
        Ast.LitBool(_) | Ast.LitNull => true
    case Ast.Param(p) => params.get(p) match {
      case Some(null) | Some(_: Long) | Some(_: Int) | Some(_: Double) |
          Some(_: String) | Some(_: Boolean) => true
      case _ => false
    }
    case Ast.Prop(Ast.Variable(`v`), _) => true
    case Ast.Neg(x) => evaluable(v, x, params)
    case Ast.Bin("+" | "-" | "*" | "/" | "%", l, r) =>
      evaluable(v, l, params) && evaluable(v, r, params)
    case _ => false
  }

  private def eval(v: String, e: Ast.Expr, props: Map[String, Any],
      params: Map[String, Any]): Option[Any] = e match {
    case Ast.LitInt(n) => Some(n)
    case Ast.LitFloat(n) => Some(n)
    case Ast.LitString(s) => Some(s)
    case Ast.LitBool(b) => Some(b)
    case Ast.LitNull => Some(null)
    case Ast.Param(p) => params.get(p).map {
      case i: Int => i.toLong
      case x => x
    }
    case Ast.Prop(Ast.Variable(`v`), k) => Some(props.getOrElse(k, null))
    case Ast.Neg(x) => eval(v, x, props, params).flatMap {
      case n: Long => Some(-n)
      case d: Double => Some(-d)
      case null => Some(null)
      case _ => None
    }
    case Ast.Bin(op, l, r) =>
      for {
        a <- eval(v, l, props, params)
        b <- eval(v, r, props, params)
        out <- binOp(op, a, b)
      } yield out
    case _ => None
  }

  /** Cypher numeric/string semantics for the tiny driver-side evaluator
    * (int/int stays integral, any float promotes, null propagates).
    */
  private def binOp(op: String, a: Any, b: Any): Option[Any] = (a, b) match {
    case (null, _) | (_, null) => Some(null)
    case (x: String, y: String) if op == "+" => Some(x + y)
    case (x: Long, y: Long) => op match {
      case "+" => Some(x + y)
      case "-" => Some(x - y)
      case "*" => Some(x * y)
      case "/" => if (y == 0) None else Some(x / y)
      case "%" => if (y == 0) None else Some(x % y)
      case _ => None
    }
    case (x: Number, y: Number) =>
      val (dx, dy) = (x.doubleValue(), y.doubleValue())
      op match {
        case "+" => Some(dx + dy)
        case "-" => Some(dx - dy)
        case "*" => Some(dx * dy)
        case "/" => Some(dx / dy)
        case "%" => Some(dx % dy)
        case _ => None
      }
    case _ => None
  }

  private def delStats(session: CypherSession, nodes: Long,
      rels: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    session.spark.createDataFrame(
      List(Row(0L, 0L, 0L, nodes, rels)).asJava,
      StructType(Seq(
        StructField("nodes_created", LongType),
        StructField("relationships_created", LongType),
        StructField("properties_set", LongType),
        StructField("nodes_deleted", LongType),
        StructField("relationships_deleted", LongType))))
  }

  private val statsCache =
    scala.collection.concurrent.TrieMap[(CypherSession, Long), DataFrame]()

  private def stats(session: CypherSession, propsSet: Long): DataFrame = {
    if (statsCache.size > 64) statsCache.clear()
    statsCache.getOrElseUpdate((session, propsSet),
      mkStats(session, propsSet))
  }

  private def mkStats(session: CypherSession, propsSet: Long): DataFrame = {
    import scala.jdk.CollectionConverters._
    session.spark.createDataFrame(
      List(Row(0L, 0L, propsSet, 0L, 0L)).asJava,
      StructType(Seq(
        StructField("nodes_created", LongType),
        StructField("relationships_created", LongType),
        StructField("properties_set", LongType),
        StructField("nodes_deleted", LongType),
        StructField("relationships_deleted", LongType))))
  }
}
