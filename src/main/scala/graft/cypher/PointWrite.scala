package graft.cypher

import graft.graph.PropertyGraph
import org.apache.spark.sql.{DataFrame, Row}
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

  private val CompactEvery = 64

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
    def size: Int = pending.size + deletedNodes.size + deletedEdges.size
    def nodesOverlaid: Boolean = pending.nonEmpty || deletedNodes.nonEmpty
    def edgesOverlaid: Boolean = deletedEdges.nonEmpty
    def clear(): Unit = {
      base = None; edgeBase = None; pending.clear()
      deletedNodes.clear(); deletedEdges.clear()
      stats = None; hasDeletes = false
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
    if (params.nonEmpty) return None
    val (v, label, cond, items) = ast.parts match {
      case List(Ast.SingleQuery(List(
          Ast.Match(false, List(p), Some(c)), Ast.SetClause(its)))) =>
        p match {
          case Ast.PathPat(None, Ast.NodePat(Some(nv), lbl, Nil), Nil,
              false, _) => (nv, lbl, c, its)
          case _ => return None
        }
      case _ => return None
    }
    val id = cond match {
      case Ast.Bin("=", Ast.Fn("id", List(Ast.Variable(`v`)), false),
          Ast.LitInt(n)) => n
      case Ast.Bin("=", Ast.LitInt(n),
          Ast.Fn("id", List(Ast.Variable(`v`)), false)) => n
      case _ => return None
    }
    if (!items.forall {
      case Ast.SetItem(Ast.Variable(`v`), Some(_), e) => evaluable(v, e)
      case _ => false
    }) return None

    // current row: pending overlay first, else a point lookup
    val (curLabel, curProps) = st.pending.get(id) match {
      case Some(p) => (p.row.get(1), p.props)
      case None =>
        val hits = session.graph.nodes.filter(col("id") === id).take(2)
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
    if (label.exists(l => curLabel != l))
      return Some(stats(session, 0))

    var props: Map[String, Any] = curProps
    items.foreach { case Ast.SetItem(_, Some(k), e) =>
      eval(v, e, props) match {
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
    st.pending(id) = Pending(newRow, props)
    session.markPointWrite() // overlay view builds lazily on next read
    if (st.pending.size >= CompactEvery) {
      session.commit(session.graph.nodes, session.graph.edges) // clears st
    }
    Some(stats(session, items.size))
  }

  /** Point DELETE fast path: a single MATCH + DELETE of one bound
    * variable resolves the target ids with one distributed lookup, then
    * records them in the deletion vectors — no snapshot commit. Node
    * deletes implicitly delete touching edges (reference semantics,
    * `op_delete.c`). Falls back for multi-target deletes, paths, OPTIONAL
    * or >MaxPointIds matches.
    */
  def tryDelete(session: CypherSession, st: State, ast: Ast.Query,
      params: Map[String, Any]): Option[DataFrame] = {
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
          st.pending.remove(id)
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
    if (st.size >= CompactEvery)
      session.commit(session.graph.nodes, session.graph.edges)
    Some(delStats(session, nDel, eDel))
  }

  /** Build the overlay view over the stable base: `base.filter(¬pending ∧
    * ¬deleted) ∪ localRelation(pending)`, edges minus deletion vector — a
    * constant-depth plan, no job. byLabel/byReltype views are dropped (a
    * prebuilt label view would bypass the overlay); compaction or any
    * general mutation restores the plain committed shape.
    */
  def materialize(session: CypherSession, st: State,
      cur: PropertyGraph): PropertyGraph = {
    if (st.pending.isEmpty && !st.hasDeletes) return cur
    import scala.jdk.CollectionConverters._
    var nodes = st.base.getOrElse(cur.nodes)
    val nodeMask = (st.deletedNodes ++ st.pending.keys).toSeq
    if (nodeMask.nonEmpty)
      nodes = nodes.filter(!col("id").isin(nodeMask: _*))
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

  /** Driver-evaluable SET value: literals, the entity's own properties,
    * and arithmetic/concat over them.
    */
  private def evaluable(v: String, e: Ast.Expr): Boolean = e match {
    case Ast.LitInt(_) | Ast.LitFloat(_) | Ast.LitString(_) |
        Ast.LitBool(_) | Ast.LitNull => true
    case Ast.Prop(Ast.Variable(`v`), _) => true
    case Ast.Neg(x) => evaluable(v, x)
    case Ast.Bin("+" | "-" | "*" | "/" | "%", l, r) =>
      evaluable(v, l) && evaluable(v, r)
    case _ => false
  }

  private def eval(v: String, e: Ast.Expr,
      props: Map[String, Any]): Option[Any] = e match {
    case Ast.LitInt(n) => Some(n)
    case Ast.LitFloat(n) => Some(n)
    case Ast.LitString(s) => Some(s)
    case Ast.LitBool(b) => Some(b)
    case Ast.LitNull => Some(null)
    case Ast.Prop(Ast.Variable(`v`), k) => Some(props.getOrElse(k, null))
    case Ast.Neg(x) => eval(v, x, props).flatMap {
      case n: Long => Some(-n)
      case d: Double => Some(-d)
      case null => Some(null)
      case _ => None
    }
    case Ast.Bin(op, l, r) =>
      for {
        a <- eval(v, l, props)
        b <- eval(v, r, props)
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
