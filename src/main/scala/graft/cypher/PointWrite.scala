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

  /** Per-session overlay state (guarded by the session's write lock). */
  final class State {
    var base: Option[DataFrame] = None // nodes frame the overlay applies to
    val pending = scala.collection.mutable.LinkedHashMap[Long, Pending]()
    def clear(): Unit = { base = None; pending.clear() }
  }

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

  /** Build the overlay view over the stable base: `base.filter(¬pending)
    * ∪ localRelation(pending)` — a constant-depth plan, no job. byLabel/
    * byReltype views are dropped (a prebuilt label view would bypass the
    * overlay); compaction or any general mutation restores the plain
    * committed shape.
    */
  def materialize(session: CypherSession, st: State,
      cur: PropertyGraph): PropertyGraph = {
    if (st.pending.isEmpty) return cur
    import scala.jdk.CollectionConverters._
    val base = st.base.getOrElse(cur.nodes)
    val pendingDf = session.spark.createDataFrame(
      st.pending.values.map(_.row).toList.asJava, session.nodeSchema)
    val ids = st.pending.keys.toSeq
    val overlaid = base.filter(!col("id").isin(ids: _*))
      .unionByName(pendingDf)
    PropertyGraph(overlaid, cur.edges).seedStatsFrom(cur)
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
