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

  var graph: PropertyGraph = PropertyGraph(
    emptyDf(nodeSchema), emptyDf(edgeSchema))

  private var nextNodeId = 0L
  private var nextEdgeId = 0L

  /** Install an externally built graph (e.g. GraphBuilder.tpch). */
  def setGraph(g: PropertyGraph): Unit = {
    graph = g
    nextNodeId = maxId(g.nodes) + 1
    nextEdgeId = maxId(g.edges) + 1
  }

  private def maxId(df: DataFrame): Long =
    if (df.isEmpty) -1L
    else df.agg(max("id")).head().getLong(0)

  /** Run a Cypher query. Mutating statements return an empty DataFrame with
    * a statistics-bearing schema; reads return the result frame.
    */
  def run(query: String, params: Map[String, Any] = Map.empty): DataFrame = {
    val ast = CypherParser.parse(query) match {
      case Right(q) => q
      case Left(err) => throw Translator.TranslateError(err)
    }
    val isMutation = ast.parts.exists(_.clauses.exists {
      case _: Ast.Create | _: Ast.Merge | _: Ast.SetClause | _: Ast.Delete => true
      case _ => false
    })
    if (isMutation) runMutation(ast, params)
    else Translator.translate(graph, ast, params)
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
    case r: Row if r.schema != null && r.schema.fieldNames.contains("t") =>
      decodeVariant(r)
    case r: Row if r.schema != null && r.schema.fieldNames.contains("props") =>
      r.schema.fieldNames.zipWithIndex.map { case (f, i) =>
        f -> decode(r.get(i))
      }.toMap
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => k -> decode(x) }.toMap
    case s: scala.collection.Seq[_] => s.map(decode).toList
    case other => other
  }

  private def decodeVariant(r: Row): Any = {
    r.getInt(r.fieldIndex("t")) match {
      case Values.T_INT => r.getLong(r.fieldIndex("i"))
      case Values.T_FLOAT => r.getDouble(r.fieldIndex("f"))
      case Values.T_STRING => r.getString(r.fieldIndex("s"))
      case Values.T_BOOL => r.getBoolean(r.fieldIndex("b"))
      case Values.T_ARRAY =>
        val arr = r.getSeq[Row](r.fieldIndex("arr"))
        arr.map(e => if (e == null) null else decodeVariant(e)).toList
      case _ => null
    }
  }

  // ═══════════════════════════ mutations ═══════════════════════════════════
  /** CREATE execution (`op_create.c` + shared/create_functions.c): evaluate
    * literal patterns, assign sequential ids, append. Returns statistics.
    */
  private def runMutation(ast: Ast.Query, params: Map[String, Any]): DataFrame = {
    require(ast.parts.size == 1, "mutations cannot be UNIONed")
    val clauses = ast.parts.head.clauses
    require(clauses.forall(_.isInstanceOf[Ast.Create]),
      "only pure CREATE statements are supported as mutations for now")

    val newNodes = scala.collection.mutable.ArrayBuffer[Row]()
    val newEdges = scala.collection.mutable.ArrayBuffer[Row]()
    val bound = scala.collection.mutable.Map[String, Long]()

    def litValue(e: Ast.Expr): Any = e match {
      case Ast.LitInt(v) => Row(Values.T_INT, v, null, null, null, null)
      case Ast.LitFloat(v) => Row(Values.T_FLOAT, null, v, null, null, null)
      case Ast.LitString(v) => Row(Values.T_STRING, null, null, v, null, null)
      case Ast.LitBool(v) => Row(Values.T_BOOL, null, null, null, v, null)
      case Ast.Neg(Ast.LitInt(v)) => Row(Values.T_INT, -v, null, null, null, null)
      case Ast.Neg(Ast.LitFloat(v)) => Row(Values.T_FLOAT, null, -v, null, null, null)
      case Ast.LitNull => null
      case Ast.ListLit(items) =>
        Row(Values.T_ARRAY, null, null, null, null,
          items.map(i => litValue(i) match {
            case Row(t, iv, f, s, b, _) => Row(t, iv, f, s, b)
            case null => null
          }))
      case Ast.Param(name) => params.get(name) match {
        case Some(v: Long) => Row(Values.T_INT, v, null, null, null, null)
        case Some(v: Int) => Row(Values.T_INT, v.toLong, null, null, null, null)
        case Some(v: Double) => Row(Values.T_FLOAT, null, v, null, null, null)
        case Some(v: String) => Row(Values.T_STRING, null, null, v, null, null)
        case Some(v: Boolean) => Row(Values.T_BOOL, null, null, null, v, null)
        case other => throw Translator.TranslateError(s"bad param: $other")
      }
      case other =>
        throw Translator.TranslateError(s"CREATE props must be literal: $other")
    }

    def propsMap(props: List[(String, Ast.Expr)]): Map[String, Any] =
      props.flatMap { case (k, e) =>
        Option(litValue(e)).map(k -> _)
      }.toMap

    def createNode(np: Ast.NodePat): Long = {
      np.variable.filter(bound.contains) match {
        case Some(v) =>
          require(np.label.isEmpty && np.props.isEmpty,
            s"rebinding $v with label/props")
          bound(v)
        case None =>
          val id = nextNodeId; nextNodeId += 1
          newNodes += Row(id, np.label.orNull, propsMap(np.props))
          np.variable.foreach(v => bound(v) = id)
          id
      }
    }

    var nodesCreated = 0
    var edgesCreated = 0
    clauses.foreach { case Ast.Create(paths) =>
      paths.foreach { p =>
        var prevId = createNode(p.head)
        p.tail.foreach { case (rel, node) =>
          require(rel.varLen.isEmpty, "CREATE with var-length edge")
          require(rel.types.size == 1,
            "CREATE edge needs exactly one reltype")
          val nid = createNode(node)
          val (s, d) = if (rel.direction == -1) (nid, prevId) else (prevId, nid)
          val eid = nextEdgeId; nextEdgeId += 1
          newEdges += Row(eid, s, d, rel.types.head, propsMap(rel.props))
          edgesCreated += 1
          prevId = nid
        }
      }
      case _ => ()
    }
    nodesCreated = newNodes.size

    import scala.jdk.CollectionConverters._
    val nDf = spark.createDataFrame(newNodes.asJava, nodeSchema)
    val eDf = spark.createDataFrame(newEdges.asJava, edgeSchema)
    graph = PropertyGraph(
      graph.nodes.unionByName(nDf).localCheckpoint(true),
      graph.edges.unionByName(eDf).localCheckpoint(true))

    spark.createDataFrame(
      java.util.Collections.singletonList(
        Row(nodesCreated.toLong, edgesCreated.toLong)),
      StructType(Seq(
        StructField("nodes_created", LongType),
        StructField("relationships_created", LongType))))
  }
}
