package graft.cypher

import graft.graph.{GraphOps, PropertyGraph}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Procedure registry (`/root/reference/src/procedures/procedure.c:29-42`):
  * table-valued functions `name → (session, constant args) => DataFrame`,
  * invoked by CALL … YIELD. Mirrors the reference set: db.labels,
  * db.relationshipTypes, db.propertyKeys, db.indexes, algo.pageRank,
  * algo.BFS, db.idx.fulltext.{createNodeIndex,drop,queryNodes}.
  *
  * Each returns (DataFrame, per-column Kind) so downstream clauses treat
  * yielded entities/values correctly.
  */
object Procedures {
  import Translator.{Kind, KNode, KValue, TranslateError}

  type ProcResult = (DataFrame, Map[String, Kind])

  /** A registered table-valued procedure with a typed signature
    * (the openCypher `CALL` extension surface — the reference compiles
    * procedures in, `src/procedures/procedure.c:29-42`; here users can
    * register their own). The defining table's columns cover the argument
    * AND output names: invocation selects the rows whose argument columns
    * match the passed values and projects the output columns, preserving
    * the registration row order.
    */
  final case class AdHocProc(name: String,
      args: List[(String, String)], outs: List[(String, String)],
      header: List[String], rows: List[List[Any]]) {
    def colIdx(c: String): Int = {
      val i = header.indexOf(c)
      if (i < 0) throw TranslateError(
        s"procedure $name: defining table lacks column `$c`")
      i
    }
  }

  /** `test.my.proc(name :: STRING?, id :: INTEGER?) :: (out :: STRING?)` */
  def parseSignature(sig: String): (String, List[(String, String)],
      List[(String, String)]) = {
    val m = """^\s*([\w.]+)\s*\((.*?)\)\s*::\s*\((.*?)\)\s*:?\s*$""".r
    def items(s: String): List[(String, String)] =
      s.split(",").map(_.trim).filter(_.nonEmpty).toList.map { it =>
        it.split("::") match {
          case Array(n, t) => (n.trim, t.trim.stripSuffix("?").toUpperCase)
          case _ => throw TranslateError(s"bad signature item: $it")
        }
      }
    sig match {
      case m(name, a, o) => (name, items(a), items(o))
      case _ => throw TranslateError(s"bad procedure signature: $sig")
    }
  }

  /** Declared-type check with numeric assignability (INTEGER ⊆ FLOAT ⊆
    * NUMBER accept wider/narrower numerics; null satisfies any nullable
    * `?` type).
    */
  private def typeOk(tpe: String, v: Any): Boolean = v match {
    case null => true
    case _: Long | _: Int => Set("INTEGER", "FLOAT", "NUMBER", "ANY")(tpe)
    case _: Double => Set("FLOAT", "NUMBER", "ANY")(tpe)
    case _: String => Set("STRING", "ANY")(tpe)
    case _: Boolean => Set("BOOLEAN", "ANY")(tpe)
    case _ => tpe == "ANY"
  }

  /** Argument-to-table-cell equality: numerics compare by value across
    * int/float (a FLOAT? argument declared 42.0 matches the literal 42).
    */
  private def argEq(cell: Any, v: Any): Boolean = {
    def widen(x: Any): Any = x match {
      case i: Int => i.toLong
      case other => other
    }
    (widen(cell), widen(v)) match {
      case (null, null) => true
      case (null, _) | (_, null) => false
      case (a: Long, b: Long) => a == b
      case (a: Long, b: Double) => a.toDouble == b
      case (a: Double, b: Long) => a == b.toDouble
      case (a: Double, b: Double) => a == b
      case (a, b) => a == b
    }
  }

  private def invokeAdHoc(session: CypherSession, p: AdHocProc,
      args: List[Any]): ProcResult = {
    if (args.length != p.args.length)
      throw TranslateError(s"procedure ${p.name} expects " +
        s"${p.args.length} arguments, got ${args.length}")
    p.args.zip(args).foreach { case ((an, at), v) =>
      if (!typeOk(at, v)) throw TranslateError(
        s"InvalidArgumentType: procedure ${p.name} argument `$an` " +
          s"expects $at, got $v")
    }
    if (p.outs.isEmpty)
      return (session.spark.emptyDataFrame, Map.empty)
    val matching =
      if (p.args.isEmpty) p.rows
      else p.rows.filter { r =>
        p.args.zipWithIndex.forall { case ((an, _), i) =>
          argEq(r(p.colIdx(an)), args(i))
        }
      }
    def rawType(t: String): DataType = t match {
      case "INTEGER" => LongType
      case "FLOAT" | "NUMBER" => DoubleType
      case "BOOLEAN" => BooleanType
      case _ => StringType
    }
    def coerce(v: Any, t: String): Any = (v, t) match {
      case (null, _) => null
      case (x: Long, "FLOAT" | "NUMBER") => x.toDouble
      case (x: Int, "FLOAT" | "NUMBER") => x.toDouble
      case (x: Int, "INTEGER") => x.toLong
      case (x, _) => x
    }
    import scala.jdk.CollectionConverters._
    val schema = StructType(p.outs.map { case (n, t) =>
      StructField(n, rawType(t), nullable = true) })
    val data = matching.map { r =>
      org.apache.spark.sql.Row(p.outs.map { case (n, t) =>
        coerce(r(p.colIdx(n)), t) }: _*)
    }
    // LocalRelation: registration row order IS the yield order
    val raw = session.spark.createDataFrame(data.asJava, schema)
    def wrap(t: String, c: Column): Column = t match {
      case "INTEGER" => Values.vInt(c)
      case "FLOAT" | "NUMBER" => Values.vFloat(c)
      case "BOOLEAN" => Values.vBool(c)
      case _ => Values.vStr(c)
    }
    (raw.select(p.outs.map { case (n, t) => wrap(t, col(n)).as(n) }: _*),
      p.outs.map(_._1 -> (KValue: Kind)).toMap)
  }

  /** Argument names+count of a registered ad-hoc procedure (implicit
    * argument binding); None for built-ins (all nullary or validated at
    * invoke).
    */
  def signatureArgs(session: CypherSession,
      name: String): Option[List[String]] =
    session.adHocProc(name).map(_.args.map(_._1))

  /** Built-in procedure signatures: (arg names, output (name, type) pairs).
    * Mirrors the reference's compiled-in registry
    * (`src/procedures/procedure.c:29-42`); also serves `dbms.procedures()`
    * (`src/procedures/proc_procedures.c`).
    */
  val builtinSignatures: List[(String, List[String], List[(String, String)])] =
    List(
      ("db.labels", Nil, List("label" -> "STRING")),
      ("db.relationshipTypes", Nil, List("relationshipType" -> "STRING")),
      ("db.propertyKeys", Nil, List("propertyKey" -> "STRING")),
      ("db.indexes", Nil, List("type" -> "STRING", "label" -> "STRING",
        "properties" -> "LIST OF STRING")),
      ("dbms.procedures", Nil,
        List("name" -> "STRING", "signature" -> "STRING",
          "mode" -> "STRING")),
      ("algo.pageRank", List("label", "relationshipType"),
        List("node" -> "NODE", "score" -> "FLOAT")),
      ("algo.BFS", List("sourceNode", "maxLevel", "relationshipType"),
        List("node" -> "NODE", "level" -> "INTEGER")),
      ("db.idx.fulltext.createNodeIndex", List("label", "property"),
        List("status" -> "STRING")),
      ("db.idx.fulltext.drop", List("label"), List("status" -> "STRING")),
      ("db.idx.fulltext.queryNodes", List("label", "query"),
        List("node" -> "NODE", "score" -> "FLOAT")))

  /** Output arity known statically (ad-hoc AND built-in procs): used to
    * enforce the in-query YIELD requirement uniformly before invocation.
    */
  def declaredOuts(session: CypherSession, name: String): Option[Int] =
    session.adHocProc(name).map(_.outs.length).orElse(
      builtinSignatures.collectFirst {
        case (n, _, outs) if n.equalsIgnoreCase(name) => outs.length
      })

  def invoke(session: CypherSession, name: String,
      args: List[Any]): ProcResult = {
    session.adHocProc(name) match {
      case Some(p) => return invokeAdHoc(session, p, args)
      case None => ()
    }
    val g = session.graph
    name.toLowerCase match {
      case "db.labels" =>
        // label column = ':'-joined label list — report each component once
        (g.nodes.select(col("label")).where(col("label").isNotNull)
          .select(explode(split(col("label"), ":")).as("label"))
          .distinct().select(Values.vStr(col("label")).as("label")),
          Map("label" -> KValue))

      case "db.relationshiptypes" =>
        (g.edges.select(col("reltype")).where(col("reltype").isNotNull)
          .distinct()
          .select(Values.vStr(col("reltype")).as("relationshipType")),
          Map("relationshipType" -> KValue))

      case "db.propertykeys" =>
        val n = g.nodes.select(explode(map_keys(col("props"))).as("k"))
        val e = g.edges.select(explode(map_keys(col("props"))).as("k"))
        (n.unionByName(e).distinct()
          .select(Values.vStr(col("k")).as("propertyKey")),
          Map("propertyKey" -> KValue))

      // `src/procedures/proc_procedures.c`: list the registry — built-ins
      // plus session-registered ad-hoc procedures, with their signatures
      case "dbms.procedures" =>
        val spark = session.spark
        import scala.jdk.CollectionConverters._
        def sig(name: String, args: List[String],
            outs: List[(String, String)]): String =
          s"$name(${args.mkString(", ")}) :: (${outs.map {
            case (n, t) => s"$n :: $t" }.mkString(", ")})"
        val builtins = builtinSignatures.map { case (n, a, o) =>
          val mode =
            if (n.startsWith("db.idx.fulltext.") && n != "db.idx.fulltext.queryNodes")
              "WRITE" else "READ"
          org.apache.spark.sql.Row(n, sig(n, a, o), mode)
        }
        val adhoc = session.adHocProcList.map { p =>
          org.apache.spark.sql.Row(p.name,
            sig(p.name, p.args.map(_._1), p.outs), "READ")
        }
        val rows = (builtins ++ adhoc).sortBy(_.getString(0))
        (spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("name", StringType),
          StructField("signature", StringType),
          StructField("mode", StringType))))
          .select(Values.vStr(col("name")).as("name"),
            Values.vStr(col("signature")).as("signature"),
            Values.vStr(col("mode")).as("mode")),
          Map("name" -> KValue, "signature" -> KValue, "mode" -> KValue))

      case "db.indexes" =>
        val spark = session.spark
        import scala.jdk.CollectionConverters._
        // reference shape (`proc_indexes.c` / test_procedures.py test11):
        // one row per (type, label) with the PROPERTIES as a list,
        // exact-match properties in creation order
        val rows = session.propIndexList.groupBy(_._1).toList
          .map { case (l, ps) =>
            org.apache.spark.sql.Row("exact-match", l, ps.map(_._2))
          } ++ session.fulltextLabels.toList.map { l =>
          org.apache.spark.sql.Row("full-text", l,
            session.fulltextProps(l))
        }
        val sorted = rows.sortBy(r => (r.getString(0), r.getString(1)))
        (spark.createDataFrame(sorted.asJava, StructType(Seq(
          StructField("type", StringType), StructField("label", StringType),
          StructField("properties", ArrayType(StringType))))
        ).select(Values.vStr(col("type")).as("type"),
          Values.vStr(col("label")).as("label"),
          Values.vArr(transform(col("properties"),
            p => Values.sStr(p))).as("properties")),
          Map("type" -> KValue, "label" -> KValue, "properties" -> KValue))

      // `src/procedures/proc_pagerank.c:202` → [[GraphOps.pageRankRef]]
      // (the LAGraph formulation, normalized to sum 1). The matrix is the
      // LABEL-INDUCED subgraph: both edge endpoints must carry the label
      // (test_pagerank.py "no_connections"), parallel edges collapse to
      // one connection, and an EMPTY matrix yields an empty result set —
      // not teleport-only scores. Rows emit score-descending (the
      // reference qsorts before replying), id ascending on ties.
      case "algo.pagerank" =>
        val (label, reltype) = args match {
          case Nil => (None, None)
          case List(l: String, r: String) => (Some(l), Some(r))
          case List(null, null) => (None, None)
          case List(l: String, null) => (Some(l), None)
          case List(null, r: String) => (None, Some(r))
          case other => throw TranslateError(s"algo.pageRank args: $other")
        }
        val nodesL = label.map(g.nodesByLabel).getOrElse(g.nodes)
        val edgesT = reltype.map(g.edgesByType).getOrElse(g.edges)
        val ids = nodesL.select(col("id"))
        val edgesL = edgesT
          .join(ids.withColumnRenamed("id", "__sid"),
            col("src") === col("__sid"), "left_semi")
          .join(ids.withColumnRenamed("id", "__did"),
            col("dst") === col("__did"), "left_semi")
        val base = if (edgesL.isEmpty) nodesL.limit(0) else nodesL
        val pr = GraphOps.pageRankRef(PropertyGraph(base, edgesL))
        val joined = nodesL.join(pr, Seq("id"))
        (joined.select(
          struct(col("id"), col("label"), col("props")).as("node"),
          Values.vFloat(col("pagerank")).as("score"))
          .orderBy(col("score.f").desc, col("node.id")),
          Map("node" -> KNode, "score" -> KValue))

      // `src/procedures/proc_bfs.c` (source, maxLevel, reltype) — source by
      // node id; level-synchronous BFS via the frontier-join kernel
      case "algo.bfs" =>
        val (srcId, maxLevel, reltype) = args match {
          case List(s: Long, m: Long) => (s, m.toInt, None)
          case List(s: Long, m: Long, r: String) => (s, m.toInt, Some(r))
          case other => throw TranslateError(s"algo.BFS args: $other")
        }
        val edges = reltype.map(g.edgesByType)
          .getOrElse(g.edges)
        val sources = g.nodes.filter(col("id") === srcId).select(col("id"))
        val reach = GraphOps.varLenExpand(sources, edges, 1,
          if (maxLevel <= 0) 15 else maxLevel)
        val joined = g.nodes.join(reach.select(col("node").as("__nid"),
          col("hops")), col("id") === col("__nid"))
        (joined.select(
          struct(col("id"), col("label"), col("props")).as("node"),
          Values.vInt(col("hops").cast(LongType)).as("level")),
          Map("node" -> KNode, "level" -> KValue))

      // fulltext (reference delegates to RediSearch, `src/index/index.h:29`;
      // here: tokenized inverted index DataFrame, rebuilt per (re)index)
      case "db.idx.fulltext.createnodeindex" =>
        val (label, props) = args match {
          case (l: String) :: rest if rest.nonEmpty =>
            (l, rest.map(_.asInstanceOf[String]))
          case other => throw TranslateError(s"createNodeIndex args: $other")
        }
        session.lastIndicesCreated =
          session.buildFulltextIndex(label, props).toLong
        (session.spark.range(0).select(Values.vStr(lit("ok")).as("status")),
          Map("status" -> KValue))

      case "db.idx.fulltext.drop" =>
        args match {
          case List(l: String) => session.dropFulltextIndex(l)
          case other => throw TranslateError(s"fulltext.drop args: $other")
        }
        (session.spark.range(0).select(Values.vStr(lit("ok")).as("status")),
          Map("status" -> KValue))

      case "db.idx.fulltext.querynodes" =>
        val (label, query) = args match {
          case List(l: String, q: String) => (l, q)
          case other => throw TranslateError(s"queryNodes args: $other")
        }
        val idx = session.fulltextIndex(label).getOrElse(
          throw TranslateError(s"no fulltext index on :$label"))
        // RediSearch-lite query surface: whitespace/`|` separate union
        // terms, a trailing `*` is a prefix wildcard, and `||` is the
        // syntax error the reference raises (test_procedures.py test08;
        // RediSearch union is a single `|`)
        if (query.contains("||")) throw TranslateError(
          s"RediSearch: Syntax error in query '$query' near '||'")
        val terms = query.toLowerCase.split("[\\s|]+")
          .filter(_.nonEmpty).toSeq
        val (prefTerms, exactTerms) = terms.partition(_.endsWith("*"))
        val exactToks = exactTerms.flatMap(CypherSession.tokenize).distinct
        val prefToks = prefTerms.map(_.dropRight(1))
          .flatMap(CypherSession.tokenize).distinct
        if (exactToks.isEmpty && prefToks.isEmpty)
          (session.spark.range(0).select(
            lit(null).cast(Translator.nodeStructType).as("node"),
            Values.vFloat(lit(0.0)).as("score")),
            Map("node" -> KNode, "score" -> KValue))
        else {
          // score = matched distinct query tokens (TF-IDF-lite); the
          // token conditions are literals pushed into the (tiny sorted)
          // index view — exact via isin, prefixes via startsWith
          val conds = (if (exactToks.nonEmpty)
            Seq(col("token").isin(exactToks: _*)) else Nil) ++
            prefToks.map(p => col("token").startsWith(p))
          val hits = idx.filter(conds.reduce(_ || _))
            .groupBy("id").agg(countDistinct("token").as("matched"))
          val joined = session.graph.nodes.join(hits, Seq("id"))
          (joined.select(
            struct(col("id"), col("label"), col("props")).as("node"),
            Values.vFloat(col("matched").cast(DoubleType)).as("score"))
            .orderBy(col("score").desc),
            Map("node" -> KNode, "score" -> KValue))
        }

      case other => throw TranslateError(s"unknown procedure: $other")
    }
  }
}
