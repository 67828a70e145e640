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

  def invoke(session: CypherSession, name: String,
      args: List[Any]): ProcResult = {
    val g = session.graph
    name.toLowerCase match {
      case "db.labels" =>
        (g.nodes.select(col("label")).where(col("label").isNotNull)
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

      case "db.indexes" =>
        val spark = session.spark
        import scala.jdk.CollectionConverters._
        val rows = session.propIndexList.toList.map { case (l, p) =>
          org.apache.spark.sql.Row("exact-match", s"$l($p)")
        } ++ session.fulltextLabels.toList.map { l =>
          org.apache.spark.sql.Row("full-text", l)
        }
        (spark.createDataFrame(rows.asJava, StructType(Seq(
          StructField("type", StringType), StructField("label", StringType)))
        ).select(Values.vStr(col("type")).as("type"),
          Values.vStr(col("label")).as("label")),
          Map("type" -> KValue, "label" -> KValue))

      // `src/procedures/proc_pagerank.c:202` → GraphX staticPageRank
      case "algo.pagerank" =>
        val (label, reltype) = args match {
          case Nil => (None, None)
          case List(l: String, r: String) => (Some(l), Some(r))
          case List(null, null) => (None, None)
          case other => throw TranslateError(s"algo.pageRank args: $other")
        }
        val sub = PropertyGraph(
          label.map(g.nodesByLabel).getOrElse(g.nodes),
          reltype.map(g.edgesByType)
            .getOrElse(g.edges))
        val pr = GraphOps.pageRank(sub)
        val joined = sub.nodes.join(pr, Seq("id"))
        (joined.select(
          struct(col("id"), col("label"), col("props")).as("node"),
          Values.vFloat(col("pagerank")).as("score")),
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
        session.buildFulltextIndex(label, props)
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
        val qTokens = CypherSession.tokenize(query)
        if (qTokens.isEmpty)
          (session.spark.range(0).select(
            lit(null).cast(Translator.nodeStructType).as("node"),
            Values.vFloat(lit(0.0)).as("score")),
            Map("node" -> KNode, "score" -> KValue))
        else {
          // score = matched distinct query tokens (TF-IDF-lite); the join is
          // a broadcast of the (tiny) token list against the inverted index
          val hits = idx.filter(col("token").isin(qTokens: _*))
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
