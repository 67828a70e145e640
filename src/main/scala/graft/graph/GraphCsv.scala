package graft.graph

import graft.cypher.Values
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV bulk ingestion — the reference's bulk-loader shape
  * (`/root/reference/docs/bulk_spec.md`, `demo/imdb|social` CSV fixtures):
  * one CSV per node label (columns become properties) and one per
  * relationship type (endpoint columns reference a key property of the
  * endpoint labels). Ids are assigned per label in deterministic key order
  * within disjoint ranges (≡ the reference's sequential per-file ids).
  *
  * Scale: id assignment is sort + zipWithIndex (distributed, no global
  * window funnel, no driver-side counter); endpoint resolution is a join
  * against the key→id mapping. Load-time validation mirrors the reference
  * loader: duplicate keys, dangling endpoint references, and id-range
  * overflow are errors, not silent data loss.
  */
object GraphCsv {

  /** One node CSV: every column becomes a property; `keyCol` is the
    * external key edge CSVs reference (must be unique per row).
    */
  final case class NodeCsv(path: String, label: String, keyCol: String)

  /** One relationship CSV: `srcCol`/`dstCol` carry endpoint keys of
    * `srcLabel`/`dstLabel`; remaining columns become edge properties.
    */
  final case class EdgeCsv(path: String, reltype: String,
      srcLabel: String, srcCol: String, dstLabel: String, dstCol: String)

  private val LabelStride = 100000000L

  private def variant(c: Column, dt: DataType): Column = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType =>
      Values.vInt(c.cast(LongType))
    case _: DoubleType | _: FloatType | _: DecimalType =>
      Values.vFloat(c.cast(DoubleType))
    case _: BooleanType => Values.vBool(c)
    // the reference's bulk loader types each FIELD independently
    // (bulk_insert.py typed_prop: try int, float, bool, else string), so
    // a heterogeneous column — which Spark's per-column inference lands
    // on STRING — still yields typed values per cell
    // (test_bulk_insertion.py test08's "mixed" column)
    case _: StringType =>
      when(c.isNull, lit(null).cast(Values.variantType))
        .when(lower(c) === "true", Values.vBool(lit(true)))
        .when(lower(c) === "false", Values.vBool(lit(false)))
        .when(c.rlike("^-?\\d{1,18}$"), Values.vInt(c.cast(LongType)))
        .when(c.rlike("^-?(\\d+\\.\\d*|\\.\\d+)([eE][+-]?\\d+)?$"),
          Values.vFloat(c.cast(DoubleType)))
        .otherwise(Values.vStr(c))
    case _ => Values.vStr(c.cast(StringType))
  }

  /** CSV read with the reference loader's whitespace discipline: header
    * names and cell values are trimmed (the social bulk fixture writes
    * `src, dest, relation` with padded cells).
    */
  private def readCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("header", "true")
      .option("inferSchema", "true")
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    raw.columns.foldLeft(raw)((df, c) => df.withColumnRenamed(c, c.trim))
  }

  /** Deterministic dense rank ids: sort by the (unique) key, then
    * zipWithIndex — distributed, unlike an unpartitioned window (which
    * funnels the whole file through one task).
    */
  private def withRankIds(df: DataFrame, sortCols: Seq[String],
      base: Long): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(sortCols.map(col): _*)
    val schema = sorted.schema.add(StructField("__gid", LongType))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex.map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ (base + i))
      }, schema)
  }

  /** Load the CSVs into a PropertyGraph (per-label views installed). */
  def fromCsv(spark: SparkSession, nodeCsvs: Seq[NodeCsv],
      edgeCsvs: Seq[EdgeCsv]): PropertyGraph = {
    require(nodeCsvs.map(_.label).distinct.size == nodeCsvs.size,
      "one CSV per node label")

    val labelBase: Map[String, Long] =
      nodeCsvs.zipWithIndex.map { case (n, i) =>
        n.label -> i.toLong * LabelStride
      }.toMap

    // raw node frames + key→id mappings (key canonicalized to STRING for
    // endpoint joins: total, cast-safe in ANSI mode, type-leg-agnostic)
    val rawNodes = nodeCsvs.map { n =>
      val raw = readCsv(spark, n.path)
      require(raw.columns.contains(n.keyCol),
        s"${n.path}: missing key column ${n.keyCol}")
      val dups = raw.groupBy(col(n.keyCol)).count()
        .filter(col("count") > 1).limit(5)
        .collect().map(_.get(0)).toSeq
      require(dups.isEmpty,
        s"${n.path}: duplicate ${n.keyCol} values: ${dups.mkString(", ")}")
      val withId = withRankIds(raw, Seq(n.keyCol), labelBase(n.label))
      val nRows = withId.count()
      require(nRows <= LabelStride,
        s"${n.path}: $nRows rows exceed the per-label id range $LabelStride")
      (n, raw.schema, withId)
    }

    val byLabel: Map[String, DataFrame] = rawNodes.map { case (n, sch, df) =>
      val props = map(sch.fields.flatMap { f =>
        Seq(lit(f.name), variant(col(f.name), f.dataType))
      }.toSeq: _*)
      n.label -> df.select(col("__gid").as("id"),
        lit(n.label).as("label"), props.as("props"))
    }.toMap

    // per-label key(string) → id
    val keyIds: Map[String, DataFrame] = rawNodes.map { case (n, _, df) =>
      n.label -> df.select(
        col(n.keyCol).cast(StringType).as("__key"),
        col("__gid").as("__nid"))
    }.toMap

    val edgeFrames = edgeCsvs.zipWithIndex.map { case (e, i) =>
      val raw = readCsv(spark, e.path)
      Seq(e.srcCol, e.dstCol).foreach { c =>
        require(raw.columns.contains(c), s"${e.path}: missing column $c")
      }
      require(keyIds.contains(e.srcLabel), s"unknown src label ${e.srcLabel}")
      require(keyIds.contains(e.dstLabel), s"unknown dst label ${e.dstLabel}")
      val propCols = raw.schema.fields
        .filterNot(f => f.name == e.srcCol || f.name == e.dstCol)
      val props =
        if (propCols.isEmpty) map().cast(Values.propsType)
        else map(propCols.flatMap { f =>
          Seq(lit(f.name), variant(col(f.name), f.dataType))
        }.toSeq: _*)
      // keep ONLY (key refs, props) past this point: a property column
      // named id/src/dst must not collide with the resolved columns
      // sort on BOTH endpoint refs PLUS a props hash: parallel edges share
      // (src, dst), and without a tiebreak the zipWithIndex order — hence
      // the id↔props association — could change across lazy recomputation;
      // edges identical in all three are interchangeable, so this order is
      // total up to indistinguishable rows
      val withId = withRankIds(
        raw.select(col(e.srcCol).cast(StringType).as("__srcref"),
          col(e.dstCol).cast(StringType).as("__dstref"),
          props.as("__props"))
          .withColumn("__tie", xxhash64(to_json(col("__props")))),
        Seq("__srcref", "__dstref", "__tie"),
        (i + nodeCsvs.size).toLong * LabelStride)
        .drop("__tie")
      val nRaw = withId.count()
      require(nRaw <= LabelStride,
        s"${e.path}: $nRaw rows exceed the per-relation id range $LabelStride")
      val resolved = withId
        .join(keyIds(e.srcLabel).withColumnRenamed("__key", "__srcref")
          .withColumnRenamed("__nid", "__srcid"), Seq("__srcref"))
        .join(keyIds(e.dstLabel).withColumnRenamed("__key", "__dstref")
          .withColumnRenamed("__nid", "__dstid"), Seq("__dstref"))
      val nResolved = resolved.count()
      // the reference loader reports unresolved endpoints; silent inner-join
      // dropping would hide typo'd or missing keys
      require(nResolved == nRaw,
        s"${e.path}: ${nRaw - nResolved} edge(s) reference missing " +
          s"${e.srcLabel}/${e.dstLabel} keys")
      e.reltype -> resolved.select(
        col("__gid").as("id"), col("__srcid").as("src"),
        col("__dstid").as("dst"),
        lit(e.reltype).as("reltype"), col("__props").as("props"))
    }

    val nodes = byLabel.values.reduce(_.unionByName(_))
    val edges =
      if (edgeFrames.nonEmpty) edgeFrames.map(_._2).reduce(_.unionByName(_))
      else spark.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("id", LongType), StructField("src", LongType),
          StructField("dst", LongType), StructField("reltype", StringType),
          StructField("props", Values.propsType))))
    val byType = edgeFrames.groupBy(_._1).map { case (t, fs) =>
      t -> fs.map(_._2).reduce(_.unionByName(_))
    }
    PropertyGraph(nodes, edges, byLabel = byLabel, byReltype = byType)
  }
}
