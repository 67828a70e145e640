package graft.graph

import graft.cypher.Values
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV bulk ingestion — the reference's bulk-loader shape
  * (`/root/reference/docs/bulk_spec.md`, `demo/imdb|social` CSV fixtures):
  * one CSV per node label (columns become properties) and one per
  * relationship type (endpoint columns reference a key property of the
  * endpoint labels). Ids are assigned per label in deterministic key order
  * within disjoint ranges (≡ the reference's sequential per-file ids).
  *
  * Scale: everything is a join against the (label-ranged) key→id mapping;
  * no driver-side id counter, no collect. At 100 TB the key→id frames are
  * just columns on the node tables, and the endpoint resolution is the
  * same broadcast/shuffle join Spark already plans.
  */
object GraphCsv {

  /** One node CSV: every column becomes a property; `keyCol` is the
    * external key edge CSVs reference.
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
    case _ => Values.vStr(c.cast(StringType))
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

    // nodes: id = label base + rank of the key within the file (key order —
    // deterministic under any partitioning, unlike input order)
    val byLabel: Map[String, DataFrame] = nodeCsvs.map { n =>
      val raw = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(n.path)
      require(raw.columns.contains(n.keyCol),
        s"${n.path}: missing key column ${n.keyCol}")
      val w = Window.orderBy(col(n.keyCol))
      val withId = raw.withColumn("__rk", row_number().over(w))
      val props = map(raw.schema.fields.flatMap { f =>
        Seq(lit(f.name), variant(col(f.name), f.dataType))
      }.toSeq: _*)
      n.label -> withId.select(
        (col("__rk").cast(LongType) + (labelBase(n.label) - 1L)).as("id"),
        lit(n.label).as("label"), props.as("props"))
    }.toMap

    // key→id mapping per label, for endpoint resolution
    def keyed(label: String, keyCol: String): DataFrame =
      byLabel(label).select(
        element_at(col("props"), keyCol).getField("s").as("__key_s"),
        element_at(col("props"), keyCol).getField("i").as("__key_i"),
        col("id"))

    val edgeFrames = edgeCsvs.zipWithIndex.map { case (e, i) =>
      val raw = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(e.path)
      val srcKeyCol = nodeCsvs.find(_.label == e.srcLabel)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown src label ${e.srcLabel}")).keyCol
      val dstKeyCol = nodeCsvs.find(_.label == e.dstLabel)
        .getOrElse(throw new IllegalArgumentException(
          s"unknown dst label ${e.dstLabel}")).keyCol
      val propCols = raw.schema.fields
        .filterNot(f => f.name == e.srcCol || f.name == e.dstCol)
      val props =
        if (propCols.isEmpty) map().cast(Values.propsType)
        else map(propCols.flatMap { f =>
          Seq(lit(f.name), variant(col(f.name), f.dataType))
        }.toSeq: _*)
      // resolve endpoints by joining the key column against the label's
      // key→id mapping (string or integer key, matched on the variant leg)
      def resolve(df: DataFrame, refCol: String, label: String,
          keyCol: String, as: String): DataFrame = {
        val k = keyed(label, keyCol)
        // plain === (NOT null-safe <=>): for a string-keyed label every
        // node's __key_i is NULL, and a null-safe match on the integer leg
        // would pair every non-numeric ref with every node
        df.join(k,
            col(refCol).cast(StringType) === k("__key_s") ||
              col(refCol).cast(LongType) === k("__key_i"))
          .drop("__key_s", "__key_i")
          .withColumnRenamed("id", as)
      }
      val w = Window.orderBy(col(e.srcCol), col(e.dstCol))
      val withProps = raw.withColumn("__props", props)
        .withColumn("__rk", row_number().over(w))
      val resolved = resolve(
        resolve(withProps, e.srcCol, e.srcLabel, srcKeyCol, "src"),
        e.dstCol, e.dstLabel, dstKeyCol, "dst")
      e.reltype -> resolved.select(
        (col("__rk").cast(LongType) +
          ((i + nodeCsvs.size).toLong * LabelStride - 1L)).as("id"),
        col("src"), col("dst"), lit(e.reltype).as("reltype"),
        col("__props").as("props"))
    }

    val nodes = byLabel.values.reduce(_.unionByName(_))
    val edges = edgeFrames.map(_._2).reduce(_.unionByName(_))
    val byType = edgeFrames.groupBy(_._1).map { case (t, fs) =>
      t -> fs.map(_._2).reduce(_.unionByName(_))
    }
    PropertyGraph(nodes, edges, byLabel = byLabel, byReltype = byType)
  }
}
