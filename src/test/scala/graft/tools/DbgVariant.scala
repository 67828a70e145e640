package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Probe: schema_of_variant strings + nested map value extraction shapes
  * (variantMiniKey recursion triage).
  */
object DbgVariant {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq("""{"a":{"x":10}}""", """{"a":{"x":2}}""", """[10]""",
      """"s"""", "true", "2", "2.5", "null").toDF("j")
      .withColumn("v", parse_json(col("j")))
    df.select(col("j"), schema_of_variant(col("v")).as("sch")).show(false)
    // nested extraction: from_json of variant cast to string
    val m = from_json(col("v").cast(StringType),
      MapType(StringType, VariantType))
    df.filter(col("j").startsWith("{"))
      .select(col("j"),
        map_keys(m).as("ks"),
        schema_of_variant(element_at(m, "a")).as("vsch"),
        try_variant_get(element_at(m, "a"), "$", "double").as("vd"),
        element_at(m, "a").cast(StringType).as("vtxt"))
      .show(false)
    spark.stop()
  }
}
