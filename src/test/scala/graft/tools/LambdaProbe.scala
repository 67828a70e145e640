package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: times translation vs execution of comprehension
  * shapes over entity keys (the TCK Merge6 control-query family).
  */
object LambdaProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = new graft.cypher.CypherSession(spark)
    sess.run("CREATE (:A {name: 'A'})-[:TYPE {name: 'foo'}]->(:B {name: 'B'})")
    def timed(label: String, q: String): Unit = {
      val t0 = System.nanoTime()
      val df = sess.run(q)
      val t1 = System.nanoTime()
      val n = sess.rows(df).size
      val t2 = System.nanoTime()
      println(f"$label%-12s translate ${(t1 - t0) / 1e9}%.2f s  execute ${(t2 - t1) / 1e9}%.2f s  rows $n")
    }
    timed("comprehension", "MATCH ()-[r:TYPE]->() RETURN [key IN keys(r) | key + '->' + r[key]] AS keyValue")
    timed("again", "MATCH ()-[r2:TYPE]->() RETURN [key IN keys(r2) | key + '->' + r2[key]] AS kv2")
    timed("simplebody", "MATCH ()-[r3:TYPE]->() RETURN [key IN keys(r3) | key] AS kv3")
    timed("subscr", "MATCH ()-[r4:TYPE]->() RETURN [key IN keys(r4) | r4[key]] AS kv4")
    timed("concat", "MATCH ()-[r5:TYPE]->() RETURN [key IN keys(r5) | key + '->'] AS kv5")
    spark.stop()
  }
}
