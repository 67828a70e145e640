package graft

import org.apache.spark.sql.SparkSession

/** Point-write latency diagnostic (builder-local, not a driver surface). */
object DiagPoint {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sess = new graft.cypher.CypherSession(spark)
    sess.run("UNWIND range(0, 200) AS i CREATE (:N {v: i})-[:R {w: i}]->(:M {v: i})")
    val edel = "MATCH (:N {v: $i})-[e:R]->() DELETE e"
    val ndel = "MATCH (n:M {v: $i}) DELETE n"
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e6}%.1f ms"); r
    }
    t("edel warm (build)") { sess.run(edel, Map("i" -> 0L)) }
    (1 to 8).foreach { i => t(s"edel $i") { sess.run(edel, Map("i" -> i.toLong)) } }
    t("ndel warm (build)") { sess.run(ndel, Map("i" -> 0L)) }
    (1 to 8).foreach { i => t(s"ndel $i") { sess.run(ndel, Map("i" -> i.toLong)) } }
    val left = sess.rows(sess.run("MATCH ()-[e:R]->() RETURN count(e) AS c"))
      .head("c").asInstanceOf[Long]
    val mLeft = sess.rows(sess.run("MATCH (n:M) RETURN count(n) AS c"))
      .head("c").asInstanceOf[Long]
    println(s"edges left: $left (expect 192), M nodes left: $mLeft (expect 192)")
    spark.stop()
  }
}
