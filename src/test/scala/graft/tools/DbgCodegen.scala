package graft.tools

import graft.cypher.CypherSession

/** Scratch: reproduce the two codegen-fallback query shapes standalone
  * (run with CODEGEN_STRICT=1 to make the failure fatal, without to check
  * results). sbt "Test/runMain graft.tools.DbgCodegen"
  */
object DbgCodegen {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("gencode"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
        org.apache.logging.log4j.Level.DEBUG)
    val s1 = new CypherSession(spark)
    s1.run("CREATE (a:A {p1: 12}), (b:B {p2: 13}), (c:C)")
    println("=== matchwhere10 (64KB overflow shape):")
    val df1 = s1.run("MATCH (n) WHERE n.p1 = 12 OR n.p2 = 13 RETURN n")
    if (args.contains("dump")) {
      import org.apache.spark.sql.execution.debug._
      val code = df1.queryExecution.debug.codegenToSeq()
      code.zipWithIndex.foreach { case ((subtree, src, _), i) =>
        println(s"--- subtree $i (${src.length} chars):")
        println(subtree)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/tmp/gen_$i.java"),
          src.getBytes("UTF-8"))
      }
      println("=== optimized plan (8k):")
      println(df1.queryExecution.optimizedPlan.treeString.take(2000))
      val re = graft.plans.ProjectCseRule(df1.queryExecution.optimizedPlan)
      println("=== manual ProjectCseRule changed: " +
        !re.fastEquals(df1.queryExecution.optimizedPlan))
      println(re.treeString.take(2000))
      spark.stop(); return
    }
    df1.collect().foreach(println)
    val s2 = new CypherSession(spark)
    println("=== map1 (isNull rvalue shape):")
    val df2 = s2.run("WITH [{num: 0}, 1] AS list RETURN (list[0]).num")
    if (args.contains("dump2")) {
      import org.apache.spark.sql.execution.debug._
      df2.queryExecution.debug.codegenToSeq().zipWithIndex.foreach {
        case ((subtree, src, _), i) =>
          println(s"--- map1 subtree $i (${src.length} chars) -> /tmp/map1_$i.java")
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"/tmp/map1_$i.java"),
            src.getBytes("UTF-8"))
      }
      println(df2.queryExecution.executedPlan.treeString.take(4000))
      spark.stop(); return
    }
    df2.collect().foreach(println)
    println("=== create4 (many CREATE clauses, literal fast path):")
    val s3 = new CypherSession(spark)
    val create = (0 until 300).map(i =>
      s"CREATE (hf)-[:STUDENT]->(_$i:Student {name: 'S$i'})")
      .mkString("\n")
    val t0 = System.nanoTime()
    s3.run(s"CREATE (hf:School {name: 'HF'})\n$create")
    println(f"create4-like 301 entities: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val n = s3.rows(s3.run("MATCH (hf:School)-[:STUDENT]->(s:Student) RETURN count(s) AS n"))
      .head("n")
    println(s"students linked: $n")
    spark.stop()
  }
}
