package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relevance ranking over the fulltext surface: BM25 scoring of documents
  * against a bag of query terms.
  *
  * The reference's fulltext search returns RediSearch relevance scores with
  * its hits (`db.idx.fulltext.queryNodes` yields a `score` column,
  * `src/procedures/proc_fulltext_query.c`); this is the same capability
  * Spark-first: corpus statistics (document frequency, average length) are
  * tiny aggregates broadcast against the per-doc term frequencies, so the
  * whole scorer is two scans of the token stream and no wide shuffle —
  * the shape that survives a 100 TB corpus.
  *
  * Determinism: per-term idf is rounded to 8 dp before weighting (ln() may
  * differ in the last ulp across engines/libm builds), per-term partial
  * scores combine in fixed term order, final score rounds to 5 dp — the
  * DuckDB oracle reproduces the exact doubles.
  */
object Ranking {

  /** BM25 scores for every document matching ≥1 query term.
    * Output: (doc_id, score), score rounded to 5 dp, descending-sortable.
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")

    // ONE corpus pass (was two: a term-filtered token stream AND a separate
    // all-docs stats scan that re-tokenized every document just to count
    // lengths). The token stream explodes once, un-filtered, and a single
    // per-doc aggregate pivots the query terms into columns: dl = token
    // count, tfᵢ = occurrences of term i (terms is a small fixed list, so
    // the pivot is a handful of conditional sums inside one codegen'd
    // map-side partial aggregate — the doc_id exchange moves one narrow row
    // per doc, never the token stream). Stats and scorer both hang off this
    // SAME exchange and Catalyst de-duplicates it (ReusedExchange), so the
    // corpus is scanned and tokenized exactly once (guide §2.4/§6).
    // Value parity with the previous shape (and the unchanged SQL oracle):
    // dl (split never yields an empty array, so count(*) over exploded
    // tokens ≡ size(split(...)) and no doc drops out), tf and df are exact
    // integers, avgdl is an exact integer sum / exact count, and the idf/w
    // arithmetic below keeps the identical expression shape and fixed term
    // order.
    val tfCols = terms.indices.map { i =>
      sum(when(col("tok") === terms(i), 1L).otherwise(0L)).as(s"__tf$i")
    }
    val perDoc = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("double").as("dl"), tfCols: _*)

    // corpus stats + per-term document frequency in one broadcastable row
    val statAggs = Seq(
      count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl")) ++
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("double")
          .as(s"__df$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)

    // docs matching ≥ 1 query term, scored per term in FIXED term order
    // (float addition is not associative; an unordered sum() could differ
    // from the oracle's); a term absent from a doc contributes literal 0.0
    val matched = perDoc.filter(
      terms.indices.map(i => col(s"__tf$i")).reduce(_ + _) > 0)
    val termCols = terms.indices.map { i =>
      val tf = col(s"__tf$i")
      val df = col(s"__df$i")
      val idf = round(
        log(lit(1.0) + (col("n_docs") - df + 0.5) / (df + 0.5)), 8)
      val w = (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
      when(tf > 0, idf * w).otherwise(lit(0.0))
    }
    matched.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(termCols.reduce(_ + _), 5).as("score"))
  }

  /** DuckDB-SQL replication of [[bm25]] over the `documents` table —
    * same tokenization, same rounding points, same fixed-order term sum.
    */
  def bm25Sql(terms: Seq[String], k1: Double = 1.2,
      b: Double = 0.75): String = {
    val termList = terms.map(t => s"'$t'").mkString("(", ", ", ")")
    val termSum = terms.map(t =>
      s"coalesce(max(CASE WHEN tok = '$t' THEN s END), 0.0)")
      .mkString("\n    + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)),
       |                                              '\\s+')) AS tok
       |  FROM documents),
       |tf AS (
       |  SELECT doc_id, tok, count(*) AS tf FROM toks
       |  WHERE tok IN $termList GROUP BY 1, 2),
       |stats AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
       |         avg(CAST(len(regexp_split_to_array(trim(text), '\\s+'))
       |                  AS DOUBLE)) AS avgdl
       |  FROM documents),
       |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |dl AS (
       |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+'))
       |                      AS DOUBLE) AS dl
       |  FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.tok,
       |    round(ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)), 8)
       |    * ((tf.tf * ($k1 + 1.0))
       |       / (tf.tf + $k1 * (1.0 - $b + $b * dl.dl / stats.avgdl))) AS s
       |  FROM tf
       |  JOIN df USING (tok)
       |  JOIN dl USING (doc_id)
       |  CROSS JOIN stats)
       |SELECT doc_id,
       |  round($termSum, 5) AS score
       |FROM scored GROUP BY doc_id""".stripMargin
  }
}
