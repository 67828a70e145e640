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
    val spark = docs.sparkSession

    // token stream, restricted to query terms immediately (predicate on the
    // exploded value — the scan never materializes non-query tokens past
    // the filter). The doc length rides along on each surviving token row:
    // it is constant per doc, so folding it in here removes the separate
    // per-doc-length scan of the corpus AND the tf⋈dl join the previous
    // shape paid (guide §2.4 — one fewer pass, one fewer join; the few
    // extra bytes per matching-token row are trivial next to either).
    // TWO selects deliberately: dl must be computed BELOW the explode.
    // Folding both into one select leaves ExtractGenerator's projection
    // (and dl's `text` dependency) above the Generate, which carries the
    // full text string through every exploded token row — measured 2×
    // on the whole query.
    val base = docs.select(col("doc_id"),
      TextOps.tokenCount(col("text")).cast("double").as("dl"),
      TextOps.tokens(col("text")).as("__toks"))
    val toks = base
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))

    // per-(doc, term) frequency — one shuffle on doc_id (narrow: only
    // matching docs survive); dl is constant per doc, max() just carries it
    val tf = toks.groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))

    // corpus stats: N docs + average doc length (single tiny aggregate —
    // needs ALL docs, not just matching ones, so it keeps its own scan)
    val stats = docs.agg(
      count(lit(1)).cast("double").as("n_docs"),
      avg(TextOps.tokenCount(col("text")).cast("double")).as("avgdl"))

    // per-term document frequency as a WINDOW over tf (≡ the old separate
    // groupBy("tok") + broadcast join): tf is tiny (≤ |matching docs| ·
    // |terms| rows), so one extra exchange of it costs ~nothing, while the
    // previous shape re-planned — and re-executed — the whole corpus
    // tokenize→explode→aggregate subtree a second time just to count docs
    // per term (materializing tf instead was measured WORSE cold at sf0.1:
    // the extra synchronous checkpoint job outweighed the saved pass)
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy("tok")
    val withDf = tf.withColumn("df",
      count(lit(1)).over(wTok).cast("double"))

    val idf = round(
      log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)),
      8)
    val w = (col("tf") * (k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val scored = withDf
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("tok"), (idf * w).as("s"))

    // combine per-term partials in FIXED term order (float addition is not
    // associative; an unordered sum() could differ from the oracle's)
    val termCols = terms.map(t =>
      coalesce(max(when(col("tok") === t, col("s"))), lit(0.0)))
    scored.groupBy("doc_id")
      .agg(round(termCols.reduce(_ + _), 5).as("score"))
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
