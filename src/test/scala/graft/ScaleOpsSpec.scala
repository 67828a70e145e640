package graft

import graft.dedup.Dedup
import graft.operators.Skew
import graft.sampling.Sampling
import graft.text.Ranking
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew rewrites, deterministic sampling/splits, BM25 ranking, near-dup
  * clustering — the round-3 scale/pipeline additions.
  */
class ScaleOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("graft_shingle_hashes ≡ the composed transform/concat_ws/polyhash " +
      "pipeline (incl. edge cases)") {
    import SparkTestSession.implicits._
    graft.plans.GraftExtensions.ensureFunctions(spark)
    // real corpus + adversarial shapes: empty, whitespace-only, leading
    // non-space whitespace (trim keeps it; the split yields a leading empty
    // token), fewer tokens than k, exactly k, non-ASCII (ICU lowercase),
    // repeated whitespace runs, and a null
    val edge = Seq(
      (9000001L, ""), (9000002L, "   "), (9000003L, "\t leading tab"),
      (9000004L, "one"), (9000005L, "two words"),
      (9000006L, "exactly three tokens"),
      (9000007L, "ÅÄÖ Straße ΣΊΣΥΦΟΣ İstanbul"),
      (9000008L, "a  b\t\tc\n\nd   e"), (9000009L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).unionByName(edge)
    for (k <- Seq(1, 3, 5)) {
      val toks = graft.text.TextOps.tokens(col("text"))
      val grams = transform(
        sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(k))))
      val legacy = corpus.select(col("doc_id"), explode(grams).as("g"))
        .select(col("doc_id"),
          call_function("graft_polyhash", col("g")).as("sh"))
      val native = corpus.select(col("doc_id"), explode(
        call_function("graft_shingle_hashes", col("text"), lit(k))).as("sh"))
      // multiset equality (repeats matter for the min-fold consumers)
      assert(native.exceptAll(legacy).isEmpty &&
        legacy.exceptAll(native).isEmpty, s"k=$k diverged")
    }
  }

  test("salted join is result-identical to the plain join under a hot key") {
    import SparkTestSession.implicits._
    // 'hot' carries 90% of the fact rows — the shape salting exists for
    val fact = ((1 to 900).map(i => (i.toLong, "hot")) ++
      (901 to 1000).map(i => (i.toLong, s"k${i % 7}"))).toDF("row_id", "key")
    val dim = fact.groupBy("key").agg(count(lit(1)).as("total"))
    val salted = Skew.saltedJoin(fact, dim, "key", 8)
      .select("row_id", "key", "total")
    val plain = fact.join(dim, "key").select("row_id", "key", "total")
    assert(salted.count() === 1000)
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("two-phase count distinct matches countDistinct") {
    import SparkTestSession.implicits._
    val df = (1 to 500).map(i => (s"g${i % 3}", (i % 40).toLong))
      .toDF("key", "value")
    val two = Skew.twoPhaseCountDistinct(df, "key", "value")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ref = df.groupBy("key").agg(countDistinct("value").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(two === ref)
  }

  test("hash split: duplicates co-assigned, stable under repartition, ~80/10/10") {
    val docs = Tables.documents(spark, sfDir)
    val assign = docs.select(col("doc_id"), col("text"),
      Sampling.hashBucket(col("text")).as("bucket"),
      Sampling.split(Sampling.hashBucket(col("text")), 80, 10).as("split"))
    // identical content ⇒ identical split (no leakage across splits)
    val leaks = assign.groupBy("text")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(leaks === 0)
    // partitioning must not change assignment
    val a = assign.select("doc_id", "split")
    val b = docs.repartition(13).select(col("doc_id"),
      Sampling.split(Sampling.hashBucket(col("text")), 80, 10).as("split"))
    assert(a.exceptAll(b).isEmpty)
    // proportions roughly 80/10/10 (content-hash uniformity)
    val n = assign.count().toDouble
    val train = assign.filter(col("split") === "train").count() / n
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
  }

  test("bm25: more matching terms => higher score; non-matching docs absent") {
    import SparkTestSession.implicits._
    val docs = Seq(
      (1L, "spark merge filter spark"), // all three terms, spark twice
      (2L, "spark something else here"), // one term
      (3L, "nothing relevant at all")   // no terms
    ).toDF("doc_id", "text")
    val scores = Ranking.bm25(docs, Seq("spark", "merge", "filter"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!scores.contains(3L))
    assert(scores(1L) > scores(2L) && scores(2L) > 0.0)
  }

  test("approx sketches stay within error bounds of exact aggregates") {
    // the queries gate the error bound themselves (oracle-checkable _ok
    // flags; the sketch values are engine-specific) — assert every flag
    val approxD = SparkEntry.queries("q_approx_distinct")(spark, sfDir)
      .collect()
    assert(approxD.nonEmpty)
    approxD.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("parts_ok")), s"HLL parts: $r")
      assert(r.getBoolean(r.fieldIndex("supps_ok")), s"HLL supps: $r")
    }
    val approxQ = SparkEntry.queries("q_approx_quantile")(spark, sfDir)
      .collect()
    assert(approxQ.nonEmpty)
    approxQ.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("p50_ok")), s"GK p50: $r")
      assert(r.getBoolean(r.fieldIndex("p99_ok")), s"GK p99: $r")
    }
  }

  test("near-dup clusters: transitive chain collapses to one canonical id") {
    import SparkTestSession.implicits._
    // A≈B, B≈C by shingle overlap (A vs C weaker) — cluster {10,11,12},
    // plus an unrelated doc that must not appear
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (10L, base),
      (11L, base + " phi"),
      (12L, base + " phi chi psi"),
      (99L, "completely different words nowhere near the others at all ok")
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(docs, 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.keySet === Set(10L, 11L, 12L))
    assert(clusters.values.toSet === Set(10L))
  }
}
