package graft

import graft.dedup.Dedup
import graft.similarity.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val docs = Tables.documents(spark, sfDir)
  lazy val emb = Tables.embeddings(spark, sfDir)

  test("minhash LSH candidates achieve high recall of true near-dups") {
    // ground truth: brute-force Jaccard >= 0.5 over all pairs (500 docs →
    // 125k pairs, fine at sf0.001)
    val ids = docs.select(col("doc_id"))
    val allPairs = ids.select(col("doc_id").as("a"))
      .crossJoin(ids.select(col("doc_id").as("b")))
      .filter(col("a") < col("b"))
    val truth = Dedup.jaccard(docs, allPairs, 3)
      .filter(col("jaccard") >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val cands = Dedup.lshCandidates(Dedup.minHashSignatures(docs, 64, 3), 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    if (truth.nonEmpty) {
      val recall = truth.count(cands.contains).toDouble / truth.size
      assert(recall >= 0.9, s"LSH recall $recall over ${truth.size} true pairs")
    }
    // candidate set should be far smaller than the cross product
    assert(cands.size < 125000 / 10)
  }

  test("lsh bucket cap drops degenerate buckets, keeps ordinary pairs") {
    import SparkTestSession.implicits._
    // 40 copies of one boilerplate doc (a degenerate bucket in every band)
    // plus one ordinary near-dup pair
    val boiler = (1L to 40L).map(i => (i, "the same boilerplate text " * 10))
    val pair = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"))
    val d = (boiler ++ pair).toDF("doc_id", "text")
    val sigs = Dedup.minHashSignatures(d, 64, 3)
    val uncapped = Dedup.lshCandidates(sigs, 64, 16,
        maxBucketSize = Int.MaxValue) // explicit escape hatch
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.lshCandidates(sigs, 64, 16, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the DEFAULT is capped (100 TB posture): verify it equals the
    // explicit-uncapped result whenever no bucket exceeds the default cap
    // (42 docs here, cap 1000 — the common non-degenerate case)
    val default = Dedup.lshCandidates(sigs, 64, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == uncapped)
    assert(uncapped.contains((100L, 101L)) && uncapped.size > 780)
    // cap kills the 40-doc cluster's ~780 pairs, keeps the ordinary pair
    assert(capped == Set((100L, 101L)))
    // no silent caps: the drop is surfaced through the cumulative metric
    // (delivered asynchronously on the listener bus — poll with a bound)
    val deadline = System.nanoTime() + 10e9.toLong
    while (Dedup.cappedRowsDropped.get() == 0 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(Dedup.cappedRowsDropped.get() > 0,
      "capBuckets dropped rows without reporting a metric")
  }

  test("simhash prefix cap: boilerplate cluster no longer quadratic") {
    import SparkTestSession.implicits._
    // 30 identical docs: identical signatures → identical prefixes → one
    // degenerate prefix bucket (would contribute ~435 pairs uncapped);
    // plus one ordinary near-identical pair that must survive the cap
    val boiler = (1L to 30L).map(i => (i, "common boilerplate header " * 8))
    val pair = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4 +
        "mu"))
    val d = (boiler ++ pair).toDF("doc_id", "text")
    val uncapped = Dedup.simHashPairs(d, 16, 16, maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((100L, 101L)) && uncapped.size > 400)
    val capped = Dedup.simHashPairs(d, 16, 16, maxBucketSize = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 30-doc bucket is dropped WHOLE; the ordinary pair survives
    assert(capped == Set((100L, 101L)))
    // default (auto) cap = 1000 on a tiny corpus: identical to uncapped
    val default = Dedup.simHashPairs(d, 16, 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(default == uncapped)
  }

  test("simhash rotations: multi-band recall ≥ 1-band, lift vs brute force") {
    import SparkTestSession.implicits._
    // seeded corpus of near-dup pairs: base doc + 3-token perturbation.
    // A perturbed pair's flipped signature bits land anywhere in the 62
    // bits, so the single top-16-bit band misses any pair with a flipped
    // high bit; each extra rotation re-keys on a different bit window.
    val rnd = new scala.util.Random(42)
    // high-entropy vocab: short "w1"-style tokens polyhash to SMALL longs
    // (high signature bits constantly 0 → every doc in one prefix bucket)
    val vocab = (0 until 500).map(_ =>
      rnd.alphanumeric.take(10 + rnd.nextInt(6)).mkString)
    val docs = (0 until 40).flatMap { i =>
      val base = Seq.fill(40)(vocab(rnd.nextInt(vocab.size)))
      val pert = base.updated(3, vocab(rnd.nextInt(vocab.size)))
        .updated(17, vocab(rnd.nextInt(vocab.size)))
        .updated(31, vocab(rnd.nextInt(vocab.size)))
      Seq((i * 2L, base.mkString(" ")), (i * 2L + 1, pert.mkString(" ")))
    }.toDF("doc_id", "text")
    val maxDist = 10
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: ALL pairs within maxDist (cross join — test-size only)
    val sig = Dedup.simHash(docs)
    val truth = pairSet(sig.select(col("doc_id").as("a"),
        col("simhash").as("sig_a"))
      .crossJoin(sig.select(col("doc_id").as("b"),
        col("simhash").as("sig_b")))
      .filter(col("a") < col("b"))
      .filter(Dedup.hamming(col("sig_a"), col("sig_b")) <= maxDist)
      .select("a", "b"))
    assert(truth.size > 10, s"seed produced only ${truth.size} true pairs")
    val one = pairSet(Dedup.simHashPairs(docs, maxDist).select("a", "b"))
    val four = pairSet(
      Dedup.simHashPairs(docs, maxDist, rotations = 4).select("a", "b"))
    // rotation 0 IS the plain prefix band → multi-band is a superset
    assert(one.subsetOf(four))
    // no false positives: bands only propose, hamming disposes
    assert(four.subsetOf(truth))
    val (rOne, rFour) =
      (one.size.toDouble / truth.size, four.size.toDouble / truth.size)
    info(f"recall: 1 band $rOne%.2f, 4 bands $rFour%.2f (${truth.size} true)")
    assert(rFour > rOne,
      s"expected recall lift: 1-band $rOne vs 4-band $rFour")
  }

  test("capCount: derived input derives the cap with zero jobs") {
    // a FILTERED frame must not re-execute its upstream plan for the cap
    val derived = docs.filter(col("doc_id") >= 0)
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_semi")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val n = Dedup.capCount(derived)
      Thread.sleep(1000) // listener-bus delivery grace before the zero check
      assert(jobs.get() == 0, s"capCount ran ${jobs.get()} jobs on a derived plan")
      assert(n > 0)
      // estimate only needs one significant digit: the auto cap it yields
      // must equal the exact corpus's (both under the 1e6 floor here)
      assert(Dedup.autoCapFor(n) == Dedup.autoCapFor(docs.count()))
    } finally spark.sparkContext.removeSparkListener(l)
    // scan-shaped input still gets the EXACT metadata count
    assert(Dedup.capCount(docs) == docs.count())
  }

  test("reliable-checkpoint knob: dedup + BFS results identical under it") {
    import graft.Checkpoints
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-").toString
    val base = Dedup.minHashDedup(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val g = graft.graph.PropertyGraph.eventChain(spark, sfDir)
    val srcs = g.nodes.select(col("id")).limit(20)
    val baseBfs = graft.graph.GraphOps.varLenExpand(srcs, g.edges, 1, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    spark.conf.set(Checkpoints.ReliableConf, "true")
    spark.conf.set(Checkpoints.DirConf, dir)
    try {
      val rel = Dedup.minHashDedup(docs, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rel == base)
      val relBfs = graft.graph.GraphOps.varLenExpand(srcs, g.edges, 1, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(relBfs == baseBfs)
      // the knob actually engaged: reliable checkpoint files were written
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala.count(java.nio.file.Files.isRegularFile(_))
      assert(files > 0, "reliable mode wrote no checkpoint files")
    } finally {
      spark.conf.unset(Checkpoints.ReliableConf)
      spark.conf.unset(Checkpoints.DirConf)
    }
  }

  test("reliable-checkpoint knob covers Cypher var-len through the session") {
    // a DEEP bound (*1..6 > the 4-hop lazy cutoff) takes the eager
    // per-hop cut path — under the knob those cuts must be RELIABLE
    // checkpoints (executor loss recomputes instead of killing the query)
    import graft.Checkpoints
    val sess = new graft.cypher.CypherSession(spark)
    sess.run("CREATE (:C {v: 0})" + (1 to 7).map(i =>
      s"-[:N]->(:C {v: $i})").mkString)
    val q = """MATCH (a {v: 0})-[*1..6]->(b) RETURN b.v AS v ORDER BY v"""
    val base = sess.rows(sess.run(q)).map(_("v"))
    assert(base == (1L to 6L))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-vl-")
    spark.conf.set(Checkpoints.ReliableConf, "true")
    spark.conf.set(Checkpoints.DirConf, dir.toString)
    try {
      assert(sess.rows(sess.run(q)).map(_("v")) == base)
      import scala.jdk.CollectionConverters._
      val files = java.nio.file.Files.walk(dir)
        .iterator().asScala.count(java.nio.file.Files.isRegularFile(_))
      assert(files > 0, "var-len under the knob wrote no checkpoint files")
    } finally {
      spark.conf.unset(Checkpoints.ReliableConf)
      spark.conf.unset(Checkpoints.DirConf)
    }
  }

  test("auto bucket cap: historical 1000 floor below 1e6 docs, sqrt beyond") {
    assert(Dedup.autoCapFor(0) == 1000)
    assert(Dedup.autoCapFor(999999) == 1000) // every test SF stays here —
    // the QUALIFY oracles' literal 1000 remains bit-identical
    assert(Dedup.autoCapFor(4000000) == 2000)
    assert(Dedup.autoCapFor(10000000000L) == 100000)
  }

  test("exact dedup keeps one doc per distinct text") {
    val kept = Dedup.exactDedup(docs)
    assert(kept.count() == docs.select(md5(col("text"))).distinct().count())
  }

  test("simhash: identical docs get identical signatures, hamming 0") {
    val dup = docs.limit(3)
      .union(docs.limit(3)) // duplicate rows, same text
    val sig = Dedup.simHash(dup.withColumn("doc_id",
      monotonically_increasing_id()))
    // 6 rows, 3 distinct texts → at most 3 distinct signatures
    assert(sig.select("simhash").distinct().count() <= 3)
  }

  test("brute-force knn: rank 1 is the most similar, sims within [-1,1]") {
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), 3)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.000001))
    val byQuery = rows.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      val sims = sorted.map(_.getDouble(2)).toSeq
      assert(sims.zip(sims.drop(1)).forall { case (x, y) => x >= y })
    }
  }

  test("embedding near-dup: LSH candidates recall vs exact pairs") {
    // high-cosine pairs are exactly where random-hyperplane LSH is strong
    val exact = Dedup.embeddingNearDupsExact(emb, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingNearDups(emb, 0.5, 4, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // verify step guarantees precision 1.0
    if (exact.nonEmpty) {
      val recall = exact.count(lsh.contains).toDouble / exact.size
      assert(recall >= 0.7, s"embed near-dup recall $recall of ${exact.size}")
    }
  }

  test("ann lsh topk recall vs brute force") {
    val bf = Similarity.bruteForceTopK(emb, emb, 3)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(emb, 3, 4, 8)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-uniform synthetic vectors are the LSH worst case: per-bit
    // collision p≈0.6 → predicted recall 1-(1-p^4)^8 ≈ 0.7. bits/tables is
    // the recall/cost knob; exact path stays available via bruteForceTopK.
    val recall = bf.count(ann.contains).toDouble / bf.size
    assert(recall >= 0.5, s"ANN top-1 recall $recall")
  }

  test("ann ivf topk recall vs brute force") {
    val queries = emb.filter(col("vec_id") < 50)
    val bf = Similarity.bruteForceTopK(emb, queries, 3)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, queries, 3, 8, 4)
      .filter(col("rank") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing half the cells (4/8) bounds the miss rate; near-uniform
    // vectors are again the worst case for any space partitioner
    val recall = bf.count(ivf.contains).toDouble / bf.size
    assert(recall >= 0.5, s"IVF top-1 recall $recall")
  }

  test("frame sampling: chunk math matches payload length") {
    val frames = graft.multimodal.Multimodal.sampleFrames(
      graft.multimodal.Multimodal.mediaFromDocs(docs), 256, 4)
    val joined = frames.groupBy("doc_id")
      .agg(count(lit(1)).as("n_frames"), max("frame_idx").as("max_idx"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .collect()
    joined.foreach { r =>
      val (n, len) = (r.getLong(1), r.getInt(3))
      val chunks = math.max((len + 255) / 256, 1)
      assert(n == (chunks - 1) / 4 + 1, s"doc ${r.getLong(0)}")
    }
  }
}
