package graft

import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming windowedCounts equals the batch result") {
    val batch = StreamOps.windowedCounts(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    val streamed = StreamOps.runStreamOnce(spark, sfDir,
        StreamOps.windowedCounts, "win_sink")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("sessionize: session_seq starts at 1 and is monotonic per user") {
    val s = StreamOps.sessionize(Tables.events(spark, sfDir), 30)
    assert(s.agg(min("session_seq")).head().getLong(0) == 1L)
    val perUser = s.groupBy("user_id").agg(
      max("session_seq").as("mx"),
      countDistinct("session_seq").as("nd"))
    // sessions are numbered 1..max contiguously
    assert(perUser.filter(col("mx") =!= col("nd")).isEmpty)
  }

  test("streaming graph ingest: events become a queryable session graph") {
    val sess = new graft.cypher.CypherSession(spark)
    StreamOps.graphIngest(spark, sfDir, sess)
    val nEvents = Tables.events(spark, sfDir).count()
    val nNodes = sess.graph.nodes.count()
    assert(nNodes == nEvents)
    // Cypher over the ingested graph: NEXT chains exist and traverse
    val r = sess.rows(sess.run(
      "MATCH (a)-[:NEXT]->(b) RETURN count(*) AS c")).head("c")
      .asInstanceOf[Long]
    assert(r > 0 && r < nEvents)
  }

  test("stateful sessionization (flatMapGroupsWithState) equals window form") {
    val windowed = StreamOps.sessionize(Tables.events(spark, sfDir), 30)
      .collect().map(_.toSeq).toSet
    val stateful = StreamOps.sessionizeStateful(Tables.events(spark, sfDir), 30)
      .collect().map(_.toSeq).toSet
    assert(stateful == windowed)
    assert(stateful.nonEmpty)
  }

  test("streaming dedup: one doc per distinct text through the stream") {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(docSchema)
      .option("pathGlobFilter", "documents.parquet").parquet(sfDir)
      .withColumn("event_ts", to_timestamp(lit("2026-01-01 00:00:00")))
    val q = StreamOps.streamingDedup(stream).writeStream
      .outputMode("append").format("memory").queryName("dedup_sink").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_sink")
    val expected = Tables.documents(spark, sfDir)
      .select(md5(col("text"))).distinct().count()
    assert(streamed.count() == expected)
    assert(streamed.select("text").distinct().count() == expected)
  }

  test("stream-stream interval join equals the batch join") {
    def joinIt(ev: org.apache.spark.sql.DataFrame) =
      StreamOps.intervalJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "error").select("user_id", "ts"),
        "user_id", 5)
    val batch = joinIt(Tables.events(spark, sfDir))
      .collect().map(_.toSeq).toSet
    val streamed = StreamOps.runStreamOnce(spark, sfDir, joinIt,
        "ssj_sink", outputMode = "append")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("incremental minhash dedup over batches finds the same pairs as batch mode") {
    val docs = Tables.documents(spark, sfDir)
    val batchPairs = graft.dedup.Dedup.minHashDedup(docs, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = new StreamOps.IncrementalDedup(0.5)
    (0 to 2).foreach { i =>
      inc.ingest(docs.filter(col("doc_id") % 3 === i))
    }
    val incPairs = inc.nearDups.map(p => (p._1, p._2)).toSet
    assert(incPairs == batchPairs)
    assert(batchPairs.nonEmpty)
  }

  test("incremental dedup bucket cap: degenerate buckets stop pairing, " +
    "ordinary pairs survive") {
    import SparkTestSession.implicits._
    // 30 boilerplate copies (one degenerate bucket per band) + one
    // ordinary near-dup pair, split across 3 batches
    val boiler = (1L to 30L).map(i => (i, "the same boilerplate text " * 10))
    val pair = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "alpha beta gamma delta epsilon zeta eta theta iota kappa mu"))
    val d = (boiler ++ pair).toDF("doc_id", "text")
    val inc = new StreamOps.IncrementalDedup(0.3, maxBucketSize = 8)
    (0 to 2).foreach(i => inc.ingest(d.filter(col("doc_id") % 3 === i)))
    val pairs = inc.nearDups.map(p => (p._1, p._2)).toSet
    // the ordinary pair verifies; the boilerplate cluster is capped well
    // below its 435 all-pairs (the monotone guard admits only the pairs
    // formed while its buckets were still under the cap)
    assert(pairs.contains((100L, 101L)))
    val boilerPairs = pairs.count { case (a, b) => a <= 30 && b <= 30 }
    assert(boilerPairs < 60, s"cap did not bound boilerplate pairs: $boilerPairs")
  }

  test("multimodal byte stats: histogram sums to n_bytes, deterministic") {
    val feats = Multimodal.byteStats(
      Multimodal.mediaFromDocs(Tables.documents(spark, sfDir)))
    val df = feats.toDF()
      .withColumn("hist_sum", aggregate(col("histogram"), lit(0L), _ + _))
    assert(df.filter(col("hist_sum") =!= col("n_bytes")).isEmpty)
    // determinism: re-running yields identical rows
    val again = Multimodal.byteStats(
      Multimodal.mediaFromDocs(Tables.documents(spark, sfDir)))
    assert(feats.toDF().exceptAll(again.toDF()).isEmpty)
  }

  test("multimodal real codec: PNG round trip is value-exact, JPEG decodes") {
    // PNG: encode → decode must reproduce every synthetic pixel exactly
    val media = Multimodal.pngMediaFromDocs(Tables.documents(spark, sfDir))
    val feats = Multimodal.decodeFeatures(media).toDF()
    import org.apache.spark.sql.Row
    feats.collect().foreach { case Row(id: Long, w: Int, h: Int,
        ch: Int, nb: Int, pxSum: Long, hist: scala.collection.Seq[_]) =>
      val (ew, eh) = Multimodal.synthDims(id)
      assert((w, h, ch) == (ew, eh, 1), s"doc $id dims")
      assert(nb > 8, s"doc $id PNG payload implausibly small")
      val expSum = (0 until ew * eh).map(i => (i + id) % 256).sum
      assert(pxSum == expSum, s"doc $id pixel sum")
      assert(hist.asInstanceOf[scala.collection.Seq[Long]].sum
        == ew.toLong * eh, s"doc $id histogram mass")
    }
    // histogram bin mass checked via hist.sum above; exact bin contents
    // are gated by the q_multimodal_decode oracle
    // JPEG: lossy, but ImageIO must sniff + decode it — dims survive
    val img = Multimodal.decodeImage(Multimodal.synthPng(7L))
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jb)
    val back = Multimodal.decodeImage(jb.toByteArray)
    assert(back.getWidth == img.getWidth && back.getHeight == img.getHeight)
    // undecodable payloads fail loudly, not silently
    intercept[IllegalArgumentException] {
      Multimodal.decodeImage("not an image".getBytes)
    }
  }

  test("multimodal resizeNN: re-encoded PNG decodes to the NN resample") {
    val media = Multimodal.pngMediaFromDocs(
      Tables.documents(spark, sfDir).limit(50))
    val out = Multimodal.decodeFeatures(
      Multimodal.resizeNN(media, 8, 6)).toDF()
    import org.apache.spark.sql.Row
    out.select("doc_id", "width", "height", "px_sum").collect().foreach {
      case Row(id: Long, w: Int, h: Int, pxSum: Long) =>
        assert((w, h) == (8, 6))
        val (sw, sh) = Multimodal.synthDims(id)
        val exp = (for { y <- 0 until 6; x <- 0 until 8 } yield {
          val sx = x * sw / 8; val sy = y * sh / 6
          (sx + sy.toLong * sw + id) % 256
        }).sum
        assert(pxSum == exp, s"doc $id resample sum")
    }
  }
}
