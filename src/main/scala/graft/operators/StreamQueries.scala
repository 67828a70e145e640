package graft.operators

import graft.{QueryDef, Tables}
import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Streaming-shaped (batch-checkable) and multimodal capabilities. The
  * windowed/sessionize transforms are the exact functions the streaming path
  * runs (StreamingSpec drives them through readStream/writeStream); here they
  * execute in batch so DuckDB can oracle them.
  */
object StreamQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q_stream_window",
      """SELECT epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS win_start_ms,
        |       event_type, count(*) AS n_events,
        |       round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      StreamOps.windowedCounts(Tables.events(s, dir))
    },

    QueryDef(
      "q_asof_join",
      // DuckDB's native ASOF JOIN is the oracle for our union+window as-of
      // (AsOfJoin.leftAsOf): each event picks the user's most recent
      // purchase at-or-before its timestamp.
      """WITH pur AS (
        |  SELECT user_id, ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id,
        |  round(p.purchase_value, 5) AS last_purchase_value
        |FROM events e ASOF LEFT JOIN pur p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts""".stripMargin) {
      (s, dir) =>
      val ev = Tables.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts").agg(max("value").as("purchase_value"))
      AsOfJoin.leftAsOf(ev.select("event_id", "user_id", "ts"),
          purchases, "user_id", "ts", Seq("purchase_value"))
        .select(col("event_id"), col("user_id"),
          round(col("asof_purchase_value"), 5).as("last_purchase_value"))
    },

    QueryDef(
      "q_range_join",
      // Interval correlation: per click event, how many of the same user's
      // error events fall within ±5 minutes. Oracle: direct inequality
      // join (fine at oracle scale); engine side: RangeJoin.bandJoin's
      // bucketed equi-join (scale path).
      """SELECT c.event_id, c.user_id, count(e.ts) AS n_nearby_errors
        |FROM events c LEFT JOIN events e
        |  ON e.user_id = c.user_id AND e.event_type = 'error'
        | AND e.ts BETWEEN c.ts - INTERVAL 5 MINUTE
        |               AND c.ts + INTERVAL 5 MINUTE
        |WHERE c.event_type = 'click'
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val errors = ev.filter(col("event_type") === "error")
        .select("user_id", "ts")
      val fiveMinNanos = 5L * 60 * 1000 * 1000 * 1000 // ts is TIMESTAMP(NANOS)
      RangeJoin.bandJoin(clicks, errors, "user_id", "ts", fiveMinNanos)
        .groupBy("event_id", "user_id")
        .agg(count(col("range_ts")).as("n_nearby_errors"))
    },

    QueryDef(
      "q_stream_join",
      // Stream-stream interval join (batch-run here for the oracle; the
      // streaming path with two-sided watermark state is StreamingSpec's
      // batch≡stream check): click × same-user errors within ±5 min.
      """SELECT c.event_id, c.user_id, epoch_ms(e.ts) AS right_ts_ms
        |FROM events c JOIN events e
        |  ON e.user_id = c.user_id AND e.event_type = 'error'
        | AND e.ts BETWEEN c.ts - INTERVAL 5 MINUTE
        |               AND c.ts + INTERVAL 5 MINUTE
        |WHERE c.event_type = 'click'""".stripMargin) { (s, dir) =>
      val ev = Tables.events(s, dir)
      StreamOps.intervalJoin(
        ev.filter(col("event_type") === "click")
          .select("event_id", "user_id", "ts"),
        ev.filter(col("event_type") === "error").select("user_id", "ts"),
        "user_id", 5)
    },

    QueryDef(
      "q_sessionize",
      """SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq
        |FROM (
        |  SELECT event_id, user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |    FROM events))""".stripMargin) { (s, dir) =>
      // gap-based sessionization (streaming analogue:
      // flatMapGroupsWithState; batch window form is the oracle for both).
      StreamOps.sessionize(Tables.events(s, dir), 30)
    },

    QueryDef(
      "q_sessionize_stateful",
      """SELECT event_id, user_id, CAST(session_seq AS BIGINT) AS session_seq
        |FROM (
        |  SELECT event_id, user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
        |  FROM (
        |    SELECT event_id, user_id, ts,
        |      CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |                              ORDER BY ts, event_id) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id)
        |              > INTERVAL 30 MINUTE
        |      THEN 1 ELSE 0 END AS new_session
        |    FROM events))""".stripMargin) { (s, dir) =>
      // flatMapGroupsWithState custom-state path, oracled by the same SQL
      // as the window form — batch and streaming run the identical function
      StreamOps.sessionizeStateful(Tables.events(s, dir), 30)
    },

    QueryDef(
      "q_multimodal_bytes",
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes
        |FROM documents""".stripMargin) { (s, dir) =>
      // binary-column plumbing: payload byte length survives the
      // cast→binary→mapPartitions round trip.
      Multimodal.byteStats(
          Multimodal.mediaFromDocs(Tables.documents(s, dir)))
        .toDF().select(col("doc_id"), col("n_bytes"))
    },

    QueryDef(
      "q_multimodal_frames",
      """SELECT doc_id, CAST(k * 4 AS INT) AS frame_idx,
        |  CAST(least(256, octet_length(encode(text)) - k * 4 * 256) AS INT)
        |    AS n_bytes
        |FROM documents,
        |  unnest(generate_series(0, greatest(
        |    CAST(ceil(octet_length(encode(text)) / 256.0) AS INT) - 1, 0) // 4))
        |  AS t(k)""".stripMargin) { (s, dir) =>
      // frame sampling: payload as 256-byte chunks, every 4th emitted —
      // 1 row in → many frame rows out (the video-decode plumbing shape)
      Multimodal.sampleFrames(
          Multimodal.mediaFromDocs(Tables.documents(s, dir)), 256, 4)
        .select(col("doc_id"), col("frame_idx"), col("n_bytes"))
    },

    QueryDef(
      "q_multimodal_decode",
      // REAL codec round trip: deterministic grayscale PNGs are generated
      // per doc_id (ImageIO encode), then decoded back (ImageIO decode)
      // and reduced to dims + channel count + pixel sum + 16-bin pixel
      // histogram. Every output is a closed-form function of doc_id
      // (pixel (x,y) = (x + y·w + id) mod 256), so the oracle replays the
      // whole pipeline arithmetically — a value-exact gate over a real
      // PNG encoder AND decoder. (Encoded n_bytes is codec-internal and
      // deliberately not part of the gated projection.)
      """WITH d AS (
        |  SELECT doc_id,
        |    4 + doc_id % 29 AS w, 3 + (doc_id * 7) % 23 AS h
        |  FROM documents
        |), px AS (
        |  -- row-major pixel i has x + y·w = i, so pixel value
        |  -- (x + y·w + id) mod 256 = (i + id) mod 256
        |  SELECT doc_id, w, h,
        |    unnest([ (i + doc_id) % 256
        |             for i in generate_series(0, w * h - 1) ]) AS v
        |  FROM d
        |)
        |SELECT doc_id,
        |  CAST(any_value(w) AS INT) AS width,
        |  CAST(any_value(h) AS INT) AS height,
        |  CAST(1 AS INT) AS channels,
        |  CAST(sum(v) AS BIGINT) AS px_sum,
        |  array_to_string([
        |    count(*) FILTER (WHERE v // 16 = 0),
        |    count(*) FILTER (WHERE v // 16 = 1),
        |    count(*) FILTER (WHERE v // 16 = 2),
        |    count(*) FILTER (WHERE v // 16 = 3),
        |    count(*) FILTER (WHERE v // 16 = 4),
        |    count(*) FILTER (WHERE v // 16 = 5),
        |    count(*) FILTER (WHERE v // 16 = 6),
        |    count(*) FILTER (WHERE v // 16 = 7),
        |    count(*) FILTER (WHERE v // 16 = 8),
        |    count(*) FILTER (WHERE v // 16 = 9),
        |    count(*) FILTER (WHERE v // 16 = 10),
        |    count(*) FILTER (WHERE v // 16 = 11),
        |    count(*) FILTER (WHERE v // 16 = 12),
        |    count(*) FILTER (WHERE v // 16 = 13),
        |    count(*) FILTER (WHERE v // 16 = 14),
        |    count(*) FILTER (WHERE v // 16 = 15)
        |  ], ',') AS histogram
        |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      // histogram serialized to a string cell (the driver's pandas reader
      // can't hash array cells)
      Multimodal.decodeFeatures(
          Multimodal.pngMediaFromDocs(Tables.documents(s, dir))).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("channels"),
          col("px_sum"), array_join(col("histogram"), ",").as("histogram"))
    },

    QueryDef(
      "q_multimodal_resize",
      // decode → nearest-neighbour resample to 8×6 → PNG re-encode →
      // decode again. NN rule is exact integer arithmetic
      // (sx = x·w/8, sy = y·h/6, floor division), so the oracle replays
      // the resampled pixels from doc_id alone — the re-encoded PNG is
      // verified value-exactly through the second decode.
      """WITH d AS (
        |  SELECT doc_id,
        |    4 + doc_id % 29 AS w, 3 + (doc_id * 7) % 23 AS h
        |  FROM documents
        |), px AS (
        |  -- output pixel j (row-major over 8×6): x = j % 8, y = j // 8
        |  SELECT doc_id,
        |    unnest([ (((j % 8) * w // 8) + ((j // 8) * h // 6) * w + doc_id)
        |               % 256
        |             for j in generate_series(0, 47) ]) AS v
        |  FROM d
        |)
        |SELECT doc_id,
        |  CAST(8 AS INT) AS width,
        |  CAST(6 AS INT) AS height,
        |  CAST(sum(v) AS BIGINT) AS px_sum
        |FROM px GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Multimodal.decodeFeatures(
          Multimodal.resizeNN(
            Multimodal.pngMediaFromDocs(Tables.documents(s, dir)), 8, 6))
        .toDF()
        .select(col("doc_id"), col("width"), col("height"), col("px_sum"))
    })
}
