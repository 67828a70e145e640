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
      Multimodal.extractFeatures(
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
      // the decode stub is a pure byte-hash (java.util.Arrays.hashCode over
      // the UTF-8 payload): the oracle replays the exact 32-bit wraparound
      // fold + truncating division in DuckDB (hex → signed-byte list →
      // list_reduce), so even the stubbed dims get a hash gate
      """WITH raw AS (
        |  SELECT doc_id, hex(encode(text)) AS hx FROM documents
        |), b AS (
        |  SELECT doc_id,
        |    [ (strpos('0123456789ABCDEF', hx[2*i-1])-1)*16 +
        |      (strpos('0123456789ABCDEF', hx[2*i])-1)
        |      for i in generate_series(1, length(hx)//2) ] AS bytes
        |  FROM raw
        |), h AS (
        |  SELECT doc_id, bytes,
        |    list_reduce(list_prepend(CAST(1 AS BIGINT), bytes),
        |      (acc, x) -> ((acc * 31 +
        |          CASE WHEN x >= 128 THEN x - 256 ELSE x END
        |          + 2147483648) % 4294967296 + 4294967296) % 4294967296
        |        - 2147483648
        |    ) AS hh
        |  FROM b
        |)
        |SELECT doc_id,
        |  CAST(abs(hh % 640) + 1 AS INT) AS width,
        |  CAST(abs(CAST(trunc(hh / 640.0) AS BIGINT) % 480) + 1 AS INT)
        |    AS height,
        |  CAST(len(bytes) AS INT) AS n_bytes,
        |  array_to_string([ CAST(len(list_filter(bytes, x -> x // 16 = k))
        |    AS BIGINT) for k in generate_series(0, 15) ], ',') AS histogram
        |FROM h""".stripMargin) { (s, dir) =>
      // full feature extraction incl. stubbed decode (deterministic fake
      // dims) + 16-bin byte histogram; histogram serialized to a string
      // cell (the driver's pandas reader can't hash array cells)
      Multimodal.extractFeatures(
          Multimodal.mediaFromDocs(Tables.documents(s, dir))).toDF()
        .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
          array_join(col("histogram"), ",").as("histogram"))
    })
}
