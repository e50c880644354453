package graft.streaming

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sql.Declared

/** Batch-mode declared queries for the windowed operators — the same
  * plan builders the streaming path uses ([[Windows]]), verified against
  * DuckDB (session windows via the classic gaps-and-islands rewrite).
  */
object WindowQueries {
  /** 15-minute tumbling windows over events. Oracle mirrors Spark's
    * window() bucketing with epoch arithmetic (origin 1970-01-01). */
  private val tumbling = Declared(
    "events_window_tumbling",
    (s, d) => Windows.tumbling(Tables(s, d, "events"), width = "15 minutes")
      .orderBy("w_start", "event_type"),
    Some("""SELECT CAST(to_timestamp(floor(epoch(ts) / 900) * 900)
           |         AS TIMESTAMP) AS w_start,
           |       CAST(to_timestamp(floor(epoch(ts) / 900) * 900 + 900)
           |         AS TIMESTAMP) AS w_end,
           |       event_type, count(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
           |         AS sum_value
           |FROM events GROUP BY 1, 2, 3
           |ORDER BY w_start, event_type""".stripMargin))

  /** 10-minute-gap session windows per user. Oracle: gaps-and-islands —
    * a session breaks where the gap to the previous event is ≥ the gap
    * duration (strict `<` merge, matching session_window's half-open
    * [start, last+gap) semantics); window end = last event + gap. */
  private val sessions = Declared(
    "events_session_window",
    (s, d) => Windows.sessions(Tables(s, d, "events"), gap = "10 minutes")
      .orderBy("user_id", "w_start"),
    Some("""WITH o AS (
           |  SELECT user_id, ts, value, event_id,
           |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
           |                                      ORDER BY ts, event_id)
           |                   < INTERVAL 10 MINUTE
           |              THEN 0 ELSE 1 END AS brk
           |  FROM events),
           |g AS (
           |  SELECT *, sum(brk) OVER (PARTITION BY user_id
           |                           ORDER BY ts, event_id
           |                           ROWS UNBOUNDED PRECEDING) AS grp
           |  FROM o)
           |SELECT min(ts) AS w_start,
           |       max(ts) + INTERVAL 10 MINUTE AS w_end,
           |       user_id, count(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
           |         AS sum_value
           |FROM g GROUP BY user_id, grp
           |ORDER BY user_id, w_start""".stripMargin))

  /** Interval attribution join, batch mode: each purchase matched to the
    * same user's views in the preceding 2 hours ([[StreamJoins]] — the
    * identical builder runs stream-stream with watermarked state). */
  private val attribution = Declared(
    "j_stream_attrib",
    (s, d) => {
      val ev = Tables(s, d, "events")
      StreamJoins.attribution(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "purchase"),
        horizon = "2 hours")
        .orderBy("user_id", "purchase_id", "view_id")
    },
    Some("""SELECT a.user_id AS user_id, a.event_id AS purchase_id,
           |       a.ts AS purchase_ts, b.event_id AS view_id,
           |       b.ts AS view_ts
           |FROM events a JOIN events b
           |  ON a.user_id = b.user_id
           | AND a.event_type = 'purchase' AND b.event_type = 'view'
           | AND b.ts BETWEEN a.ts - INTERVAL 2 HOUR AND a.ts
           |ORDER BY user_id, purchase_id, view_id""".stripMargin))

  /** Stream-static enrichment, batch mode: every event decorated with
    * its user's dimension attributes ([[StreamJoins.enrich]] — the
    * identical builder runs stream-static with a per-batch broadcast
    * of the dim and zero join state). */
  private val enrichment = Declared(
    "j_stream_enrich",
    (s, d) => StreamJoins.enrich(
      Tables(s, d, "events"), Tables(s, d, "customer"))
      .orderBy("event_id"),
    Some("""SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
           |       c.c_mktsegment AS segment, c.c_nationkey AS nationkey
           |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
           |ORDER BY event_id""".stripMargin))

  val all: Seq[Declared] = Seq(tumbling, sessions, attribution, enrichment)
}
