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

  /** 15-minute windows sliding every 5 — each event lands in exactly
    * width/slide = 3 overlapping windows. Oracle: explicit 3-way unnest
    * over the slide-aligned starts (Spark's window() epoch-origin
    * alignment spelled out). */
  private val sliding = Declared(
    "events_window_sliding",
    (s, d) => Windows.sliding(Tables(s, d, "events"),
        width = "15 minutes", slide = "5 minutes")
      .orderBy("w_start", "event_type"),
    Some("""SELECT CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - k * 300)
           |         AS TIMESTAMP) AS w_start,
           |       CAST(to_timestamp(floor(epoch(ts) / 300) * 300 - k * 300
           |                         + 900) AS TIMESTAMP) AS w_end,
           |       event_type, count(*) AS n,
           |       CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE)
           |         AS sum_value
           |FROM events, unnest(range(0, 3)) AS t(k)
           |GROUP BY 1, 2, 3
           |ORDER BY w_start, event_type""".stripMargin))

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

  /** Conversion funnel, batch mode ([[Funnel.completions]] — the
    * identical semantics run streaming through `transformWithState`,
    * spec-pinned equal). Oracle: the same greedy two-stage-min chain
    * per step, every "first" tie-broken on event_id. */
  private val funnel = Declared(
    "j_funnel_vcp",
    (s, d) => Funnel.completions(Tables(s, d, "events")),
    Some(s"""WITH v1 AS (
            |  SELECT user_id, min(ts) AS vt FROM events
            |  WHERE event_type = 'view' GROUP BY 1),
            |v2 AS (
            |  SELECT e.user_id, v1.vt, min(e.event_id) AS vid
            |  FROM events e JOIN v1
            |    ON e.user_id = v1.user_id AND e.ts = v1.vt
            |  WHERE e.event_type = 'view' GROUP BY 1, 2),
            |c1 AS (
            |  SELECT e.user_id, min(e.ts) AS ct
            |  FROM events e JOIN v2 ON e.user_id = v2.user_id
            |  WHERE e.event_type = 'click'
            |    AND (e.ts > v2.vt OR (e.ts = v2.vt AND e.event_id > v2.vid))
            |    AND epoch_us(e.ts) - epoch_us(v2.vt) <= ${Funnel.GapUs}
            |  GROUP BY 1),
            |c2 AS (
            |  SELECT e.user_id, c1.ct, min(e.event_id) AS cid
            |  FROM events e
            |  JOIN c1 ON e.user_id = c1.user_id AND e.ts = c1.ct
            |  JOIN v2 ON v2.user_id = e.user_id
            |  WHERE e.event_type = 'click'
            |    AND (e.ts > v2.vt OR (e.ts = v2.vt AND e.event_id > v2.vid))
            |  GROUP BY 1, 2),
            |p1 AS (
            |  SELECT e.user_id, min(e.ts) AS pt
            |  FROM events e JOIN c2 ON e.user_id = c2.user_id
            |  WHERE e.event_type = 'purchase'
            |    AND (e.ts > c2.ct OR (e.ts = c2.ct AND e.event_id > c2.cid))
            |    AND epoch_us(e.ts) - epoch_us(c2.ct) <= ${Funnel.GapUs}
            |  GROUP BY 1),
            |p2 AS (
            |  SELECT e.user_id, p1.pt, min(e.event_id) AS pid
            |  FROM events e
            |  JOIN p1 ON e.user_id = p1.user_id AND e.ts = p1.pt
            |  JOIN c2 ON c2.user_id = e.user_id
            |  WHERE e.event_type = 'purchase'
            |    AND (e.ts > c2.ct OR (e.ts = c2.ct AND e.event_id > c2.cid))
            |  GROUP BY 1, 2)
            |SELECT v2.user_id, v2.vid AS view_id, c2.cid AS click_id,
            |  p2.pid AS purchase_id, v2.vt AS view_ts, p2.pt AS purchase_ts,
            |  epoch_us(p2.pt) - epoch_us(v2.vt) AS funnel_us
            |FROM v2
            |JOIN c2 ON c2.user_id = v2.user_id
            |JOIN p2 ON p2.user_id = v2.user_id
            |ORDER BY v2.user_id""".stripMargin))

  /** Generic 4-step CEP chain ([[Cep.chain]] — the [[Funnel]] machine
    * for any step list; identical semantics run streaming via
    * `transformWithState`, spec-pinned). Oracle: the same greedy
    * two-stage-min fold, one (sN, sNb) CTE pair per step. */
  private val cepChain4 = Declared(
    "j_cep_chain4",
    (s, d) => Cep.chain(Tables(s, d, "events"),
      Seq("signup", "view", "click", "purchase")),
    Some {
      val H = Funnel.GapUs
      val types = Seq("signup", "view", "click", "purchase")
      val steps = types.zipWithIndex.map { case (tpe, k) =>
        if (k == 0)
          s"""s0 AS (SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = '$tpe' GROUP BY 1),
             |s0b AS (
             |  SELECT e.user_id, s0.t, min(e.event_id) AS i
             |  FROM events e JOIN s0
             |    ON e.user_id = s0.user_id AND e.ts = s0.t
             |  WHERE e.event_type = '$tpe' GROUP BY 1, 2)""".stripMargin
        else {
          val p = k - 1
          s"""s$k AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s${p}b a ON e.user_id = a.user_id
             |  WHERE e.event_type = '$tpe'
             |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
             |    AND epoch_us(e.ts) - epoch_us(a.t) <= $H
             |  GROUP BY 1),
             |s${k}b AS (
             |  SELECT e.user_id, s$k.t, min(e.event_id) AS i
             |  FROM events e
             |  JOIN s$k ON e.user_id = s$k.user_id AND e.ts = s$k.t
             |  JOIN s${p}b a ON a.user_id = e.user_id
             |  WHERE e.event_type = '$tpe'
             |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
             |  GROUP BY 1, 2)""".stripMargin
        }
      }.mkString(",\n")
      val idsExpr = types.indices
        .map(k => s"CAST(s${k}b.i AS VARCHAR)").mkString(" || ',' || ")
      val joins = types.indices.tail
        .map(k => s"JOIN s${k}b ON s${k}b.user_id = s0b.user_id")
        .mkString("\n")
      val last = types.size - 1
      s"""WITH $steps
         |SELECT s0b.user_id, $idsExpr AS step_ids,
         |  s0b.t AS start_ts, s${last}b.t AS end_ts,
         |  epoch_us(s${last}b.t) - epoch_us(s0b.t) AS span_us
         |FROM s0b
         |$joins
         |ORDER BY s0b.user_id""".stripMargin
    })

  /** CEP alternation — `signup (view|click) purchase`
    * ([[Cep.chainAlt]], r10 verdict #6): the MATCH_RECOGNIZE
    * alternation quantifier. The middle step matches the first event
    * of EITHER type after the signup anchor within gap; the machine is
    * [[Cep.chain]]'s with per-step type sets (singleton sets ARE the
    * plain chain — [[Cep.chain]] delegates). Oracle: the chain4
    * two-stage-min generator with `IN` lists in place of equalities.
    * Identical semantics run streaming via [[Cep.streamingAlt]]
    * (set-membership match in [[ChainProcessor]]), spec-pinned equal
    * including an overlapping-sets edge pattern. */
  private val cepAlt = Declared(
    "j_cep_alt",
    (s, d) => Cep.chainAlt(Tables(s, d, "events"),
      Seq(Seq("signup"), Seq("view", "click"), Seq("purchase"))),
    Some {
      val H = Funnel.GapUs
      val steps = Seq(Seq("signup"), Seq("view", "click"),
        Seq("purchase"))
      def inList(ts: Seq[String]): String =
        ts.map(t => s"'$t'").mkString(", ")
      val ctes = steps.zipWithIndex.map { case (ts, k) =>
        if (k == 0)
          s"""s0 AS (SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type IN (${inList(ts)}) GROUP BY 1),
             |s0b AS (
             |  SELECT e.user_id, s0.t, min(e.event_id) AS i
             |  FROM events e JOIN s0
             |    ON e.user_id = s0.user_id AND e.ts = s0.t
             |  WHERE e.event_type IN (${inList(ts)}) GROUP BY 1, 2)""".stripMargin
        else {
          val p = k - 1
          s"""s$k AS (
             |  SELECT e.user_id, min(e.ts) AS t
             |  FROM events e JOIN s${p}b a ON e.user_id = a.user_id
             |  WHERE e.event_type IN (${inList(ts)})
             |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
             |    AND epoch_us(e.ts) - epoch_us(a.t) <= $H
             |  GROUP BY 1),
             |s${k}b AS (
             |  SELECT e.user_id, s$k.t, min(e.event_id) AS i
             |  FROM events e
             |  JOIN s$k ON e.user_id = s$k.user_id AND e.ts = s$k.t
             |  JOIN s${p}b a ON a.user_id = e.user_id
             |  WHERE e.event_type IN (${inList(ts)})
             |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
             |  GROUP BY 1, 2)""".stripMargin
        }
      }.mkString(",\n")
      val idsExpr = steps.indices
        .map(k => s"CAST(s${k}b.i AS VARCHAR)").mkString(" || ',' || ")
      val joins = steps.indices.tail
        .map(k => s"JOIN s${k}b ON s${k}b.user_id = s0b.user_id")
        .mkString("\n")
      val last = steps.size - 1
      s"""WITH $ctes
         |SELECT s0b.user_id, $idsExpr AS step_ids,
         |  s0b.t AS start_ts, s${last}b.t AS end_ts,
         |  epoch_us(s${last}b.t) - epoch_us(s0b.t) AS span_us
         |FROM s0b
         |$joins
         |ORDER BY s0b.user_id""".stripMargin
    })

  /** CEP negation — the churn query ([[Cep.chainNot]]): users whose
    * greedy first view→click completed but who then did NOT purchase
    * within the gap window (trailing-NOT absence). Oracle: the same
    * two-stage-min positive chain, minus users with a qualifying
    * purchase after the click anchor. The identical semantics run
    * streaming via [[Cep.streamingNot]] (emission withheld until the
    * watermark proves the absence window closed), spec-pinned equal. */
  private val cepChurn = Declared(
    "j_cep_churn",
    (s, d) => Cep.chainNot(Tables(s, d, "events"),
      Seq(CepStep("view"), CepStep("click"),
        CepStep("purchase", negated = true))),
    Some(s"""WITH s0 AS (
            |  SELECT user_id, min(ts) AS t FROM events
            |  WHERE event_type = 'view' GROUP BY 1),
            |s0b AS (
            |  SELECT e.user_id, s0.t, min(e.event_id) AS i
            |  FROM events e JOIN s0
            |    ON e.user_id = s0.user_id AND e.ts = s0.t
            |  WHERE e.event_type = 'view' GROUP BY 1, 2),
            |s1 AS (
            |  SELECT e.user_id, min(e.ts) AS t
            |  FROM events e JOIN s0b a ON e.user_id = a.user_id
            |  WHERE e.event_type = 'click'
            |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
            |    AND epoch_us(e.ts) - epoch_us(a.t) <= ${Funnel.GapUs}
            |  GROUP BY 1),
            |s1b AS (
            |  SELECT e.user_id, s1.t, min(e.event_id) AS i
            |  FROM events e
            |  JOIN s1 ON e.user_id = s1.user_id AND e.ts = s1.t
            |  JOIN s0b a ON a.user_id = e.user_id
            |  WHERE e.event_type = 'click'
            |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
            |  GROUP BY 1, 2),
            |viol AS (
            |  SELECT DISTINCT e.user_id
            |  FROM events e JOIN s1b a ON e.user_id = a.user_id
            |  WHERE e.event_type = 'purchase'
            |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
            |    AND epoch_us(e.ts) - epoch_us(a.t) <= ${Funnel.GapUs})
            |SELECT s0b.user_id,
            |  CAST(s0b.i AS VARCHAR) || ',' || CAST(s1b.i AS VARCHAR)
            |    AS step_ids,
            |  s0b.t AS start_ts, s1b.t AS end_ts,
            |  epoch_us(s1b.t) - epoch_us(s0b.t) AS span_us
            |FROM s0b JOIN s1b ON s1b.user_id = s0b.user_id
            |WHERE s0b.user_id NOT IN (SELECT user_id FROM viol)
            |ORDER BY s0b.user_id""".stripMargin))

  /** CEP Kleene-plus — `view click+ purchase` ([[Cep.chainPlus]]): the
    * MATCH_RECOGNIZE quantifier family. The click run absorbs greedily
    * (first gaps-and-islands island from the initial click), the
    * purchase matches the first one within gap of the last click
    * absorbed BEFORE it in (ts, id) order. Oracle: the same island +
    * merged-window (last_value IGNORE NULLS) + two-stage-min fold.
    * Identical semantics run streaming via [[Cep.streamingPlus]],
    * spec-pinned equal. */
  private val cepKleene = Declared(
    "j_cep_kleene",
    (s, d) => Cep.chainPlus(Tables(s, d, "events"),
      Seq(CepQStep("view"), CepQStep("click", plus = true),
        CepQStep("purchase"))),
    Some {
      val H = Funnel.GapUs
      s"""WITH s0 AS (
         |  SELECT user_id, min(ts) AS t FROM events
         |  WHERE event_type = 'view' GROUP BY 1),
         |s0b AS (
         |  SELECT e.user_id, s0.t, min(e.event_id) AS i
         |  FROM events e JOIN s0
         |    ON e.user_id = s0.user_id AND e.ts = s0.t
         |  WHERE e.event_type = 'view' GROUP BY 1, 2),
         |c0 AS (
         |  SELECT e.user_id, min(e.ts) AS t
         |  FROM events e JOIN s0b a ON e.user_id = a.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |    AND epoch_us(e.ts) - epoch_us(a.t) <= $H
         |  GROUP BY 1),
         |c0b AS (
         |  SELECT e.user_id, c0.t, min(e.event_id) AS i
         |  FROM events e
         |  JOIN c0 ON e.user_id = c0.user_id AND e.ts = c0.t
         |  JOIN s0b a ON a.user_id = e.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |  GROUP BY 1, 2),
         |bs AS (
         |  SELECT e.user_id, e.event_id, e.ts,
         |    lag(e.ts) OVER (PARTITION BY e.user_id
         |                    ORDER BY e.ts, e.event_id) AS pts
         |  FROM events e JOIN c0b ON e.user_id = c0b.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > c0b.t OR (e.ts = c0b.t AND e.event_id >= c0b.i))),
         |reach AS (
         |  SELECT user_id, event_id, ts FROM (
         |    SELECT *, sum(CASE WHEN pts IS NULL THEN 0
         |        WHEN epoch_us(ts) - epoch_us(pts) > $H THEN 1
         |        ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS isl
         |    FROM bs) WHERE isl = 0),
         |cs AS (
         |  SELECT e.user_id, e.event_id, e.ts
         |  FROM events e JOIN c0b ON e.user_id = c0b.user_id
         |  WHERE e.event_type = 'purchase'
         |    AND (e.ts > c0b.t OR (e.ts = c0b.t AND e.event_id > c0b.i))),
         |merged AS (
         |  SELECT user_id, event_id, ts, 1 AS isb FROM reach
         |  UNION ALL
         |  SELECT user_id, event_id, ts, 0 FROM cs),
         |scored AS (
         |  SELECT *,
         |    last_value(CASE WHEN isb = 1 THEN ts END IGNORE NULLS)
         |      OVER w AS lbt,
         |    last_value(CASE WHEN isb = 1 THEN event_id END IGNORE NULLS)
         |      OVER w AS lbi,
         |    sum(isb) OVER w AS nb
         |  FROM merged
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |qual AS (
         |  SELECT * FROM scored
         |  WHERE isb = 0 AND lbt IS NOT NULL
         |    AND epoch_us(ts) - epoch_us(lbt) <= $H),
         |q1 AS (SELECT user_id, min(ts) AS mt FROM qual GROUP BY 1),
         |q2 AS (
         |  SELECT q.user_id, q1.mt, min(q.event_id) AS mid
         |  FROM qual q JOIN q1 ON q.user_id = q1.user_id AND q.ts = q1.mt
         |  GROUP BY 1, 2),
         |chosen AS (
         |  SELECT q.user_id, q.ts, q.event_id, q.lbt, q.lbi, q.nb
         |  FROM qual q JOIN q2 ON q.user_id = q2.user_id
         |    AND q.ts = q2.mt AND q.event_id = q2.mid)
         |SELECT s0b.user_id,
         |  CAST(s0b.i AS VARCHAR) || ',' || CAST(c.lbi AS VARCHAR)
         |    || ',' || CAST(c.event_id AS VARCHAR) AS step_ids,
         |  '1,' || CAST(c.nb AS VARCHAR) || ',1' AS counts,
         |  s0b.t AS start_ts, c.ts AS end_ts,
         |  epoch_us(c.ts) - epoch_us(s0b.t) AS span_us
         |FROM s0b JOIN chosen c ON c.user_id = s0b.user_id
         |ORDER BY s0b.user_id""".stripMargin
    })

  /** CEP bounded repetition — `signup click{2,3} purchase`
    * ([[Cep.chainRep]], beyond the r10 ask): the full MATCH_RECOGNIZE
    * quantifier. Only the first THREE gap-chained clicks absorb
    * (row_number cap on the island); the purchase qualifies only once
    * at least TWO absorbed clicks precede it in (ts, id) order — an
    * earlier purchase is ignored, not a failure. [[Cep.chainPlus]] IS
    * this machine at `{1,∞}` (delegation), so the kleene row pins the
    * generalization. Oracle: the kleene fold with `rn <= 3` on the
    * absorption island and `nb >= 2` on the successor. Streaming
    * twin: [[Cep.streamingRep]], spec-pinned equal. */
  private val cepRep = Declared(
    "j_cep_rep",
    (s, d) => Cep.chainRep(Tables(s, d, "events"),
      Seq(CepRepStep("signup"), CepRepStep("click", minN = 2, maxN = 3),
        CepRepStep("purchase"))),
    Some {
      val H = Funnel.GapUs
      s"""WITH s0 AS (
         |  SELECT user_id, min(ts) AS t FROM events
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s0b AS (
         |  SELECT e.user_id, s0.t, min(e.event_id) AS i
         |  FROM events e JOIN s0
         |    ON e.user_id = s0.user_id AND e.ts = s0.t
         |  WHERE e.event_type = 'signup' GROUP BY 1, 2),
         |c0 AS (
         |  SELECT e.user_id, min(e.ts) AS t
         |  FROM events e JOIN s0b a ON e.user_id = a.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |    AND epoch_us(e.ts) - epoch_us(a.t) <= $H
         |  GROUP BY 1),
         |c0b AS (
         |  SELECT e.user_id, c0.t, min(e.event_id) AS i
         |  FROM events e
         |  JOIN c0 ON e.user_id = c0.user_id AND e.ts = c0.t
         |  JOIN s0b a ON a.user_id = e.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |  GROUP BY 1, 2),
         |bs AS (
         |  SELECT e.user_id, e.event_id, e.ts,
         |    lag(e.ts) OVER (PARTITION BY e.user_id
         |                    ORDER BY e.ts, e.event_id) AS pts
         |  FROM events e JOIN c0b ON e.user_id = c0b.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > c0b.t OR (e.ts = c0b.t AND e.event_id >= c0b.i))),
         |reach AS (
         |  SELECT user_id, event_id, ts FROM (
         |    SELECT *, sum(CASE WHEN pts IS NULL THEN 0
         |        WHEN epoch_us(ts) - epoch_us(pts) > $H THEN 1
         |        ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS isl
         |    FROM bs) WHERE isl = 0),
         |absorbed AS (
         |  SELECT user_id, event_id, ts FROM (
         |    SELECT *, row_number()
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |    FROM reach) WHERE rn <= 3),
         |cs AS (
         |  SELECT e.user_id, e.event_id, e.ts
         |  FROM events e JOIN c0b ON e.user_id = c0b.user_id
         |  WHERE e.event_type = 'purchase'
         |    AND (e.ts > c0b.t OR (e.ts = c0b.t AND e.event_id > c0b.i))),
         |merged AS (
         |  SELECT user_id, event_id, ts, 1 AS isb FROM absorbed
         |  UNION ALL
         |  SELECT user_id, event_id, ts, 0 FROM cs),
         |scored AS (
         |  SELECT *,
         |    last_value(CASE WHEN isb = 1 THEN ts END IGNORE NULLS)
         |      OVER w AS lbt,
         |    last_value(CASE WHEN isb = 1 THEN event_id END IGNORE NULLS)
         |      OVER w AS lbi,
         |    sum(isb) OVER w AS nb
         |  FROM merged
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |qual AS (
         |  SELECT * FROM scored
         |  WHERE isb = 0 AND lbt IS NOT NULL AND nb >= 2
         |    AND epoch_us(ts) - epoch_us(lbt) <= $H),
         |q1 AS (SELECT user_id, min(ts) AS mt FROM qual GROUP BY 1),
         |q2 AS (
         |  SELECT q.user_id, q1.mt, min(q.event_id) AS mid
         |  FROM qual q JOIN q1 ON q.user_id = q1.user_id AND q.ts = q1.mt
         |  GROUP BY 1, 2),
         |chosen AS (
         |  SELECT q.user_id, q.ts, q.event_id, q.lbt, q.lbi, q.nb
         |  FROM qual q JOIN q2 ON q.user_id = q2.user_id
         |    AND q.ts = q2.mt AND q.event_id = q2.mid)
         |SELECT s0b.user_id,
         |  CAST(s0b.i AS VARCHAR) || ',' || CAST(c.lbi AS VARCHAR)
         |    || ',' || CAST(c.event_id AS VARCHAR) AS step_ids,
         |  '1,' || CAST(c.nb AS VARCHAR) || ',1' AS counts,
         |  s0b.t AS start_ts, c.ts AS end_ts,
         |  epoch_us(c.ts) - epoch_us(s0b.t) AS span_us
         |FROM s0b JOIN chosen c ON c.user_id = s0b.user_id
         |ORDER BY s0b.user_id""".stripMargin
    })

  /** CEP optional step — `signup click{0,2} purchase`
    * ([[Cep.chainRep]] at `minN = 0`, completing the MATCH_RECOGNIZE
    * quantifier family: `B?` is `{0,1}`; r11 verdict #5): the click
    * run may close EMPTY — a purchase within gap of the SIGNUP anchor
    * consumes directly, emitting count 0 and sentinel step id −1;
    * with clicks present the machine is the bounded-repetition fold
    * (first two gap-chained clicks absorb, the purchase qualifies
    * within gap of the last absorbed). Oracle: the rep fold with the
    * successor candidates anchored at the signup (not the first
    * click) and the gap anchor coalesced to it. Streaming twin:
    * [[Cep.streamingRep]], spec-pinned equal incl. the EMPTY close. */
  private val cepOpt = Declared(
    "j_cep_opt",
    (s, d) => Cep.chainRep(Tables(s, d, "events"),
      Seq(CepRepStep("signup"), CepRepStep("click", minN = 0, maxN = 2),
        CepRepStep("purchase"))),
    Some {
      val H = Funnel.GapUs
      s"""WITH s0 AS (
         |  SELECT user_id, min(ts) AS t FROM events
         |  WHERE event_type = 'signup' GROUP BY 1),
         |s0b AS (
         |  SELECT e.user_id, s0.t, min(e.event_id) AS i
         |  FROM events e JOIN s0
         |    ON e.user_id = s0.user_id AND e.ts = s0.t
         |  WHERE e.event_type = 'signup' GROUP BY 1, 2),
         |c0 AS (
         |  SELECT e.user_id, min(e.ts) AS t
         |  FROM events e JOIN s0b a ON e.user_id = a.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |    AND epoch_us(e.ts) - epoch_us(a.t) <= $H
         |  GROUP BY 1),
         |c0b AS (
         |  SELECT e.user_id, c0.t, min(e.event_id) AS i
         |  FROM events e
         |  JOIN c0 ON e.user_id = c0.user_id AND e.ts = c0.t
         |  JOIN s0b a ON a.user_id = e.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))
         |  GROUP BY 1, 2),
         |bs AS (
         |  SELECT e.user_id, e.event_id, e.ts,
         |    lag(e.ts) OVER (PARTITION BY e.user_id
         |                    ORDER BY e.ts, e.event_id) AS pts
         |  FROM events e JOIN c0b ON e.user_id = c0b.user_id
         |  WHERE e.event_type = 'click'
         |    AND (e.ts > c0b.t OR (e.ts = c0b.t AND e.event_id >= c0b.i))),
         |reach AS (
         |  SELECT user_id, event_id, ts FROM (
         |    SELECT *, sum(CASE WHEN pts IS NULL THEN 0
         |        WHEN epoch_us(ts) - epoch_us(pts) > $H THEN 1
         |        ELSE 0 END)
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |        AS isl
         |    FROM bs) WHERE isl = 0),
         |absorbed AS (
         |  SELECT user_id, event_id, ts FROM (
         |    SELECT *, row_number()
         |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |    FROM reach) WHERE rn <= 2),
         |cs AS (
         |  SELECT e.user_id, e.event_id, e.ts
         |  FROM events e JOIN s0b a ON e.user_id = a.user_id
         |  WHERE e.event_type = 'purchase'
         |    AND (e.ts > a.t OR (e.ts = a.t AND e.event_id > a.i))),
         |merged AS (
         |  SELECT user_id, event_id, ts, 1 AS isb FROM absorbed
         |  UNION ALL
         |  SELECT user_id, event_id, ts, 0 FROM cs),
         |scored AS (
         |  SELECT *,
         |    last_value(CASE WHEN isb = 1 THEN ts END IGNORE NULLS)
         |      OVER w AS lbt,
         |    last_value(CASE WHEN isb = 1 THEN event_id END IGNORE NULLS)
         |      OVER w AS lbi,
         |    sum(isb) OVER w AS nb
         |  FROM merged
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |qual AS (
         |  SELECT s.user_id, s.event_id, s.ts,
         |    coalesce(s.lbt, a.t) AS lbt,
         |    CASE WHEN s.nb = 0 THEN -1 ELSE s.lbi END AS lbi,
         |    s.nb
         |  FROM scored s JOIN s0b a ON s.user_id = a.user_id
         |  WHERE s.isb = 0
         |    AND epoch_us(s.ts) - epoch_us(coalesce(s.lbt, a.t)) <= $H),
         |q1 AS (SELECT user_id, min(ts) AS mt FROM qual GROUP BY 1),
         |q2 AS (
         |  SELECT q.user_id, q1.mt, min(q.event_id) AS mid
         |  FROM qual q JOIN q1 ON q.user_id = q1.user_id AND q.ts = q1.mt
         |  GROUP BY 1, 2),
         |chosen AS (
         |  SELECT q.user_id, q.ts, q.event_id, q.lbt, q.lbi, q.nb
         |  FROM qual q JOIN q2 ON q.user_id = q2.user_id
         |    AND q.ts = q2.mt AND q.event_id = q2.mid)
         |SELECT s0b.user_id,
         |  CAST(s0b.i AS VARCHAR) || ',' || CAST(c.lbi AS VARCHAR)
         |    || ',' || CAST(c.event_id AS VARCHAR) AS step_ids,
         |  '1,' || CAST(c.nb AS VARCHAR) || ',1' AS counts,
         |  s0b.t AS start_ts, c.ts AS end_ts,
         |  epoch_us(c.ts) - epoch_us(s0b.t) AS span_us
         |FROM s0b JOIN chosen c ON c.user_id = s0b.user_id
         |ORDER BY s0b.user_id""".stripMargin
    })

  /** Identity stream-dedup e2e ([[StreamDedup.exactlyOnce]] —
    * `dropDuplicatesWithinWatermark`): every third fixture event is
    * REDELIVERED (the at-least-once broker edge), the doubled stream
    * arrives over real micro-batch waves in event-time order, and the
    * deduped output lands as hash-bucketed parquet appends (the
    * distributed-sink doctrine — no driver-side collect). Exactly-once
    * means the result is precisely the original fixture — which is the
    * oracle: any duplicate that leaks doubles a row and breaks the
    * row-count/hash match. The watermark-EVICTION half of the operator
    * (state bounded by the horizon) is pinned in StreamDedupSpec; here
    * the delay is sized past the fixture span so determinism is
    * total. (The orderBy+collect below is the HARNESS feeding the
    * MemoryStream in event-time waves — the ChangeGen-wave pattern of
    * the cdc_* cells — not the operator's data path; the dedup and its
    * sink are fully distributed.) */
  private val streamDedupE2e = Declared(
    "events_stream_dedup",
    (s, d) => {
      import s.implicits._
      val ev = Tables(s, d, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
      val rows = ev.orderBy("ts", "event_id").collect()
      // deterministic redelivery: every third event arrives twice,
      // the copy immediately after the original (same wave or the
      // next — both inside the watermark)
      val withDups = rows.flatMap { r =>
        if (r.getLong(0) % 3 == 0) Seq(r, r) else Seq(r)
      }
      // harness feeder through the one audited shim (ADVICE r13 #4)
      val in = org.apache.spark.sql.graftbridge.StreamBridge
        .memoryStream[(Long, Long, java.sql.Timestamp, String, Double)](s)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft-sdedup-out").toString
      val ckptDir = java.nio.file.Files
        .createTempDirectory("graft-sdedup-ckpt").toString
      val q = StreamDedup.exactlyOnce(
          in.toDF().toDF("event_id", "user_id", "ts", "event_type", "value"),
          "event_id", watermark = "3650 days")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            batch
              .withColumn("bucket", pmod(col("event_id"), lit(16)))
              .repartition(col("bucket"))
              .write.mode("append").partitionBy("bucket").parquet(outDir)
        }
        .start()
      try withDups.grouped(withDups.length / 4 + 1).foreach { wave =>
        in.addData(wave.map(r => (r.getLong(0), r.getLong(1),
          r.getTimestamp(2), r.getString(3), r.getDouble(4))))
        q.processAllAvailable()
      } finally q.stop()
      // empty-stream guard + per-run dir cleanup (ADVICE r13 #4)
      val res =
        if (withDups.isEmpty) ev.limit(0).localCheckpoint(true)
        else s.read.parquet(outDir)
          .select("event_id", "user_id", "ts", "event_type", "value")
          .localCheckpoint(true)
      Seq(outDir, ckptDir).foreach { p =>
        def go(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
          f.delete(); ()
        }
        go(new java.io.File(p))
      }
      res.orderBy("event_id")
    },
    Some("""SELECT event_id, user_id, ts, event_type, value
           |FROM events ORDER BY event_id""".stripMargin))

  val all: Seq[Declared] = Seq(tumbling, sliding, sessions, attribution,
    enrichment, funnel, cepChain4, cepAlt, cepChurn, cepKleene, cepRep,
    cepOpt,
    streamDedupE2e)
}
