package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState, ExpiredTimerInfo}

/** One funnel event, microsecond event time (the TWS input row). */
private[streaming] case class FunnelEvent(user_id: Long, event_id: Long,
    ts_us: Long, event_type: String)

/** A completed funnel (the emitted row, batch and streaming). */
private[streaming] case class FunnelHit(user_id: Long, view_id: Long,
    click_id: Long, purchase_id: Long, view_ts_us: Long,
    purchase_ts_us: Long)

/** The per-key funnel state machine position: stage 0 = awaiting view,
  * 1 = awaiting click, 2 = awaiting purchase, 3 = completed (terminal).
  * (at, aid) anchor the last matched step; (vt, vid) pin the view for
  * the emitted row. */
private[streaming] case class FunnelStage(stage: Int, at: Long, aid: Long,
    vt: Long, vid: Long, cid: Long)

/** Conversion-funnel detection (the CEP / MATCH_RECOGNIZE family):
  * find, per user, the GREEDY first completion of the ordered pattern
  * view → click → purchase where each consecutive step lands within
  * [[GapUs]] of the previous one — the product-analytics query every
  * event pipeline runs, and a pattern Spark has no native operator for.
  *
  * Semantics (skip-till-next-match, anchored): the matched view is the
  * user's FIRST view (min (ts, event_id)); the matched click is the
  * first click strictly after it within the gap; the matched purchase
  * is the first purchase strictly after that click within the gap.
  * "First" ties break on event_id, so the match is deterministic by
  * construction — never by timestamp-collision luck. A first view whose
  * gap window closes empty means no match ever (the greedy contract:
  * anchors never re-bind).
  *
  * Two forms, one semantics, spec-pinned equal:
  *  - [[completions]]: batch — three (filter → per-user two-stage min)
  *    steps, each one map-side-combined aggregate over the events scan
  *    plus a size-conditionally-broadcast join of the per-user anchor
  *    table (bounded by |users|, not events — [[anchorsBroadcastable]]). At 100 TB: three passes over a pruned
  *    per-type scan, no event-to-event self-join anywhere (contrast the
  *    theta-join attribution — this is why funnels don't explode).
  *  - [[streaming]]: Spark 4 `transformWithState` (the arbitrary-state
  *    API, RocksDB-backed): per-user ListState buffers events still
  *    inside the watermark horizon, an event-time timer fires when the
  *    watermark passes them, and the drained prefix folds through the
  *    [[FunnelStage]] state machine in (ts, event_id) order — so
  *    cross-batch disorder inside the watermark cannot change the
  *    match. Completed users drop to a terminal stage and their buffer
  *    clears: state is bounded by in-horizon events for active users
  *    plus one row per completed user.
  */
object Funnel {
  /** Max micros between consecutive funnel steps (24 h). */
  val GapUs: Long = 24L * 3600 * 1000000

  private[streaming] def afterAnchor(ts: Column, id: Column, at: Column,
      aid: Column): Column =
    ts > at || (ts === at && id > aid)

  /** Size-conditional broadcast decision for the per-user anchor
    * tables (r8 verdict #3): the anchors are |users|-bounded, which at
    * fixture scale is a few KB — but at 100 TB a 10⁸-10⁹-user anchor
    * is NOT broadcastable, and an unconditional hint becomes a
    * driver/executor OOM where the un-hinted equi-join degrades
    * gracefully to shuffle. Catalyst's own estimate of the anchor
    * SUBPLANS is useless here — size-only stats multiply through the
    * chained step joins (measured: the third anchor estimates 664 GB
    * over a 28 KB fixture) — so the decision uses the honest upper
    * bound instead: every anchor holds at most one narrow row per user
    * PRESENT IN THE EVENTS SOURCE, so the source scan's estimate
    * (footer-accurate for parquet) bounds every anchor. Hints fire only
    * when that bound fits the session's autoBroadcastJoinThreshold;
    * over it (or with broadcasting disabled, threshold ≤ 0) every
    * anchor join falls through to a shuffled sort-merge join, and AQE
    * may still convert back at runtime if the actual built size turns
    * out small. */
  private[streaming] def anchorsBroadcastable(events: DataFrame): Boolean = {
    val thr = events.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    thr > 0 &&
      events.queryExecution.optimizedPlan.stats.sizeInBytes <= thr
  }

  private[streaming] def hintIf(df: DataFrame, small: Boolean): DataFrame =
    if (small) broadcast(df) else df

  /** Per-user (at, aid) = two-stage min: earliest ts, then lowest id at
    * that ts — deterministic without comparing (ts, id) structs. */
  private[streaming] def firstPerUser(cand: DataFrame,
      small: Boolean = true): DataFrame = {
    val t1 = cand.groupBy("user_id").agg(min(col("ts")).as("mt"))
    cand.join(hintIf(t1, small), "user_id").filter(col("ts") === col("mt"))
      .groupBy("user_id", "mt").agg(min(col("event_id")).as("mid"))
      .select(col("user_id"), col("mt").as("at"), col("mid").as("aid"))
  }

  /** First event of `tpe` strictly after the anchor within the gap. */
  private[streaming] def step(events: DataFrame, tpe: String, anchor: DataFrame,
      gapUs: Long, small: Boolean = true): DataFrame =
    stepIn(events, Seq(tpe), anchor, gapUs, small)

  /** [[step]] over an ALTERNATION of types — the matched event's type
    * may be any member of `tpes` ([[Cep.chainAlt]]'s per-step set).
    * A singleton set is exactly [[step]] (Catalyst folds the one-element
    * IN back to an equality), so the single-type machine delegates
    * here with no plan change. */
  private[streaming] def stepIn(events: DataFrame, tpes: Seq[String],
      anchor: DataFrame, gapUs: Long, small: Boolean = true): DataFrame =
    firstPerUser(events.filter(col("event_type").isin(tpes: _*))
      .join(hintIf(anchor, small), "user_id")
      .filter(afterAnchor(col("ts"), col("event_id"), col("at"),
          col("aid")) &&
        unix_micros(col("ts")) - unix_micros(col("at")) <= gapUs)
      .select("user_id", "event_id", "ts"), small)

  /** Batch funnel over the events table. Emits (user_id, view_id,
    * click_id, purchase_id, view_ts, purchase_ts, funnel_us). */
  def completions(events: DataFrame, gapUs: Long = GapUs): DataFrame = {
    val ev = events.select("user_id", "event_id", "ts", "event_type")
    val small = anchorsBroadcastable(ev)
    val v = firstPerUser(ev.filter(col("event_type") === "view")
      .select("user_id", "event_id", "ts"), small)
      .select(col("user_id"), col("at").as("vt"), col("aid").as("vid"))
    val c = step(ev, "click",
        v.select(col("user_id"), col("vt").as("at"), col("vid").as("aid")),
        gapUs, small)
      .select(col("user_id"), col("at").as("ct"), col("aid").as("cid"))
    val p = step(ev, "purchase",
        c.select(col("user_id"), col("ct").as("at"), col("cid").as("aid")),
        gapUs, small)
      .select(col("user_id"), col("at").as("pt"), col("aid").as("pid"))
    v.join(hintIf(c, small), "user_id").join(hintIf(p, small), "user_id")
      .select(col("user_id"), col("vid").as("view_id"),
        col("cid").as("click_id"), col("pid").as("purchase_id"),
        col("vt").as("view_ts"), col("pt").as("purchase_ts"),
        (unix_micros(col("pt")) - unix_micros(col("vt"))).as("funnel_us"))
      .orderBy("user_id")
  }

  /** Streaming funnel: watermarked events → [[FunnelProcessor]] under
    * `transformWithState` (event-time TimeMode, append output). Input
    * needs (user_id, event_id, ts, event_type); emits [[FunnelHit]]
    * rows exactly once per completing user, only after the watermark
    * passes the purchase. */
  def streaming(events: DataFrame, gapUs: Long = GapUs,
      watermark: String = "30 minutes"): Dataset[FunnelHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** The TWS processor behind [[Funnel.streaming]]. Buffered events fold
  * in strict (ts_us, event_id) order once the watermark passes them;
  * the buffer holds ONLY in-horizon events (everything ≤ watermark
  * drains each firing), and a completed or terminally-stuck key clears
  * its buffer, so per-key state is O(events inside the watermark
  * horizon) — the same bound the built-in stream-stream join carries. */
private[streaming] class FunnelProcessor(gapUs: Long)
    extends StatefulProcessor[Long, FunnelEvent, FunnelHit] {
  @transient private var buf: ListState[FunnelEvent] = _
  @transient private var stage: ValueState[FunnelStage] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[FunnelEvent]("buf",
      Encoders.product[FunnelEvent], TTLConfig.NONE)
    stage = getHandle.getValueState[FunnelStage]("stage",
      Encoders.product[FunnelStage], TTLConfig.NONE)
  }

  private def current(): FunnelStage =
    if (stage.exists()) stage.get()
    else FunnelStage(0, 0L, 0L, 0L, 0L, 0L)

  /** Fold every buffered event with ts_us ≤ the watermark through the
    * state machine in (ts_us, event_id) order; keep the rest buffered.
    * Returns completions to emit. */
  private def drain(key: Long, wmUs: Long): Iterator[FunnelHit] = {
    val all = buf.get().toSeq
    if (all.isEmpty) return Iterator.empty
    val (ripe, rest) = all.partition(_.ts_us <= wmUs)
    if (ripe.isEmpty) return Iterator.empty
    var st = current()
    val hits = Seq.newBuilder[FunnelHit]
    ripe.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      st.stage match {
        case 0 if e.event_type == "view" =>
          st = FunnelStage(1, e.ts_us, e.event_id, e.ts_us, e.event_id, 0L)
        case 1 if e.event_type == "click" &&
            (e.ts_us > st.at || (e.ts_us == st.at && e.event_id > st.aid)) &&
            e.ts_us - st.at <= gapUs =>
          st = FunnelStage(2, e.ts_us, e.event_id, st.vt, st.vid, e.event_id)
        case 2 if e.event_type == "purchase" &&
            (e.ts_us > st.at || (e.ts_us == st.at && e.event_id > st.aid)) &&
            e.ts_us - st.at <= gapUs =>
          hits += FunnelHit(key, st.vid, st.cid, e.event_id, st.vt, e.ts_us)
          st = FunnelStage(3, e.ts_us, e.event_id, st.vt, st.vid, st.cid)
        case _ => // no transition: greedy anchors never re-bind
      }
    }
    stage.update(st)
    if (st.stage == 3 || rest.isEmpty) buf.clear()
    else buf.put(rest.toArray)
    hits.result().iterator
  }

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timers: TimerValues): Iterator[FunnelHit] = {
    val st = current()
    if (st.stage == 3) return Iterator.empty // terminal: ignore the rest
    rows.foreach(buf.appendValue)
    val out = drain(key, timers.getCurrentWatermarkInMs() * 1000L)
    rearm()
    out
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[FunnelHit] = {
    val out = drain(key, timers.getCurrentWatermarkInMs() * 1000L)
    rearm()
    out
  }

  /** Anything still buffered ripens when the watermark passes it —
    * re-register the event-time timer at the earliest pending event. */
  private def rearm(): Unit = {
    val pending = buf.get().toSeq
    if (pending.nonEmpty)
      getHandle.registerTimer(pending.map(_.ts_us).min / 1000L + 1L)
  }
}
