package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** The per-key chain-machine position: `stage` = number of steps
  * matched so far (== types.size ⇒ completed-and-emitted, terminal);
  * (at, aid) anchor the last matched event; ids/tss record every
  * matched step for the emitted row. */
private[streaming] case class ChainState(stage: Int, at: Long, aid: Long,
    ids: Seq[Long], tss: Seq[Long])

/** A completed chain (one row per completing user, exactly once). */
private[streaming] case class ChainHit(user_id: Long, step_ids: Seq[Long],
    step_ts_us: Seq[Long])

/** Generic ordered-pattern (CEP) chain detection — [[Funnel]]'s
  * semantics for ANY step sequence: per user, the greedy
  * skip-till-next-match first completion of `types.head → types(1) →
  * …` where each consecutive step lands within `gapUs` of the previous
  * one, every "first" tie-broken on event_id (deterministic by
  * construction; anchors never re-bind — the greedy contract).
  *
  * Batch [[chain]] is a fold of the [[Funnel]] step primitive: per
  * step, one filtered corpus pass + one per-user two-stage-min
  * aggregate + a size-conditionally-broadcast anchor join (anchors
  * bounded by |users|; see [[Funnel.anchorsBroadcastable]]) —
  * N steps = N pruned passes, never an event-to-event self-join.
  * Streaming [[streaming]] runs the same machine on Spark 4
  * `transformWithState` ([[ChainProcessor]]): per-user ListState
  * buffers in-horizon events, event-time timers drain them in
  * (ts, event_id) order once the watermark passes, completed keys go
  * terminal and clear their buffer.
  */
object Cep {
  /** Batch chain detection. Emits (user_id, step_ids — comma-joined in
    * step order, start_ts, end_ts, span_us), one row per user whose
    * chain completes. */
  def chain(events: DataFrame, types: Seq[String],
      gapUs: Long = Funnel.GapUs): DataFrame = {
    require(types.nonEmpty, "chain needs at least one step")
    val ev = events.select("user_id", "event_id", "ts", "event_type")
    val small = Funnel.anchorsBroadcastable(ev)
    val first = Funnel.firstPerUser(
      ev.filter(col("event_type") === types.head)
        .select("user_id", "event_id", "ts"), small)
    val anchors = types.tail.scanLeft(first)(
      (anchor, tpe) => Funnel.step(ev, tpe, anchor, gapUs, small))
    val named = anchors.zipWithIndex.map { case (df, k) =>
      df.select(col("user_id"), col("at").as(s"t$k"), col("aid").as(s"i$k"))
    }
    val joined = named.reduce((a, b) => a.join(Funnel.hintIf(b, small), "user_id"))
    val n = types.size
    joined.select(col("user_id"),
        concat_ws(",",
          (0 until n).map(k => col(s"i$k").cast("string")): _*)
          .as("step_ids"),
        col("t0").as("start_ts"), col(s"t${n - 1}").as("end_ts"),
        (unix_micros(col(s"t${n - 1}")) - unix_micros(col("t0")))
          .as("span_us"))
      .orderBy("user_id")
  }

  /** Streaming chain: watermarked events → [[ChainProcessor]] under
    * `transformWithState` (event-time, append). Emits [[ChainHit]]
    * exactly once per completing user, only after the watermark passes
    * the final step. */
  def streaming(events: DataFrame, types: Seq[String],
      gapUs: Long = Funnel.GapUs,
      watermark: String = "30 minutes"): Dataset[ChainHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ChainProcessor(types, gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}

/** The TWS processor behind [[Cep.streaming]] — the [[FunnelProcessor]]
  * machine generalized to any step list. Buffered events fold in strict
  * (ts_us, event_id) order once the watermark passes them; per-key
  * state is O(events inside the watermark horizon), and a completed key
  * is terminal with a cleared buffer. */
private[streaming] class ChainProcessor(types: Seq[String], gapUs: Long)
    extends StatefulProcessor[Long, FunnelEvent, ChainHit] {
  @transient private var buf: ListState[FunnelEvent] = _
  @transient private var stage: ValueState[ChainState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    buf = getHandle.getListState[FunnelEvent]("buf",
      Encoders.product[FunnelEvent], TTLConfig.NONE)
    stage = getHandle.getValueState[ChainState]("stage",
      Encoders.product[ChainState], TTLConfig.NONE)
  }

  private def current(): ChainState =
    if (stage.exists()) stage.get()
    else ChainState(0, 0L, 0L, Seq.empty, Seq.empty)

  private def drain(key: Long, wmUs: Long): Iterator[ChainHit] = {
    val all = buf.get().toSeq
    if (all.isEmpty) return Iterator.empty
    val (ripe, rest) = all.partition(_.ts_us <= wmUs)
    if (ripe.isEmpty) return Iterator.empty
    var st = current()
    val hits = Seq.newBuilder[ChainHit]
    ripe.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (st.stage < types.size && e.event_type == types(st.stage) &&
          (st.stage == 0 ||
            ((e.ts_us > st.at || (e.ts_us == st.at && e.event_id > st.aid))
              && e.ts_us - st.at <= gapUs))) {
        st = ChainState(st.stage + 1, e.ts_us, e.event_id,
          st.ids :+ e.event_id, st.tss :+ e.ts_us)
        if (st.stage == types.size) // completed: emit once, go terminal
          hits += ChainHit(key, st.ids, st.tss)
      }
    }
    stage.update(st)
    if (st.stage == types.size || rest.isEmpty) buf.clear()
    else buf.put(rest.toArray)
    hits.result().iterator
  }

  override def handleInputRows(key: Long, rows: Iterator[FunnelEvent],
      timers: TimerValues): Iterator[ChainHit] = {
    if (current().stage == types.size) return Iterator.empty // terminal
    rows.foreach(buf.appendValue)
    val out = drain(key, timers.getCurrentWatermarkInMs() * 1000L)
    rearm()
    out
  }

  override def handleExpiredTimer(key: Long, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[ChainHit] = {
    val out = drain(key, timers.getCurrentWatermarkInMs() * 1000L)
    rearm()
    out
  }

  private def rearm(): Unit = {
    val pending = buf.get().toSeq
    if (pending.nonEmpty)
      getHandle.registerTimer(pending.map(_.ts_us).min / 1000L + 1L)
  }
}
