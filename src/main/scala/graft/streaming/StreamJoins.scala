package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (SURVEY.md §2.9 family —
  * beyond-reference streaming surface): the attribution shape every
  * event pipeline runs — match each conversion to the same user's
  * candidate events in the preceding `horizon`.
  *
  * The one plan builder serves BOTH execution modes:
  *  - batch: the declared query (`j_stream_attrib`) runs it over the
  *    `events` fixture and DuckDB verifies it;
  *  - streaming: both sides watermarked → Spark's symmetric hash join
  *    buffers each side keyed by `user_id`, and the time-range
  *    condition + watermark bound state eviction: a buffered candidate
  *    is dropped once the conversion-side watermark passes
  *    `candidate_ts + horizon`, so per-key state is O(events within
  *    horizon + watermark delay), independent of stream length — the
  *    property that lets attribution run continuously at 100 TB/day.
  *
  * Scale: the equi key (`user_id`) hash-partitions both sides once; no
  * other shuffle. The range predicate is evaluated inside the join, not
  * as a post-join filter over a cartesian pair space.
  */
object StreamJoins {
  /** Conversions × candidates within [conv_ts - horizon, conv_ts],
    * per user. Inputs need (user_id, event_id, ts); outputs one row
    * per (conversion, matched candidate).
    *
    * `watermark` (streaming only) applies to both sides; leave None in
    * batch (watermark on a batch plan is a no-op column-wise but blocks
    * DuckDB-comparable plans from staying simple).
    */
  /** [[attribution]]'s join type: `"inner"` (default) emits matched
    * pairs only; `"left_outer"` ALSO emits each unmatched conversion
    * once — with null candidate fields — after the watermark proves no
    * candidate can still arrive (Spark's outer stream-stream contract:
    * the null-extended row is withheld until state for that window is
    * provably complete). The outer form is the audit shape:
    * "conversions with no preceding view" is itself the signal. */
  def attribution(candidates: DataFrame, conversions: DataFrame,
      horizon: String = "2 hours",
      watermark: Option[String] = None,
      joinType: String = "inner"): DataFrame = {
    val cand0 = candidates.select(
      col("user_id").as("cand_user"),
      col("event_id").as("view_id"),
      col("ts").as("view_ts"))
    val conv0 = conversions.select(
      col("user_id"),
      col("event_id").as("purchase_id"),
      col("ts").as("purchase_ts"))
    val cand = watermark.fold(cand0)(cand0.withWatermark("view_ts", _))
    val conv = watermark.fold(conv0)(conv0.withWatermark("purchase_ts", _))
    conv.join(cand,
        col("user_id") === col("cand_user") &&
          col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon") &&
          col("view_ts") <= col("purchase_ts"),
        joinType)
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("view_id"), col("view_ts"))
  }

  /** Stream-static enrichment join — the other canonical streaming join
    * shape (next to [[attribution]]'s stream-stream): each event
    * decorated with its user's dimension attributes from a static
    * table, the lookup every event pipeline does before routing.
    *
    * The one builder serves both modes:
    *  - batch: the declared query (`j_stream_enrich`) over the
    *    `events`/`customer` fixtures, DuckDB-verified;
    *  - streaming: the static side needs no watermark and holds NO join
    *    state — Spark re-plans it into each micro-batch, and the
    *    `broadcast` hint makes every batch a stateless
    *    BroadcastHashJoin (dim ships once per executor, the stream side
    *    never shuffles). LEFT join so an event with no dim row passes
    *    through with nulls instead of silently dropping — at 100 TB the
    *    unmatched stream is a data-quality signal, not noise to eat.
    *
    * Scale: dim is the small side by design (customers vs events). A
    * dim too big to broadcast flips to a shuffled hash join on the same
    * builder — but then the RIGHT design is pre-bucketing the dim and
    * stream on the key, which `Replicate`'s bucketed replica layout
    * already provides. */
  def enrich(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        broadcast(dim.select(col("c_custkey"), col("c_mktsegment"),
          col("c_nationkey"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"),
        col("c_mktsegment").as("segment"),
        col("c_nationkey").as("nationkey"))
}
