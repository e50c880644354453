package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation (SURVEY.md §2.9 T5/T6 — the
  * beyond-reference streaming surface): tumbling and session windows
  * with watermark-based late-data handling.
  *
  * The same plan builders serve BOTH execution modes:
  *  - batch: the declared queries run them over the `events` fixture and
  *    DuckDB verifies them (session windows via the gaps-and-islands
  *    rewrite);
  *  - streaming: `withWatermark` + append-mode emission — windows
  *    finalize once the watermark passes their end; later events are
  *    dropped (tested in StreamingWindowSpec with a MemoryStream clock).
  *
  * Scale: windowed aggregation shuffles once on (key, window); the state
  * store holds only open windows (bounded by watermark horizon ×
  * key-cardinality), so state is O(active keys), independent of stream
  * length — the property that lets this run for months at 100 TB/day.
  */
object Windows {
  /** Tumbling event-time counts/sums per (window, event_type). */
  def tumbling(events: DataFrame, width: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,4)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Sliding (hopping) event-time windows: width `width`, advancing
    * every `slide` — each event lands in width/slide overlapping
    * windows (the smoothing/trend form between tumbling and session).
    * Same shuffle-once-on-(window, key) plan; streaming state is open
    * windows × overlap factor, still watermark-bounded. */
  def sliding(events: DataFrame, width: String = "15 minutes",
      slide: String = "5 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,4)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))
  }

  /** Session windows per user: events closer than `gap` merge into one
    * session (window end = last event + gap). */
  def sessions(events: DataFrame, gap: String = "10 minutes",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(events.withWatermark("ts", _))
    src
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(30,4)")).cast("double")
          .as("sum_value"))
      .select(col("w.start").as("w_start"), col("w.end").as("w_end"),
        col("user_id"), col("n"), col("sum_value"))
  }
}
