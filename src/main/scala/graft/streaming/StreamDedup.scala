package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exactly-once stream deduplication on a key, via Spark 4's
  * `dropDuplicatesWithinWatermark` — the built-in for the at-least-once
  * ingest edge (a broker redelivery, an idempotent producer retry, an
  * overlapping backfill) where the SAME record can arrive twice across
  * micro-batches.
  *
  * Contrast with the library's other dedup surfaces: [[graft.ml.Dedup]]
  * deduplicates CONTENT (different doc_ids, same/near-same text);
  * [[graft.cdc.Replicate]]'s idempotent merge deduplicates by
  * LAST-WRITER-WINS fold (a redelivered change re-applies to the same
  * image). This operator suppresses IDENTITY duplicates — same key,
  * same event — before any of that runs, emitting each key exactly once.
  *
  * Scale/state story: plain `dropDuplicates` on a stream keeps EVERY
  * seen key forever (unbounded state); the within-watermark variant
  * evicts a key's state once the watermark passes its event time plus
  * the delay — state is bounded by keys inside the watermark horizon,
  * the same bound the stream-stream join carries. A duplicate arriving
  * later than the watermark delay can re-emit (the documented contract);
  * size the delay to the source's maximum redelivery lag. */
object StreamDedup {
  /** `events` must carry `ts` (event time) and the key column. Emits
    * the first arrival of each key within the watermark horizon,
    * exactly once. */
  def exactlyOnce(events: DataFrame, key: String,
      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(key)
}
