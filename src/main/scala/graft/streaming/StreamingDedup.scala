package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming-native member of the dedup
  * family (batch twins: `Dedup.exact` / `ml_dedup_exact`).
  *
  * A training-data ingest stream wants exactly this shape: admit the
  * FIRST occurrence of each content hash, drop re-crawls/duplicates
  * arriving later, and keep the dedup state BOUNDED — the reason this
  * uses `dropDuplicatesWithinWatermark`, not `dropDuplicates`: an
  * unwindowed streaming distinct would grow state forever on an
  * unbounded corpus. State per key lives until the watermark passes its
  * event time, so memory is O(docs within the watermark horizon), and
  * a duplicate arriving after expiry is re-admitted (at-least-once
  * dedup — the right trade for ingest; the batch pipeline's exact pass
  * catches stragglers).
  *
  * Scale: state is hash-partitioned by content hash across executors
  * (RocksDB-backed state store in production), updates are pure lookups
  * — no shuffle beyond the one keyed exchange every stateful operator
  * needs.
  */
object StreamingDedup {
  /** First-occurrence pass-through on a streaming doc frame with an
    * event-time column `ts`: one row per distinct `md5(text)` within
    * the watermark horizon. */
  def distinctDocs(docs: DataFrame, watermark: String = "1 hour")
      : DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
