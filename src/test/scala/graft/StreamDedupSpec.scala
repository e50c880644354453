package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamDedup

/** `dropDuplicatesWithinWatermark`-based identity dedup
  * ([[StreamDedup.exactlyOnce]]): redelivered events suppress across
  * micro-batch boundaries, and the key state EVICTS once the watermark
  * passes (the bound that makes the operator viable at 100 TB — plain
  * streaming dropDuplicates retains every key forever). */
class StreamDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2026-11-01 00:00:00").getTime
  private def ev(id: Long, offSec: Long) =
    FnEv(id, id, new Timestamp(t0 + offSec * 1000L), "view")

  test("cross-batch redeliveries emit exactly once; state evicts past the watermark") {
    val in = MemoryStream[FnEv](spark)
    val out = StreamDedup.exactlyOnce(
      in.toDF().withColumnRenamed("user_id", "key"), "key",
      watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup_sink")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: three events, one in-batch duplicate
      in.addData(ev(1, 0), ev(2, 30), ev(2, 30), ev(3, 60))
      q.processAllAvailable()
      // batch 2: redeliveries of 1 and 3 (within the watermark) + a new key
      in.addData(ev(1, 0), ev(3, 60), ev(4, 90))
      q.processAllAvailable()
      val emitted = spark.table("sdedup_sink").select("key")
        .as[Long].collect().toSeq
      assert(emitted.sorted === Seq(1L, 2L, 3L, 4L),
        "each key must emit exactly once across batches")
      val stateFull = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateFull >= 4, s"all live keys hold state, got $stateFull")
      // push the watermark far past every key's event time + delay:
      // their dedup state must evict (the unbounded-state contrast)
      in.addData(ev(99, 7200))
      q.processAllAvailable()
      in.addData(ev(98, 7260))
      q.processAllAvailable()
      val stateAfter = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateAfter < stateFull,
        s"watermark must evict expired dedup state ($stateFull -> $stateAfter)")
    } finally q.stop()
  }
}
