package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Per-batch streaming counters via [[StreamingQueryListener]] — the
  * `processedChanges++` running counters of the reference replicator
  * (replicator/main.go:107,123,223; SURVEY.md §2.4 A7) and the progress
  * side of its 5 s monitor loop (pubsub/main.go:128-209; §2.9 T8),
  * re-expressed on Structured Streaming's progress events.
  *
  * Register on `spark.streams.addListener`, read after (or during) the
  * run. Thread-safe: progress events arrive on the listener bus thread.
  */
final class BatchMetricsListener(queryName: Option[String] = None)
    extends StreamingQueryListener {

  final case class BatchStat(batchId: Long, inputRows: Long,
      triggerExecSec: Double)

  private val stats = ArrayBuffer[BatchStat]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    if (queryName.forall(_ == p.name)) {
      val execMs = Option(p.durationMs.get("triggerExecution"))
        .map(_.longValue).getOrElse(0L)
      synchronized {
        stats += BatchStat(p.batchId, p.numInputRows, execMs / 1000.0)
      }
    }
  }

  def batches: Seq[BatchStat] = synchronized(stats.toSeq)
  /** Total rows ingested across batches — the `processedChanges` analog. */
  def processedRows: Long = batches.map(_.inputRows).sum
  def worstBatchSec: Double =
    batches.foldLeft(0.0)((m, b) => math.max(m, b.triggerExecSec))
  def totalExecSec: Double = batches.map(_.triggerExecSec).sum
  /** Sustained apply throughput over non-empty batches. */
  def rowsPerSec: Double = {
    val busy = batches.filter(_.inputRows > 0)
    val t = busy.map(_.triggerExecSec).sum
    if (t == 0.0) 0.0 else busy.map(_.inputRows).sum / t
  }
}
