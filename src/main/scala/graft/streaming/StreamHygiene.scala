package graft.streaming

/** Post-harness state hygiene for self-contained streaming runs.
  *
  * Spark caches loaded state-store providers per (checkpoint,
  * operator, partition) for the lifetime of the executor, so a stream
  * whose checkpoint was a TEMP directory leaves providers (heap +
  * maintenance work) behind forever after the dir is deleted. One such
  * run is noise; a growing family of stream-harness rows measurably
  * dragged every later query in a full bench pass (~20% on the
  * common-query sum — the round-9 "harness rows poison the run"
  * signature, re-surfaced at four more rows). Each harness therefore
  * unloads the provider cache as part of deleting its temp dirs: the
  * providers can never be reused (their checkpoint is gone), so the
  * unload is pure cleanup, not a cache policy.
  */
object StreamHygiene {
  /** Unload every cached state-store provider; the next stream (or
    * the next harness row) reloads its own providers from its own
    * checkpoint as usual. The maintenance TIMER THREAD deliberately
    * keeps running — `StateStore.unloadAll()` only unloads providers
    * (`stop()` would also kill the thread, but it's one idle timer
    * with nothing to maintain once the providers are gone, and Spark
    * restarts it lazily anyway); the leak being fixed is provider heap
    * + per-provider maintenance work, and that is fully handled.
    *
    * SCOPE: this unloads the WHOLE JVM's provider cache, not just the
    * finished run's — correct for the declared rows (Verify/Bench run
    * streams sequentially; any provider alive at this point is dead
    * weight), but a host embedding these rows NEXT TO a live stateful
    * stream would force that stream to reload its state from its
    * checkpoint on its next trigger. Per-provider unload needs the
    * provider ids, which Spark does not expose publicly; the
    * sequential assumption is the deliberate trade. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.graftbridge.StreamBridge.unloadStateStores()

  /** The shared harness teardown: drop the provider cache, then
    * remove the run's temp dirs — one helper so a future harness row
    * cannot take the delete half without the unload half.
    *
    * GUARD (VERDICT r14 #9, softened per ADVICE r15 #3): the JVM-wide
    * unload is only safe under the sequential-streams assumption
    * documented above — Verify/Bench run one harness row at a time, so
    * no provider alive at teardown belongs to a live stream. The guard
    * WARNS LOUDLY and skips only the unload instead of throwing: every
    * call site sits in a `finally` block, so an exception here would
    * REPLACE the stream's original failure (the diagnosis that
    * matters) with the guard's own — and the hazard being guarded
    * (a live stream forced to reload state) costs latency, not
    * correctness, so a skipped unload + warning is the right trade.
    * Liveness is checked on the OWNING session passed by the caller
    * (the session that started the run's streams), not the ambient
    * active/default session, which in a multi-session host is not
    * necessarily the one that owns them. */
  def cleanupRun(dirs: Seq[String],
      owner: Option[org.apache.spark.sql.SparkSession] = None): Unit = {
    val live = owner
      .orElse(org.apache.spark.sql.SparkSession.getActiveSession)
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.streams.active.toSeq).getOrElse(Seq.empty)
    if (live.nonEmpty)
      System.err.println(
        s"[graft] cleanupRun: ${live.size} active stream(s) " +
          s"(${live.map(_.name).mkString(", ")}) — SKIPPING the JVM-wide " +
          "state-store unload (it assumes sequential harness rows; a live " +
          "stream would be forced to reload its state). Temp dirs are " +
          "still removed.")
    else unloadStateStores()
    dirs.foreach(deleteRec)
  }

  /** Session conf for the span of ONE maintain stream (r16
    * optimization round, guide §2.2/§2.4): pins
    * `spark.sql.shuffle.partitions` to the maintenance width for the
    * WHOLE stream run — not just across `start()` — and disables AQE
    * for the span.
    *
    * Why the wider span: the width used to be restored immediately
    * after `start()` (it is burned into the stream's checkpoint at
    * that point), but every foreachBatch BODY query — the touched-
    * bucket collects, hot scans, split training aggregates — plans
    * against the OUTER session and so ran at the corpus-sized session
    * width (32 locally) with AQE re-planning each tiny exchange. A
    * maintain epoch is change-volume-sized by construction, so the
    * maintenance width is the right width for every body query too;
    * job-level profiling of the r16 shared pass measured 684 jobs
    * with 35% of wall in between-job driver gap, most of it per-query
    * planning that this span removes. AQE is off for the same reason:
    * the body plans are statically shaped (explicit repartition-by-key
    * widths, explicit broadcast hints, partition-pruned reads), so
    * adaptive re-planning buys nothing and costs a planning round per
    * exchange per query. Maintains run one at a time (the sequential-
    * harness assumption documented on [[cleanupRun]]), so holding the
    * session conf for the span is safe; both keys are restored in a
    * `finally`. At deployment scale the width is the operator's
    * maintenance-shuffle parameter (MicroShuffle here), not a local
    * tuning constant.
    *
    * REENTRANT per session (ref-counted): the shared maintain pass
    * overlaps independent maintains from a small thread pool (guide
    * §2.6 — the pass is dominated by per-job driver gap, which one
    * maintain's jobs can fill while another plans/commits), so two
    * spans on the SAME session may nest in time. Only the first enter
    * captures the restore values and only the last exit restores —
    * naive capture/restore would have the second span capture the
    * first's width-8 as "previous" and leave the session at width 8
    * for everything after the pass. Every maintain uses the same
    * MicroShuffle width (asserted), so first-enter-wins is exact, not
    * an approximation. */
  private final class Span(val width: Int, val prevWidth: String,
      val prevAqe: String) { var depth = 0 }
  private val spans =
    new java.util.IdentityHashMap[org.apache.spark.sql.SparkSession, Span]()

  def withMaintainConf[T](spark: org.apache.spark.sql.SparkSession,
      width: Int)(body: => T): T = {
    spans.synchronized {
      val s = Option(spans.get(spark)).getOrElse {
        val fresh = new Span(width,
          spark.conf.get("spark.sql.shuffle.partitions"),
          spark.conf.get("spark.sql.adaptive.enabled", "true"))
        spark.conf.set("spark.sql.shuffle.partitions", width)
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spans.put(spark, fresh)
        fresh
      }
      require(s.width == width,
        s"nested maintain spans with different widths (${s.width} vs " +
          s"$width) on one session — the maintenance width must agree")
      s.depth += 1
    }
    try body
    finally spans.synchronized {
      val s = spans.get(spark)
      s.depth -= 1
      if (s.depth == 0) {
        spans.remove(spark)
        spark.conf.set("spark.sql.shuffle.partitions", s.prevWidth)
        spark.conf.set("spark.sql.adaptive.enabled", s.prevAqe)
      }
    }
  }

  /** Unpersist the RDD behind a `localCheckpoint(true)`-produced frame
    * (its analyzed plan is a `LogicalRDD` over the checkpointed RDD).
    * The maintain epoch bodies checkpoint several change-volume-sized
    * frames PER EPOCH; without an explicit release those blocks sit in
    * the block manager until the driver GCs and the ContextCleaner
    * reaps them — which on a large quiet heap can be never, so a
    * multi-stream bench accumulates dead blocks (and the GC pressure
    * they cause) across its whole run (r16 optimization round, guide
    * §5: maintains measured ~70% slower inside the 8-family pass than
    * isolated). Callers release ONLY frames they own that cannot
    * escape (checkpointed locals, dead once the epoch's writes commit)
    * — NEVER a frame handed out to a memo ([[graft.ml.Dedup]]'s cache
    * comment: an unpersisted localCheckpoint cannot be recomputed).
    * Best-effort: anything unexpected leaves the blocks to the
    * ContextCleaner, exactly as before. */
  def releaseBlocks(dfs: org.apache.spark.sql.DataFrame*): Unit =
    dfs.foreach { df =>
      try df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      } catch { case _: Throwable => () }
    }

  /** Best-effort recursive removal of a per-run temp dir. */
  def deleteRec(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(path))
  }
}
