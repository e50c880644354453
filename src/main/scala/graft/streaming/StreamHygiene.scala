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

  /** Best-effort recursive removal of a per-run temp dir. */
  def deleteRec(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(path))
  }
}
