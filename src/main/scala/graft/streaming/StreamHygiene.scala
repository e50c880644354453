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
  /** Unload every cached state-store provider and stop the
    * maintenance task; the next stream (or the next harness row)
    * reloads its own providers from its own checkpoint as usual. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.graftbridge.StreamBridge.unloadStateStores()
}
