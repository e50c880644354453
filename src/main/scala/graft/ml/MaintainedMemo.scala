package graft.ml

/** Session-scoped memo for the maintained-index family's
  * stream-and-maintain passes (VERDICT r14 #5 — the `lsh_shared_pass`
  * / `ann_model_shared_pass` precedent applied to the CDC-e2e rows).
  *
  * Each family row (`ml_ann_cdc_index`, `ml_bm25_cdc_index`,
  * `ml_dedup_cdc_index`, `ml_hybrid_cdc_serve`) drives a real
  * checkpointed multi-epoch change stream to build its serving
  * artifact, then serves off it. The stream-and-maintain phase is the
  * row's fixture — deterministic per (session, ops-dump path) — so in
  * one Verify/Bench JVM re-running it per invocation (Bench's warm +
  * timed passes!) measures trigger/commit machinery twice and buys
  * nothing. The memo caches the maintained ARTIFACT HANDLE (paths on
  * disk + bounded model state); invocation N>1 goes straight to the
  * serve — the operationally honest split, since a production serving
  * job reads an index a standing maintainer keeps warm, it does not
  * rebuild the index per query.
  *
  * Artifact lifetime: a memoized pass's dirs must outlive the call, so
  * they are swept by a JVM shutdown hook ([[keepUntilExit]]) instead
  * of per-call deletion; the per-stream change-log and checkpoint temp
  * dirs are still removed (with the state-store provider unload) as
  * soon as the stream finishes. [[clearCache]] only FORGETS entries
  * (the bench's reset seam, so the timed shared line pays the real
  * cost); forgotten dirs stay on disk until exit — a rebuild writes
  * fresh dirs, never in place — which at fixture scale is a few MB.
  *
  * Builds are SERIALIZED per key (ADVICE r15 #4): unlike the
  * [[Dedup]] memo's pure-value entries, these builds write to FIXED
  * fixture paths (the ops dump, the centroid dumps — SaveMode
  * .Overwrite on shared locations), so two threads racing a cold key
  * would not merely duplicate idle work, they would interleave
  * overwrites of the SAME artifact mid-build. `computeIfAbsent`
  * installs a lazy holder (cheap, inside the map's bin lock); forcing
  * the holder outside the lock runs the build exactly once, with the
  * loser blocking on the holder's initializer instead of re-writing
  * the paths. A build that THROWS leaves its holder retryable (a lazy
  * initializer failure is not cached), matching the old behavior
  * where a failed build memoized nothing.
  */
object MaintainedMemo {
  /** One-shot build cell: lazy forces at most one evaluation, with
    * competing threads blocking rather than double-building. */
  private final class Holder(build: () => AnyRef) {
    lazy val value: AnyRef = build()
  }
  private val memo =
    new java.util.concurrent.ConcurrentHashMap[AnyRef, Holder]()
  private val exitDirs = scala.collection.mutable.ArrayBuffer.empty[String]
  private lazy val hookOnce: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.synchronized(exitDirs.toList)
        .foreach(graft.streaming.StreamHygiene.deleteRec)))
    ()
  }

  /** Memoize one stream-and-maintain pass. Key by (session, tag,
    * fixture path) — the session reference itself, so two sessions
    * over the same fixture never share a handle bound to the other's
    * state. */
  def maintained[T <: AnyRef](key: AnyRef)(build: => T): T =
    memo.computeIfAbsent(key, _ => new Holder(() => build))
      .value.asInstanceOf[T]

  /** Register an artifact dir for the JVM-exit sweep and return it. */
  def keepUntilExit(dir: String): String = {
    hookOnce
    exitDirs.synchronized { exitDirs += dir }
    dir
  }

  /** Forget handles (artifacts stay on disk until JVM exit; the next
    * build writes fresh dirs). With `tags`, forgets only entries whose
    * key carries one of the given tag strings — the bench's reset
    * seam: it drops exactly the CDC stream-and-maintain entries its
    * timed `cdc_maint_shared_pass` line repays, while BUILD-memo
    * entries (the cell-split and hot-split serving artifacts) stay
    * warm across the warm→timed passes, consistent with the
    * index-build precedent ("the write is the building row's point;
    * the others serve from the artifact"). No tags = forget
    * everything. */
  def clearCache(tags: String*): Unit =
    if (tags.isEmpty) memo.clear()
    else {
      val t = tags.toSet
      memo.keySet().removeIf {
        case p: Product if p.productArity >= 2 =>
          p.productElement(1) match {
            case s: String => t(s)
            case _ => false
          }
        case _ => false
      }
    }
}
