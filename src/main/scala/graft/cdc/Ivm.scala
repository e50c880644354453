package graft.cdc

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One retraction-stream element: a key's contribution entering
  * (`sign = +1`) or leaving (`sign = -1`) the view. */
final case class AggDelta(id: Int, sign: Int, score: Int)

/** Incremental view maintenance over the change stream — the
  * Flink-changelog / Materialize shape: fold each key's micro-batch to
  * its old→new transition (the exact replica semantics,
  * [[Replicate.foldEvent]]), and emit it as RETRACTION deltas — `-old,
  * +new` — so ANY distributive downstream aggregate (count, sum, and
  * their quotients) is maintained by pure addition, never by
  * rescanning the replica.
  *
  * This is what [[StatefulReplica.liveUpdates]] cannot give a
  * downstream aggregate: its updates carry only the NEW image, so a
  * consumer cannot subtract the old contribution. The delta stream
  * carries both sides of every transition; a no-op transition (key
  * folds back to its prior image) emits nothing.
  *
  * Scale: identical to the state-store replica — state is the live-key
  * image map, hash-partitioned by key; each micro-batch shuffles only
  * its own rows; the emitted deltas are at most 2 rows per touched
  * key per batch, so the maintained aggregate's input is
  * change-volume-sized, independent of replica size. Exactly the
  * 100 TB materialized-view story: the view never re-reads the
  * table. */
object Ivm {
  /** changes → retraction deltas (Update mode; pair with a downstream
    * additive fold — `foreachBatch` into the aggregate table, or a
    * driver-side accumulator in tests). */
  def deltas(changes: Dataset[PersonChange]): Dataset[AggDelta] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.id)
      .flatMapGroupsWithState[ReplicaState, AggDelta](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id, events, state: GroupState[ReplicaState]) =>
          val init = state.getOption.flatMap(_.row)
          val fin = events.toSeq.sortBy(_.lsn).foldLeft(init)(
            Replicate.foldEvent)
          if (fin.isDefined) state.update(ReplicaState(fin))
          else if (state.exists) state.remove()
          if (init == fin) Iterator.empty
          else
            (init.map(o => AggDelta(id, -1, o.score)) ++
              fin.map(n => AggDelta(id, +1, n.score))).iterator
      }
  }
}
