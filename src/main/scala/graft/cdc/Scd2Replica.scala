package graft.cdc

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The open (current) SCD2 version of one key: the live row plus the
  * lsn that opened it. */
final case class Scd2State(row: PersonRow, validFrom: Long)

/** One CLOSED history version — emitted exactly once, when the next
  * change on its key arrives. */
final case class Scd2Closed(id: Int, name: String, uid: String,
    score: Int, created_at: java.sql.Timestamp,
    valid_from: Long, valid_to: Long)

/** Streaming SCD Type-2 maintenance: the continuous form of
  * [[CdcQueries]]' `cdc_scd2_history` batch query. Where the batch form
  * needs the WHOLE changelog to window over (each version's close lsn is
  * the next event on its key), the streaming form keeps only the OPEN
  * version per key as managed state and emits a version downstream the
  * moment the next change closes it — so history can land append-only
  * in a warehouse while the change stream is still flowing.
  *
  * Per-key semantics reuse [[Replicate.foldEvent]] verbatim (created_at
  * preserved on I-over-existing/U, U on an absent key a no-op, D closes
  * without opening), so the current rows implied by this operator are
  * always exactly the [[StatefulReplica]] replica.
  *
  * Scale: state is one row per LIVE key (the same bound as the replica
  * state store — dead keys drop their state), partitioned by key hash;
  * each micro-batch shuffles only its own rows; the emitted stream is
  * append-only and never rewritten. At 100 TB of history the closed
  * versions are a partitioned parquet append, not state.
  */
object Scd2Replica {
  /** changes → stream of closed versions (Append mode). Within a batch
    * a key's events fold in lsn order; intermediate versions close and
    * emit in the same batch. */
  def closedVersions(changes: Dataset[PersonChange]): Dataset[Scd2Closed] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, events, state: GroupState[Scd2State]) =>
          var open = state.getOption
          val out = Seq.newBuilder[Scd2Closed]
          events.toSeq.sortBy(_.lsn).foreach { ev =>
            val next = Replicate.foldEvent(open.map(_.row), ev)
            (open, next) match {
              case (Some(o), Some(row)) =>
                // I-over-existing or U: close the open version, open the
                // folded image at this event's lsn
                out += toClosed(o, ev.lsn)
                open = Some(Scd2State(row, ev.lsn))
              case (Some(o), None) => // D: close without reopening
                out += toClosed(o, ev.lsn)
                open = None
              case (None, Some(row)) => // fresh I (U on absent no-ops)
                open = Some(Scd2State(row, ev.lsn))
              case (None, None) => // U/D on absent: no-op
            }
          }
          open match {
            case Some(o) => state.update(o)
            case None => if (state.exists) state.remove()
          }
          out.result().iterator
      }
  }

  private def toClosed(o: Scd2State, closeLsn: Long): Scd2Closed =
    Scd2Closed(o.row.id, o.row.name, o.row.uid, o.row.score,
      o.row.created_at, o.validFrom, closeLsn)
}
