package graft.cdc

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import graft.sql.Declared

/** CDC dataflow exposed through the driver's query contract. Not
  * SQL-expressible over the fixture tables (it runs a full generate →
  * stream → merge pipeline), so these are rows-only checks; the DuckDB-
  * grade semantics are asserted in CdcSpec against a naive replay oracle.
  */
object CdcQueries {
  /** End-to-end replicate: deterministic change log (seed=42) → snapshot
    * + streaming apply with the parity publication filter → final replica
    * (pubsub pipeline, pubsub/main.go:77-210). Returns the replica sorted
    * by id; the sfDir argument is unused (the CDC source is the generated
    * wal2json log, not the TPC-H fixtures). */
  private val replicateE2e = Declared(
    "cdc_replicate_e2e",
    (s: SparkSession, _: String) => {
      val ops = ChangeGen.ops(seed = 42L, n = 2000)
      val (snapOps, streamOps) = ops.splitAt(800)
      val changeDir = Files.createTempDirectory("graft-cdc-log").toString
      val replica = Files.createTempDirectory("graft-cdc-replica").toString
      val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString
      import s.implicits._
      val snapState = ChangeGen.replay(snapOps).values.filter(_.score % 2 == 0)
      Replicate.snapshot(s, snapState.toSeq.toDS(), replica)
      ChangeGen.writeBatches(changeDir, streamOps, batches = 5)
      val q = Replicate.start(s, changeDir, replica, ckpt,
        rowFilter = Some(Replicate.parityPred),
        trigger = Trigger.ProcessingTime("1 second"))
      try q.processAllAvailable() finally q.stop()
      Replicate.readReplica(s, replica).orderBy("id").toDF()
    })

  /** Batch parse of a generated wal2json v2 log: the S2→X11→X13→F2 slice
    * (slot scan, JSON decode, column pivot, table routing) without the
    * sink. */
  private val parseChangelog = Declared(
    "cdc_parse_changelog",
    (s: SparkSession, _: String) => {
      val changeDir = Files.createTempDirectory("graft-cdc-parse").toString
      ChangeGen.writeBatches(changeDir, ChangeGen.ops(seed = 7L, n = 1000),
        batches = 4)
      ChangeSource.readBatch(s, changeDir).orderBy("lsn").toDF()
    })

  val all: Seq[Declared] = Seq(replicateE2e, parseChangelog)
}
