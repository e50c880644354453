package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Streaming SCD Type-2 maintenance ([[graft.cdc.Scd2Replica]]):
  * closed versions emitted exactly once, equal to an independent naive
  * replay of the typed ops, across real micro-batch boundaries AND a
  * checkpoint restart (exactly-once via the file sink's metadata log).
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  private type Version =
    (Int, String, String, Int, java.sql.Timestamp, Long, Long)

  /** Independent replay (not via engine code): open-version map folded
    * in lsn order with the reference upsert semantics — created_at
    * carried from the prior open version on I-over-existing/U. */
  private def naiveClosed(ops: Seq[ChangeGen.Op]): Set[Version] = {
    val open = scala.collection.mutable
      .Map[Int, (String, String, Int, java.time.LocalDateTime, Long)]()
    val out = Set.newBuilder[Version]
    def closed(id: Int,
        v: (String, String, Int, java.time.LocalDateTime, Long),
        to: Long): Version =
      (id, v._1, v._2, v._3, java.sql.Timestamp.valueOf(v._4), v._5, to)
    ops.sortBy(_.lsn).foreach { op =>
      op.action match {
        case "I" | "U" =>
          open.get(op.id) match {
            case Some(prior) =>
              out += closed(op.id, prior, op.lsn)
              open(op.id) = (op.name, op.uid, op.score, prior._4, op.lsn)
            case None if op.action == "I" =>
              open(op.id) = (op.name, op.uid, op.score, op.createdAt, op.lsn)
            case None => // U on absent: reference no-op
          }
        case "D" =>
          open.remove(op.id).foreach(v => out += closed(op.id, v, op.lsn))
        case _ =>
      }
    }
    out.result()
  }

  private def drain(changeDir: String, outDir: String, ckpt: String): Unit = {
    val q = Scd2Replica.closedVersions(ChangeSource.readStream(spark, changeDir))
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  private def readVersions(outDir: String): Set[Version] =
    spark.read.parquet(outDir).collect().map { r =>
      (r.getAs[Int]("id"), r.getAs[String]("name"), r.getAs[String]("uid"),
        r.getAs[Int]("score"), r.getAs[java.sql.Timestamp]("created_at"),
        r.getAs[Long]("valid_from"), r.getAs[Long]("valid_to"))
    }.toSet

  test("closed versions equal the naive replay across micro-batches") {
    val ops = ChangeGen.ops(seed = 83L, n = 1200)
    val dir = tmp("scd2-log")
    ChangeGen.writeBatches(dir, ops, batches = 5)
    val out = tmp("scd2-out")
    drain(dir, out, tmp("scd2-ckpt"))
    val got = readVersions(out)
    val want = naiveClosed(ops)
    assert(got === want)
    // every version interval is well-formed and versions chain per key
    assert(got.forall { case (_, _, _, _, _, from, to) => from < to })
  }

  test("checkpoint restart mid-log emits each closed version exactly once") {
    val ops = ChangeGen.ops(seed = 89L, n = 1000)
    val dir = tmp("scd2r-log")
    val out = tmp("scd2r-out")
    val ckpt = tmp("scd2r-ckpt")
    ChangeGen.writeBatches(dir, ops.take(500), batches = 3)
    drain(dir, out, ckpt)
    val mid = readVersions(out)
    assert(mid === naiveClosed(ops.take(500)))
    // phase 2: the rest of the log lands, the SAME checkpoint resumes —
    // open state survives the restart, nothing re-emits
    ChangeGen.writeBatches(dir, ops.drop(500), batches = 3, startIndex = 3)
    drain(dir, out, ckpt)
    val all = spark.read.parquet(out).collect()
    assert(all.length === naiveClosed(ops).size) // no duplicate emissions
    assert(readVersions(out) === naiveClosed(ops))
  }
}
