package graft

import java.nio.file.Files

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Delta-join view maintenance ([[Ivm.applyJoinBatch]], r10 verdict
  * #2): the maintained `person ⋈ account` view must equal a full
  * recompute at EVERY epoch prefix (the bilinear identity is exact,
  * not eventually-consistent), re-applying an epoch must be a no-op
  * (dynamic epoch-partition overwrite — the checkpoint-replay
  * contract), and the whole pipeline must survive a checkpointed
  * restart of the streaming query. */
class IvmJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val pSpec = MtTestSpecs.person
  private val aSpec = MtTestSpecs.account

  /** Expected view from a naive in-memory replay of each table's op
    * prefix: the reference fold per table, equijoined on id. */
  private def recompute(pOps: Seq[ChangeGen.Op], aOps: Seq[ChangeGen.Op])
      : Set[(Int, String, String, Int, String, Int)] = {
    val p = ChangeGen.replay(pOps)
    val a = ChangeGen.replay(aOps)
    (for {
      (id, pr) <- p
      ar <- a.get(id)
    } yield (id, pr.name, pr.uid, pr.score, ar.name, ar.score)).toSet
  }

  private def viewRows(viewDir: String)
      : Set[(Int, String, String, Int, String, Int)] =
    Ivm.joinView(spark, viewDir, pSpec, aSpec)
      .select("id", "name", "uid", "score", "owner", "balance")
      .as[(Int, String, String, Int, String, Int)].collect().toSet

  test("empty-log joinView carries the specs' real value types (one schema either way)") {
    val emptyDir =
      Files.createTempDirectory("ivmj-empty").toString + "/log"
    val empty = Ivm.joinView(spark, emptyDir, pSpec, aSpec)
    assert(empty.count() === 0L)
    // schema must match what a landed epoch produces: int score/balance,
    // not the r11 all-StringType default (ADVICE r11)
    val types = empty.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("score") === org.apache.spark.sql.types.IntegerType)
    assert(types("balance") === org.apache.spark.sql.types.IntegerType)
    assert(types("id") === pSpec.rowSchema(pSpec.keyCol).dataType)
  }

  test("maintained join view equals full recompute at every epoch prefix; double-apply is a no-op") {
    val (pOps, aOps) = ChangeGen.mtOps(811L, nPerson = 400, nAccount = 300)
    val stateDir =
      Files.createTempDirectory("ivmj-state").toString + "/log"
    val viewDir = Files.createTempDirectory("ivmj-view").toString + "/log"
    val ckpt = Files.createTempDirectory("ivmj-ckpt").toString
    // merge both tables' ops by lsn (unique across tables — disjoint
    // parity) and split into 5 waves; render each wave's lines with
    // the same envelope renderers the file log uses
    val merged: Seq[(Long, String, Boolean)] =
      (pOps.map(o => (o.lsn, ChangeGen.toJsonLine(o), true)) ++
        aOps.map(o => (o.lsn, ChangeGen.toAccountJsonLine(o), false)))
        .sortBy(_._1)
    val per = ChangeGen.chunkSize(merged.size, 5)
    val waves = merged.grouped(per).toSeq
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[String](spark)
    val q = Ivm.mtDeltas(MultiTable.parseAll(in.toDF(), Seq(pSpec, aSpec)))
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
        batch.persist()
        try {
          Ivm.applyJoinBatch(spark, batch, bid, stateDir, viewDir,
            pSpec, aSpec)
          // checkpoint-replay contract: re-applying the SAME epoch
          // must leave both logs (and thus the view) unchanged
          Ivm.applyJoinBatch(spark, batch, bid, stateDir, viewDir,
            pSpec, aSpec)
        } finally batch.unpersist()
      }
      .start()
    try {
      var pSeen = Seq.empty[ChangeGen.Op]
      var aSeen = Seq.empty[ChangeGen.Op]
      val lsnIsPerson =
        (pOps.map(_.lsn -> true) ++ aOps.map(_.lsn -> false)).toMap
      waves.zipWithIndex.foreach { case (wave, i) =>
        in.addData(wave.map(_._2))
        q.processAllAvailable()
        pSeen = pSeen ++ pOps.filter(o =>
          wave.exists(w => w._1 == o.lsn && w._3))
        aSeen = aSeen ++ aOps.filter(o =>
          wave.exists(w => w._1 == o.lsn && !w._3))
        assert(lsnIsPerson.size === pOps.size + aOps.size,
          "lsn collision across tables would break the wave split")
        assert(viewRows(viewDir) === recompute(pSeen, aSeen),
          s"prefix mismatch after wave $i")
      }
      assert(viewRows(viewDir).nonEmpty,
        "fixture must produce a non-empty join view")
    } finally q.stop()
  }

  test("join maintenance survives a checkpointed restart of the streaming query") {
    val (pOps, aOps) = ChangeGen.mtOps(823L, nPerson = 300, nAccount = 240)
    val changeDir = Files.createTempDirectory("ivmj-rlog").toString
    val stateDir =
      Files.createTempDirectory("ivmj-rstate").toString + "/log"
    val viewDir = Files.createTempDirectory("ivmj-rview").toString + "/log"
    val ckpt = Files.createTempDirectory("ivmj-rckpt").toString
    // phase 1: first three epoch files, run to completion
    val merged: Seq[(Long, Boolean)] =
      (pOps.map(_.lsn -> true) ++ aOps.map(_.lsn -> false)).sortBy(_._1)
    val per = ChangeGen.chunkSize(merged.size, 5)
    val prefixLsns = merged.take(3 * per).map(_._1).toSet
    ChangeGen.writeMtBatches(changeDir,
      pOps.filter(o => prefixLsns.contains(o.lsn)),
      aOps.filter(o => prefixLsns.contains(o.lsn)), batches = 3)
    def run(): Unit = {
      val q = Ivm.mtDeltas(MultiTable.parseAll(
          ChangeSource.rawLines(spark, changeDir, Some(1)),
          Seq(pSpec, aSpec)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
          Ivm.applyJoinBatch(spark, batch, bid, stateDir, viewDir,
            pSpec, aSpec)
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    run()
    assert(viewRows(viewDir) === recompute(
      pOps.filter(o => prefixLsns.contains(o.lsn)),
      aOps.filter(o => prefixLsns.contains(o.lsn))))
    // phase 2: the remaining ops land as NEW epoch files; a fresh
    // query on the SAME checkpoint resumes — TWS state restored, only
    // the new epochs applied — and converges to the full recompute
    ChangeGen.writeMtBatches(changeDir,
      pOps.filterNot(o => prefixLsns.contains(o.lsn)),
      aOps.filterNot(o => prefixLsns.contains(o.lsn)),
      batches = 2, startIndex = 3)
    run()
    assert(viewRows(viewDir) === recompute(pOps, aOps))
    assert(viewRows(viewDir).nonEmpty)
  }
}
