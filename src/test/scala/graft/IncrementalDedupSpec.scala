package graft

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.Dedup
import graft.streaming.IncrementalDedup

/** The streaming incremental-dedup pipeline (r6 verdict #5): signature
  * store seeded from the corpus, new docs streamed in daily files,
  * accepted signatures appended back, checkpoint-restart pinned the
  * same way as the JDBC sink — drain half the log, stop, restart on
  * the same checkpoint over new files, converge exactly. */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** One single-file "day" of crawled docs with a strictly increasing
    * mtime — the file source orders by (mtime, path), and the r6 CDC
    * find showed equal mtimes let it reorder epochs. */
  private def writeDayFile(df: DataFrame, docsDir: String, i: Int): Unit = {
    val stage = tmp("incdedup-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(docsDir, f"day$i%03d.parquet")
    Files.move(part.toPath, dst.toPath, StandardCopyOption.REPLACE_EXISTING)
    assert(dst.setLastModified(1700000000000L + i * 60000L))
  }

  test("streaming incremental dedup: restart converges to the batch answer; accepted sigs screen later batches") {
    val docs = Tables(spark, sf, "documents")
    // the ml_dedup_increment split: corpus = 90%, increment = the
    // doc_id % 10 == 0 docs, same 0.5 estimate threshold
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val increment = docs.filter(col("doc_id") % 10 === 0)
      .orderBy("doc_id").collect()
    val incDf = (rows: Seq[org.apache.spark.sql.Row]) =>
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), IncrementalDedup.DocSchema)
    // four "days": 3 slices of the real increment, then a day
    // containing a VERBATIM COPY (new doc_id) of a day-1 doc — its only
    // near-dup is an ACCEPTED increment doc, so rejecting it proves the
    // append-back path screens against accepted docs, not just the
    // original corpus
    val slices = increment.grouped((increment.length + 2) / 3).toSeq
    assert(slices.length === 3)
    val corpusSigs = Dedup.minhashWide(corpus).localCheckpoint(true)
    // the copy's source must be a doc day 1 will ACCEPT (one that
    // matches the corpus gets rejected, and its copy would then match
    // the corpus too, proving nothing about the append-back path) —
    // precompute day 1's screen to pick one
    val day1Rejected = Dedup.dedupIncrement(
        Dedup.minhashWide(incDf(slices(0).toSeq)), corpusSigs, minEst = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val copySrc = slices(0).find(r => !day1Rejected(r.getLong(0))).get
    val copyRow = org.apache.spark.sql.Row(999999L, copySrc.getString(1),
      copySrc.getString(2), copySrc.getString(3), copySrc.getLong(4))

    val docsDir = tmp("incdedup-days")
    val sigDir = tmp("incdedup-sigs")
    val outDir = tmp("incdedup-out")
    val ckpt = tmp("incdedup-ckpt")
    IncrementalDedup.seedStore(corpusSigs, sigDir)

    def drain(): Unit = {
      val q = IncrementalDedup.start(spark, docsDir, sigDir, outDir, ckpt,
        minEst = 0.5, maxFilesPerTrigger = Some(1))
      try q.awaitTermination() finally q.stop()
    }
    // phase 1: two days, drain, "crash" (stop the query)
    writeDayFile(incDf(slices(0).toSeq), docsDir, 1)
    writeDayFile(incDf(slices(1).toSeq), docsDir, 2)
    drain()
    val phase1Accepted = IncrementalDedup.accepted(spark, outDir)
      .select("doc_id").as[Long].collect().toSet
    // phase 2: two more days (incl. the copy), restart on the SAME
    // checkpoint, drain the rest
    writeDayFile(incDf(slices(2).toSeq), docsDir, 3)
    writeDayFile(incDf(Seq(copyRow)), docsDir, 4)
    drain()

    val streamAccepted = IncrementalDedup.accepted(spark, outDir)
    val streamRejected = IncrementalDedup.rejected(spark, outDir)
    val acceptedIds = streamAccepted.select("doc_id").as[Long].collect().toSet
    val rejectedRows = streamRejected
      .select("doc_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect()
    // phase-1 results were not disturbed by the restart
    assert(phase1Accepted.subsetOf(acceptedIds))

    // ---- equals the batch answer on the same log ----
    // the batch reference: the same four batches applied sequentially
    // through the same screen in batch mode, fresh store
    val refSig = tmp("incdedup-ref-sigs"); val refOut = tmp("incdedup-ref-out")
    IncrementalDedup.seedStore(corpusSigs, refSig)
    val batches = Seq(incDf(slices(0).toSeq), incDf(slices(1).toSeq),
      incDf(slices(2).toSeq), incDf(Seq(copyRow)))
    batches.zipWithIndex.foreach { case (b, i) =>
      IncrementalDedup.applyBatch(b, refSig, refOut, i.toLong, minEst = 0.5)
    }
    val refAccepted = IncrementalDedup.accepted(spark, refOut)
      .select("doc_id").as[Long].collect().toSet
    assert(acceptedIds === refAccepted,
      "post-restart accepted set must equal the batch replay")

    // day-1 docs saw store == corpus exactly, so their rejections are
    // literally ml_dedup_increment's semantics on that slice
    val day1Ids = slices(0).map(_.getLong(0)).toSet
    assert(rejectedRows.map(_._1).toSet.intersect(day1Ids) === day1Rejected)

    // the injected copy was rejected BY ITS ACCEPTED TWIN (est 1.0):
    // identical text → identical signature → all 64 minhashes agree
    assert(acceptedIds.contains(copySrc.getLong(0)),
      "the copy's source doc must itself have been accepted")
    val copyVerdict = rejectedRows.find(_._1 == 999999L)
    assert(copyVerdict.isDefined, "verbatim copy must be rejected")
    assert(copyVerdict.get._2 === copySrc.getLong(0) &&
      copyVerdict.get._3 === 1.0,
      s"copy must match its accepted twin at est 1.0, got $copyVerdict")

    // ---- epoch replay is a no-op (the crash-mid-epoch contract) ----
    val storeBefore = IncrementalDedup.readStore(spark, sigDir)
      .orderBy("doc_id").collect().toSeq
    IncrementalDedup.applyBatch(batches(3), sigDir, outDir,
      batchId = 3L, minEst = 0.5) // same epoch id as the stream's last
    val storeAfter = IncrementalDedup.readStore(spark, sigDir)
      .orderBy("doc_id").collect().toSeq
    assert(storeAfter === storeBefore, "replaying an epoch must not grow the store")
    assert(IncrementalDedup.accepted(spark, outDir)
      .select("doc_id").as[Long].collect().toSet === acceptedIds)
  }

  test("replaying an epoch whose docs were ACCEPTED is a no-op (the self-match hazard)") {
    // the crash window the epoch-keyed write alone does not close: the
    // sig append landed, the checkpoint commit did not, and the epoch
    // replays. With the store read un-scoped the epoch's own accepted
    // signatures are visible, every doc self-matches at est 1.0, and
    // the replay flips accepted → rejected. visibleStore (batches
    // strictly before the id) restores the exact pre-epoch store.
    val docs = Tables(spark, sf, "documents")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val sigDir = tmp("incdedup-selfmatch-sigs")
    val outDir = tmp("incdedup-selfmatch-out")
    IncrementalDedup.seedStore(
      Dedup.minhashWide(corpus).localCheckpoint(true), sigDir)
    // an epoch guaranteed to have accepted docs
    val day = spark.createDataFrame(
      spark.sparkContext.parallelize(
        docs.filter(col("doc_id") % 20 === 0).collect().toSeq, 1),
      IncrementalDedup.DocSchema)
    IncrementalDedup.applyBatch(day, sigDir, outDir, 0L, minEst = 0.5)
    val acc0 = IncrementalDedup.accepted(spark, outDir)
      .select("doc_id").as[Long].collect().toSet
    val rej0 = IncrementalDedup.rejected(spark, outDir)
      .select("doc_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(acc0.nonEmpty, "the epoch must accept some docs")
    // replay: same batch, same id — the appended sigs are on disk
    IncrementalDedup.applyBatch(day, sigDir, outDir, 0L, minEst = 0.5)
    assert(IncrementalDedup.accepted(spark, outDir)
      .select("doc_id").as[Long].collect().toSet === acc0,
      "replay must not flip accepted docs to rejected")
    assert(IncrementalDedup.rejected(spark, outDir)
      .select("doc_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet === rej0,
      "replay must reproduce the identical rejections")
  }
}
