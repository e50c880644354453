package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ml.Dedup

/** Streaming incremental near-dup screening — the 100 TB daily-crawl
  * shape as ONE continuous pipeline (r6 verdict #5): a persistent
  * MinHash signature store seeded from the staged corpus
  * ([[graft.ml.Dedup.pipeline]]'s `signatures` stage), a `readStream`
  * of newly crawled documents, and per micro-batch the L41 screen
  * ([[graft.ml.Dedup.dedupIncrement]]): band the increment, probe the
  * store, reject near-dups, APPEND the accepted signatures back — so
  * tomorrow's batch dedups against today's accepted docs, not just the
  * original corpus.
  *
  * ## Exactly-once without a transactional sink
  *
  * Structured Streaming may replay the current epoch after a crash, so
  * TWO rules compose: every write is EPOCH-KEYED (batch `id` writes,
  * and on replay overwrites, exactly `batch=<id>` dirs in the
  * signature store and the accepted/rejected outputs), and every READ
  * is EPOCH-SCOPED ([[visibleStore]]: only batches strictly before
  * `id`). The write rule alone is NOT enough — a crash after the sig
  * append but before the checkpoint commit leaves the epoch's own
  * accepted signatures on disk, and a full-glob re-read would
  * self-match every one of them at est 1.0, flipping accepted to
  * rejected on replay. With both rules the replayed screen sees the
  * exact pre-epoch store, recomputes bit-identically, and the
  * overwrite converges (the [[graft.cdc.Replicate]] delta-commit
  * idempotency argument, applied to a signature store).
  *
  * ## Scale shape
  *
  * Per trigger: the increment's signatures and band keys BROADCAST
  * (a day's crawl ≪ the corpus); the store is scanned column-pruned,
  * NEVER shuffled — [[graft.ml.Dedup.dedupIncrement]]'s contract. The
  * store scan is O(corpus signatures) per trigger, which is the right
  * trade at a daily cadence; a sub-hour cadence would bucket the store
  * by band-key range so the probe prunes partitions instead.
  */
object IncrementalDedup {
  /** The `documents`-table schema, declared for the file stream (a
    * streaming parquet source cannot infer). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private val SigSchema: StructType = StructType(
    StructField("doc_id", LongType) +:
      (0 until Dedup.NumHashes).map(h => StructField(s"m$h", LongType)))

  /** Seed the signature store from already-computed corpus signatures
    * (e.g. `Dedup.pipeline(...)`'s staged `signatures` output). Epoch
    * -1: before every streamed batch. */
  def seedStore(corpusSigs: DataFrame, sigDir: String): Unit =
    corpusSigs.select(SigSchema.fieldNames.map(col).toSeq: _*)
      .write.mode(SaveMode.Overwrite).parquet(s"$sigDir/batch=-1")

  /** The signature store as one frame: corpus seed ∪ accepted appends.
    * The `batch=*` glob reads each epoch dir as a root (no partition
    * column), with the schema declared — no footer inference over what
    * grows to many epochs. */
  def readStore(spark: SparkSession, sigDir: String): DataFrame =
    spark.read.schema(SigSchema).parquet(s"$sigDir/batch=*")

  /** The store AS EPOCH `batchId` MUST SEE IT: only batches strictly
    * before it. Reading the full glob inside [[applyBatch]] is the
    * replay hazard the epoch-keyed write alone does not close: a crash
    * AFTER the sig append but BEFORE the checkpoint commit replays the
    * epoch with its own accepted signatures visible, every accepted doc
    * self-matches at est 1.0, and the "idempotent" rewrite flips them
    * all to rejected. Excluding `batch >= batchId` restores the exact
    * pre-epoch store, so the replayed screen is bit-identical
    * (spec-pinned: the accepted-epoch replay test). */
  def visibleStore(spark: SparkSession, sigDir: String,
      batchId: Long): DataFrame = {
    val dirs = Option(new java.io.File(sigDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .filter(_.getName.stripPrefix("batch=").toLong < batchId)
      .map(_.getAbsolutePath).toSeq.sorted
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], SigSchema)
    else spark.read.schema(SigSchema).parquet(dirs: _*)
  }

  /** All accepted documents so far (original rows). */
  def accepted(spark: SparkSession, outDir: String): DataFrame =
    spark.read.schema(DocSchema).parquet(s"$outDir/accepted/batch=*")

  /** All rejected docs so far: (doc_id, matched_id, est_jaccard). */
  def rejected(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/rejected/batch=*")

  /** Screen ONE batch of new docs against the store and append the
    * survivors — the foreachBatch body, callable directly for batch
    * backfills. Idempotent per `batchId` (see the object doc). */
  def applyBatch(batch: DataFrame, sigDir: String, outDir: String,
      batchId: Long, minEst: Double = 0.7): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    // reused three times (probe, sig append, accept anti-join) — cut
    // lineage once; O(batch) rows of 64 longs
    val incSigs = Dedup.minhashWide(batch).localCheckpoint(true)
    // screen against the store AS THIS EPOCH SEES IT (batches < id) —
    // never the full glob, which on replay would include this epoch's
    // own pre-crash appends (see visibleStore)
    val matched = Dedup.dedupIncrement(incSigs,
      visibleStore(spark, sigDir, batchId),
      minEst).localCheckpoint(true) // tiny: ≤ one row per new doc
    val matchedIds = broadcast(matched.select("doc_id"))
    incSigs.join(matchedIds, Seq("doc_id"), "left_anti")
      .write.mode(SaveMode.Overwrite).parquet(s"$sigDir/batch=$batchId")
    batch.join(matchedIds, Seq("doc_id"), "left_anti")
      .select(DocSchema.fieldNames.map(col).toSeq: _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/accepted/batch=$batchId")
    matched.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/rejected/batch=$batchId")
    // trigger-local checkpoints are dead once the three writes committed
    StreamHygiene.releaseBlocks(incSigs, matched)
  }

  /** Continuous pipeline: stream new-doc parquet files from
    * `newDocsDir`, screen each micro-batch, grow the store. Restart on
    * the same `checkpointDir` resumes exactly (see the epoch-keyed
    * write argument above). */
  def start(spark: SparkSession, newDocsDir: String, sigDir: String,
      outDir: String, checkpointDir: String, minEst: Double = 0.7,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(DocSchema)
    val withMax = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
    withMax.parquet(newDocsDir)
      .writeStream
      .queryName("graft-inc-dedup")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        applyBatch(b.toDF(), sigDir, outDir, id, minEst)
      }
      .start()
  }
}
