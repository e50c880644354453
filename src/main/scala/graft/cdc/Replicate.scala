package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The CDC apply pipeline: maintain a keyed replica of `person` from a
  * stream of row-level changes — the Spark re-expression of the
  * reference's replicator loop (replicator/main.go:154-270) and of the
  * pubsub publication/subscription (pubsub/main.go:79-120).
  *
  * ## Scale design (the 100 TB story)
  *
  * The replica is parquet **hash-bucketed by key** (`id_bucket =
  * pmod(id, numBuckets)`, a partition column). Each micro-batch:
  *
  *  1. reduces the batch to one summary row per key — a window + hash
  *     aggregate, fully whole-stage-codegen (no typed objects in the hot
  *     path), shuffled at `mergeParallelism` (batch-sized, not the global
  *     `spark.sql.shuffle.partitions`);
  *  2. reads back ONLY the buckets containing touched keys (partition
  *     pruning on `id_bucket` — untouched data is never scanned);
  *  3. merges current ⟗ summary with conditional expressions (one
  *     shuffle of the touched buckets; at production scale `numBuckets`
  *     is raised so touched-bucket volume stays proportional to the
  *     batch, not the replica);
  *  4. writes the merged buckets to a fresh temp dir, then swaps the
  *     touched bucket directories into place. No dynamic self-overwrite:
  *     the output is fully materialized elsewhere before any source file
  *     is deleted, so executor loss or cache eviction can never corrupt
  *     the replica (the temp write IS the durable lineage break).
  *
  * Crash mid-swap leaves a prefix of buckets updated; replaying the
  * micro-batch (Structured Streaming's checkpoint contract) re-folds
  * idempotently — the reference's ON-CONFLICT idempotency trick
  * (replicator/main.go:121,207) re-expressed (SURVEY.md §2.9 T2).
  */
object Replicate {
  val BucketCol = "id_bucket"

  /** Shuffle width for per-batch merge stages. CDC micro-batches are
    * small relative to the replica; 32/200 shuffle tasks over a few
    * hundred rows are pure overhead (the round-1 bench lost ~19× of its
    * latency envelope to exactly this). Production tunes it to
    * ~batchRows / 100k. */
  val DefaultMergeParallelism = 8

  /** Bucket count scales with REPLICA size (target: a bucket rewrite ≈
    * one comfortable task, e.g. 128 MB — production on TBs uses
    * thousands). For the fixture/bench-sized replica, 16 measures
    * fastest: at 64+, per-batch fixed costs (partition dirs × writer
    * files × commit renames) dominate and worst-batch latency triples. */
  val DefaultNumBuckets = 16

  /** Publication row filter (pubsub/main.go:79), with PostgreSQL's
    * row-filter UPDATE transformation semantics: an UPDATE whose new image
    * leaves the filter is published as DELETE, and one whose new image
    * enters the filter is published as INSERT (the old image may never
    * have reached the subscriber). Our I-fold is an upsert (ON CONFLICT
    * semantics), so U→I is safe when the row is already present too.
    * Deletes always pass through. */
  def withRowFilter(changes: Dataset[PersonChange], pred: Column)
      : Dataset[PersonChange] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes
      .withColumn("action",
        when(col("action") === "D", lit("D"))
          .when(pred,
            when(col("action") === "U", lit("I")).otherwise(col("action")))
          .otherwise(lit("D")))
      .as[PersonChange]
  }

  /** Parity predicate of the reference publication:
    * `WHERE (score % 2 = 0)` (pubsub/main.go:79). */
  def parityPred: Column = col("score") % 2 === 0

  /** Typed cogroup fold — the TEST ORACLE for the merge semantics
    * (exact reference behavior, replicator/main.go:195-269):
    *  - I on absent key inserts; I on present key updates name/uid/score
    *    but PRESERVES created_at (ON CONFLICT DO UPDATE,
    *    replicator/main.go:204-217);
    *  - U on present key updates name/uid/score, created_at untouched
    *    (replicator/main.go:234-243); U on absent key is a no-op;
    *  - D removes (replicator/main.go:260-261).
    * Changes are applied in lsn order (slot order, SURVEY.md §2.9 T3).
    * Deliberately naive and readable; the engine path is [[mergeBatch]],
    * which CdcSpec asserts equivalent on generated sequences. */
  /** Apply ONE change to a key's state — the reference's switch
    * statement as a pure function, shared by the cogroup oracle and the
    * state-store path ([[StatefulReplica]]). */
  def foldEvent(st: Option[PersonRow], ev: PersonChange): Option[PersonRow] =
    ev.action match {
      case "I" => st match {
        case Some(old) => Some(old.copy(name = ev.name.get,
          uid = ev.uid.get, score = ev.score.get))
        case None => Some(PersonRow(ev.id, ev.name.get, ev.uid.get,
          ev.score.get, ev.created_at.get))
      }
      case "U" => st.map(_.copy(name = ev.name.get, uid = ev.uid.get,
        score = ev.score.get))
      case "D" => None
      case _ => st
    }

  def applyChanges(current: Dataset[PersonRow],
      changes: Dataset[PersonChange]): Dataset[PersonRow] = {
    val spark = current.sparkSession
    import spark.implicits._
    current.groupByKey(_.id).cogroup(changes.groupByKey(_.id)) {
      (_, curIt, chIt) =>
        chIt.toSeq.sortBy(_.lsn)
          .foldLeft(curIt.toSeq.headOption)(foldEvent).iterator
    }
  }

  /** Reduce a micro-batch to ONE row per key — the per-key fold algebra,
    * expressed so the only state-dependent part is explicit:
    *
    *  - `last_d_lsn`: lsn of the key's last delete in the batch (null if
    *    none). Every event before it is irrelevant (state is absent right
    *    after it); every later event is I or U.
    *  - `first_ins`: the first INSERT after the last delete. If present
    *    the key ends the batch alive regardless of prior state; its
    *    created_at is used when the row wasn't already alive.
    *  - `last_img`: image (name/uid/score) of the last non-delete event
    *    after the last delete — the final image if the key ends alive.
    *    With no delete in the batch this is just the last I/U image,
    *    which also covers the all-UPDATE case.
    *
    * Struct max/min order by `lsn` first, so they are argmax/argmin by
    * lsn (lsn is unique per change). Everything is codegen'd: one window
    * (hash-partition by id) + one hash aggregate reusing the same
    * partitioning — a single batch-sized shuffle. */
  def summarize(batch: DataFrame, parallelism: Int = DefaultMergeParallelism)
      : DataFrame = {
    val byId = Window.partitionBy("id")
    val afterD = col("lsn") > coalesce(col("last_d_lsn"), lit(Long.MinValue))
    batch
      .repartition(parallelism, col("id"))
      .withColumn("last_d_lsn",
        max(when(col("action") === "D", col("lsn"))).over(byId))
      .groupBy("id")
      .agg(
        max(when(col("action") =!= "D" && afterD,
          struct(col("lsn"), col("name"), col("uid"), col("score"))))
          .as("last_img"),
        min(when(col("action") === "I" && afterD,
          struct(col("lsn"), col("created_at")))).as("first_ins"),
        max(col("last_d_lsn")).as("last_d_lsn"))
  }

  /** Merge current state with a batch summary — DataFrame-native LWW with
    * the reference's created_at-preservation and U-on-absent-no-op
    * semantics, as pure conditional expressions (Tungsten/codegen; no
    * object serialization). `current` must cover every key it is asked to
    * keep (i.e. the touched buckets, in full). */
  def mergeBatch(current: DataFrame, summary: DataFrame,
      parallelism: Int = DefaultMergeParallelism): DataFrame = {
    val hasIns = col("first_ins").isNotNull
    val hasDel = col("last_d_lsn").isNotNull
    val inCur = col("_cur")
    // keep = inserted after last delete, OR untouched/updated current row
    val keep = hasIns || (!hasDel && inCur)
    current
      .withColumn("_cur", lit(true))
      .join(summary.repartition(parallelism, col("id")),
        Seq("id"), "full_outer")
      .withColumn("_cur", coalesce(inCur, lit(false)))
      .filter(keep)
      .select(
        col("id"),
        // a kept key with batch events always has last_img (its final
        // image); without events, the current row rides through.
        when(col("last_img").isNotNull, col("last_img.name"))
          .otherwise(col("name")).as("name"),
        when(col("last_img").isNotNull, col("last_img.uid"))
          .otherwise(col("uid")).as("uid"),
        when(col("last_img").isNotNull, col("last_img.score"))
          .otherwise(col("score")).as("score"),
        // created_at: resurrect-after-delete takes the insert's stamp;
        // otherwise the live row's stamp survives (ON CONFLICT DO UPDATE
        // never touches it, replicator/main.go:204-217).
        when(hasIns && hasDel, col("first_ins.created_at"))
          .when(hasIns && !hasDel,
            coalesce(col("created_at"), col("first_ins.created_at")))
          .otherwise(col("created_at")).as("created_at"))
  }

  private def hasBuckets(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a dir holding only _SUCCESS (all buckets deleted) is an EMPTY
    // replica, not a readable parquet source (ADVICE r1)
    fs.exists(p) && fs.listStatus(p)
      .exists(_.getPath.getName.startsWith(BucketCol + "="))
  }

  /** Read the replica (empty if not yet created or fully deleted). */
  def readReplica(spark: SparkSession, replicaDir: String)
      : Dataset[PersonRow] = {
    import spark.implicits._
    if (hasBuckets(spark, replicaDir))
      spark.read.parquet(replicaDir)
        .select("id", "name", "uid", "score", "created_at").as[PersonRow]
    else spark.emptyDataset[PersonRow]
  }

  private def readBuckets(spark: SparkSession, replicaDir: String,
      buckets: Seq[Int]): DataFrame = {
    import spark.implicits._
    if (!hasBuckets(spark, replicaDir))
      spark.emptyDataset[PersonRow].toDF()
    else
      spark.read.parquet(replicaDir)
        .filter(col(BucketCol).isin(buckets: _*)) // partition-pruned scan
        .select("id", "name", "uid", "score", "created_at")
  }

  /** Apply one micro-batch to the bucketed replica. Idempotent: replaying
    * the last batch after a crash converges to the same state. */
  def applyBatch(spark: SparkSession, batch: Dataset[PersonChange],
      replicaDir: String, numBuckets: Int = DefaultNumBuckets,
      mergeParallelism: Int = DefaultMergeParallelism): Unit = {
    import spark.implicits._
    // Cache the RAW batch (not the summary): the touched-bucket probe
    // below fills the cache, so the source is read exactly once per
    // trigger, and the merge job consumes the cached rows.
    val b = batch.toDF().persist()
    try {
      // touched buckets: ≤ numBuckets ints — a bounded driver round-trip
      val touched = b
        .select(pmod(col("id"), lit(numBuckets)).cast("int").as(BucketCol))
        .distinct().as[Int].collect().toSeq.sorted
      if (touched.isEmpty) return
      val summary = summarize(b, mergeParallelism)
      val current = readBuckets(spark, replicaDir, touched)
      val merged = mergeBatch(current, summary, mergeParallelism)
        .withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))

      // Durable lineage break: fully materialize the merged buckets in a
      // temp dir FIRST, then swap directories. The write never overlaps
      // the read, so no cache/checkpoint is needed for correctness.
      val tmpDir = s"$replicaDir.__tmp"
      val fs = new Path(replicaDir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(tmpDir), true)
      merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
        .parquet(tmpDir)
      val base = new Path(replicaDir)
      if (!fs.exists(base)) fs.mkdirs(base)
      touched.foreach { bkt =>
        val live = new Path(s"$replicaDir/$BucketCol=$bkt")
        val fresh = new Path(s"$tmpDir/$BucketCol=$bkt")
        fs.delete(live, true)
        // a touched bucket absent from the output had all its keys
        // deleted — removing the live dir IS the apply
        if (fs.exists(fresh)) fs.rename(fresh, live)
      }
      fs.delete(new Path(tmpDir), true)
    } finally b.unpersist()
  }

  /** Initial snapshot (phase 2 of the replicator,
    * replicator/main.go:98-140): bulk-load existing rows into the replica.
    * Static overwrite (explicit, per-write — never a session-level mode
    * flip) fully replaces any previous replica. The slot-before-copy
    * overlap trick becomes "snapshot then start the stream from offset 0;
    * overlapping changes re-fold idempotently". */
  def snapshot(spark: SparkSession, rows: Dataset[PersonRow],
      replicaDir: String, numBuckets: Int = DefaultNumBuckets): Unit = {
    rows.withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "static")
      .partitionBy(BucketCol)
      .parquet(replicaDir)
  }

  /** The continuous pipeline: change log → parse → optional publication
    * row filter → keyed merge, every `trigger` interval (the 2 s poll,
    * replicator/main.go:154; README.md:35). */
  def start(spark: SparkSession, changeDir: String, replicaDir: String,
      checkpointDir: String, rowFilter: Option[Column] = None,
      numBuckets: Int = DefaultNumBuckets,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      mergeParallelism: Int = DefaultMergeParallelism,
      maxFilesPerTrigger: Option[Int] = None)
      : StreamingQuery =
    startFrom(spark,
      ChangeSource.readStream(spark, changeDir, maxFilesPerTrigger),
      replicaDir, checkpointDir, rowFilter, numBuckets, trigger,
      mergeParallelism)

  /** Source-agnostic pipeline entry: any parsed change stream
    * (wal2json, Debezium, Kafka+either envelope) drives the same
    * filter → merge dataflow. */
  def startFrom(spark: SparkSession, changes: Dataset[PersonChange],
      replicaDir: String, checkpointDir: String,
      rowFilter: Option[Column] = None,
      numBuckets: Int = DefaultNumBuckets,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      mergeParallelism: Int = DefaultMergeParallelism)
      : StreamingQuery = {
    val filtered = rowFilter.map(withRowFilter(changes, _)).getOrElse(changes)
    filtered.writeStream
      .queryName("graft-replicate")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PersonChange], _: Long) =>
        applyBatch(spark, batch, replicaDir, numBuckets, mergeParallelism)
      }
      .start()
  }
}
