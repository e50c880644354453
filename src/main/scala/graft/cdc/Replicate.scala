package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType, TimestampType}

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
  *  1. reduces the batch to one summary row per key with ONE shuffle,
  *     hash-partitioned directly on `id_bucket` (bucket ⊂ key, so the
  *     per-key window + hash aggregate reuse that partitioning) — fully
  *     whole-stage-codegen, cached for step 3;
  *  2. derives the touched-bucket list from the cached summary (a
  *     bounded ≤ numBuckets collect — the job that computes it is the
  *     same one that fills the cache, so the SOURCE is read exactly
  *     once per trigger);
  *  3. reads back ONLY the touched bucket directories (explicit paths +
  *     explicit schema: no full-tree listing, no footer schema
  *     inference) and full-outer-merges current ⟗ summary on
  *     (bucket, key) — the summary side is already partitioned by
  *     bucket, so only the touched current rows shuffle, and the merged
  *     output stays bucket-aligned: the write emits ONE file per bucket
  *     with no extra exchange;
  *  4. writes the merged buckets to a fresh temp dir, then swaps each
  *     touched bucket in via RENAME-ASIDE (live → .__old, fresh → live,
  *     drop .__old): the live data is never deleted before its
  *     replacement is in place, every rename is checked, and a leftover
  *     .__old from a crash is rolled back/forward at the next batch
  *     ([[recoverSwap]]) — so no interleaving of crashes can lose rows
  *     that were not in the micro-batch (ADVICE r2).
  *
  * Crash mid-swap leaves a prefix of buckets updated; replaying the
  * micro-batch (Structured Streaming's checkpoint contract) re-folds
  * idempotently — the reference's ON-CONFLICT idempotency trick
  * (replicator/main.go:121,207) re-expressed (SURVEY.md §2.9 T2).
  * At production scale an object-store deployment would swap via a
  * per-batch manifest instead of directory renames (S3 renames are
  * copies); the bucket layout and merge dataflow are unchanged.
  */
object Replicate {
  val BucketCol = "id_bucket"

  /** Crash-recovery prefix for the rename-aside swap. Leading dot =
    * hidden to Hadoop/Spark file listings, so a leftover aside dir can
    * never leak into a replica read. */
  private val AsidePrefix = ".__old."

  /** Replica on-disk schema, passed explicitly to every bucket read so
    * per-trigger reads skip parquet footer schema inference. */
  private val ReplicaSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("uid", StringType),
    StructField("score", IntegerType),
    StructField("created_at", TimestampType)))

  private def check(ok: Boolean, what: => String): Unit =
    if (!ok) throw new java.io.IOException(s"replica filesystem op failed: $what")

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

  /** [[summarize]] with the shuffle keyed on `id_bucket` instead of raw
    * `id`: bucket is a function of id, so per-key grouping is preserved,
    * and — because the window/aggregate/merge-join/write downstream all
    * cluster on (bucket, id) ⊇ {bucket} — the ENTIRE apply path runs off
    * this single batch-sized shuffle: no re-shuffle before the join, and
    * each write task holds exactly its bucket(s), emitting one file per
    * bucket. */
  def summarizeBucketed(batch: DataFrame, numBuckets: Int = DefaultNumBuckets)
      : DataFrame = {
    val byKey = Window.partitionBy(BucketCol, "id")
    val afterD = col("lsn") > coalesce(col("last_d_lsn"), lit(Long.MinValue))
    batch
      .withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))
      .repartition(numBuckets, col(BucketCol))
      .withColumn("last_d_lsn",
        max(when(col("action") === "D", col("lsn"))).over(byKey))
      .groupBy(BucketCol, "id")
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
    * keep (i.e. the touched buckets, in full). Joins on `joinKeys`
    * (default the bare key; the apply path passes (bucket, id) so the
    * summary's bucket partitioning is reused and only `current`
    * shuffles); EnsureRequirements co-partitions the sides, so no
    * explicit repartition is needed here. */
  def mergeBatch(current: DataFrame, summary: DataFrame,
      joinKeys: Seq[String] = Seq("id")): DataFrame = {
    val hasIns = col("first_ins").isNotNull
    val hasDel = col("last_d_lsn").isNotNull
    val inCur = col("_cur")
    // keep = inserted after last delete, OR untouched/updated current row
    val keep = hasIns || (!hasDel && inCur)
    current
      .withColumn("_cur", lit(true))
      .join(summary, joinKeys, "full_outer")
      .withColumn("_cur", coalesce(inCur, lit(false)))
      .filter(keep)
      .select(joinKeys.map(col) ++ Seq(
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
          .otherwise(col("created_at")).as("created_at")): _*)
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

  /** Bucket ids present on disk — one listing call, aside dirs excluded. */
  private def listBuckets(fs: FileSystem, base: Path): Set[Int] =
    if (!fs.exists(base)) Set.empty
    else fs.listStatus(base).iterator.map(_.getPath.getName)
      .filter(_.startsWith(BucketCol + "="))
      .map(_.substring(BucketCol.length + 1).toInt).toSet

  /** Roll a crashed rename-aside swap back or forward (single-writer;
    * called at the start of each batch): an aside dir whose live dir
    * exists means that swap completed — drop the aside; a missing live
    * dir means the swap aborted between the two renames — restore the
    * aside, and the replayed micro-batch re-merges idempotently. */
  private def recoverSwap(fs: FileSystem, base: Path): Unit =
    if (fs.exists(base)) fs.listStatus(base).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(AsidePrefix)) {
        val live = new Path(base, n.stripPrefix(AsidePrefix))
        if (fs.exists(live))
          check(fs.delete(st.getPath, true), s"drop completed aside $n")
        else check(fs.rename(st.getPath, live), s"restore aborted swap $n")
      }
    }

  /** Swap one merged bucket into place without ever deleting live data
    * before its replacement is committed (ADVICE r2): live → aside,
    * fresh → live, drop aside. Every rename result is checked. */
  private def swapBucket(fs: FileSystem, replicaDir: String, tmpDir: String,
      bkt: Int): Unit = {
    val live = new Path(s"$replicaDir/$BucketCol=$bkt")
    val aside = new Path(s"$replicaDir/$AsidePrefix$BucketCol=$bkt")
    val fresh = new Path(s"$tmpDir/$BucketCol=$bkt")
    if (fs.exists(live)) check(fs.rename(live, aside), s"set aside $live")
    // a touched bucket absent from the output had all its keys deleted —
    // ending up with no live dir IS the apply
    if (fs.exists(fresh)) check(fs.rename(fresh, live), s"swap in $fresh")
    if (fs.exists(aside)) check(fs.delete(aside, true), s"drop aside $aside")
  }

  /** Apply one micro-batch to the bucketed replica. Idempotent: replaying
    * the last batch after a crash converges to the same state.
    * `numBuckets` must stay constant for a replica's lifetime (it defines
    * the key → bucket mapping the merge joins on). */
  def applyBatch(spark: SparkSession, batch: Dataset[PersonChange],
      replicaDir: String, numBuckets: Int = DefaultNumBuckets,
      mergeParallelism: Int = DefaultMergeParallelism): Unit = {
    import spark.implicits._
    val base = new Path(replicaDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverSwap(fs, base)
    // ONE batch-sized shuffle (keyed by bucket) computes the per-key
    // summary; cached so the touched-bucket probe below is the same job
    // that reads the source — exactly once per trigger.
    val summary = summarizeBucketed(batch.toDF(), numBuckets).persist()
    try {
      // touched buckets: ≤ numBuckets ints — a bounded driver round-trip
      // folded into the summary job (no separate source scan)
      val touched = summary.agg(collect_set(col(BucketCol)))
        .first().getSeq[Int](0).sorted
      if (touched.isEmpty) return
      val readable = touched.filter(listBuckets(fs, base))
      val current =
        (if (readable.isEmpty) spark.emptyDataset[PersonRow].toDF()
         else spark.read.schema(ReplicaSchema) // explicit dirs + schema:
           .parquet(readable.map(b => s"$replicaDir/$BucketCol=$b"): _*))
          .withColumn(BucketCol,
            pmod(col("id"), lit(numBuckets)).cast("int"))
      // join on (bucket, id): the cached summary's bucket partitioning
      // satisfies the join's clustering, so only `current` shuffles, and
      // the merged output stays bucket-aligned for the write below —
      // one file per bucket, no extra exchange.
      val merged = mergeBatch(current, summary,
        joinKeys = Seq(BucketCol, "id"))

      // Durable lineage break: fully materialize the merged buckets in a
      // temp dir FIRST, then rename-aside swap each touched bucket.
      val tmpDir = s"$replicaDir.__tmp"
      fs.delete(new Path(tmpDir), true)
      merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
        .parquet(tmpDir)
      if (!fs.exists(base)) check(fs.mkdirs(base), s"mkdirs $base")
      touched.foreach(swapBucket(fs, replicaDir, tmpDir, _))
      fs.delete(new Path(tmpDir), true)
    } finally summary.unpersist()
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
