package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, Dataset, SaveMode, SparkSession}
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
  *  1. reduces the batch to per-key folds — one shuffle of the (small)
  *     batch, keyed the same way as the replica;
  *  2. reads back ONLY the buckets containing touched keys (partition
  *     pruning on `id_bucket` — untouched data is never scanned);
  *  3. rewrites ONLY those buckets (dynamic partition overwrite).
  *
  * Cost per batch is O(touched buckets), not O(replica). With CDC key
  * locality (hot keys cluster) this is the standard merge-on-read-free
  * layout; a production deployment raises `numBuckets` so one bucket ≪
  * executor memory. The reference's full-table semantics are preserved;
  * its ON-CONFLICT idempotency trick (replicator/main.go:121,207) becomes
  * fold idempotency here, so checkpoint replays are safe (exactly-once,
  * SURVEY.md §2.9 T2).
  */
object Replicate {
  val BucketCol = "id_bucket"

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

  /** Fold a batch of changes into the current per-key state with exact
    * reference semantics:
    *  - I on absent key inserts; I on present key updates name/uid/score
    *    but PRESERVES created_at (ON CONFLICT DO UPDATE,
    *    replicator/main.go:204-217);
    *  - U on present key updates name/uid/score, created_at untouched
    *    (replicator/main.go:234-243); U on absent key is a no-op;
    *  - D removes (replicator/main.go:260-261).
    * Changes are applied in lsn order (slot order, SURVEY.md §2.9 T3).
    * One cogroup = one shuffle keyed by id; per-key event counts per
    * batch are small so the in-memory sort is O(few). Folding the same
    * batch twice is a no-op — the idempotency exactly-once relies on. */
  def applyChanges(current: Dataset[PersonRow],
      changes: Dataset[PersonChange]): Dataset[PersonRow] = {
    val spark = current.sparkSession
    import spark.implicits._
    current.groupByKey(_.id).cogroup(changes.groupByKey(_.id)) {
      (id, curIt, chIt) =>
        val init: Option[PersonRow] = curIt.toSeq.headOption
        val fin = chIt.toSeq.sortBy(_.lsn).foldLeft(init) { (st, ev) =>
          ev.action match {
            case "I" => st match {
              case Some(old) => Some(old.copy(name = ev.name.get,
                uid = ev.uid.get, score = ev.score.get))
              case None => Some(PersonRow(id, ev.name.get, ev.uid.get,
                ev.score.get, ev.created_at.get))
            }
            case "U" => st.map(_.copy(name = ev.name.get, uid = ev.uid.get,
              score = ev.score.get))
            case "D" => None
            case _ => st
          }
        }
        fin.iterator
    }
  }

  /** Read the replica (empty if not yet created). */
  def readReplica(spark: SparkSession, replicaDir: String)
      : Dataset[PersonRow] = {
    import spark.implicits._
    val p = new Path(replicaDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty)
      spark.read.parquet(replicaDir)
        .select("id", "name", "uid", "score", "created_at").as[PersonRow]
    else spark.emptyDataset[PersonRow]
  }

  private def readBuckets(spark: SparkSession, replicaDir: String,
      buckets: Seq[Int]): Dataset[PersonRow] = {
    import spark.implicits._
    val p = new Path(replicaDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty)
      spark.emptyDataset[PersonRow]
    else
      spark.read.parquet(replicaDir)
        .filter(col(BucketCol).isin(buckets: _*)) // partition-pruned scan
        .select("id", "name", "uid", "score", "created_at").as[PersonRow]
  }

  /** Apply one micro-batch to the bucketed replica. Idempotent: replaying
    * the last batch after a crash converges to the same state. */
  def applyBatch(spark: SparkSession, batch: Dataset[PersonChange],
      replicaDir: String, numBuckets: Int = 16): Unit = {
    import spark.implicits._
    val cached = batch.cache()
    try {
      // touched buckets: tiny driver-side set (≤ numBuckets ints)
      val touched = cached.select(pmod(col("id"), lit(numBuckets)).cast("int"))
        .distinct().as[Int].collect().toSeq.sorted
      if (touched.isEmpty) return
      val current = readBuckets(spark, replicaDir, touched)
      val merged = applyChanges(current, cached)
        .withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))
        .cache()
      try {
        val nonEmptyBuckets =
          merged.select(BucketCol).distinct().as[Int].collect().toSet
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
          .parquet(replicaDir)
        // dynamic overwrite only replaces partitions present in the output;
        // a touched bucket whose keys were ALL deleted must be dropped
        // explicitly or stale rows would survive.
        val fs = new Path(replicaDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        touched.filterNot(nonEmptyBuckets).foreach { b =>
          fs.delete(new Path(s"$replicaDir/$BucketCol=$b"), true)
        }
      } finally merged.unpersist()
    } finally cached.unpersist()
  }

  /** Initial snapshot (phase 2 of the replicator,
    * replicator/main.go:98-140): bulk-load existing rows into the replica.
    * The slot-before-copy overlap trick becomes "snapshot then start the
    * stream from offset 0; overlapping changes re-fold idempotently". */
  def snapshot(spark: SparkSession, rows: Dataset[PersonRow],
      replicaDir: String, numBuckets: Int = 16): Unit = {
    rows.withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(replicaDir)
  }

  /** The continuous pipeline: change log → parse → optional publication
    * row filter → keyed merge, every `trigger` interval (the 2 s poll,
    * replicator/main.go:154; README.md:35). */
  def start(spark: SparkSession, changeDir: String, replicaDir: String,
      checkpointDir: String, rowFilter: Option[Column] = None,
      numBuckets: Int = 16,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"))
      : StreamingQuery = {
    val parsed = ChangeSource.readStream(spark, changeDir)
    val filtered = rowFilter.map(withRowFilter(parsed, _)).getOrElse(parsed)
    filtered.writeStream
      .queryName("graft-replicate")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PersonChange], _: Long) =>
        applyBatch(spark, batch, replicaDir, numBuckets)
      }
      .start()
  }
}
