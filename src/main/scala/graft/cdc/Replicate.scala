package graft.cdc

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType, TimestampType}

/** The CDC apply pipeline: maintain a keyed replica of `person` from a
  * stream of row-level changes — the Spark re-expression of the
  * reference's replicator loop (replicator/main.go:154-270) and of the
  * pubsub publication/subscription (pubsub/main.go:79-120).
  *
  * ## Scale design (the 100 TB story): merge-on-read + compaction
  *
  * The replica is parquet **hash-bucketed by key** (`id_bucket =
  * pmod(id, numBuckets)`, a partition column) plus a hidden
  * **delta log** (`.__delta/batch=<epoch>/`). The round-3 design
  * rewrote every touched bucket per trigger — O(replica) work for an
  * O(batch) change, unshippable at a 2 s trigger once buckets hold
  * real data. Round 4 moves to the merge-on-read pattern (the
  * Hudi/Paimon MoR shape):
  *
  *  - **Per trigger (O(batch), one job)**: reduce the micro-batch to
  *    one summary row per key with ONE shuffle ([[summarizeBucketed]] —
  *    window + hash aggregate reuse the bucket partitioning, fully
  *    whole-stage-codegen) and commit it as delta `batch=<epochId>` via
  *    tmp-write + rename. No base read, no bucket rewrite, no collect.
  *    Replay after a crash overwrites the same delta dir — idempotent.
  *  - **The base holds the SAME per-key summary state as the deltas**
  *    (lsn-stamped last image, first insert, last delete lsn — dead
  *    keys stay as tombstones), so base and deltas fold through ONE
  *    commutative, associative, idempotent algebra
  *    ([[combineSummaries]]): the key's global last-delete lsn is the
  *    max over inputs, and last_img/first_ins are the arg-max/arg-min
  *    by lsn of the structs strictly past it. **Fold order cannot
  *    change the result** — this matters because micro-batch CONTENTS
  *    can arrive out of lsn order (Spark's file source orders by
  *    modification time with nondeterministic ties; Kafka partitions
  *    interleave), and a recency-assuming merge ("batch beats base")
  *    silently loses newer images when an older batch folds later.
  *    Liveness is derived, never assumed: a key is alive iff its
  *    first insert survives past the last delete.
  *  - **On read** ([[readReplica]]): base ∪ deltas → combine → project
  *    live rows. With no pending deltas this is a pure scan+filter (the
  *    compacted base is already one row per key).
  *  - **Every `compactEvery` triggers**: fold the delta-TOUCHED
  *    buckets' base rows ∪ deltas (union + combine — NO join;
  *    untouched buckets are never read or rewritten, keeping the fold
  *    O(hot data) at thousands of buckets) into fresh buckets in a
  *    temp dir,
  *    RENAME-ASIDE swap each bucket (live → .__old, fresh → live, drop
  *    .__old; every rename checked; [[recoverSwap]] rolls a crashed
  *    swap back/forward), then drop the consumed deltas. Deltas are
  *    deleted only AFTER the swap completes; re-folding a delta over an
  *    already-compacted base is a no-op (max/min of an already-folded
  *    element), so every crash window converges. Tombstones are
  *    retained (they are what makes late/reordered events safe);
  *    [[vacuum]] physically removes them once the source can no longer
  *    deliver older lsns (the Postgres slot contract —
  *    confirmed_flush_lsn only advances).
  *
  * The streaming path runs compaction ASYNCHRONOUSLY (the Hudi pattern):
  * every trigger is O(batch), the fold happens on a background thread
  * guarded per replica, and change VISIBILITY never waits on it because
  * reads are merge-on-read anyway — the fold only bounds read
  * amplification. Deltas committed during a fold stay untouched (the
  * consumed set is listed once; the watermark rises only to its max),
  * and a killed fold leaves its deltas live for the next attempt.
  * Direct `applyBatch` callers default to the synchronous fold
  * (deterministic for tests/layout assertions). At 100 TB: thousands of
  * buckets, deltas partition-pruned by bucket at compaction, and an
  * object-store deployment swaps via a per-batch manifest instead of
  * directory renames (S3 renames are copies); the dataflow is unchanged.
  *
  * SCHEMA EVOLUTION — documented decision (r6 verdict #7): this typed
  * single-table path fixes its schema at compile time BY DESIGN —
  * [[PersonRow]] and the summary structs ([[DeltaSchema]]/[[BaseSchema]])
  * are what buy fully codegen'd folds with no JSON round-trip per
  * column. A deployment that needs to widen a table's schema without a
  * rewrite uses the generic declared-schema path ([[MultiTable]] /
  * [[ManifestMultiTable]] with a single [[TableSpec]]): its replicas
  * store the change image as a JSON column map, so adding a column to
  * the declared schema is a READ-SIDE change only (old rows read as
  * null — pinned in MultiTableSpec's evolution test). Same trade as
  * Dataset[T] vs DataFrame, surfaced at the replica level.
  */
object Replicate {
  val BucketCol = "id_bucket"

  /** Crash-recovery prefix for the rename-aside swap. Leading dot =
    * hidden to Hadoop/Spark file listings, so a leftover aside dir can
    * never leak into a replica read. */
  private val AsidePrefix = ".__old."

  // (base files share the delta summary schema — see [[BaseSchema]])

  private[cdc] def check(ok: Boolean, what: => String): Unit =
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

  /** Compact the delta log into the base every N triggers. Bounds both
    * read amplification (≤ N delta files union'd at read time) and the
    * worst-trigger latency (the compaction batch does the base rewrite;
    * all other triggers are O(batch)). 1 = eager (rewrite per trigger,
    * the round-3 behavior). */
  val DefaultCompactEvery = 8

  /** Hidden delta-log dir under the replica root (leading dot: invisible
    * to Hadoop/Spark listings, so plain reads of the base never pick up
    * delta rows). */
  private[cdc] val DeltaDirName = ".__delta"

  /** Layout marker at the replica root recording the bucket count the
    * replica was written with. `numBuckets` defines the key→bucket
    * mapping on DISK, so a caller passing a different value would remap
    * keys into fresh dirs while stale copies survive in the old ones —
    * silent duplicates. Was doc-only ("must stay constant"); since the
    * incremental compaction no longer re-buckets the whole base as a
    * side effect, the constraint is now ENFORCED. Underscore prefix =
    * invisible to Spark/Hadoop data listings. */
  private val LayoutFile = "_layout"
  private val layoutSeen =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[cdc] def checkLayout(fs: FileSystem, base: Path,
      numBuckets: Int): Unit = {
    val cached = layoutSeen.get(base.toString)
    if (cached != null)
      check(cached.intValue == numBuckets,
        s"replica $base laid out with numBuckets=$cached, caller passed $numBuckets")
    else layoutSeen.synchronized {
      // serialized: two concurrent FIRST writers with different bucket
      // counts must not both adopt (check-then-act); after adoption the
      // lock-free cache path above carries every subsequent call
      val raced = layoutSeen.get(base.toString)
      if (raced != null)
        check(raced.intValue == numBuckets,
          s"replica $base laid out with numBuckets=$raced, caller passed $numBuckets")
      else {
        val p = new Path(base, LayoutFile)
        if (fs.exists(p)) {
          val in = fs.open(p)
          val n = try new String(in.readAllBytes(), "UTF-8").trim.toInt
            finally in.close()
          check(n == numBuckets,
            s"replica $base laid out with numBuckets=$n, caller passed $numBuckets")
        } else {
          // adopt (also covers pre-r5 replicas) — but never blindly
          // (r5 ADVICE): existing bucket dirs prove the real modulus'
          // LOWER bound, and a dir with id >= the adopted count means
          // the caller's modulus is provably wrong — stale higher
          // buckets would hold duplicate keys the incremental
          // compaction never rewrites. One cheap one-time LIST.
          val existing = listBuckets(fs, base)
          check(existing.forall(_ < numBuckets),
            s"replica $base has bucket dir id_bucket=${existing.max} — " +
              s"cannot adopt numBuckets=$numBuckets")
          // tmp+rename like every other small-file commit here, so a
          // crash mid-write can never leave an empty marker that
          // poisons later startups
          val tmp = new Path(base, s".$LayoutFile.tmp")
          val out = fs.create(tmp, true)
          try out.write(numBuckets.toString.getBytes("UTF-8"))
          finally out.close()
          fs.delete(p, false)
          check(fs.rename(tmp, p), s"commit layout marker $p")
        }
        layoutSeen.put(base.toString, numBuckets)
      }
    }
  }

  /** Forget a replica's cached/persisted layout (snapshot = full
    * overwrite, truncate = fresh start — both may re-bucket). */
  private def resetLayout(fs: FileSystem, base: Path): Unit = {
    layoutSeen.remove(base.toString)
    fs.delete(new Path(base, LayoutFile), false)
  }

  /** Delta on-disk schema = [[summarizeBucketed]] output, passed
    * explicitly to reads to skip footer inference. */
  private[cdc] val DeltaSchema = StructType(Seq(
    StructField(BucketCol, IntegerType),
    StructField("id", IntegerType),
    StructField("last_img", StructType(Seq(
      StructField("lsn", LongType), StructField("name", StringType),
      StructField("uid", StringType), StructField("score", IntegerType)))),
    StructField("first_ins", StructType(Seq(
      StructField("lsn", LongType),
      StructField("created_at", TimestampType)))),
    StructField("last_d_lsn", LongType)))

  /** Base-bucket file schema: identical to the deltas minus the bucket
    * column (that is the partition dir). One summary row per key that
    * ever existed — live keys and tombstones alike. */
  private[cdc] val BaseSchema =
    StructType(DeltaSchema.fields.filterNot(_.name == BucketCol))

  /** Lift plain person rows into summary form: image and insert stamped
    * at `lsn` (0 for snapshots — every real change has lsn ≥ 1, so
    * stream events always outrank the initial copy), no delete. */
  def rowsAsSummaries(rows: DataFrame, lsn: Long = 0L): DataFrame =
    rows.select(
      col("id"),
      struct(lit(lsn).as("lsn"), col("name"), col("uid"), col("score"))
        .as("last_img"),
      struct(lit(lsn).as("lsn"), col("created_at")).as("first_ins"),
      lit(null).cast(LongType).as("last_d_lsn"))

  /** Project the live person rows out of folded summaries. A key is
    * alive iff an insert survives past the last delete; its image is
    * the last surviving write, its created_at the first surviving
    * insert's (the reference's ON CONFLICT preservation,
    * replicator/main.go:204-217). */
  def projectAlive(combined: DataFrame): DataFrame =
    combined.filter(col("first_ins").isNotNull)
      .select(col("id"),
        col("last_img.name").as("name"),
        col("last_img.uid").as("uid"),
        col("last_img.score").as("score"),
        col("first_ins.created_at").as("created_at"))

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
    * Deliberately naive and readable; the engine path is
    * [[summarize]] + [[combineSummaries]] + [[projectAlive]], which
    * CdcSpec asserts equivalent on generated sequences. */
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
      // repartition WITHOUT an explicit count: AQE sizes the exchange to
      // the batch (a trigger-sized batch folds to one partition → one
      // delta file; a bulk load fans out) — the fixed-width variant
      // either serialized bulk loads or sprayed 16 tiny files per
      // trigger, tripling compaction's scan cost
      .repartition(col(BucketCol))
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

  // (the old recency-assuming mergeBatch join is gone: base rows ARE
  // summaries now, so batch-vs-base merging is [[combineSummaries]] —
  // commutative, so an out-of-order micro-batch can never clobber a
  // newer image the way "summary beats base" did)

  /** Bucket ids present on disk — one listing call, aside dirs excluded. */
  private[cdc] def listBuckets(fs: FileSystem, base: Path): Set[Int] =
    if (!fs.exists(base)) Set.empty
    else fs.listStatus(base).iterator.map(_.getPath.getName)
      .filter(_.startsWith(BucketCol + "="))
      .map(_.substring(BucketCol.length + 1).toInt).toSet

  /** Compaction watermark file: holds the max batchId folded into the
    * base. Deltas with batchId ≤ watermark are ALREADY in the base and
    * must be ignored (and may be lazily deleted): a crash between the
    * bucket swap + watermark commit and the delta deletions can leave an
    * arbitrary subset of consumed deltas behind, and re-applying only an
    * OLDER delta would regress keys whose newer image sat in a deleted
    * one. The watermark makes compaction's visible effect atomic:
    * before the marker commits, the full (idempotent) delta set is
    * re-applied; after it, none are. */
  private val WatermarkFile = "_watermark"

  private[cdc] def readWatermark(fs: FileSystem, dRoot: Path): Long = {
    val p = new Path(dRoot, WatermarkFile)
    // exists-then-open is a TOCTOU window against [[writeWatermark]]'s
    // delete-then-rename commit from a CONCURRENT compactor (the async
    // fold, or another writer's lazy-deletion pass): a reader that
    // checks existence before the delete and opens after it dies on
    // FileNotFound mid-replace (caught by the 300-trigger lifecycle
    // soak). Open-and-catch instead, retrying while the marker exists:
    // the exists=true/open-fails state can only be the replace window,
    // which a rename resolves in microseconds; stable absence (never
    // compacted) exits as MinValue on the first check.
    while (fs.exists(p)) {
      try {
        val in = fs.open(p)
        return (
          try new String(in.readAllBytes(), "UTF-8").trim.toLong
          finally in.close())
      } catch { case _: java.io.FileNotFoundException => () }
    }
    Long.MinValue
  }

  private[cdc] def writeWatermark(fs: FileSystem, dRoot: Path, id: Long): Unit = {
    val tmp = new Path(dRoot, s".$WatermarkFile.tmp")
    val out = fs.create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    val dst = new Path(dRoot, WatermarkFile)
    fs.delete(dst, false)
    check(fs.rename(tmp, dst), s"commit watermark $dst")
  }

  private[cdc] def batchIdOf(p: Path): Long =
    p.getName.stripPrefix("batch=").toLong

  /** Live (uncompacted) delta dirs: batch=<epoch> with epoch past the
    * compaction watermark. One listing + one marker read. */
  private[cdc] def listDeltas(fs: FileSystem, dRoot: Path): Seq[Path] =
    if (!fs.exists(dRoot)) Seq.empty
    else {
      val wm = readWatermark(fs, dRoot)
      fs.listStatus(dRoot).iterator.map(_.getPath)
        .filter(_.getName.startsWith("batch="))
        .filter(batchIdOf(_) > wm).toSeq
    }

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Base bucket summaries (no deltas), explicit dirs + schema, WITHOUT
    * the bucket column (a plain reader never needs to know the writer's
    * bucket count; [[compact]] recomputes it with the authoritative
    * `numBuckets`). */
  private[graft] def readBase(spark: SparkSession, fs: FileSystem,
      replicaDir: String, only: Option[Set[Int]] = None,
      schema: StructType = BaseSchema): DataFrame = {
    val buckets = {
      val all = listBuckets(fs, new Path(replicaDir))
      only.fold(all)(all.intersect)
    }
    if (buckets.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(buckets.toSeq.sorted
        .map(b => s"$replicaDir/$BucketCol=$b"): _*)
  }

  /** Fold per-key summaries (one row per key PER INPUT — deltas and/or
    * base) into one summary row per key. The algebra is commutative,
    * associative, and idempotent: the key's global last-delete lsn is
    * the max over inputs, and the surviving image / first-insert are
    * the arg-max / arg-min by lsn of the input structs strictly past it
    * (struct ordering is lsn-first, and lsns are unique) — so fold
    * ORDER never matters, re-folding an already-folded delta is a
    * no-op, and out-of-lsn-order micro-batches converge. One shuffle on
    * `keys.head` feeds the window, the aggregate, and (at compaction,
    * where keys = (bucket, id)) the bucket-partitioned write. */
  def combineSummaries(summaries: DataFrame, keys: Seq[String],
      width: Option[Int] = None): DataFrame = {
    val kc = keys.map(col)
    val byKey = Window.partitionBy(kc: _*)
    def afterD(lsn: Column): Column =
      lsn > coalesce(col("dl"), lit(Long.MinValue))
    width.fold(summaries)(w => summaries.repartition(w, kc.head))
      .withColumn("dl", max(col("last_d_lsn")).over(byKey))
      .groupBy(kc: _*)
      .agg(
        max(when(afterD(col("last_img.lsn")), col("last_img")))
          .as("last_img"),
        min(when(afterD(col("first_ins.lsn")), col("first_ins")))
          .as("first_ins"),
        max(col("last_d_lsn")).as("last_d_lsn"))
  }

  /** Read the replica — the merge-on-read view of base buckets plus any
    * uncompacted deltas (empty if neither exists). With no pending
    * deltas the compacted base is already one row per key, so the read
    * is a pure scan + liveness filter — no shuffle. */
  def readReplica(spark: SparkSession, replicaDir: String)
      : Dataset[PersonRow] = {
    import spark.implicits._
    val (fs, base) = fsOf(spark, replicaDir)
    val baseDf = readBase(spark, fs, replicaDir)
    val deltaDirs = listDeltas(fs, new Path(base, DeltaDirName))
    val folded =
      if (deltaDirs.isEmpty) baseDf
      else {
        val deltas = spark.read.schema(DeltaSchema)
          .parquet(deltaDirs.map(_.toString): _*)
          .select(BaseSchema.fieldNames.map(col).toSeq: _*)
        combineSummaries(baseDf.unionAll(deltas), Seq("id"))
      }
    projectAlive(folded).as[PersonRow]
  }

  /** Roll a crashed rename-aside swap back or forward (single-writer;
    * called at the start of each batch): an aside dir whose live dir
    * exists means that swap completed — drop the aside; a missing live
    * dir means the swap aborted between the two renames — restore the
    * aside, and the replayed micro-batch re-merges idempotently. */
  private[cdc] def recoverSwap(fs: FileSystem, base: Path): Unit =
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
  /** Per-phase stderr timing, enabled via GRAFT_CDC_TRACE=1 (bench
    * triage only — zero cost when off). */
  private val trace = sys.env.get("GRAFT_CDC_TRACE").contains("1")
  private def traced[A](what: String)(body: => A): A =
    if (!trace) body else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[cdc-trace] $what%-14s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    }

  /** `batchId` is the delta's identity and MUST be monotonically
    * increasing across distinct batches for one replica (the streaming
    * path threads the foreachBatch epoch): re-using an id means "this
    * is a REPLAY of that batch" — the delta is overwritten in place,
    * and an id at or below the compaction watermark is discarded as
    * already-applied (both exactly right for crash replay, both data
    * loss if a NEW batch wears an old id). No default value so a direct
    * caller must choose one consciously. */
  /** In-flight background compactions, one slot per replica dir:
    * guards against overlapping compactions AND tells the trigger path
    * to skip recoverSwap while a same-JVM compactor is mid-swap (a
    * half-done swap is the compactor's, not a crash's). */
  private val compacting =
    new java.util.concurrent.ConcurrentHashMap[String, Thread]()

  /** Replica dirs with a bulk lifecycle op (vacuum) in flight — the
    * rename-path twin of [[ManifestReplica]]'s flag (r6 review: the
    * multi-table stream runs recoverSwap every trigger on EVERY
    * declared table, so an operator vacuum's rename-aside swap on an
    * idle table could be torn apart mid-swap by a trigger that
    * mistook it for a crash; triggers also must not start a fold whose
    * base read predates the vacuum rewrite). Triggers skip
    * recoverSwap and the compaction threshold while the flag is set;
    * delta writes stay allowed (the next fold consumes them against
    * the post-vacuum base). */
  private val lifecycleOps =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private[cdc] def lifecycleBusy(dir: String): Boolean =
    lifecycleOps.contains(dir)

  /** Per-replica-dir READ-WRITE locks: the trigger's sections (swap
    * recovery, the whole delta write/commit, threshold folds) and the
    * async fold take the SHARED side — they never contend with each
    * other, preserving the async design's trigger-stays-O(batch)
    * property — while operator ops that rewrite or delete state
    * (vacuum, truncate, compactNow, the public compacts) take the
    * EXCLUSIVE side. The earlier advisory flag was check-then-act
    * (r6 review: a trigger descheduled between `!lifecycleBusy` and
    * its recoverSwap could wake inside a vacuum's rename-aside window
    * and tear the swap apart; a truncate could delete a delta tmp
    * mid-commit and kill the stream); reader/writer exclusion closes
    * every such interleaving without serializing the steady state.
    * The flag survives only to SKIP work while a lifecycle op runs or
    * waits (recoverSwap would misread its swaps; new folds would
    * starve it). */
  private val dirLocks = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.locks.ReentrantReadWriteLock]()

  private def rwLock(dir: String) =
    dirLocks.computeIfAbsent(dir,
      _ => new java.util.concurrent.locks.ReentrantReadWriteLock())

  private[cdc] def shared[A](dir: String)(body: => A): A = {
    val l = rwLock(dir).readLock(); l.lock()
    try body finally l.unlock()
  }

  private[cdc] def exclusive[A](dir: String)(body: => A): A = {
    val l = rwLock(dir).writeLock(); l.lock()
    try body finally l.unlock()
  }

  private[graft] def withLifecycle[A](dir: String)(body: => A): A = {
    check(lifecycleOps.add(dir), s"lifecycle op already in flight at $dir")
    try body finally lifecycleOps.remove(dir)
  }

  /** Join any in-flight background compactions (clean-shutdown hook:
    * call before `spark.stop()` so a mid-flight fold isn't killed with
    * the context — killed folds are still crash-safe, just wasted). */
  def awaitCompactions(): Unit =
    compacting.values().toArray(Array.empty[Thread]).foreach(_.join())

  /** Join only ONE replica dir's in-flight async fold — what a
    * lifecycle op actually needs (the global join stalls on unrelated
    * tables' folds in a multi-table deployment, r6 review). */
  private[cdc] def awaitCompactions(replicaDir: String): Unit =
    Option(compacting.get(replicaDir)).foreach(_.join())

  def applyBatch(spark: SparkSession, batch: Dataset[PersonChange],
      replicaDir: String, numBuckets: Int = DefaultNumBuckets,
      mergeParallelism: Int = DefaultMergeParallelism,
      batchId: Long,
      compactEvery: Int = DefaultCompactEvery,
      compactAsync: Boolean = false): Unit = {
    val base = new Path(replicaDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    shared(replicaDir) {
    traced("layout")(checkLayout(fs, base, numBuckets))
    if (!compacting.containsKey(replicaDir) && !lifecycleBusy(replicaDir))
      traced("recoverSwap")(recoverSwap(fs, base))
    val dRoot = new Path(base, DeltaDirName)
    // ONE O(batch) job per trigger: micro-batch → per-key summary (one
    // bucket-keyed shuffle) → one small parquet file per bucket
    // partition. No base read, no bucket rewrite, no driver collect.
    val tmp = new Path(dRoot, s".tmp-$batchId")
    fs.delete(tmp, true)
    traced("delta-write")(
      summarizeBucketed(batch.toDF(), numBuckets)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString))
    // commit: replace-then-rename — replaying this batchId after a crash
    // rebuilds the identical delta, so the replace is idempotent
    val dst = new Path(dRoot, s"batch=$batchId")
    fs.delete(dst, true)
    check(fs.rename(tmp, dst), s"commit delta $dst")
    // one listing serves orphan-tmp cleanup, lazy deletion of already-
    // compacted deltas (crash leftovers or a replayed pre-compaction
    // batch), AND the compaction trigger
    val entries = fs.listStatus(dRoot)
    entries.iterator.filter(_.getPath.getName.startsWith(".tmp-"))
      .foreach(e => fs.delete(e.getPath, true))
    val wm = readWatermark(fs, dRoot)
    val (stale, live) = entries.iterator.map(_.getPath)
      .filter(_.getName.startsWith("batch=")).toSeq
      .partition(batchIdOf(_) <= wm)
    stale.foreach(p => fs.delete(p, true))
    if (live.size >= compactEvery) {
      if (!compactAsync) {
        if (!lifecycleBusy(replicaDir))
          traced("compact")(compact(spark, fs, replicaDir, numBuckets))
      }
      else if (!compacting.containsKey(replicaDir) &&
          !lifecycleBusy(replicaDir)) {
        // async (Hudi-style): the trigger path stays O(batch) — readers
        // already merge deltas, so visibility gains nothing from an
        // inline fold, and the fold's lumpy cost leaves the latency
        // envelope. New deltas written during the fold are untouched
        // (the consumed set is listed once, the watermark rises only to
        // its max). One fold per replica at a time.
        val t = new Thread(() => {
          // the fold's jobs run in their OWN scheduler pool (r8 verdict
          // #5): under the default FIFO scheduler a 256-bucket fold's
          // jobs queue AHEAD of the next trigger's and occupy every
          // task slot, landing the fold's lumpy cost on that trigger's
          // latency even though the fold thread is async. Under a FAIR
          // session (spark.scheduler.mode=FAIR — Bench and any
          // latency-sensitive deployment set it) the pool time-slices
          // task slots with the trigger's default pool, so steady-state
          // trigger latency holds through fold epochs. Under FIFO the
          // property is inert — no behavior change.
          spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", "graft-compact")
          // the fold's swaps serialize with lifecycle rewrites too — a
          // spawn that raced a starting vacuum (advisory flag read)
          // parks here until the rewrite finishes, then folds from the
          // post-rewrite state (compact re-reads base and deltas)
          try shared(replicaDir) {
            // bounded footprint (r11 verdict #2, the manifest twin's
            // fix): a background fold may hold at most
            // [[ManifestReplica.AsyncFoldMaxTasks]] slots at any
            // instant — FAIR weights share slots only at task
            // boundaries, so a full-width merge launched into a
            // trigger gap convoys the next trigger's write behind
            // whole fold-task durations
            if (!lifecycleBusy(replicaDir))
              traced("compact")(compact(spark, fs, replicaDir, numBuckets,
                maxTasks = Some(ManifestReplica.AsyncFoldMaxTasks)))
          }
          catch { case e: Throwable =>
            System.err.println(s"[cdc] async compaction failed (deltas stay live, next trigger retries): $e")
          } finally compacting.remove(replicaDir)
        }, s"graft-compact-$batchId")
        t.setDaemon(true)
        if (compacting.putIfAbsent(replicaDir, t) == null) t.start()
      }
    }
    }
  }

  /** Write bucket-partitioned summaries to a temp dir, then rename-aside
    * swap the written buckets into the live base. `dropAbsent = true`
    * (the [[vacuum]] full-rewrite) additionally swaps OUT live buckets
    * the output no longer contains — absence then means "every key
    * vacuumed"; [[compact]] passes false so buckets its incremental
    * fold never read are left untouched. */
  private[cdc] def writeAndSwap(fs: FileSystem, base: Path, replicaDir: String,
      merged: DataFrame, dropAbsent: Boolean): Unit = {
    val tmpDir = s"$replicaDir.__tmp"
    fs.delete(new Path(tmpDir), true)
    merged.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(tmpDir)
    if (!fs.exists(base)) check(fs.mkdirs(base), s"mkdirs $base")
    val touched = listBuckets(fs, new Path(tmpDir)) ++
      (if (dropAbsent) listBuckets(fs, base) else Set.empty)
    touched.toSeq.sorted.foreach(swapBucket(fs, replicaDir, tmpDir, _))
    fs.delete(new Path(tmpDir), true)
  }

  /** Fold the committed deltas into the buckets they TOUCH and drop
    * them (round 5 — incremental, like [[ManifestReplica.compact]]):
    * the touched-bucket set comes off the small deltas (a collect
    * bounded by `numBuckets`), only those buckets' base dirs are read
    * (explicit path list = partition pruning by construction), and only
    * they are swapped — an untouched bucket's dir is byte-stable across
    * compactions, which is what keeps the fold O(hot data), not
    * O(replica), at thousands of buckets. Base and deltas share one
    * summary schema, so the fold is a pure union + [[combineSummaries]]
    * — no join: one bucket-keyed exchange feeds the window, the
    * aggregate, AND the bucket-partitioned write. Deltas are deleted
    * only AFTER every bucket swap completed; a crash anywhere replays
    * into [[recoverSwap]] + re-folding deltas over the compacted base,
    * which the max/min algebra absorbs idempotently. Dead keys persist
    * as tombstones ([[vacuum]] removes them). */
  private def compact(spark: SparkSession, fs: FileSystem,
      replicaDir: String, numBuckets: Int,
      maxTasks: Option[Int] = None): Unit = {
    val base = new Path(replicaDir)
    val deltaDirs = listDeltas(fs, new Path(base, DeltaDirName))
    if (deltaDirs.isEmpty) return
    val deltas = spark.read.schema(DeltaSchema)
      .parquet(deltaDirs.map(_.toString): _*)
      .select(DeltaSchema.fieldNames.map(col).toSeq: _*)
    val touched = deltas.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).toSet
    val baseDf = readBase(spark, fs, replicaDir, Some(touched))
      .withColumn(BucketCol, pmod(col("id"), lit(numBuckets)).cast("int"))
      .select(DeltaSchema.fieldNames.map(col).toSeq: _*)
    val merged = combineSummaries(baseDf.unionAll(deltas),
      Seq(BucketCol, "id"),
      width = Some(maxTasks.fold(touched.size.max(1))(c =>
        math.min(touched.size.max(1), c))))
    writeAndSwap(fs, base, replicaDir, merged, dropAbsent = false)
    // commit point: once the watermark lands, the consumed deltas are
    // invisible everywhere; until then the full set re-applies
    // idempotently over the swapped base
    writeWatermark(fs, new Path(base, DeltaDirName),
      deltaDirs.map(batchIdOf).max)
    // unchecked: once the watermark is committed these are invisible
    // everywhere, and the trigger path's lazy stale-cleanup may have
    // raced us to the same dirs
    deltaDirs.foreach(d => fs.delete(d, true))
  }

  /** Operator-invoked fold of all pending deltas into the base (public
    * entry over the incremental [[compact]] the trigger path schedules)
    * — read amplification drops to zero until new deltas land. */
  def compactNow(spark: SparkSession, replicaDir: String,
      numBuckets: Int = DefaultNumBuckets): Unit = {
    awaitCompactions(replicaDir)
    // operator entry: exclusive — an unguarded compact raced the
    // trigger's (both write the same staging dir) and could tear a
    // vacuum's swaps (r6 review)
    exclusive(replicaDir) {
      val (fs, base) = fsOf(spark, replicaDir)
      checkLayout(fs, base, numBuckets)
      recoverSwap(fs, base)
      compact(spark, fs, replicaDir, numBuckets)
    }
  }

  /** Physically remove tombstones (and fold any pending deltas first).
    * Safe once the source can no longer deliver changes with lsns below
    * the tombstones' delete lsns — the Postgres slot contract
    * (confirmed_flush_lsn only advances; replicator/main.go:159-164
    * consumes with get_changes, which advances it). Until then,
    * tombstones are load-bearing: they are what absorbs a reordered or
    * replayed older event without resurrecting a deleted row. A bucket
    * whose keys are all tombstones is dropped outright. */
  def vacuum(spark: SparkSession, replicaDir: String,
      numBuckets: Int = DefaultNumBuckets): Unit =
    withLifecycle(replicaDir) {
      awaitCompactions(replicaDir)
      exclusive(replicaDir) {
        val (fs, base) = fsOf(spark, replicaDir)
        checkLayout(fs, base, numBuckets)
        recoverSwap(fs, base)
        compact(spark, fs, replicaDir, numBuckets)
        val alive = readBase(spark, fs, replicaDir)
          .filter(col("first_ins").isNotNull)
          .withColumn(BucketCol,
            pmod(col("id"), lit(numBuckets)).cast("int"))
          .repartition(numBuckets, col(BucketCol))
        writeAndSwap(fs, base, replicaDir, alive, dropAbsent = true)
      }
    }

  /** Truncate the replica (S9 — `TRUNCATE TABLE person RESTART IDENTITY`
    * before a subscription re-copy, pubsub/main.go:88): drop every
    * bucket, the delta log, and the compaction watermark, leaving an
    * empty replica root ready for a fresh [[snapshot]] + stream. Also
    * clears any crashed-swap aside dirs (they reference truncated
    * state). */
  def truncate(spark: SparkSession, replicaDir: String): Unit =
    // same protection as vacuum (r6 review: an unguarded truncate raced
    // a live trigger's recoverSwap — a deleted aside mid-restore kills
    // the stream; an in-flight fold re-creates dirs after the delete).
    // Join BEFORE exclusive: joining a fold parked on the shared side
    // while holding the write lock would deadlock.
    withLifecycle(replicaDir) {
      awaitCompactions(replicaDir)
      exclusive(replicaDir) { truncateLocked(spark, replicaDir) }
    }

  /** The delete body, for callers already holding the dir's write lock
    * (e.g. [[MultiTable.snapshot]]). */
  private[cdc] def truncateLocked(spark: SparkSession,
      replicaDir: String): Unit = {
    val (fs, base) = fsOf(spark, replicaDir)
    if (fs.exists(base)) {
      fs.listStatus(base).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(BucketCol + "=") ||
            n.startsWith(AsidePrefix) || n == DeltaDirName)
          check(fs.delete(st.getPath, true), s"truncate $n")
      }
    }
    resetLayout(fs, base) // a fresh snapshot may re-bucket
  }

  /** Initial snapshot (phase 2 of the replicator,
    * replicator/main.go:98-140): bulk-load existing rows into the replica.
    * Static overwrite (explicit, per-write — never a session-level mode
    * flip) fully replaces any previous replica. The slot-before-copy
    * overlap trick becomes "snapshot then start the stream from offset 0;
    * overlapping changes re-fold idempotently". */
  def snapshot(spark: SparkSession, rows: Dataset[PersonRow],
      replicaDir: String, numBuckets: Int = DefaultNumBuckets): Unit =
    // operator entry rewriting the whole replica: a registered
    // lifecycle op (concurrent bulk ops fail fast) + exclusive, like
    // vacuum/truncate; fold joined before the write lock
    withLifecycle(replicaDir) {
    awaitCompactions(replicaDir)
    exclusive(replicaDir) {
      val (fs, base) = fsOf(spark, replicaDir)
      resetLayout(fs, base) // full overwrite — may legitimately re-bucket
      rowsAsSummaries(rows.toDF())
        .withColumn(BucketCol,
          pmod(col("id"), lit(numBuckets)).cast("int"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "static")
        .partitionBy(BucketCol)
        .parquet(replicaDir)
      checkLayout(fs, base, numBuckets) // stamp the fresh layout
    }
    }

  /** Snapshot diff — the INVERSE of replication: given two table
    * states, re-derive the minimal change set (I/U/D by key) that maps
    * `oldSnap` to `newSnap`. This is how a pipeline bootstraps CDC for
    * a source with no changelog (the Debezium snapshot-mode analog of
    * pubsub's `copy_data=true` initial sync, pubsub/main.go:96-104),
    * and how replica drift is audited against a fresh extract.
    *
    * One full-outer equi-join on the key: with both snapshots bucketed
    * by key (the replica layout) the join is co-partitioned and
    * exchange-free; otherwise it is the single unavoidable keyed
    * shuffle. Unchanged rows drop before any downstream work. All
    * image columns are non-null in snapshots, so plain `=!=`
    * classification is total. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame): DataFrame = {
    val o = oldSnap.select(col("id").as("o_id"), col("name").as("o_name"),
      col("uid").as("o_uid"), col("score").as("o_score"),
      col("created_at").as("o_created_at"))
    val n = newSnap.select(col("id").as("n_id"), col("name").as("n_name"),
      col("uid").as("n_uid"), col("score").as("n_score"),
      col("created_at").as("n_created_at"))
    o.join(n, col("o_id") === col("n_id"), "full_outer")
      .withColumn("op",
        when(col("o_id").isNull, "I")
          .when(col("n_id").isNull, "D")
          .when(col("o_name") =!= col("n_name") ||
            col("o_uid") =!= col("n_uid") ||
            col("o_score") =!= col("n_score") ||
            col("o_created_at") =!= col("n_created_at"), "U")
          .otherwise("="))
      .filter(col("op") =!= "=")
      .select(coalesce(col("n_id"), col("o_id")).as("id"), col("op"),
        col("n_name").as("name"), col("n_uid").as("uid"),
        col("n_score").as("score"), col("n_created_at").as("created_at"))
      .orderBy("id")
  }

  /** The continuous pipeline: change log → parse → optional publication
    * row filter → keyed merge, every `trigger` interval (the 2 s poll,
    * replicator/main.go:154; README.md:35). */
  def start(spark: SparkSession, changeDir: String, replicaDir: String,
      checkpointDir: String, rowFilter: Option[Column] = None,
      numBuckets: Int = DefaultNumBuckets,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      mergeParallelism: Int = DefaultMergeParallelism,
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Int = DefaultCompactEvery)
      : StreamingQuery =
    startFrom(spark,
      ChangeSource.readStream(spark, changeDir, maxFilesPerTrigger),
      replicaDir, checkpointDir, rowFilter, numBuckets, trigger,
      mergeParallelism, compactEvery)

  /** [[start]] with a dead-letter sink: every non-`ok` raw line lands in
    * `quarantineDir` as parquet (value, verdict, batch) instead of being
    * silently dropped — the operational T9 shape (log-and-continue with
    * the log being queryable). One extra O(batch) classify + append per
    * trigger; the replica path is unchanged. (parse additionally
    * requires the id VALUE to cast — a structurally-ok line with a
    * non-integer id is quarantine-invisible by design: the classifier
    * routes structure, the parser owns typing.) */
  def startWithQuarantine(spark: SparkSession, changeDir: String,
      replicaDir: String, checkpointDir: String, quarantineDir: String,
      rowFilter: Option[Column] = None,
      numBuckets: Int = DefaultNumBuckets,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Int = DefaultCompactEvery): StreamingQuery = {
    val reader = spark.readStream.format("text")
    val lines = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .load(changeDir)
    lines.writeStream
      .queryName("graft-replicate")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val classified = ChangeSource.classify(batch)
        // one OVERWRITTEN dir per epoch, not a blind append: replaying
        // the epoch after a crash rewrites the same dir instead of
        // duplicating its dead letters — the sink stays exactly-once
        // like the replica. Readers see `batch` as a partition column.
        classified.filter(col("verdict") =!= "ok")
          .write.mode(SaveMode.Overwrite)
          .parquet(s"$quarantineDir/batch=$epochId")
        val parsed = ChangeSource.parse(batch)
        val filtered =
          rowFilter.map(withRowFilter(parsed, _)).getOrElse(parsed)
        applyBatch(spark, filtered, replicaDir, numBuckets,
          batchId = epochId, compactEvery = compactEvery,
          compactAsync = true)
      }
      .start()
  }

  /** Source-agnostic pipeline entry: any parsed change stream
    * (wal2json, Debezium, Kafka+either envelope) drives the same
    * filter → merge dataflow. */
  def startFrom(spark: SparkSession, changes: Dataset[PersonChange],
      replicaDir: String, checkpointDir: String,
      rowFilter: Option[Column] = None,
      numBuckets: Int = DefaultNumBuckets,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      mergeParallelism: Int = DefaultMergeParallelism,
      compactEvery: Int = DefaultCompactEvery)
      : StreamingQuery = {
    val filtered = rowFilter.map(withRowFilter(changes, _)).getOrElse(changes)
    filtered.writeStream
      .queryName("graft-replicate")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PersonChange], epochId: Long) =>
        if (trace) {
          val r = batch.toDF().agg(min("lsn"), max("lsn")).head()
          System.err.println(s"[cdc-trace] epoch=$epochId lsn=[${r.get(0)}, ${r.get(1)}]")
        }
        applyBatch(spark, batch, replicaDir, numBuckets, mergeParallelism,
          batchId = epochId, compactEvery = compactEvery,
          compactAsync = true)
      }
      .start()
  }
}
