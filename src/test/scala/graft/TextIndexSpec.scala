package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.MtDelta
import graft.core.Tables
import graft.ml.TextIndex

/** The CDC-maintained inverted text index ([[graft.ml.TextIndex]]):
  * the oracle row proves maintained == full-rebuild end to end through
  * the real stream; these tests pin what the value-compare can't state
  * — bucket-touch accounting (an epoch touching b buckets rewrites
  * exactly b partitions), replay idempotence (including the
  * epoch-keyed stats log), emptied-bucket cleanup, the stats-fold
  * identity, and serve-side partition pruning. */
class TextIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables(spark, sf, "documents")
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkDelta(key: Long, sign: Int, text: String): MtDelta =
    MtDelta("document", key.toString, sign,
      s"""{"doc_id":"$key","text":"$text"}""", None)

  /** Per-bucket file fingerprints (name → (length, mtime)) — the
    * touched-partition accounting primitive. */
  private def fingerprint(indexPath: String): Map[String, Map[String, (Long, Long)]] = {
    val root = new java.io.File(indexPath)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map { d =>
        d.getName -> d.listFiles().filterNot(_.getName.startsWith("."))
          .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
      }.toMap
  }

  private def indexContent(indexPath: String): Set[(Long, String, Long, Long)] =
    spark.read.parquet(indexPath)
      .select("doc_id", "term", "tf", "dlen").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet

  private def statsSum(statsPath: String): (Long, Long) = {
    val r = spark.read.parquet(statsPath)
      .agg(sum("dn"), sum("dt")).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("maintained postings == full rebuild after N epochs (naive delta replay)") {
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val root = tmp("txt-maint")
    val (idx, st) = (s"$root/index", s"$root/stats")
    var state = Map.empty[Long, String]
    var bid = 0L
    ops.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (_, group) =>
      val start = state
      group.sortBy(_.lsn).foreach { op =>
        op.action match {
          case "I" => state = state.updated(op.docId, op.text.get)
          case "U" if state.contains(op.docId) =>
            state = state.updated(op.docId, op.text.get)
          case "D" => state = state - op.docId
          case _ => ()
        }
      }
      val touched = (start.keySet ++ state.keySet)
        .filter(k => start.get(k) != state.get(k)).toSeq.sorted
      val deltas = touched.flatMap { k =>
        start.get(k).map(t => mkDelta(k, -1, t)).toSeq ++
          state.get(k).map(t => mkDelta(k, +1, t)).toSeq
      }
      TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, bid)
      bid += 1
    }
    val idx2 = tmp("txt-rebuild") + "/index"
    TextIndex.buildIndex(state.toSeq.toDF("doc_id", "text"), idx2)
    assert(indexContent(idx) === indexContent(idx2),
      "incremental maintenance must equal the full rebuild")
    // the maintained stats log folds to the final corpus's exact (N, T)
    val expN = state.size.toLong
    val expT = state.valuesIterator.map(_.split(" ").length.toLong).sum
    assert(statsSum(st) === ((expN, expT)),
      "stats log must fold to the rebuilt corpus scalars")
    assert(ops.exists(_.action == "U") && ops.exists(_.action == "D") &&
      ops.exists(o => o.action == "I" && o.epoch > 0))
  }

  test("an epoch touching b buckets rewrites exactly b partitions") {
    val root = tmp("txt-touch")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    val before = fingerprint(idx)
    assert(before.size >= 3, s"fixture needs >= 3 buckets, got ${before.size}")
    // one synthetic doc whose two fresh terms land in known buckets:
    // affected must be exactly those buckets, every other partition
    // untouched
    val terms = Seq("zzqx", "zzqy")
    val bkts = terms.toDF("term")
      .select(TextIndex.bucketOf(col("term"))).collect()
      .map(_.getInt(0)).toSet
    assume(bkts.size == 2, "synthetic terms must hash to distinct buckets")
    val deltas = Seq(mkDelta(999999L, +1, terms.mkString(" ")))
    val affected =
      TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, 1L)
    assert(affected.toSet === bkts,
      "affected buckets must be exactly the new terms' buckets")
    val after = fingerprint(idx)
    val untouched = before.keySet -- bkts.map(b => s"bucket=$b")
    untouched.foreach { b =>
      assert(after(b) === before(b), s"partition $b must be untouched")
    }
    bkts.foreach { b =>
      assert(after(s"bucket=$b") !== before.getOrElse(s"bucket=$b", Map.empty),
        s"touched partition bucket=$b must be rewritten")
    }
  }

  test("replay idempotence: re-applying an epoch is a no-op (restart contract)") {
    val root = tmp("txt-replay")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(
      docs.select("doc_id", "text").filter(col("doc_id") < 30), idx)
    TextIndex.buildStats(docs.filter(col("doc_id") < 30), st)
    val deltas = Seq(
      mkDelta(5L, -1, docs.filter(col("doc_id") === 5)
        .select("text").collect()(0).getString(0)),
      mkDelta(5L, +1, "spark spark merge"),
      mkDelta(777L, +1, "join window window"))
    val a1 = TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, 7L)
    val c1 = indexContent(idx)
    val s1 = statsSum(st)
    val a2 = TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, 7L)
    assert(a1 === a2, "replay must touch the same buckets")
    assert(indexContent(idx) === c1, "replay must not change the index")
    assert(statsSum(st) === s1,
      "replay must not change the folded stats (epoch-keyed overwrite)")
  }

  test("a batch that empties a bucket clears its partition") {
    val root = tmp("txt-empty")
    val (idx, st) = (s"$root/index", s"$root/stats")
    // two docs, disjoint single-term vocabularies → two known buckets
    val b1 = Seq(mkDelta(1L, +1, "zzqx zzqx"), mkDelta(2L, +1, "zzqy"))
    val bkts = Seq("zzqx", "zzqy").toDF("term")
      .select(TextIndex.bucketOf(col("term"))).collect()
      .map(_.getInt(0))
    assume(bkts.toSet.size == 2)
    assert(TextIndex.applyEpoch(spark, b1.toDS(), idx, st, 0L).toSet
      === bkts.toSet)
    // delete the only doc carrying zzqx: its bucket dir must disappear
    val b2 = Seq(mkDelta(1L, -1, "zzqx zzqx"))
    assert(TextIndex.applyEpoch(spark, b2.toDS(), idx, st, 1L)
      === Seq(bkts(0)))
    assert(!new java.io.File(s"$idx/bucket=${bkts(0)}").exists(),
      "emptied bucket partition must be cleared")
    assert(indexContent(idx).map(_._1) === Set(2L))
    assert(statsSum(st) === ((1L, 1L)))
  }

  test("checkpoint restart mid-history: resumed stream converges to the one-shot state") {
    // the T2 contract on the maintained index: run the real stream over
    // the first half of the epoch files, stop, then restart from the
    // SAME checkpoint with the rest present — state (replica liveness)
    // and artifact (postings + stats) must end identical to a one-shot
    // run over all files
    import org.apache.spark.sql.streaming.Trigger
    import graft.cdc.{ChangeGen, ChangeSource, Ivm, MultiTable}
    import graft.cdc.MtDelta
    import org.apache.spark.sql.Dataset
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    def writeEpochs(dir: String, upTo: Int): Unit =
      ops.filter(_.epoch <= upTo).groupBy(_.epoch).toSeq.sortBy(_._1)
        .foreach { case (e, group) =>
          ChangeGen.writeLineBatches(dir,
            group.sortBy(_.lsn).map(TextIndex.toLine),
            batches = 1, startIndex = e)
        }
    def drive(changeDir: String, ckpt: String, idx: String,
        st: String): Unit = {
      val q = Ivm.mtDeltas(MultiTable.parseAll(
          ChangeSource.rawLines(spark, changeDir, Some(1)),
          Seq(TextIndex.DocSpec)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
          TextIndex.applyEpoch(spark, batch, idx, st, bid); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // run A: two sessions — epochs 0..1, stop, then 2..3 resume
    val dirA = tmp("txt-restart-log")
    val rootA = tmp("txt-restart")
    val (idxA, stA, ckptA) = (s"$rootA/index", s"$rootA/stats", s"$rootA/ckpt")
    writeEpochs(dirA, 1)
    drive(dirA, ckptA, idxA, stA)
    writeEpochs(dirA, 3)
    drive(dirA, ckptA, idxA, stA)
    // run B: one shot over all epochs
    val dirB = tmp("txt-oneshot-log")
    val rootB = tmp("txt-oneshot")
    val (idxB, stB, ckptB) = (s"$rootB/index", s"$rootB/stats", s"$rootB/ckpt")
    writeEpochs(dirB, 3)
    drive(dirB, ckptB, idxB, stB)
    assert(indexContent(idxA) === indexContent(idxB),
      "restarted stream must converge to the one-shot artifact")
    assert(statsSum(stA) === statsSum(stB),
      "restarted stats log must fold to the one-shot scalars")
    // and both serve the same top-k
    val a = TextIndex.searchIndex(spark, idxA, stA).collect().toSeq
    val b = TextIndex.searchIndex(spark, idxB, stB).collect().toSeq
    assert(a === b)
  }

  test("append fast path + compaction: only touched buckets gain files; content invariant") {
    val root = tmp("txt-append")
    val (idx, st) = (s"$root/index", s"$root/stats")
    val half = docs.select("doc_id", "text")
    TextIndex.buildIndex(half.filter(col("doc_id") % 2 === 0), idx)
    TextIndex.buildStats(docs.filter(col("doc_id") % 2 === 0), st)
    val before = fingerprint(idx)
    val waves = (1 to 3).map(w =>
      half.filter(col("doc_id") % 6 === (2 * w - 1) % 6))
    var epoch = 1L
    waves.foreach { w =>
      val touched = TextIndex.appendToIndex(w, idx, st, epoch)
      assert(touched.nonEmpty)
      epoch += 1
    }
    val mid = fingerprint(idx)
    // appends never rewrite existing files
    before.foreach { case (b, files) =>
      files.foreach { case (n, sig) =>
        assert(mid(b).get(n).contains(sig), s"existing file $n in $b rewritten")
      }
    }
    // content equals a one-shot build over the union
    val idx2 = tmp("txt-append-rb") + "/index"
    TextIndex.buildIndex(half, idx2)
    assert(indexContent(idx) === indexContent(idx2),
      "append waves must equal the one-shot build")
    // stats log folds to the full corpus scalars
    val expT = docs.select(
        org.apache.spark.sql.functions.sum(
          size(split(col("text"), " ")).cast("long")))
      .collect()(0).getLong(0)
    assert(statsSum(st) === ((docs.count(), expT)))
    // compaction: only fragmented buckets rewrite, content invariant
    val content = indexContent(idx)
    val fragged = mid.filter(_._2.size > 2).keySet
    assume(fragged.nonEmpty, "waves must have fragmented some bucket")
    val compacted = TextIndex.compactIndex(spark, idx, maxFiles = 2)
    assert(compacted.map(b => s"bucket=$b").toSet === fragged)
    val after = fingerprint(idx)
    (mid.keySet -- fragged).foreach { b =>
      assert(after(b) === mid(b), s"partition $b must be untouched")
    }
    fragged.foreach { b =>
      assert(after(b).size === 1, s"$b must compact to one file")
    }
    assert(indexContent(idx) === content,
      "compaction must not change the postings")
  }

  test("serve: the query read prunes to exactly the query terms' buckets") {
    val root = tmp("txt-prune")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    val qb = graft.ml.TextAnalysis.Bm25Query.toDF("term")
      .select(TextIndex.bucketOf(col("term"))).distinct().count()
    val scan = TextIndex.indexScan(spark, idx,
      graft.ml.TextAnalysis.Bm25Query.toDF("term")
        .select(TextIndex.bucketOf(col("term"))).distinct()
        .collect().map(_.getInt(0)).toSeq)
    val nBuckets = new java.io.File(idx).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(nBuckets > qb, "fixture needs more buckets than the query touches")
    assert(scan.select(input_file_name()).distinct().count() === qb,
      "serve scan must read exactly the query terms' buckets' files")
    // and the served result equals BM25 over the corpus (static case)
    val served = TextIndex.searchIndex(spark, idx, st)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = graft.ml.TextAnalysis.bm25TopK(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served === direct,
      "index-served BM25 must equal the direct corpus derivation")
  }

  test("an epoch that empties EVERY bucket leaves a readable artifact (empty-root guard)") {
    // ADVICE r14 #2 regression pin: cleanup deletes emptied partition
    // dirs but keeps the root (_SUCCESS etc.), and the old
    // root-exists read guard then fed the bare root to parquet schema
    // inference, which throws. hasPartitions must read it as ABSENT
    // and the next epoch must rebuild from nothing.
    val root = tmp("txt-emptyroot")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.applyEpoch(spark,
      Seq(mkDelta(1L, +1, "alpha beta gamma")).toDS(), idx, st, 0L)
    assert(graft.ml.IndexFs.hasPartitions(spark, idx, "bucket"))
    TextIndex.applyEpoch(spark,
      Seq(mkDelta(1L, -1, "alpha beta gamma")).toDS(), idx, st, 1L)
    assert(new java.io.File(idx).exists(),
      "the artifact root survives the emptying epoch")
    assert(!graft.ml.IndexFs.hasPartitions(spark, idx, "bucket"),
      "zero partition dirs must read as no-index")
    // the next epoch treats the artifact as absent instead of crashing
    val tb = TextIndex.applyEpoch(spark,
      Seq(mkDelta(2L, +1, "delta epsilon")).toDS(), idx, st, 2L)
    assert(tb.nonEmpty)
    assert(indexContent(idx).map(_._1) === Set(2L),
      "the revived artifact holds exactly the new doc's postings")
  }

  test("hot-bucket split: only the split bucket rewrites; content and serve invariant") {
    val root = tmp("txt-split")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    val baseline = TextIndex.searchIndex(spark, idx, st)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val before = fingerprint(idx)
    val contentBefore = indexContent(idx)
    val hot = spark.read.parquet(idx).groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (b, n) => (-n, b) }.head._1
    val splits = TextIndex.splitBucket(spark, idx, hot, Nil)
    assert(splits === Seq(TextIndex.HashSplit(hot, hot + 16, 16)))
    // rewrite unit: the split bucket's two halves; everything else
    // byte-identical
    val after = fingerprint(idx)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed.subsetOf(Set(s"bucket=$hot", s"bucket=${hot + 16}")),
      s"a split may touch only its own partitions: $changed")
    assert(indexContent(idx) === contentBefore,
      "a split is a pure layout rewrite")
    // every row now lives where the genealogy says it lives
    val misplaced = spark.read.parquet(idx)
      .filter(col("bucket") =!=
        TextIndex.splitBucketOf(col("term"), splits)).count()
    assert(misplaced === 0L, "rows must land in their genealogy bucket")
    // serve through the map: identical results, still bucket-pruned
    val served = TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(served === baseline && served.nonEmpty,
      "serve through the split map must equal the pre-split serve")
    val qBuckets = graft.ml.TextAnalysis.Bm25Query.toDF("term")
      .select(TextIndex.splitBucketOf(col("term"), splits)).distinct()
      .collect().map(_.getInt(0)).toSeq
    val scanned = TextIndex.indexScan(spark, idx, qBuckets)
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.forall(f =>
      qBuckets.exists(b => f.contains(s"bucket=$b/"))),
      "post-split serve must stay within the mapped buckets")
  }

  test("split genealogy: second-level split + post-split epoch derive through the map") {
    val root = tmp("txt-split2")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    val hot = spark.read.parquet(idx).groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (b, n) => (-n, b) }.head._1
    var splits = TextIndex.splitBucket(spark, idx, hot, Nil)
    // second-level: split the fuller half — its local modulus is now 32
    val half = spark.read.parquet(idx)
      .filter(col("bucket").isin(hot, hot + 16))
      .groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (b, n) => (-n, b) }.head._1
    assert(TextIndex.localModOf(splits, half) === 32)
    splits = TextIndex.splitBucket(spark, idx, half, splits)
    assert(splits.last === TextIndex.HashSplit(half, half + 32, 32))
    assert(spark.read.parquet(idx)
      .filter(col("bucket") =!=
        TextIndex.splitBucketOf(col("term"), splits)).count() === 0L)
    // the genealogy round-trips like the ANN quantizer's
    TextIndex.saveSplits(spark, s"$root/splits", splits)
    assert(TextIndex.loadSplits(spark, s"$root/splits") === splits)
    // post-split epoch: update one doc, delete another — BOTH sides'
    // buckets must derive through the map (a base-hash derivation
    // would retract from / land in the split bucket's former home)
    val (d1, t1) :: (d2, t2) :: Nil = docs.select("doc_id", "text")
      .orderBy("doc_id").limit(2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    val deltas = Seq(mkDelta(d1, -1, t1), mkDelta(d1, +1, t1 + " zzznew"),
      mkDelta(d2, -1, t2))
    val before = fingerprint(idx)
    val touched = TextIndex.applyEpoch(spark, deltas.toDS(), idx, st,
      batchId = 1L, splits = splits)
    val after = fingerprint(idx)
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
      .map(_.stripPrefix("bucket=").toInt)
    assert(changed.subsetOf(touched.toSet),
      s"rewritten partitions $changed must be within touched $touched")
    assert(spark.read.parquet(idx)
      .filter(col("bucket") =!=
        TextIndex.splitBucketOf(col("term"), splits)).count() === 0L,
      "no stale rows: the epoch must route through the genealogy")
    // maintained (split layout) == full rebuild (base layout) —
    // content is layout-independent
    val finalState = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
      .updated(d1, t1 + " zzznew").removed(d2)
    val idx2 = tmp("txt-split2-rebuild") + "/index"
    TextIndex.buildIndex(finalState.toSeq.toDF("doc_id", "text"), idx2)
    assert(indexContent(idx) === indexContent(idx2),
      "post-split maintenance must equal the full rebuild")
    // serve equality off the maintained split layout
    val st2 = tmp("txt-split2-stats")
    TextIndex.buildStats(finalState.toSeq.toDF("doc_id", "text"), st2)
    val servedSplit = TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val servedRebuild = TextIndex.searchIndex(spark, idx2, st2)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(servedSplit === servedRebuild && servedSplit.nonEmpty,
      "serve through the genealogy must equal the rebuilt-index serve")
  }

  test("in-stream re-balance (real stream): splits land inside epochs; restart mid-history converges") {
    // VERDICT r15 next #1, the lifted precondition: the split policy
    // runs INSIDE checkpointed triggers via the epoch-keyed genealogy
    // log, and a restart mid-split-history converges to the one-shot
    // state — index, stats, log, and serve all identical
    import org.apache.spark.sql.streaming.Trigger
    import graft.cdc.{ChangeGen, ChangeSource, Ivm, MultiTable}
    import org.apache.spark.sql.Dataset
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val maxRows = 700L // the size-triggered spec's cascade threshold
    def writeEpochs(dir: String, upTo: Int): Unit =
      ops.filter(_.epoch <= upTo).groupBy(_.epoch).toSeq.sortBy(_._1)
        .foreach { case (e, group) =>
          ChangeGen.writeLineBatches(dir,
            group.sortBy(_.lsn).map(TextIndex.toLine),
            batches = 1, startIndex = e)
        }
    def drive(changeDir: String, ckpt: String, idx: String, st: String,
        log: String): Unit = {
      val q = Ivm.mtDeltas(MultiTable.parseAll(
          ChangeSource.rawLines(spark, changeDir, Some(1)),
          Seq(TextIndex.DocSpec)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
          TextIndex.applyEpochRebalanced(spark, batch, idx, st, bid,
            log, maxRows); ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    // run A: stop after epochs 0..1 (splits already landed), resume 2..3
    val dirA = tmp("txt-ss-log"); val rootA = tmp("txt-ss")
    val (idxA, stA, logA, ckptA) =
      (s"$rootA/index", s"$rootA/stats", s"$rootA/gen", s"$rootA/ckpt")
    writeEpochs(dirA, 1)
    drive(dirA, ckptA, idxA, stA, logA)
    val logMid = TextIndex.loadSplitLog(spark, logA)
    assert(logMid.nonEmpty, "splits must land inside the streamed epochs")
    writeEpochs(dirA, 3)
    drive(dirA, ckptA, idxA, stA, logA)
    // run B: one shot
    val dirB = tmp("txt-ss-log2"); val rootB = tmp("txt-ss2")
    val (idxB, stB, logB, ckptB) =
      (s"$rootB/index", s"$rootB/stats", s"$rootB/gen", s"$rootB/ckpt")
    writeEpochs(dirB, 3)
    drive(dirB, ckptB, idxB, stB, logB)
    val (la, lb) = (TextIndex.loadSplitLog(spark, logA),
      TextIndex.loadSplitLog(spark, logB))
    assert(la === lb, "restarted genealogy log must equal the one-shot log")
    assert(la.map(_._1).distinct.size >= 2,
      s"splits must land in more than one epoch (in-stream growth): $la")
    assert(indexContent(idxA) === indexContent(idxB),
      "restarted stream must converge to the one-shot artifact")
    assert(statsSum(stA) === statsSum(stB))
    // serve threads the LOG's genealogy; equality pins the whole chain
    val a = TextIndex.searchIndex(spark, idxA, stA,
      splits = la.map(_._2)).collect().toSeq
    val b = TextIndex.searchIndex(spark, idxB, stB,
      splits = lb.map(_._2)).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("write-ahead crash windows: logged-unmoved split heals; full-epoch replay is a no-op") {
    // the two recoverable crash states the WAL ordering creates:
    // S1 = entry logged, physical move not done (crash between the log
    // write and splitBucket) — replay must HEAL; S2 = everything done,
    // offset commit lost — replay must be a no-op
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val maxRows = 700L
    def epochDeltas(): Seq[(Long, Seq[MtDelta])] = {
      var state = Map.empty[Long, String]
      ops.groupBy(_.epoch).toSeq.sortBy(_._1).map { case (e, group) =>
        val start = state
        group.sortBy(_.lsn).foreach { op =>
          op.action match {
            case "I" => state = state.updated(op.docId, op.text.get)
            case "U" if state.contains(op.docId) =>
              state = state.updated(op.docId, op.text.get)
            case "D" => state = state - op.docId
            case _ => ()
          }
        }
        val touched = (start.keySet ++ state.keySet)
          .filter(k => start.get(k) != state.get(k)).toSeq.sorted
        (e.toLong, touched.flatMap { k =>
          start.get(k).map(t => mkDelta(k, -1, t)).toSeq ++
            state.get(k).map(t => mkDelta(k, +1, t)).toSeq
        })
      }
    }
    val epochs = epochDeltas()
    // reference run A — no crashes
    val rootA = tmp("txt-wal-a")
    val (idxA, stA, logA) = (s"$rootA/index", s"$rootA/stats", s"$rootA/gen")
    epochs.foreach { case (e, d) =>
      TextIndex.applyEpochRebalanced(spark, d.toDS(), idxA, stA, e,
        logA, maxRows)
    }
    val refLog = TextIndex.loadSplitLog(spark, logA)
    // crash epoch: the first with splits AFTER the snapshot epoch (the
    // size-triggered cascade guarantees one; skip the test if not)
    val crashE = refLog.map(_._1).distinct.find(_ >= 1L)
    assume(crashE.nonEmpty, "fixture must split in a post-snapshot epoch")
    val e = crashE.get
    // run B: clean through e-1, then construct S1 at epoch e
    val rootB = tmp("txt-wal-b")
    val (idxB, stB, logB) = (s"$rootB/index", s"$rootB/stats", s"$rootB/gen")
    epochs.takeWhile(_._1 < e).foreach { case (i, d) =>
      TextIndex.applyEpochRebalanced(spark, d.toDS(), idxB, stB, i,
        logB, maxRows)
    }
    val dE = epochs.find(_._1 == e).get._2
    val prefixB = TextIndex.loadSplitLog(spark, logB).map(_._2)
    // S1: apply done, FIRST split entry logged, move NOT performed
    TextIndex.applyEpoch(spark, dE.toDS(), idxB, stB, e, splits = prefixB)
    val firstSplit = refLog.filter(_._1 == e).map(_._2).head
    TextIndex.saveSplitLogEpoch(spark, logB, e, Seq(firstSplit))
    // --- crash --- replay the epoch through the full protocol
    TextIndex.applyEpochRebalanced(spark, dE.toDS(), idxB, stB, e,
      logB, maxRows)
    // finish the history and compare everything against A
    epochs.dropWhile(_._1 <= e).foreach { case (i, d) =>
      TextIndex.applyEpochRebalanced(spark, d.toDS(), idxB, stB, i,
        logB, maxRows)
    }
    assert(TextIndex.loadSplitLog(spark, logB) === refLog,
      "the healed run's genealogy log must equal the crash-free run's")
    assert(indexContent(idxB) === indexContent(idxA),
      "the healed run's index must equal the crash-free run's")
    assert(statsSum(stB) === statsSum(stA))
    // S2: replaying the final epoch end-to-end changes nothing
    val (lastE, lastD) = epochs.last
    val c0 = indexContent(idxB)
    TextIndex.applyEpochRebalanced(spark, lastD.toDS(), idxB, stB,
      lastE, logB, maxRows)
    assert(indexContent(idxB) === c0,
      "full-epoch replay must be a no-op on the index")
    assert(TextIndex.loadSplitLog(spark, logB) === refLog,
      "full-epoch replay must be a no-op on the log")
  }

  test("restarted serving job: split genealogy loaded in a FRESH session serves identically") {
    // the hash-layout twin of AnnIndexSpec's quantizer pin (VERDICT
    // r15 next #8): build + two splits + persist, then a NEW isolated
    // session loads the genealogy from disk and serves the SAME
    // artifact — results must equal the in-memory serve bit for bit
    val root = tmp("txt-split-fresh")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    def hottest(cands: Option[Seq[Int]]): Int = {
      val counts = spark.read.parquet(idx).groupBy("bucket").count()
      cands.fold(counts)(cs => counts.filter(col("bucket").isin(cs: _*)))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy { case (b, n) => (-n, b) }.head._1
    }
    val h0 = hottest(None)
    var splits = TextIndex.splitBucket(spark, idx, h0, Nil)
    splits = TextIndex.splitBucket(spark, idx,
      hottest(Some(Seq(h0, h0 + 16))), splits)
    TextIndex.saveSplits(spark, s"$root/splits", splits)
    val inMem = TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val s2 = spark.newSession()
    val loaded = TextIndex.loadSplits(s2, s"$root/splits")
    assert(loaded === splits, "the genealogy must ride the reload")
    val viaLoaded = TextIndex.searchIndex(s2, idx, st, splits = loaded)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(viaLoaded === inMem && inMem.nonEmpty,
      "fresh-session serve through the reloaded genealogy must equal the in-memory serve")
  }

  test("size-triggered splits DURING maintenance: genealogy grows mid-history, maintained == rebuild") {
    // the composition the policy exists for: epochs land, hot TOUCHED
    // buckets split, the NEXT epoch derives through the grown map —
    // the AnnIndex splitCell-in-the-loop story on the hash layout
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val root = tmp("txt-hotmaint")
    val (idx, st) = (s"$root/index", s"$root/stats")
    // threshold sized off the fixture's measured bucket histogram
    // (top counts 1530/1166/1162/1155/820…): the snapshot epoch trips
    // the heavy buckets, and the 1530-bucket's two ~765 children stay
    // above 700 — so the next epoch that TOUCHES a child re-splits it,
    // which is exactly the convergence contract (one doubling per
    // bucket per epoch); growth mid-history is the cascade, not luck
    val maxRows = 700L
    var splits = Seq.empty[TextIndex.HashSplit]
    var state = Map.empty[Long, String]
    var bid = 0L
    var growth = List.empty[Int]
    ops.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (_, group) =>
      val start = state
      group.sortBy(_.lsn).foreach { op =>
        op.action match {
          case "I" => state = state.updated(op.docId, op.text.get)
          case "U" if state.contains(op.docId) =>
            state = state.updated(op.docId, op.text.get)
          case "D" => state = state - op.docId
          case _ => ()
        }
      }
      val touched = (start.keySet ++ state.keySet)
        .filter(k => start.get(k) != state.get(k)).toSeq.sorted
      val deltas = touched.flatMap { k =>
        start.get(k).map(t => mkDelta(k, -1, t)).toSeq ++
          state.get(k).map(t => mkDelta(k, +1, t)).toSeq
      }
      val tb = TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, bid,
        splits = splits)
      splits = TextIndex.splitIfHot(spark, idx, tb, splits, maxRows)
      growth = splits.size :: growth
      bid += 1
    }
    val sizes = growth.reverse
    assert(sizes.head > 0, "the snapshot epoch must trip splits")
    assert(sizes.last > sizes.head,
      s"later epochs must extend the genealogy mid-history: $sizes")
    // no stale rows at the end of history
    assert(spark.read.parquet(idx)
      .filter(col("bucket") =!=
        TextIndex.splitBucketOf(col("term"), splits)).count() === 0L,
      "every row must live in its genealogy bucket after N epochs")
    // maintained-with-splits == full rebuild (content layout-free)
    val idx2 = tmp("txt-hotmaint-rebuild") + "/index"
    TextIndex.buildIndex(state.toSeq.toDF("doc_id", "text"), idx2)
    assert(indexContent(idx) === indexContent(idx2),
      "maintenance with in-loop splits must equal the full rebuild")
    // and the serve threads the final genealogy
    val st2 = tmp("txt-hotmaint-stats")
    TextIndex.buildStats(state.toSeq.toDF("doc_id", "text"), st2)
    val a = TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val b = TextIndex.searchIndex(spark, idx2, st2)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(a === b && a.nonEmpty,
      "post-history serve through the genealogy must equal the rebuilt serve")
  }

  test("sub-blocking the guard-refused bucket: bounded rows per file, serve and content invariant") {
    // VERDICT r15 next #3: the splittability guard refuses a
    // one-hot-term bucket (no hash split can shrink it); the named
    // repair is bounding the FILE — the unit a scan parallelizes over.
    // Fixture: one df-heavy term in every doc plus unique scatter terms
    val hotDocs = (1L to 120L).map(i => (i, s"zzhot fill$i"))
      .toDF("doc_id", "text")
    val root = tmp("txt-block")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(hotDocs, idx)
    TextIndex.buildStats(hotDocs, st)
    val hotB = Seq("zzhot").toDF("term")
      .select(TextIndex.bucketOf(col("term"))).collect()(0).getInt(0)
    val query = Seq("zzhot", "fill7")
    val before = TextIndex.searchIndex(spark, idx, st,
        queryTerms = query)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val fpBefore = fingerprint(idx)
    val content = indexContent(idx)
    val n = spark.read.parquet(s"$idx/bucket=$hotB").count()
    assert(n > 50, "the hot term's bucket must exceed the threshold")
    // the policy: splittable hot buckets split, the guard-refused one
    // sub-blocks; here only zzhot's bucket is above the threshold and
    // its hottest term IS the whole threshold breach
    val splits = TextIndex.splitOrBlockIfHot(spark, idx,
      (0 until 16).toSeq, Nil, maxRows = 50, blockRows = 50)
    assert(splits.isEmpty,
      "the one-hot-term bucket must not split (guard) and no other bucket is hot")
    val files = graft.ml.IndexFs.dataFiles(spark, s"$idx/bucket=$hotB")
    assert(files.size === ((n + 49) / 50).toInt,
      s"the bucket must block into ceil(n/blockRows) files, got ${files.size}")
    files.foreach { f =>
      val rows = spark.read.parquet(s"$idx/bucket=$hotB/$f").count()
      assert(rows <= 50, s"file $f holds $rows rows (> blockRows)")
    }
    // pure layout: content identical, untouched partitions byte-equal
    assert(indexContent(idx) === content,
      "sub-blocking must not change the postings")
    val fpAfter = fingerprint(idx)
    (fpBefore.keySet - s"bucket=$hotB").foreach { b =>
      assert(fpAfter(b) === fpBefore(b), s"partition $b must be untouched")
    }
    // serve: df stays exact (every posting still probed), scores equal
    val after = TextIndex.searchIndex(spark, idx, st, queryTerms = query)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(after === before && after.nonEmpty,
      "the blocked bucket must serve identically")
    // convergence: a second policy pass changes nothing
    val fpStable = fingerprint(idx)
    assert(TextIndex.splitOrBlockIfHot(spark, idx, (0 until 16).toSeq,
      Nil, maxRows = 50, blockRows = 50).isEmpty)
    assert(fingerprint(idx) === fpStable,
      "an adequately-blocked bucket must not re-block")
  }

  test("soak: splits x compaction x emptied-bucket cleanup interleaved over a long history") {
    // VERDICT r15 next #9: the unit specs pin each pairwise
    // composition; this drives all three lifecycle ops together over a
    // longer maintained history, then empties EVERYTHING and revives —
    // the three-way interactions the repo's history shows up late
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 6)
    val root = tmp("txt-soak")
    val (idx, st) = (s"$root/index", s"$root/stats")
    val maxRows = 700L
    var splits = Seq.empty[TextIndex.HashSplit]
    var state = Map.empty[Long, String]
    var bid = 0L
    val appended = scala.collection.mutable.Map.empty[Long, String]
    ops.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (e, group) =>
      val start = state
      group.sortBy(_.lsn).foreach { op =>
        op.action match {
          case "I" => state = state.updated(op.docId, op.text.get)
          case "U" if state.contains(op.docId) =>
            state = state.updated(op.docId, op.text.get)
          case "D" => state = state - op.docId
          case _ => ()
        }
      }
      val touched = (start.keySet ++ state.keySet)
        .filter(k => start.get(k) != state.get(k)).toSeq.sorted
      val deltas = touched.flatMap { k =>
        start.get(k).map(t => mkDelta(k, -1, t)).toSeq ++
          state.get(k).map(t => mkDelta(k, +1, t)).toSeq
      }
      val tb = TextIndex.applyEpoch(spark, deltas.toDS(), idx, st, bid,
        splits = splits)
      splits = TextIndex.splitIfHot(spark, idx, tb, splits, maxRows)
      // fragmentation pressure: an insert-only append wave between
      // epochs (fresh key namespace, stats epochs offset past history)
      val wave = (1L to 5L)
        .map(k => (3000000L + 10 * bid + k, s"soak wave$bid token$k"))
      wave.foreach { case (k, t) => appended(k) = t }
      TextIndex.appendToIndex(wave.toDF("doc_id", "text"), idx, st,
        epoch = 100L + bid, splits = splits)
      // compaction interleaves with live splits every other epoch
      if (bid % 2 == 1) TextIndex.compactIndex(spark, idx, maxFiles = 2)
      // invariants hold mid-history, every epoch
      assert(splits.size <= 64, s"genealogy must stay bounded: ${splits.size}")
      assert(spark.read.parquet(idx)
        .filter(col("bucket") =!=
          TextIndex.splitBucketOf(col("term"), splits)).count() === 0L,
        s"epoch $bid: every row must live in its genealogy bucket")
      bid += 1
    }
    // bounded fragmentation after the final compaction
    TextIndex.compactIndex(spark, idx, maxFiles = 2)
    graft.ml.IndexFs.partitionValues(spark, idx, "bucket").foreach { b =>
      assert(graft.ml.IndexFs
        .dataFileCount(spark, s"$idx/bucket=$b") <= 2,
        s"bucket $b must be compact after the final pass")
    }
    assert(TextIndex.compactIndex(spark, idx, maxFiles = 2).isEmpty,
      "compaction must converge")
    // maintained == rebuild of (folded history ∪ appended waves)
    val expect = state ++ appended
    val idx2 = tmp("txt-soak-rb") + "/index"
    TextIndex.buildIndex(expect.toSeq.toDF("doc_id", "text"), idx2)
    assert(indexContent(idx) === indexContent(idx2),
      "the soaked artifact must equal the full rebuild")
    val st2 = tmp("txt-soak-stats")
    TextIndex.buildStats(expect.toSeq.toDF("doc_id", "text"), st2)
    val a = TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val b = TextIndex.searchIndex(spark, idx2, st2)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(a === b && a.nonEmpty, "soaked serve must equal rebuilt serve")
    // total retraction: one epoch deletes EVERY live doc — all buckets
    // empty, the artifact reads as absent, the genealogy survives
    val wipe = expect.toSeq.map { case (k, t) => mkDelta(k, -1, t) }
    TextIndex.applyEpoch(spark, wipe.toDS(), idx, st, bid, splits = splits)
    assert(!graft.ml.IndexFs.hasPartitions(spark, idx, "bucket"),
      "total retraction must clear every partition")
    // revive THROUGH the existing genealogy: the new doc's postings
    // must land in genealogy buckets, and serve still works
    TextIndex.applyEpoch(spark,
      Seq(mkDelta(1L, +1, "spark merge join window")).toDS(), idx, st,
      bid + 1, splits = splits)
    assert(spark.read.parquet(idx)
      .filter(col("bucket") =!=
        TextIndex.splitBucketOf(col("term"), splits)).count() === 0L,
      "the revived epoch must route through the surviving genealogy")
    assert(TextIndex.searchIndex(spark, idx, st, splits = splits)
      .collect().nonEmpty)
  }

  test("applyEpochStats == a fresh post-write scan (r16: the hot list " +
      "rides the epoch's own aggregate, not a second index read)") {
    val root = tmp("txt-stats")
    val (idx, st) = (s"$root/index", s"$root/stats")
    TextIndex.buildIndex(docs.select("doc_id", "text"), idx)
    TextIndex.buildStats(docs, st)
    val snap = docs.select("doc_id", "text").orderBy("doc_id").limit(2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // mixed epoch: one delete, one update, one insert
    val deltas = Seq(
      mkDelta(snap(0)._1, -1, snap(0)._2),
      mkDelta(snap(1)._1, -1, snap(1)._2),
      mkDelta(snap(1)._1, +1, snap(1)._2 + " zzquux"),
      mkDelta(888888L, +1, "fresh body of text"))
    val (touched, stats) =
      TextIndex.applyEpochStats(spark, deltas.toDS(), idx, st, 1L)
    assert(touched.nonEmpty)
    // the claim C3 rests on: the rewritten partitions' post-write
    // content is exactly the aggregated `next` frame, so the returned
    // (rows, hottest-term df) per bucket must equal what the former
    // implementation's post-write index scan would have read
    val rescanned = spark.read.parquet(idx)
      .filter(col("bucket").isin(touched: _*))
      .groupBy("bucket", "term").count()
      .groupBy("bucket")
      .agg(sum("count").as("n"), max("count").as("hottest"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(stats.toSet === rescanned,
      "epoch-returned stats must equal a fresh scan of the touched buckets")
    // and the emptied-bucket accounting is consistent: every returned
    // stat bucket is touched, every touched-but-absent bucket has no dir
    assert(stats.map(_._1).toSet.subsetOf(touched.toSet))
    (touched.toSet -- stats.map(_._1).toSet).foreach { b =>
      assert(!new java.io.File(s"$idx/bucket=$b").exists(),
        s"emptied bucket $b must have been cleared")
    }
  }
}
