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
}
