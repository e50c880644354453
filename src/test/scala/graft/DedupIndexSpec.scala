package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.MtDelta
import graft.core.Tables
import graft.ml.{Dedup, DedupIndex, TextIndex}

/** The CDC-maintained MinHash/LSH dedup index
  * ([[graft.ml.DedupIndex]]): the oracle row proves maintained ==
  * full-rebuild end to end through the real stream; these tests pin
  * what the value-compare can't state — bucket-touch accounting (an
  * epoch touching b buckets rewrites exactly b partitions, per
  * sub-artifact), replay idempotence, emptied-bucket cleanup, the
  * append/compaction fast paths, screen == the from-scratch
  * [[graft.ml.Dedup.dedupIncrement]], and serve-side partition
  * pruning. Stream-level checkpoint restart is NOT re-pinned here: the
  * index advances only through [[graft.ml.DedupIndex.applyEpoch]],
  * whose replay idempotence (pinned below) is the whole restart
  * contract — the offset/commit machinery itself is pinned by
  * TextIndexSpec and CdcSpec on the identical stream. */
class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables(spark, sf, "documents")
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkDelta(key: Long, sign: Int, text: String): MtDelta =
    MtDelta("document", key.toString, sign,
      s"""{"doc_id":"$key","text":"$text"}""", None)

  /** Per-partition file fingerprints (name → (length, mtime)) — the
    * touched-partition accounting primitive. */
  private def fingerprint(path: String, partCol: String)
      : Map[String, Map[String, (Long, Long)]] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(s"$partCol="))
      .map { d =>
        d.getName -> d.listFiles().filterNot(_.getName.startsWith("."))
          .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
      }.toMap
  }

  private def bandsContent(path: String): Set[(Long, Long, Long)] =
    spark.read.parquet(path).select("doc_id", "band", "bk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def sigsContent(path: String): Set[Seq[Long]] =
    spark.read.parquet(path)
      .select(col("doc_id") +:
        (0 until Dedup.NumHashes).map(h => col(s"m$h")): _*)
      .collect().map(_.toSeq.map(_.asInstanceOf[Long])).toSet

  /** Expected touched buckets, derived from the delta rows themselves
    * (the no-probe property the maintenance relies on). */
  private def expected(deltas: Seq[MtDelta]): (Set[Int], Set[Int]) = {
    val rows = deltas.map { d =>
      val img = ujsonText(d.img)
      (d.key.toLong, img)
    }.toDF("doc_id", "text")
    val sigs = DedupIndex.sigRowsFor(rows)
    val tb = DedupIndex.bandRowsFor(sigs).select("bucket")
      .distinct().collect().map(_.getInt(0)).toSet
    val ts = sigs.select(DedupIndex.sigBucketOf(col("doc_id")).as("s"))
      .distinct().collect().map(_.getInt(0)).toSet
    (tb, ts)
  }

  // the delta img is this spec's own mkDelta JSON — extract `text`
  private def ujsonText(img: String): String = {
    val m = """"text":"(.*)"\}""".r.findFirstMatchIn(img)
    m.get.group(1)
  }

  test("maintained index == full rebuild after N epochs (naive delta replay)") {
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val root = tmp("ddx-maint")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    var state = Map.empty[Long, String]
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
      DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp)
    }
    val root2 = tmp("ddx-rebuild")
    val (bp2, sp2) = (s"$root2/bands", s"$root2/sigs")
    DedupIndex.buildIndex(state.toSeq.toDF("doc_id", "text"), bp2, sp2)
    assert(bandsContent(bp) === bandsContent(bp2),
      "incremental band maintenance must equal the full rebuild")
    assert(sigsContent(sp) === sigsContent(sp2),
      "incremental signature maintenance must equal the full rebuild")
    assert(ops.exists(_.action == "U") && ops.exists(_.action == "D") &&
      ops.exists(o => o.action == "I" && o.epoch > 0))
  }

  test("an epoch touching b buckets rewrites exactly b partitions (both tables)") {
    val root = tmp("ddx-touch")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupIndex.buildIndex(docs.select("doc_id", "text"), bp, sp)
    val beforeB = fingerprint(bp, "bucket")
    val beforeS = fingerprint(sp, "sbucket")
    assert(beforeB.size >= 3, "fixture needs >= 3 band buckets")
    val deltas = Seq(
      mkDelta(999999L, +1, "zz qq xx yy ww vv uu tt"))
    val (expB, expS) = expected(deltas)
    val (affB, affS) = DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp)
    assert(affB.toSet === expB,
      "affected band buckets must be exactly the new doc's band buckets")
    assert(affS.toSet === expS,
      "affected sig buckets must be exactly the new doc's own bucket")
    val afterB = fingerprint(bp, "bucket")
    val afterS = fingerprint(sp, "sbucket")
    (beforeB.keySet -- expB.map(b => s"bucket=$b")).foreach { b =>
      assert(afterB(b) === beforeB(b), s"band partition $b must be untouched")
    }
    (beforeS.keySet -- expS.map(b => s"sbucket=$b")).foreach { b =>
      assert(afterS(b) === beforeS(b), s"sig partition $b must be untouched")
    }
    expB.foreach { b =>
      assert(afterB(s"bucket=$b") !==
        beforeB.getOrElse(s"bucket=$b", Map.empty[String, (Long, Long)]),
        s"touched band partition bucket=$b must be rewritten")
    }
  }

  test("replay idempotence: re-applying an epoch is a no-op (restart contract)") {
    val root = tmp("ddx-replay")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupIndex.buildIndex(
      docs.select("doc_id", "text").filter(col("doc_id") < 30), bp, sp)
    val oldText = docs.filter(col("doc_id") === 5)
      .select("text").collect()(0).getString(0)
    val deltas = Seq(
      mkDelta(5L, -1, oldText),
      mkDelta(5L, +1, "spark merge spark merge window"),
      mkDelta(777L, +1, "join window join window frame"))
    val a1 = DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp)
    val (cb, cs) = (bandsContent(bp), sigsContent(sp))
    val a2 = DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp)
    assert(a1 === a2, "replay must touch the same buckets")
    assert(bandsContent(bp) === cb, "replay must not change the bands")
    assert(sigsContent(sp) === cs, "replay must not change the sigs")
  }

  test("a batch that empties a bucket clears its partitions") {
    val root = tmp("ddx-empty")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    val t1 = "aa bb cc dd ee"
    val t2 = "ff gg hh ii jj kk"
    val (b1, s1) = expected(Seq(mkDelta(1L, +1, t1)))
    val (b2, s2) = expected(Seq(mkDelta(2L, +1, t2)))
    assume((b1 -- b2).nonEmpty && (s1 -- s2).nonEmpty,
      "docs must own at least one exclusive bucket each")
    DedupIndex.applyEpoch(spark,
      Seq(mkDelta(1L, +1, t1), mkDelta(2L, +1, t2)).toDS(), bp, sp)
    DedupIndex.applyEpoch(spark, Seq(mkDelta(1L, -1, t1)).toDS(), bp, sp)
    (b1 -- b2).foreach { b =>
      assert(!new java.io.File(s"$bp/bucket=$b").exists(),
        s"emptied band partition bucket=$b must be cleared")
    }
    (s1 -- s2).foreach { b =>
      assert(!new java.io.File(s"$sp/sbucket=$b").exists(),
        s"emptied sig partition sbucket=$b must be cleared")
    }
    assert(spark.read.parquet(bp).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet === Set(2L))
  }

  test("append fast path + compaction: only touched buckets gain files; content invariant") {
    val root = tmp("ddx-append")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    val half = docs.select("doc_id", "text")
    DedupIndex.buildIndex(half.filter(col("doc_id") % 2 === 0), bp, sp)
    val beforeB = fingerprint(bp, "bucket")
    val waves = (1 to 3).map(w =>
      half.filter(col("doc_id") % 6 === (2 * w - 1) % 6))
    waves.foreach { w =>
      val (tb, ts) = DedupIndex.appendToIndex(w, bp, sp)
      assert(tb.nonEmpty && ts.nonEmpty)
    }
    val midB = fingerprint(bp, "bucket")
    beforeB.foreach { case (b, files) =>
      files.foreach { case (n, sig) =>
        assert(midB(b).get(n).contains(sig),
          s"existing file $n in $b rewritten by append")
      }
    }
    val root2 = tmp("ddx-append-rb")
    val (bp2, sp2) = (s"$root2/bands", s"$root2/sigs")
    DedupIndex.buildIndex(half, bp2, sp2)
    assert(bandsContent(bp) === bandsContent(bp2),
      "append waves must equal the one-shot build (bands)")
    assert(sigsContent(sp) === sigsContent(sp2),
      "append waves must equal the one-shot build (sigs)")
    val content = bandsContent(bp)
    val fragged = midB.filter(_._2.size > 2).keySet
    assume(fragged.nonEmpty, "waves must have fragmented some bucket")
    val compacted = DedupIndex.compactIndex(spark, bp, "bucket", maxFiles = 2)
    assert(compacted.map(b => s"bucket=$b").toSet === fragged)
    val afterB = fingerprint(bp, "bucket")
    (midB.keySet -- fragged).foreach { b =>
      assert(afterB(b) === midB(b), s"partition $b must be untouched")
    }
    fragged.foreach { b =>
      assert(afterB(b).size === 1, s"$b must compact to one file")
    }
    assert(bandsContent(bp) === content,
      "compaction must not change the band rows")
  }

  test("screen == from-scratch dedupIncrement; read prunes to probed buckets") {
    val root = tmp("ddx-screen")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupIndex.buildIndex(docs.select("doc_id", "text"), bp, sp)
    val probes = DedupIndex.probesOf(docs).localCheckpoint(true)
    val served = DedupIndex.screenIndex(spark, probes, bp, sp)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served.nonEmpty, "the truncation probes must find matches")
    // the from-scratch reference: a fresh corpus signature pass through
    // Dedup.dedupIncrement at the same threshold
    val ref = Dedup.dedupIncrement(
        DedupIndex.sigRowsFor(probes),
        DedupIndex.sigRowsFor(docs.select("doc_id", "text")),
        minEst = DedupIndex.MinEst)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served === ref,
      "index screen must equal the from-scratch incremental screen")
    // pruning: the band read touches exactly the probes' band buckets
    val pBuckets = DedupIndex.bandRowsFor(DedupIndex.sigRowsFor(probes))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    val nBuckets = new java.io.File(bp).listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("bucket="))
    val scanned = spark.read.parquet(bp)
      .filter(col("bucket").isin(pBuckets: _*))
      .select(input_file_name()).distinct().count()
    val probedDirs = pBuckets.count(b =>
      new java.io.File(s"$bp/bucket=$b").exists())
    assert(scanned === probedDirs.toLong,
      "band scan must read exactly the probed buckets' files")
    // the fixture must actually exercise pruning at serve time
    if (pBuckets.size < nBuckets)
      assert(probedDirs < nBuckets)
  }

  test("hot band-bucket split: only the split bucket rewrites; screen invariant; post-split epoch routes through the map") {
    val root = tmp("ddx-split")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupIndex.buildIndex(docs.select("doc_id", "text"), bp, sp)
    val probes = DedupIndex.probesOf(docs).localCheckpoint(true)
    val baseline = DedupIndex.screenIndex(spark, probes, bp, sp)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val before = fingerprint(bp, "bucket")
    val contentBefore = bandsContent(bp)
    val hot = spark.read.parquet(bp).groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (b, n) => (-n, b) }.head._1
    var splits = DedupIndex.splitBandBucket(spark, bp, hot, Nil)
    assert(splits === Seq(TextIndex.HashSplit(hot, hot + 16, 16)))
    val after = fingerprint(bp, "bucket")
    val changed = (before.keySet ++ after.keySet)
      .filter(k => before.get(k) != after.get(k))
    assert(changed.subsetOf(Set(s"bucket=$hot", s"bucket=${hot + 16}")),
      s"a split may touch only its own partitions: $changed")
    assert(bandsContent(bp) === contentBefore,
      "a split is a pure layout rewrite")
    // second level: the fuller half lives at local mod 32
    val half = spark.read.parquet(bp)
      .filter(col("bucket").isin(hot, hot + 16))
      .groupBy("bucket").count()
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (b, n) => (-n, b) }.head._1
    assert(TextIndex.localModOf(splits, half, DedupIndex.NumBuckets) === 32)
    splits = DedupIndex.splitBandBucket(spark, bp, half, splits)
    // every row lives where the genealogy says
    assert(spark.read.parquet(bp)
      .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
        col("band"), col("bk"), splits)).count() === 0L,
      "rows must land in their genealogy bucket")
    // the screen through the map is value-identical and still pruned
    val served = DedupIndex.screenIndex(spark, probes, bp, sp,
        splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(served === baseline && served.nonEmpty,
      "screen through the split map must equal the pre-split screen")
    // post-split epoch: update + delete route BOTH signs through the map
    val (d1, t1) :: (d2, t2) :: Nil = docs.select("doc_id", "text")
      .orderBy("doc_id").limit(2).collect()
      .map(r => (r.getLong(0), r.getString(1))).toList
    val deltas = Seq(mkDelta(d1, -1, t1), mkDelta(d1, +1, t1 + " zzznew"),
      mkDelta(d2, -1, t2))
    val preEpoch = fingerprint(bp, "bucket")
    val (touchedB, _) = DedupIndex.applyEpoch(spark, deltas.toDS(), bp,
      sp, splits = splits)
    val postEpoch = fingerprint(bp, "bucket")
    val epochChanged = (preEpoch.keySet ++ postEpoch.keySet)
      .filter(k => preEpoch.get(k) != postEpoch.get(k))
      .map(_.stripPrefix("bucket=").toInt)
    assert(epochChanged.subsetOf(touchedB.toSet),
      s"rewritten partitions $epochChanged must be within touched $touchedB")
    assert(spark.read.parquet(bp)
      .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
        col("band"), col("bk"), splits)).count() === 0L,
      "no stale rows: the epoch must route through the genealogy")
    // maintained (split layout) == full rebuild (base layout): band
    // content is layout-independent
    val finalDocs = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
      .updated(d1, t1 + " zzznew").removed(d2)
    val root2 = tmp("ddx-split-rebuild")
    DedupIndex.buildIndex(finalDocs.toSeq.toDF("doc_id", "text"),
      s"$root2/bands", s"$root2/sigs")
    assert(bandsContent(bp) === bandsContent(s"$root2/bands"),
      "post-split maintenance must equal the full rebuild")
  }

  test("in-stream re-balance on the band layout: epochs split via the log; crash windows replay to convergence") {
    // the band-layout half of VERDICT r15 next #1: the write-ahead
    // genealogy-log protocol ([[DedupIndex.applyEpochRebalanced]])
    // converges from both recoverable crash states, and the screen
    // through the logged genealogy equals the from-scratch rebuild
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    // band buckets carry ~16·N/16 = N rows each (near-uniform key
    // hash), so a threshold at 0.45·N trips every bucket at the
    // snapshot epoch and their ~N/2 children again when a later epoch
    // touches them — deterministic multi-epoch growth
    val maxRows = snap.size.toLong * 45 / 100
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
    def finalState(): Map[Long, String] = {
      var state = Map.empty[Long, String]
      ops.sortBy(_.lsn).foreach { op =>
        op.action match {
          case "I" => state = state.updated(op.docId, op.text.get)
          case "U" if state.contains(op.docId) =>
            state = state.updated(op.docId, op.text.get)
          case "D" => state = state - op.docId
          case _ => ()
        }
      }
      state
    }
    // reference run A — no crashes
    val rootA = tmp("ddx-wal-a")
    val (bpA, spA, logA) = (s"$rootA/bands", s"$rootA/sigs", s"$rootA/gen")
    epochs.foreach { case (e, d) =>
      DedupIndex.applyEpochRebalanced(spark, d.toDS(), bpA, spA, e,
        logA, maxRows)
    }
    val refLog = TextIndex.loadSplitLog(spark, logA)
    assert(refLog.nonEmpty &&
      refLog.map(_._1).distinct.size >= 2,
      s"splits must land across multiple epochs: $refLog")
    // every row lives where the logged genealogy says
    assert(spark.read.parquet(bpA)
      .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
        col("band"), col("bk"), refLog.map(_._2))).count() === 0L)
    // run B: clean to e-1, then S1 (logged-unmoved) at the first
    // post-snapshot split epoch
    val crashE = refLog.map(_._1).distinct.find(_ >= 1L)
    assume(crashE.nonEmpty, "fixture must split in a post-snapshot epoch")
    val e = crashE.get
    val rootB = tmp("ddx-wal-b")
    val (bpB, spB, logB) = (s"$rootB/bands", s"$rootB/sigs", s"$rootB/gen")
    epochs.takeWhile(_._1 < e).foreach { case (i, d) =>
      DedupIndex.applyEpochRebalanced(spark, d.toDS(), bpB, spB, i,
        logB, maxRows)
    }
    val dE = epochs.find(_._1 == e).get._2
    val prefixB = TextIndex.loadSplitLog(spark, logB).map(_._2)
    DedupIndex.applyEpoch(spark, dE.toDS(), bpB, spB, splits = prefixB)
    TextIndex.saveSplitLogEpoch(spark, logB, e,
      Seq(refLog.filter(_._1 == e).map(_._2).head))
    // --- crash --- replay through the full protocol, then finish
    DedupIndex.applyEpochRebalanced(spark, dE.toDS(), bpB, spB, e,
      logB, maxRows)
    epochs.dropWhile(_._1 <= e).foreach { case (i, d) =>
      DedupIndex.applyEpochRebalanced(spark, d.toDS(), bpB, spB, i,
        logB, maxRows)
    }
    assert(TextIndex.loadSplitLog(spark, logB) === refLog,
      "the healed run's genealogy log must equal the crash-free run's")
    assert(bandsContent(bpB) === bandsContent(bpA),
      "the healed run's bands must equal the crash-free run's")
    assert(sigsContent(spB) === sigsContent(spA))
    // S2: full-epoch replay is a no-op
    val (lastE, lastD) = epochs.last
    val c0 = bandsContent(bpB)
    DedupIndex.applyEpochRebalanced(spark, lastD.toDS(), bpB, spB,
      lastE, logB, maxRows)
    assert(bandsContent(bpB) === c0 &&
      TextIndex.loadSplitLog(spark, logB) === refLog,
      "full-epoch replay must be a no-op")
    // screen through the logged genealogy == screen of an unsplit
    // rebuild of the final corpus (the layout-free theorem)
    val rb = tmp("ddx-wal-rb")
    DedupIndex.buildIndex(finalState().toSeq.toDF("doc_id", "text"),
      s"$rb/bands", s"$rb/sigs")
    val probes = DedupIndex.probesOf(docs).localCheckpoint(true)
    val viaLog = DedupIndex.screenIndex(spark, probes, bpA, spA,
        splits = refLog.map(_._2))
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val viaRebuild = DedupIndex.screenIndex(spark, probes,
        s"$rb/bands", s"$rb/sigs")
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(viaLog === viaRebuild && viaLog.nonEmpty,
      "screen through the logged genealogy must equal the rebuilt screen")
  }

  test("restarted serving job: band genealogy loaded in a FRESH session screens identically") {
    // the band-layout twin of the TextIndex fresh-session pin (VERDICT
    // r15 next #8): build + two splits + persist, then a NEW isolated
    // session loads the genealogy from disk and screens the SAME
    // artifact — results must equal the in-memory screen bit for bit
    val root = tmp("ddx-split-fresh")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupIndex.buildIndex(docs.select("doc_id", "text"), bp, sp)
    def hottest(cands: Option[Seq[Int]]): Int = {
      val counts = spark.read.parquet(bp).groupBy("bucket").count()
      cands.fold(counts)(cs => counts.filter(col("bucket").isin(cs: _*)))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
        .sortBy { case (b, n) => (-n, b) }.head._1
    }
    val h0 = hottest(None)
    var splits = DedupIndex.splitBandBucket(spark, bp, h0, Nil)
    splits = DedupIndex.splitBandBucket(spark, bp,
      hottest(Some(Seq(h0, h0 + 16))), splits)
    TextIndex.saveSplits(spark, s"$root/splits", splits)
    val inMem = DedupIndex.screenIndex(spark, DedupIndex.probesOf(docs),
        bp, sp, splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val s2 = spark.newSession()
    val loaded = TextIndex.loadSplits(s2, s"$root/splits")
    assert(loaded === splits, "the genealogy must ride the reload")
    val viaLoaded = DedupIndex.screenIndex(s2,
        DedupIndex.probesOf(Tables(s2, sf, "documents")), bp, sp,
        splits = loaded)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(viaLoaded === inMem && inMem.nonEmpty,
      "fresh-session screen through the reloaded genealogy must equal the in-memory screen")
  }

  test("an epoch that empties EVERY bucket leaves readable artifacts (empty-root guard)") {
    // ADVICE r14 #2 regression pin, band+sig twins of the TextIndex
    // case: an all-partitions-emptied root must read as absent
    val root = tmp("ddx-emptyroot")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    val text = "alpha beta gamma delta"
    DedupIndex.applyEpoch(spark, Seq(mkDelta(1L, +1, text)).toDS(), bp, sp)
    assert(graft.ml.IndexFs.hasPartitions(spark, bp, "bucket") &&
      graft.ml.IndexFs.hasPartitions(spark, sp, "sbucket"))
    DedupIndex.applyEpoch(spark, Seq(mkDelta(1L, -1, text)).toDS(), bp, sp)
    assert(new java.io.File(bp).exists() && new java.io.File(sp).exists())
    assert(!graft.ml.IndexFs.hasPartitions(spark, bp, "bucket") &&
      !graft.ml.IndexFs.hasPartitions(spark, sp, "sbucket"),
      "zero partition dirs must read as no-index on BOTH sub-artifacts")
    val (tb, ts) = DedupIndex.applyEpoch(spark,
      Seq(mkDelta(2L, +1, "epsilon zeta eta theta")).toDS(), bp, sp)
    assert(tb.nonEmpty && ts.nonEmpty)
    assert(bandsContent(bp).map(_._1) === Set(2L),
      "the revived artifact holds exactly the new doc's rows")
  }

  test("size-triggered splits DURING maintenance: policy in the epoch loop, screen == from-scratch") {
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val root = tmp("ddx-hotmaint")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    var splits = Seq.empty[TextIndex.HashSplit]
    var state = Map.empty[Long, String]
    var first = true
    var maxRows = 0L
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
      val (tb, _) = DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp,
        splits = splits)
      if (first) {
        // threshold derived from the live histogram: 80% of the
        // snapshot's hottest bucket, so the first policy call must
        // split at least that bucket (band hashes are near-uniform —
        // no cascade follows; the point here is the policy IN the
        // loop, the cascade dynamic is pinned on the text layout)
        maxRows = (spark.read.parquet(bp).groupBy("bucket").count()
          .agg(max("count")).collect()(0).getLong(0) * 8) / 10
        first = false
      }
      splits = DedupIndex.splitIfHot(spark, bp, tb, splits, maxRows)
      // genealogy invariant holds after every epoch+policy step
      assert(spark.read.parquet(bp)
        .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
          col("band"), col("bk"), splits)).count() === 0L)
    }
    assert(splits.nonEmpty, "the sized threshold must trip the policy")
    // the screen through the final genealogy equals the from-scratch
    // incremental screen over the final corpus
    val live = state.toSeq.toDF("doc_id", "text")
    val probes = DedupIndex.probesOf(live).localCheckpoint(true)
    val served = DedupIndex.screenIndex(spark, probes, bp, sp,
        splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val ref = Dedup.dedupIncrement(
        DedupIndex.sigRowsFor(probes), DedupIndex.sigRowsFor(live),
        minEst = DedupIndex.MinEst)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(served === ref && served.nonEmpty,
      "screen off the policy-maintained layout must equal from-scratch")
  }

  test("soak: splits x compaction x emptied-bucket cleanup interleaved over a long history (band layout)") {
    // TextIndexSpec's lifecycle soak on the band layout (VERDICT r15
    // next #9 named both spec files): 6 epochs of apply, the in-loop
    // split policy, insert-only append waves, and interleaved
    // compaction on BOTH sub-artifacts, invariants asserted every
    // epoch; then total retraction (artifacts read as absent) and
    // revival through the surviving genealogy
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 6)
    val root = tmp("ddx-soak")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    var splits = Seq.empty[TextIndex.HashSplit]
    var state = Map.empty[Long, String]
    var bid = 0L
    var maxRows = 0L
    val appended = scala.collection.mutable.Map.empty[Long, String]
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
      val (tb, _) = DedupIndex.applyEpoch(spark, deltas.toDS(), bp, sp,
        splits = splits)
      if (bid == 0L)
        maxRows = (spark.read.parquet(bp).groupBy("bucket").count()
          .agg(max("count")).collect()(0).getLong(0) * 8) / 10
      splits = DedupIndex.splitIfHot(spark, bp, tb, splits, maxRows)
      // fragmentation pressure: an insert-only append wave between
      // epochs (fresh key namespace)
      val wave = (1L to 5L)
        .map(k => (3000000L + 10 * bid + k, s"soak wave$bid token$k"))
      wave.foreach { case (k, t) => appended(k) = t }
      DedupIndex.appendToIndex(wave.toDF("doc_id", "text"), bp, sp,
        splits = splits)
      // compaction interleaves with live splits every other epoch
      if (bid % 2 == 1) {
        DedupIndex.compactIndex(spark, bp, "bucket", maxFiles = 2)
        DedupIndex.compactIndex(spark, sp, "sbucket", maxFiles = 2)
      }
      // invariants hold mid-history, every epoch
      assert(splits.size <= 64,
        s"genealogy must stay bounded: ${splits.size}")
      assert(spark.read.parquet(bp)
        .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
          col("band"), col("bk"), splits)).count() === 0L,
        s"epoch $bid: every band row must live in its genealogy bucket")
      bid += 1
    }
    assert(splits.nonEmpty, "the sized threshold must trip the policy")
    // bounded fragmentation after the final compaction; both converge
    DedupIndex.compactIndex(spark, bp, "bucket", maxFiles = 2)
    DedupIndex.compactIndex(spark, sp, "sbucket", maxFiles = 2)
    graft.ml.IndexFs.partitionValues(spark, bp, "bucket").foreach { b =>
      assert(graft.ml.IndexFs
        .dataFileCount(spark, s"$bp/bucket=$b") <= 2,
        s"band bucket $b must be compact after the final pass")
    }
    assert(DedupIndex.compactIndex(spark, bp, "bucket", 2).isEmpty &&
      DedupIndex.compactIndex(spark, sp, "sbucket", 2).isEmpty,
      "compaction must converge on both sub-artifacts")
    // maintained == rebuild of (folded history ∪ appended waves) —
    // content equality, then screen equality vs from-scratch
    val expect = state ++ appended
    val rb = tmp("ddx-soak-rb")
    val (bp2, sp2) = (s"$rb/bands", s"$rb/sigs")
    DedupIndex.buildIndex(expect.toSeq.toDF("doc_id", "text"), bp2, sp2)
    // band CONTENT equal (bucket LAYOUT differs: the soaked artifact
    // descends its genealogy, the rebuild is unsplit)
    assert(bandsContent(bp) === bandsContent(bp2),
      "the soaked band rows must equal the full rebuild's")
    assert(sigsContent(sp) === sigsContent(sp2),
      "the soaked signature rows must equal the full rebuild's")
    val live = expect.toSeq.toDF("doc_id", "text")
    val probes = DedupIndex.probesOf(live).localCheckpoint(true)
    val a = DedupIndex.screenIndex(spark, probes, bp, sp,
        splits = splits)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    val b = DedupIndex.screenIndex(spark, probes, bp2, sp2)
      .collect().map(_.toSeq.map(x => x: Any)).toSeq
    assert(a === b && a.nonEmpty, "soaked screen must equal rebuilt screen")
    // total retraction: one epoch deletes EVERY live doc — both
    // artifacts read as absent, the genealogy survives
    val wipe = expect.toSeq.map { case (k, t) => mkDelta(k, -1, t) }
    DedupIndex.applyEpoch(spark, wipe.toDS(), bp, sp, splits = splits)
    assert(!graft.ml.IndexFs.hasPartitions(spark, bp, "bucket"),
      "total retraction must clear every band partition")
    assert(!graft.ml.IndexFs.hasPartitions(spark, sp, "sbucket"),
      "total retraction must clear every sig partition")
    // revive THROUGH the existing genealogy
    DedupIndex.applyEpoch(spark,
      Seq(mkDelta(1L, +1, snap.head._2)).toDS(), bp, sp,
      splits = splits)
    assert(spark.read.parquet(bp)
      .filter(col("bucket") =!= DedupIndex.splitBandBucketOf(
        col("band"), col("bk"), splits)).count() === 0L,
      "the revived epoch must route through the surviving genealogy")
    // probe with a FRESH id carrying the same text: the screen must
    // find the revived doc as its near-dup (a self-probe is excluded
    // by design, so it cannot witness the revival)
    assert(DedupIndex.screenIndex(spark,
        Seq((4000000L, snap.head._2)).toDF("doc_id", "text"),
        bp, sp, splits = splits)
      .collect().nonEmpty,
      "screen must work against the revived artifact")
  }
}
