package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.ml.DedupIndex
import graft.streaming.{DedupGate, IncrementalDedup}

/** The indexed continuous dedup gate ([[graft.streaming.DedupGate]]):
  * the oracle row (`ml_dedup_gate_index`) proves the two-epoch fold
  * against DuckDB end to end through the real file stream; these tests
  * pin the equivalences and restart contracts the value-compare can't
  * state — indexed gate == flat-store gate on the same waves,
  * accepted-epoch replay idempotence (reads epoch-scoped as well as
  * writes epoch-keyed), and epoch-keyed append accounting (a batch
  * creates dirs only under its touched buckets × its own batch id). */
class DedupGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables(spark, sf, "documents")
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def asDay(df: DataFrame): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(df.collect().toSeq, 1),
      IncrementalDedup.DocSchema)

  private def outcomes(outDir: String, readRej: Boolean)
      : Set[(Long, Long, Double)] =
    if (readRej)
      spark.read.parquet(s"$outDir/rejected/batch=*")
        .select("doc_id", "matched_id", "est_jaccard")
        .as[(Long, Long, Double)].collect().toSet
    else Set.empty

  test("indexed gate == flat-store gate on the same two waves") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val waves = Seq(
      asDay(docs.filter(col("doc_id") % 20 === 0)),
      asDay(docs.filter(col("doc_id") % 20 === 10)))
    // flat store (IncrementalDedup)
    val fSig = tmp("gate-flat-sigs"); val fOut = tmp("gate-flat-out")
    IncrementalDedup.seedStore(
      graft.ml.Dedup.minhashWide(corpus).localCheckpoint(true), fSig)
    waves.zipWithIndex.foreach { case (w, i) =>
      IncrementalDedup.applyBatch(w, fSig, fOut, i.toLong, minEst = 0.5)
    }
    // indexed store (DedupGate)
    val root = tmp("gate-idx"); val gOut = tmp("gate-out")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupGate.seedGate(corpus, bp, sp)
    waves.zipWithIndex.foreach { case (w, i) =>
      DedupGate.applyBatch(w, bp, sp, gOut, i.toLong)
    }
    val flatAcc = IncrementalDedup.accepted(spark, fOut)
      .select("doc_id").as[Long].collect().toSet
    val gateAcc = DedupGate.accepted(spark, gOut)
      .select("doc_id").as[Long].collect().toSet
    // the flat pipeline never sees unscreenable docs' sigs but accepts
    // the docs themselves (applyBatch anti-joins the DOC rows), so the
    // accepted DOC sets must agree exactly
    assert(gateAcc === flatAcc,
      "indexed and flat gates must accept the same docs")
    val flatRej = IncrementalDedup.rejected(spark, fOut)
      .select("doc_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val gateRej = spark.read.parquet(s"$gOut/rejected/batch=*")
      .select("doc_id", "matched_id", "est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(gateRej === flatRej,
      "indexed and flat gates must reject identically")
    assert(gateRej.nonEmpty && gateAcc.nonEmpty)
  }

  test("accepted-epoch replay is a no-op: reads are epoch-scoped, writes epoch-keyed") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val day = asDay(docs.filter(col("doc_id") % 20 === 0))
    val root = tmp("gate-replay-idx"); val out = tmp("gate-replay-out")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupGate.seedGate(corpus, bp, sp)
    DedupGate.applyBatch(day, bp, sp, out, 0L)
    val acc0 = DedupGate.accepted(spark, out)
      .select("doc_id").as[Long].collect().toSet
    val rej0 = outcomes(out, readRej = true)
    assert(acc0.nonEmpty, "the epoch must accept some docs")
    val bands0 = spark.read.parquet(bp)
      .select("doc_id", "band", "bk", "bucket", "batch")
      .collect().map(_.toSeq).toSet
    // replay with the epoch's own appends on disk — the visible filter
    // (batch < id) must hide them, or every accepted doc self-matches
    DedupGate.applyBatch(day, bp, sp, out, 0L)
    assert(DedupGate.accepted(spark, out)
      .select("doc_id").as[Long].collect().toSet === acc0,
      "replay must not flip accepted docs to rejected")
    assert(outcomes(out, readRej = true) === rej0,
      "replay must reproduce identical rejections")
    assert(spark.read.parquet(bp)
      .select("doc_id", "band", "bk", "bucket", "batch")
      .collect().map(_.toSeq).toSet === bands0,
      "replay must leave the index content unchanged")
  }

  test("the epoch-scoped screen read prunes BOTH partition levels (bucket and batch)") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val root = tmp("gate-prune-idx"); val out = tmp("gate-prune-out")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupGate.seedGate(corpus, bp, sp)
    DedupGate.applyBatch(
      asDay(docs.filter(col("doc_id") % 20 === 0)), bp, sp, out, 0L)
    DedupGate.applyBatch(
      asDay(docs.filter(col("doc_id") % 20 === 10)), bp, sp, out, 1L)
    // a small probe set: few band buckets touched
    val probe = docs.filter(col("doc_id") === 5).select("doc_id", "text")
    val pBuckets = DedupIndex.bandRowsFor(DedupIndex.sigRowsFor(probe))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSeq
    // epoch 1's view: batches {-1, 0} only — batch=1 dirs must not be read
    val scanned = spark.read.parquet(bp)
      .filter(col("bucket").isin(pBuckets: _*) && col("batch") < 1L)
      .select(input_file_name()).distinct().collect()
      .map(_.getString(0)).toSet
    assert(scanned.nonEmpty)
    assert(scanned.forall(f => f.contains("batch=-1") || f.contains("batch=0")),
      s"epoch-scoped read must exclude later batches' files: $scanned")
    assert(scanned.forall(f =>
      pBuckets.exists(b => f.contains(s"bucket=$b/"))),
      "read must stay within the probed buckets")
    // the expected file set exactly: every existing file under
    // (probed bucket, batch < 1)
    val expected = pBuckets.flatMap { b =>
      Seq(-1L, 0L).flatMap { e =>
        val d = new java.io.File(s"$bp/bucket=$b/batch=$e")
        Option(d.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.endsWith(".parquet")).map(_.getName)
      }
    }.toSet
    assert(scanned.map(f => f.substring(f.lastIndexOf('/') + 1)) === expected,
      "files read must be exactly the visible probed partitions' files")
  }

  test("compactGate merges committed epochs into the seed partition; content invariant") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val root = tmp("gate-compact-idx"); val out = tmp("gate-compact-out")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupGate.seedGate(corpus, bp, sp)
    (0 to 2).foreach { w =>
      DedupGate.applyBatch(
        asDay(docs.filter(col("doc_id") % 20 === 0)
          .filter(col("doc_id") % 3 === w)), bp, sp, out, w.toLong)
    }
    def content(p: String): Set[Seq[Any]] =
      spark.read.parquet(p).drop("batch").collect()
        .map(_.toSeq.map(x => x: Any)).toSet
    def dirs(p: String): Map[String, Set[String]] =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).map { b =>
          b.getName -> b.listFiles().filter(_.isDirectory)
            .map(_.getName).toSet
        }.toMap
    val before = content(bp)
    val dirsBefore = dirs(bp)
    val frag = dirsBefore.filter(_._2.size > 2).keySet
    assume(frag.nonEmpty, "three waves must have fragmented some bucket")
    val probe = docs.filter(col("doc_id") === 5).select("doc_id", "text")
    val s0 = DedupIndex.screenIndex(spark, probe, bp, sp).collect().toSeq
    val compacted = DedupGate.compactGate(spark, bp, "bucket",
      upToBatch = 2L, maxFiles = 2)
    val dirsAfter = dirs(bp)
    assert(content(bp) === before, "compaction must not change the rows")
    compacted.foreach { b =>
      assert(dirsAfter(s"bucket=$b") === Set("batch=-1"),
        s"bucket=$b must hold only the consolidated seed partition")
    }
    (dirsBefore.keySet -- compacted.map(b => s"bucket=$b")).foreach { b =>
      assert(dirsAfter(b) === dirsBefore(b), s"$b must be untouched")
    }
    // the screen is unaffected by the layout rewrite
    val s1 = DedupIndex.screenIndex(spark, probe, bp, sp).collect().toSeq
    assert(s1 === s0, "screen must be invariant under compaction")
    // CONVERGENCE (ADVICE r14 #1): the rewrite must itself satisfy the
    // threshold it compacts against — one file per consolidated bucket,
    // so a compacted bucket can never be re-flagged as fragmented
    compacted.foreach { b =>
      val n = Option(new java.io.File(s"$bp/bucket=$b/batch=-1").listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"bucket=$b consolidated into $n files, want 1")
    }
    val again = DedupGate.compactGate(spark, bp, "bucket",
      upToBatch = 2L, maxFiles = 2)
    assert(again.isEmpty,
      s"an immediate second compactGate must find nothing to do: $again")
  }

  test("an epoch's appends land only under its touched buckets × its own batch id") {
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val root = tmp("gate-touch-idx"); val out = tmp("gate-touch-out")
    val (bp, sp) = (s"$root/bands", s"$root/sigs")
    DedupGate.seedGate(corpus, bp, sp)
    def batchDirs(path: String): Set[(String, String)] =
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.isDirectory).flatMap { b =>
          b.listFiles().filter(_.isDirectory).map(d => (b.getName, d.getName))
        }.toSet
    val before = batchDirs(bp)
    assert(before.forall(_._2 == "batch=-1"), "seed is epoch -1")
    val day = asDay(docs.filter(col("doc_id") % 20 === 0))
    DedupGate.applyBatch(day, bp, sp, out, 0L)
    val added = batchDirs(bp) -- before
    assert(added.nonEmpty && added.forall(_._2 == "batch=0"),
      "the epoch may create dirs only under batch=0")
    // expected buckets: the ACCEPTED docs' band buckets
    val accIds = DedupGate.accepted(spark, out)
      .select("doc_id").as[Long].collect().toSet
    val expBuckets = DedupIndex.bandRowsFor(DedupIndex.sigRowsFor(
        day.filter(col("doc_id").isin(accIds.toSeq: _*))
          .select("doc_id", "text")))
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(added.map(_._1) === expBuckets.map(b => s"bucket=$b"),
      "the epoch's dirs must be exactly the accepted docs' band buckets")
    // and the seed partitions are untouched
    assert(batchDirs(bp).intersect(before) === before)
  }
}
