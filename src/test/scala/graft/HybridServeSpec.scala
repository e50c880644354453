package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.MtDelta
import graft.core.Tables
import graft.ml.{AnnIndex, HybridServe, Similarity, TextAnalysis, TextIndex}

/** The one-stream/two-indexes composition ([[graft.ml.HybridServe]]):
  * the oracle row proves maintained == rebuilt jointly; these tests
  * pin the routing contract (a MIXED batch applied through both
  * maintainers leaves each index identical to applying only its own
  * table's deltas) and the integer RRF fusion arithmetic. */
class HybridServeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("a mixed multi-table batch routes to each maintainer's own table only") {
    val emb = Tables(spark, sf, "embeddings")
    val root = tmp("hyb-route")
    val cents = Similarity.coarseCentroids(emb)
    val cb = Similarity.pqTrain(emb)
    val docDelta = MtDelta("document", "999999", 1,
      """{"doc_id":"999999","text":"spark merge window"}""", None)
    val q0 = emb.select(col("vec_id"),
        graft.ml.MlFunctions.quantize(col("embedding")).as("q"))
      .filter(col("vec_id") === 0)
      .select("q").collect()(0).getSeq[Long](0).mkString(",")
    val embDelta = MtDelta("embedding", "999999", 1,
      s"""{"vec_id":"999999","emb":"$q0"}""", None)
    // mixed apply
    val (tiM, anM) = (s"$root/ti-mixed", s"$root/an-mixed")
    val mixed = Seq(docDelta, embDelta).toDS()
    TextIndex.applyEpoch(spark, mixed, s"$tiM/idx", s"$tiM/stats", 0L)
    AnnIndex.applyEpoch(spark, mixed, anM, cents, cb)
    // solo applies
    val (tiS, anS) = (s"$root/ti-solo", s"$root/an-solo")
    TextIndex.applyEpoch(spark, Seq(docDelta).toDS(),
      s"$tiS/idx", s"$tiS/stats", 0L)
    AnnIndex.applyEpoch(spark, Seq(embDelta).toDS(), anS, cents, cb)
    def postings(p: String) = spark.read.parquet(p)
      .select("doc_id", "term", "tf", "dlen").collect()
      .map(_.toSeq).toSet
    def cells(p: String) = spark.read.parquet(p)
      .select("vec_id", "cell").collect().map(_.toSeq).toSet
    assert(postings(s"$tiM/idx") === postings(s"$tiS/idx"),
      "the text maintainer must see only document deltas")
    assert(cells(anM) === cells(anS),
      "the ANN maintainer must see only embedding deltas")
    assert(postings(s"$tiM/idx").nonEmpty && cells(anM).nonEmpty)
  }

  test("one checkpoint, two indexes: restart mid-history converges both artifacts") {
    // the composition contract TextIndexSpec's single-table restart
    // can't state: ONE stream's checkpoint gates BOTH maintainers, so
    // a restart must replay (or skip) the same epoch for the postings
    // AND the cells together
    import org.apache.spark.sql.Dataset
    import org.apache.spark.sql.streaming.Trigger
    import graft.cdc.{ChangeGen, ChangeSource, Ivm, MtDelta, MultiTable}
    val emb = Tables(spark, sf, "embeddings")
    val docs = Tables(spark, sf, "documents")
    val cents = Similarity.coarseCentroids(emb)
    val cb = Similarity.pqTrain(emb)
    val docOps = TextIndex.epochScript(
      docs.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq, epochs = 3)
    val embOps = AnnIndex.epochScript(
      emb.select(col("vec_id"),
          graft.ml.MlFunctions.quantize(col("embedding")).as("q"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
        .toSeq, epochs = 3)
    def writeEpochs(dir: String, upTo: Int): Unit =
      (0 to upTo).foreach { e =>
        val lines =
          docOps.filter(_.epoch == e).sortBy(_.lsn).map(TextIndex.toLine) ++
            embOps.filter(_.epoch == e).sortBy(_.lsn).map(AnnIndex.toLine)
        ChangeGen.writeLineBatches(dir, lines, batches = 1, startIndex = e)
      }
    def drive(changeDir: String, ckpt: String, ti: String, st: String,
        an: String): Unit = {
      val q = Ivm.mtDeltas(MultiTable.parseAll(
          ChangeSource.rawLines(spark, changeDir, Some(1)),
          Seq(TextIndex.DocSpec, AnnIndex.EmbSpec)))
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
          val pinned = batch.localCheckpoint(true)
          TextIndex.applyEpoch(spark, pinned, ti, st, bid)
          AnnIndex.applyEpoch(spark, pinned, an, cents, cb)
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    def postings(p: String) = spark.read.parquet(p)
      .select("doc_id", "term", "tf", "dlen").collect().map(_.toSeq).toSet
    def cells(p: String) = spark.read.parquet(p)
      .select("vec_id", "cell", "codes").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2))).toSet
    // run A: epochs 0..1, stop, then 2..3 on the SAME checkpoint
    val dirA = tmp("hyb-restart-log"); val rootA = tmp("hyb-restart")
    writeEpochs(dirA, 1)
    drive(dirA, s"$rootA/ckpt", s"$rootA/ti", s"$rootA/st", s"$rootA/an")
    writeEpochs(dirA, 3)
    drive(dirA, s"$rootA/ckpt", s"$rootA/ti", s"$rootA/st", s"$rootA/an")
    // run B: one shot
    val dirB = tmp("hyb-oneshot-log"); val rootB = tmp("hyb-oneshot")
    writeEpochs(dirB, 3)
    drive(dirB, s"$rootB/ckpt", s"$rootB/ti", s"$rootB/st", s"$rootB/an")
    assert(postings(s"$rootA/ti") === postings(s"$rootB/ti"),
      "restarted postings must converge to the one-shot artifact")
    assert(cells(s"$rootA/an") === cells(s"$rootB/an"),
      "restarted cells must converge to the one-shot artifact")
    graft.streaming.StreamHygiene.unloadStateStores()
  }

  test("integer RRF fusion: exact arithmetic on a hand-built pair of lists") {
    import TextAnalysis.{RrfK, RrfScale}
    // lex scores: doc 3 > doc 1 > doc 7 → ranks 1, 2, 3
    val lex = Seq((3L, 1L, 300L), (1L, 1L, 200L), (7L, 1L, 100L))
      .toDF("doc_id", "matched", "score_fp")
    // sem ranks: doc 1 at 1, doc 9 at 2
    val sem = Seq((0L, 1L, 1L, 5L, 9L), (0L, 2L, 9L, 6L, 11L))
      .toDF("query_id", "rank", "vec_id", "adc", "exact_d2")
    val out = HybridServe.fuse(lex, sem).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(3)))
    def rr(rank: Long): Long = RrfScale / (RrfK + rank)
    val expected = Seq(
      (1L, Some(2L), Some(1L), rr(2) + rr(1)), // both lists
      (3L, Some(1L), None, rr(1)),
      (9L, None, Some(2L), rr(2)),
      (7L, Some(3L), None, rr(3)))
      .sortBy(t => (-t._4, t._1))
    assert(out.toSeq === expected,
      "fusion must match the hand-derived integer RRF exactly")
  }
}
