package graft

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._
import graft.core.Tables
import graft.ml.Dedup
import graft.streaming.{BatchMetricsListener, IncrementalDedup}

/** The real deployment shape (r7 verdict #7): the CDC replica stream
  * and the streaming dedup pipeline live SIMULTANEOUSLY in one session,
  * isolated by scheduler pool — Spark's documented
  * scheduling-within-an-application model: the thread that starts a
  * streaming query stamps `spark.scheduler.pool`, every job that query
  * submits runs in that pool, and FAIR scheduling shares the executor
  * set between pools instead of letting one pipeline's long stage
  * starve the other's 2 s trigger cadence. The
  * [[CdcMlIntegrationSpec]] proves the two halves COMPOSE
  * (sequentially); this spec proves they COEXIST. */
class ConcurrentPipelinesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cdc replica + streaming dedup live concurrently in separate pools; both converge, CDC latency bounded") {
    val sc = spark.sparkContext
    assert(sc.getConf.get("spark.scheduler.mode", "FIFO") === "FAIR",
      "scheduler pools need FAIR mode")

    // every job's pool, captured at submission — the proof each
    // pipeline's work actually ran under ITS pool
    val pools = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val poolCapture = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        pools.add(Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.scheduler.pool")))
          .getOrElse("default"))
    }
    sc.addSparkListener(poolCapture)

    // wall-clock progress spans per query — the proof the two streams
    // were genuinely mid-flight at the same time
    val spans = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    val spanCapture = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val now = System.currentTimeMillis()
        spans.merge(e.progress.name, (now, now),
          (a, b) => (math.min(a._1, b._1), math.max(a._2, b._2)))
      }
    }
    spark.streams.addListener(spanCapture)

    // ---- CDC side: snapshot + 3000 streamed ops over 6 epochs --------
    val ops = ChangeGen.ops(seed = 501L, n = 4000)
    val (snapOps, streamOps) = ops.splitAt(1000)
    val changeDir = Files.createTempDirectory("conc-cdc-log").toString
    val replica = Files.createTempDirectory("conc-cdc-replica").toString
    val ckptC = Files.createTempDirectory("conc-cdc-ckpt").toString
    Replicate.snapshot(spark,
      ChangeGen.replay(snapOps).values.toSeq.toDS(), replica)
    ChangeGen.writeBatches(changeDir, streamOps, batches = 6)

    // ---- ML side: half the corpus seeds the store, the other half
    // streams in as 4 new-doc waves ------------------------------------
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val seedDocs = docs.filter($"doc_id" % 2 === 0)
    val waves = docs.filter($"doc_id" % 2 === 1).cache()
    val waveCount = waves.count()
    val sigDir = Files.createTempDirectory("conc-ml-sig").toString
    val newDir = Files.createTempDirectory("conc-ml-new").toString
    val outDir = Files.createTempDirectory("conc-ml-out").toString
    val ckptM = Files.createTempDirectory("conc-ml-ckpt").toString
    IncrementalDedup.seedStore(Dedup.minhashWide(seedDocs), sigDir)
    val stage = Files.createTempDirectory("conc-ml-stage").toString
    (0 until 4).foreach { w =>
      val d = s"$stage/w$w"
      waves.filter((($"doc_id" - 1) / 2) % 4 === w)
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(d)
      val part = new java.io.File(d).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(newDir, f"wave$w%02d.parquet"))
    }

    // ---- launch both LIVE, each in its own pool ----------------------
    val cdcL = new BatchMetricsListener(Some("graft-replicate"))
    val mlL = new BatchMetricsListener(Some("graft-inc-dedup"))
    spark.streams.addListener(cdcL)
    spark.streams.addListener(mlL)
    sc.setLocalProperty("spark.scheduler.pool", "cdc")
    val qCdc = Replicate.start(spark, changeDir, replica, ckptC,
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      maxFilesPerTrigger = Some(1))
    sc.setLocalProperty("spark.scheduler.pool", "ml")
    val qMl = IncrementalDedup.start(spark, newDir, sigDir, outDir, ckptM,
      trigger = Trigger.ProcessingTime("500 milliseconds"),
      maxFilesPerTrigger = Some(1))
    sc.setLocalProperty("spark.scheduler.pool", null)

    try {
      // drain on COMPLETED non-empty batches (6 CDC epochs, 4 waves) —
      // counting raw rows is unreliable mid-flight (a progress event's
      // numInputRows can over-report while a backlog is discovered)
      val deadline = System.nanoTime() + 180L * 1000 * 1000 * 1000
      def cdcDone = cdcL.batches.count(_.inputRows > 0) >= 6
      def mlDone = mlL.batches.count(_.inputRows > 0) >= 4
      while ((!cdcDone || !mlDone) && System.nanoTime() < deadline)
        Thread.sleep(200)
    } finally {
      qCdc.stop(); qMl.stop()
      spark.streams.removeListener(cdcL)
      spark.streams.removeListener(mlL)
      spark.streams.removeListener(spanCapture)
      sc.removeSparkListener(poolCapture)
    }
    Replicate.awaitCompactions()

    assert(cdcL.batches.count(_.inputRows > 0) >= 6,
      s"CDC drained ${cdcL.batches}/6 epochs before deadline")
    assert(mlL.batches.count(_.inputRows > 0) >= 4,
      s"dedup drained ${mlL.batches}/4 waves before deadline")

    // each pipeline's jobs ran in its own pool
    assert(pools.contains("cdc") && pools.contains("ml"),
      s"pools seen at job submission: $pools")
    // and their progress spans genuinely overlapped in wall-clock time
    val (c0, c1) = spans.get("graft-replicate")
    val (m0, m1) = spans.get("graft-inc-dedup")
    assert(c0 <= m1 && m0 <= c1,
      s"streams never overlapped: cdc [$c0,$c1] vs ml [$m0,$m1]")

    // CDC converged to the replay — the other pipeline's load never
    // corrupted it — and its per-trigger latency stayed bounded (FAIR
    // pools: the dedup stages cannot starve the replica's cadence)
    val got = Replicate.readReplica(spark, replica).collect()
      .map(p => p.id -> ((p.name, p.uid, p.score))).toMap
    assert(got === ChangeGen.replay(ops).map { case (id, p) =>
      id -> ((p.name, p.uid, p.score)) })
    assert(cdcL.worstBatchSec < 10.0,
      s"CDC worst batch ${cdcL.worstBatchSec}s — starved under concurrent load")

    // the dedup result equals ITS OWN sequential replay: re-screen the
    // exact per-epoch doc sets the stream processed, in epoch order,
    // against a fresh store seeded identically — concurrency must not
    // change a single accept/reject decision
    val sigDir2 = Files.createTempDirectory("conc-ml-sig2").toString
    val outDir2 = Files.createTempDirectory("conc-ml-out2").toString
    IncrementalDedup.seedStore(Dedup.minhashWide(seedDocs), sigDir2)
    // a batch may reject nothing — declare the schema so an empty epoch
    // dir (just _SUCCESS) still reads as zero rows
    val rejSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("matched_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("est_jaccard",
        org.apache.spark.sql.types.DoubleType)))
    val epochs = new java.io.File(s"$outDir/accepted").listFiles()
      .map(_.getName.stripPrefix("batch=").toLong).sorted
    epochs.foreach { id =>
      val acc = spark.read.schema(IncrementalDedup.DocSchema)
        .parquet(s"$outDir/accepted/batch=$id").select("doc_id")
      val rej = spark.read.schema(rejSchema)
        .parquet(s"$outDir/rejected/batch=$id").select("doc_id")
      val epochDocs = waves.join(acc.union(rej).distinct(), "doc_id")
        .select(waves.columns.map(org.apache.spark.sql.functions.col).toSeq: _*)
      IncrementalDedup.applyBatch(epochDocs, sigDir2, outDir2, id)
    }
    def ids(dir: String, leaf: String): Set[Long] = {
      val schema =
        if (leaf == "accepted") IncrementalDedup.DocSchema else rejSchema
      spark.read.schema(schema).parquet(s"$dir/$leaf/batch=*")
        .select("doc_id").as[Long].collect().toSet
    }
    assert(ids(outDir, "accepted") === ids(outDir2, "accepted"))
    assert(ids(outDir, "rejected") === ids(outDir2, "rejected"))
    assert(ids(outDir, "accepted").size + ids(outDir, "rejected").size
      === waveCount, "every streamed doc decided exactly once")
    waves.unpersist()
  }
}
