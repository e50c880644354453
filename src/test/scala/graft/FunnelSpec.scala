package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.streaming.Funnel

// file-level: a spec-nested case class has no stable outer scope for
// Catalyst's deserializer
private[graft] case class FnEv(user_id: Long, event_id: Long,
    ts: Timestamp, event_type: String)

/** The streaming conversion funnel ([[graft.streaming.Funnel]], Spark 4
  * `transformWithState`): same completions as the oracle-checked batch
  * query across real micro-batch boundaries, RocksDB provider engaged,
  * exactly-once across a checkpoint restart through the file sink. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb = "org.apache.spark.sql.execution.streaming." +
    "state.RocksDBStateStoreProvider"

  private def withRocksDb(body: => Unit): Unit = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def fixtureEvents(): Array[FnEv] =
    Tables(spark, sf, "events")
      .select("user_id", "event_id", "ts", "event_type")
      .orderBy("ts", "event_id").collect()
      .map(r => FnEv(r.getLong(0), r.getLong(1), r.getTimestamp(2),
        r.getString(3)))

  /** Far-future events: the first pushes the watermark past the whole
    * fixture; the second triggers one more batch so the event-time
    * timers registered at watermark-advance time actually fire. */
  private def flushEvents(): Seq[FnEv] = Seq(
    FnEv(-1L, 0L, Timestamp.valueOf("2031-01-01 00:00:00"), "view"),
    FnEv(-1L, 1L, Timestamp.valueOf("2031-01-02 00:00:00"), "noop"))

  private def batchHits(): Set[(Long, Long, Long, Long, Long, Long)] =
    Funnel.completions(Tables(spark, sf, "events"))
      .selectExpr("user_id", "view_id", "click_id", "purchase_id",
        "unix_micros(view_ts)", "unix_micros(purchase_ts)")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  test("streaming funnel equals the batch query; RocksDB provider engaged") {
    withRocksDb {
      import scala.jdk.CollectionConverters._
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Funnel.streaming(in.toDF())
        .writeStream.format("memory").queryName("funnel_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e =>
          in.addData(e); q.processAllAvailable()
        }
        val rocksEngaged = q.lastProgress.stateOperators.exists(
          _.customMetrics.keySet().asScala.exists(
            _.toLowerCase.contains("rocksdb")))
        assert(rocksEngaged, "RocksDB provider metrics absent")
        val got = spark.table("funnel_sink")
          .select("user_id", "view_id", "click_id", "purchase_id",
            "view_ts_us", "purchase_ts_us")
          .as[(Long, Long, Long, Long, Long, Long)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = batchHits()
        assert(got.toSet === want)
        assert(want.nonEmpty, "fixture must contain completions")
      } finally q.stop()
    }
  }

  test("funnel batch semantics equal a naive greedy replay, 12 seeded schedules") {
    val types = Seq("view", "click", "purchase", "error")
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val gapUs = 600L * 1000000 // 10 min — tight enough to sever chains
      val base = Timestamp.valueOf("2026-03-01 00:00:00").getTime
      // second-granularity over 2 h → deliberate timestamp collisions
      val evs = (0 until 400).map { i =>
        FnEv(rnd.nextInt(6).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          types(rnd.nextInt(types.size)))
      }
      val got = Funnel.completions(evs.toDF(), gapUs)
        .selectExpr("user_id", "view_id", "click_id", "purchase_id")
        .as[(Long, Long, Long, Long)].collect().toSet
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var st = 0; var vt = 0L; var vid = 0L; var ct = 0L; var cid = 0L
        var hit: Option[(Long, Long, Long, Long)] = None
        for (e <- sorted if hit.isEmpty) {
          val tus = e.ts.getTime * 1000L
          st match {
            case 0 if e.event_type == "view" =>
              st = 1; vt = tus; vid = e.event_id
            case 1 if e.event_type == "click" &&
                (tus > vt || (tus == vt && e.event_id > vid)) &&
                tus - vt <= gapUs =>
              st = 2; ct = tus; cid = e.event_id
            case 2 if e.event_type == "purchase" &&
                (tus > ct || (tus == ct && e.event_id > cid)) &&
                tus - ct <= gapUs =>
              hit = Some((u, vid, cid, e.event_id))
            case _ => // greedy: anchors never re-bind
          }
        }
        hit
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("generic chain over the funnel's steps equals the funnel") {
    import graft.streaming.Cep
    val ev = Tables(spark, sf, "events")
    val viaChain = Cep.chain(ev, Seq("view", "click", "purchase"))
      .select("user_id", "step_ids").as[(Long, String)].collect().toMap
    val viaFunnel = Funnel.completions(ev)
      .selectExpr("user_id",
        "concat_ws(',', view_id, click_id, purchase_id)")
      .as[(Long, String)].collect().toMap
    assert(viaChain === viaFunnel)
    assert(viaChain.nonEmpty)
  }

  test("streaming 4-step chain equals the batch chain") {
    import graft.streaming.Cep
    val types = Seq("signup", "view", "click", "purchase")
    withRocksDb {
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streaming(in.toDF(), types)
        .writeStream.format("memory").queryName("chain_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("chain_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)")
          .as[(Long, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chain(Tables(spark, sf, "events"), types)
          .select("user_id", "step_ids").as[(Long, String)].collect().toSet
        assert(got.toSet === want)
        assert(want.nonEmpty, "fixture must contain 4-step completions")
      } finally q.stop()
    }
  }

  test("4-step chain equals a naive greedy replay, 12 seeded schedules") {
    import graft.streaming.Cep
    val types = Seq("view", "click", "error", "purchase")
    val all = types :+ "noop"
    for (seed <- 101 to 112) {
      val rnd = new scala.util.Random(seed)
      val gapUs = 900L * 1000000
      val base = Timestamp.valueOf("2026-04-01 00:00:00").getTime
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(5).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chain(evs.toDF(), types, gapUs)
        .select("user_id", "step_ids").as[(Long, String)].collect().toSet
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var st = 0; var at = 0L; var aid = 0L
        val ids = Seq.newBuilder[Long]
        var done = false
        for (e <- sorted if !done) {
          val tus = e.ts.getTime * 1000L
          if (st < types.size && e.event_type == types(st) &&
              (st == 0 ||
                ((tus > at || (tus == at && e.event_id > aid)) &&
                  tus - at <= gapUs))) {
            st += 1; at = tus; aid = e.event_id; ids += e.event_id
            if (st == types.size) done = true
          }
        }
        if (done) Some((u, ids.result().mkString(","))) else None
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("funnel checkpoint restart: file source + file sink, exactly once") {
    withRocksDb {
      val srcDir = Files.createTempDirectory("funnel-src").toString
      val outDir = Files.createTempDirectory("funnel-out").toString
      val ckpt = Files.createTempDirectory("funnel-ckpt").toString
      val events = fixtureEvents()
      val chunks = events.grouped(events.length / 4 + 1)
        .map(_.toSeq).toSeq
      def land(evs: Seq[FnEv]): Unit = {
        evs.toDS().coalesce(1).write.mode("append").parquet(srcDir)
        Thread.sleep(1100) // distinct file mtimes → deterministic order
      }
      def run(): Unit = {
        val src = spark.readStream
          .schema(spark.read.parquet(srcDir).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir)
        val q = Funnel.streaming(src)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
        try q.processAllAvailable() finally q.stop()
      }
      // phase 1: half the log, some completions land, then a hard stop
      chunks.take(2).foreach(land)
      run()
      // phase 2: the rest + flush, the SAME checkpoint resumes
      chunks.drop(2).foreach(land)
      land(flushEvents())
      run()
      val got = spark.read.parquet(outDir)
        .select("user_id", "view_id", "click_id", "purchase_id",
          "view_ts_us", "purchase_ts_us")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(got.length === got.toSet.size,
        "restart must not re-emit completions")
      assert(got.toSet === batchHits())
    }
  }

  test("chainNot with no negations equals chain") {
    import graft.streaming.{Cep, CepStep}
    val types = Seq("view", "click", "purchase")
    val ev = Tables(spark, sf, "events")
    val viaNot = Cep.chainNot(ev, types.map(t => CepStep(t)))
      .select("user_id", "step_ids").as[(Long, String)].collect().toSet
    val viaChain = Cep.chain(ev, types)
      .select("user_id", "step_ids").as[(Long, String)].collect().toSet
    assert(viaNot === viaChain)
    assert(viaNot.nonEmpty)
  }

  test("churn (trailing NOT) partitions the positive chain by purchase absence") {
    import graft.streaming.{Cep, CepStep}
    val ev = Tables(spark, sf, "events")
    val positive = Cep.chain(ev, Seq("view", "click"))
      .select("user_id").as[Long].collect().toSet
    val churned = Cep.chainNot(ev, Seq(CepStep("view"), CepStep("click"),
        CepStep("purchase", negated = true)))
      .select("user_id").as[Long].collect().toSet
    assert(churned.subsetOf(positive),
      "churn rows must be positive-chain completions")
    assert(churned.nonEmpty && churned != positive,
      "fixture must exercise both churned and converted users")
  }

  test("streaming chainNot (churn) equals batch; emission awaits the closed window") {
    import graft.streaming.{Cep, CepStep}
    val steps = Seq(CepStep("view"), CepStep("click"),
      CepStep("purchase", negated = true))
    withRocksDb {
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingNot(in.toDF(), steps)
        .writeStream.format("memory").queryName("churn_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("churn_sink")
          .select("user_id", "step_ids")
          .selectExpr("user_id", "concat_ws(',', step_ids)")
          .as[(Long, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chainNot(Tables(spark, sf, "events"), steps)
          .select("user_id", "step_ids").as[(Long, String)].collect().toSet
        assert(got.toSet === want)
        assert(want.nonEmpty)
      } finally q.stop()
    }
  }

  test("trailing-NOT emission is withheld until the watermark closes the window") {
    import graft.streaming.{Cep, CepStep}
    val steps = Seq(CepStep("view"), CepStep("click"),
      CepStep("purchase", negated = true))
    val gapUs = 600L * 1000000 // 10 min absence window
    val t0 = Timestamp.valueOf("2026-07-01 00:00:00").getTime
    def ev(u: Long, id: Long, offSec: Long, tpe: String) =
      FnEv(u, id, new Timestamp(t0 + offSec * 1000L), tpe)
    withRocksDb {
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingNot(in.toDF(), steps, gapUs,
        watermark = "30 minutes")
      .writeStream.format("memory").queryName("withhold_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        // user 1 completes view→click (window closes at +11 min); user 2
        // purchases inside the window (never emits). Watermark after
        // this batch sits 30 min behind +5 min — both windows OPEN.
        in.addData(ev(1, 1, 0, "view"), ev(1, 2, 60, "click"),
          ev(2, 3, 0, "view"), ev(2, 4, 60, "click"),
          ev(2, 5, 300, "purchase"), ev(9, 6, 300, "noop"))
        q.processAllAvailable()
        assert(spark.table("withhold_sink").count() === 0,
          "absence must be proven by the watermark, never assumed")
        // push the watermark past user 1's anchor+gap (+11 min):
        // +45 min event ⇒ watermark +15 min
        in.addData(ev(9, 7, 2700, "noop"))
        q.processAllAvailable()
        val got = spark.table("withhold_sink")
          .select("user_id").as[Long].collect().toSeq
        assert(got === Seq(1L),
          "only the purchase-free user emits, exactly once")
      } finally q.stop()
    }
  }

  test("interior NOT sharing the awaited positive's type: the match is not a violation") {
    // pattern "view, NOT click, click" — the matching click IS the
    // awaited positive; batch counts violators strictly BETWEEN anchor
    // and match, so it must emit, and streaming must agree (it once
    // tested forbidden before positive and silently emitted nothing)
    import graft.streaming.{Cep, CepStep}
    val steps = Seq(CepStep("view"), CepStep("click", negated = true),
      CepStep("click"))
    val gapUs = 600L * 1000000
    val t0 = Timestamp.valueOf("2026-07-02 00:00:00").getTime
    def ev(u: Long, id: Long, offSec: Long, tpe: String) =
      FnEv(u, id, new Timestamp(t0 + offSec * 1000L), tpe)
    val evs = Seq(
      ev(1, 1, 0, "view"), ev(1, 2, 60, "click"), // plain hit
      ev(2, 3, 0, "view"), ev(2, 4, 60, "click"),
      ev(2, 5, 120, "click"), // second click after the match: harmless
      ev(3, 6, 0, "view")) // no click: no hit
    val want = Set((1L, "1,2"), (2L, "3,4"))
    val batch = Cep.chainNot(evs.toDF(), steps, gapUs)
      .select("user_id", "step_ids").as[(Long, String)].collect().toSet
    assert(batch === want, "batch: the match itself never violates")
    withRocksDb {
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingNot(in.toDF(), steps, gapUs)
        .writeStream.format("memory").queryName("sharednot_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(evs: _*)
        q.processAllAvailable()
        // close every window far past anchor+gap
        in.addData(ev(9, 99, 7200, "noop"))
        q.processAllAvailable()
        val got = spark.table("sharednot_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)")
          .as[(Long, String)].collect().toSet
        assert(got === want, "streaming must equal batch on shared types")
      } finally q.stop()
    }
  }

  test("streaming chainNot equals batch on the shared-type pattern, 4 seeded schedules") {
    // "view, NOT click, click" on collision-rich random schedules: the
    // shared-type branch order is exactly where the streaming twin once
    // diverged, so pin equality where timestamp ties make it hardest
    import graft.streaming.{Cep, CepStep}
    val steps = Seq(CepStep("view"), CepStep("click", negated = true),
      CepStep("click"))
    val all = Seq("view", "click", "error", "noop")
    val gapUs = 900L * 1000000
    val base = Timestamp.valueOf("2026-05-02 00:00:00").getTime
    withRocksDb {
      for (seed <- 301 to 304) {
        val rnd = new scala.util.Random(seed)
        val evs = (0 until 400).map { i =>
          FnEv(rnd.nextInt(6).toLong, i.toLong,
            new Timestamp(base + rnd.nextInt(7200) * 1000L),
            all(rnd.nextInt(all.size)))
        }
        val want = Cep.chainNot(evs.toDF(), steps, gapUs)
          .select("user_id", "step_ids").as[(Long, String)]
          .collect().toSet
        val in = MemoryStream[FnEv](spark)
        val q = Cep.streamingNot(in.toDF(), steps, gapUs)
          .writeStream.format("memory").queryName(s"sharednot_p$seed")
          .outputMode(OutputMode.Append()).start()
        try {
          // one wave: event-time order inside the batch is the
          // processor's own sort, no late-drop ambiguity
          in.addData(evs: _*)
          q.processAllAvailable()
          flushEvents().foreach { e =>
            in.addData(e); q.processAllAvailable()
          }
          val got = spark.table(s"sharednot_p$seed")
            .selectExpr("user_id", "concat_ws(',', step_ids)")
            .as[(Long, String)].collect().toSet
          assert(got === want, s"seed $seed")
        } finally q.stop()
      }
    }
  }

  test("ambiguous plus patterns are rejected by BOTH the batch and streaming APIs") {
    import graft.streaming.{Cep, CepQStep}
    val ev = Tables(spark, sf, "events")
    // A B+ B: greedy absorption can never see the successor
    val shared = Seq(CepQStep("view"), CepQStep("click", plus = true),
      CepQStep("click"))
    intercept[IllegalArgumentException](Cep.chainPlus(ev, shared))
    intercept[IllegalArgumentException](Cep.streamingPlus(ev, shared))
    // B+ C+: consecutive plus — streaming once accepted this silently
    val consec = Seq(CepQStep("view"), CepQStep("click", plus = true),
      CepQStep("purchase", plus = true))
    intercept[IllegalArgumentException](Cep.chainPlus(ev, consec))
    intercept[IllegalArgumentException](Cep.streamingPlus(ev, consec))
  }

  test("chainNot equals a naive interval replay, 12 seeded schedules") {
    import graft.streaming.{Cep, CepStep}
    // view → NOT error → click → NOT purchase (interior + trailing)
    val steps = Seq(CepStep("view"), CepStep("error", negated = true),
      CepStep("click"), CepStep("purchase", negated = true))
    val all = Seq("view", "click", "error", "purchase", "noop")
    for (seed <- 201 to 212) {
      val rnd = new scala.util.Random(seed)
      val gapUs = 900L * 1000000
      val base = Timestamp.valueOf("2026-05-01 00:00:00").getTime
      // second-granularity over 2 h → deliberate timestamp collisions
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(6).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chainNot(evs.toDF(), steps, gapUs)
        .select("user_id", "step_ids").as[(Long, String)].collect().toSet
      // independent interval-style replay: greedily match the positive
      // chain, then check each negation's interval for intruders
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        def tus(e: FnEv) = e.ts.getTime * 1000L
        // positive chain: first view, then first click after it in gap
        val view = sorted.find(_.event_type == "view")
        val click = view.flatMap { v =>
          sorted.find(e => e.event_type == "click" &&
            (tus(e) > tus(v) ||
              (tus(e) == tus(v) && e.event_id > v.event_id)) &&
            tus(e) - tus(v) <= gapUs)
        }
        (view, click) match {
          case (Some(v), Some(c)) =>
            val errBetween = sorted.exists(e => e.event_type == "error" &&
              (tus(e) > tus(v) ||
                (tus(e) == tus(v) && e.event_id > v.event_id)) &&
              (tus(e) < tus(c) ||
                (tus(e) == tus(c) && e.event_id < c.event_id)))
            val purchaseAfter = sorted.exists(e =>
              e.event_type == "purchase" &&
              (tus(e) > tus(c) ||
                (tus(e) == tus(c) && e.event_id > c.event_id)) &&
              tus(e) - tus(c) <= gapUs)
            if (!errBetween && !purchaseAfter)
              Some((u, s"${v.event_id},${c.event_id}"))
            else None
          case _ => None
        }
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("chainPlus with no plus steps equals chain") {
    import graft.streaming.{Cep, CepQStep}
    val types = Seq("view", "click", "purchase")
    val ev = Tables(spark, sf, "events")
    val viaPlus = Cep.chainPlus(ev, types.map(t => CepQStep(t)))
      .select("user_id", "step_ids").as[(Long, String)].collect().toSet
    val viaChain = Cep.chain(ev, types)
      .select("user_id", "step_ids").as[(Long, String)].collect().toSet
    assert(viaPlus === viaChain)
    assert(viaPlus.nonEmpty)
  }

  test("chainPlus equals a naive single-pass replay, 12 seeded schedules") {
    import graft.streaming.{Cep, CepQStep}
    // view → click+ → purchase: the island fold vs an independent
    // event-at-a-time greedy absorption machine
    val steps = Seq(CepQStep("view"), CepQStep("click", plus = true),
      CepQStep("purchase"))
    val all = Seq("view", "click", "purchase", "noop")
    for (seed <- 301 to 312) {
      val rnd = new scala.util.Random(seed)
      val gapUs = 900L * 1000000
      val base = Timestamp.valueOf("2026-08-01 00:00:00").getTime
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(6).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chainPlus(evs.toDF(), steps, gapUs)
        .select("user_id", "step_ids", "counts")
        .as[(Long, String, String)].collect().toSet
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        def tus(e: FnEv) = e.ts.getTime * 1000L
        // single-pass machine: await view → await first click →
        // absorb clicks → first purchase within gap of last absorbed
        var st = 0; var at = 0L; var aid = 0L
        var vid = 0L; var lastCid = 0L; var n = 0L
        var hit: Option[(Long, String, String)] = None
        for (e <- sorted if hit.isEmpty) {
          val t = tus(e)
          def after = t > at || (t == at && e.event_id > aid)
          st match {
            case 0 if e.event_type == "view" =>
              st = 1; at = t; aid = e.event_id; vid = e.event_id
            case 1 if e.event_type == "click" && after && t - at <= gapUs =>
              st = 2; at = t; aid = e.event_id; lastCid = e.event_id; n = 1
            case 2 if e.event_type == "click" && after && t - at <= gapUs =>
              at = t; aid = e.event_id; lastCid = e.event_id; n += 1
            case 2 if e.event_type == "purchase" && after &&
                t - at <= gapUs =>
              hit = Some((u, s"$vid,$lastCid,${e.event_id}", s"1,$n,1"))
            case _ => // greedy: everything else is ignored
          }
        }
        hit
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("streaming chainPlus equals batch (fixture and random schedule)") {
    import graft.streaming.{Cep, CepQStep}
    val steps = Seq(CepQStep("view"), CepQStep("click", plus = true),
      CepQStep("purchase"))
    withRocksDb {
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingPlus(in.toDF(), steps)
        .writeStream.format("memory").queryName("kleene_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("kleene_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)",
            "concat_ws(',', counts)")
          .as[(Long, String, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chainPlus(Tables(spark, sf, "events"), steps)
          .select("user_id", "step_ids", "counts")
          .as[(Long, String, String)].collect().toSet
        assert(got.toSet === want)
        assert(want.nonEmpty, "fixture must contain kleene completions")
      } finally q.stop()
    }
  }

  test("trailing plus absorbs the whole run and emits once the window closes") {
    import graft.streaming.{Cep, CepQStep}
    // view → click+ (trailing): the run closes by watermark, batch
    // equals streaming, counts report the full absorption
    val steps = Seq(CepQStep("view"), CepQStep("click", plus = true))
    val gapUs = 600L * 1000000
    val t0 = Timestamp.valueOf("2026-09-01 00:00:00").getTime
    def ev(u: Long, id: Long, offSec: Long, tpe: String) =
      FnEv(u, id, new Timestamp(t0 + offSec * 1000L), tpe)
    // user 1: view, then clicks at +1, +5, +8 min (one run of 3), a
    // click at +30 min is beyond the gap and must NOT absorb
    val evs = Seq(ev(1, 1, 0, "view"), ev(1, 2, 60, "click"),
      ev(1, 3, 300, "click"), ev(1, 4, 480, "click"),
      ev(1, 5, 1800, "click"))
    val batch = Cep.chainPlus(evs.toDF(), steps, gapUs)
      .select("user_id", "step_ids", "counts")
      .as[(Long, String, String)].collect().toSeq
    assert(batch === Seq((1L, "1,4", "1,3")),
      "trailing run must stop at the gap break")
    withRocksDb {
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingPlus(in.toDF(), steps, gapUs)
        .writeStream.format("memory").queryName("kleene_trail_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        in.addData(evs: _*)
        q.processAllAvailable()
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("kleene_trail_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)",
            "concat_ws(',', counts)")
          .as[(Long, String, String)].collect().toSeq
        assert(got === batch)
      } finally q.stop()
    }
  }

  test("chainPlus checkpoint restart: mid-absorption state survives, exactly once") {
    import graft.streaming.{Cep, CepQStep}
    // trailing plus — the timer-driven emission path — with the HARD
    // STOP landing mid-absorption: the resumed query must keep the
    // absorbed run (ListState + ChainPlusState through RocksDB) and
    // emit exactly once when the watermark finally closes the window
    val steps = Seq(CepQStep("view"), CepQStep("click", plus = true))
    val gapUs = 600L * 1000000
    val t0 = Timestamp.valueOf("2026-10-01 00:00:00").getTime
    def ev(u: Long, id: Long, offSec: Long, tpe: String) =
      FnEv(u, id, new Timestamp(t0 + offSec * 1000L), tpe)
    withRocksDb {
      val srcDir = Files.createTempDirectory("kleene-src").toString
      val outDir = Files.createTempDirectory("kleene-out").toString
      val ckpt = Files.createTempDirectory("kleene-ckpt").toString
      def land(evs: Seq[FnEv]): Unit = {
        evs.toDS().coalesce(1).write.mode("append").parquet(srcDir)
        Thread.sleep(1100)
      }
      def run(): Unit = {
        val src = spark.readStream
          .schema(spark.read.parquet(srcDir).schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(srcDir)
        val q = Cep.streamingPlus(src, steps, gapUs)
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
        try q.processAllAvailable() finally q.stop()
      }
      // phase 1: view + two clicks, plus a wm-pusher that ripens them
      // (wm = +40 min − 30 min = +10 min ⇒ both clicks drain and
      // absorb, window still open) — then a hard stop mid-absorption
      land(Seq(ev(1, 1, 0, "view"), ev(1, 2, 60, "click"),
        ev(1, 3, 300, "click"), ev(9, 4, 2400, "noop")))
      run()
      assert(spark.read.parquet(outDir).count() === 0,
        "the absorption window is still open at the stop")
      // phase 2: a third click inside the gap of the second (+12 min),
      // then the flush closes the window — the SAME checkpoint resumes
      land(Seq(ev(1, 5, 720, "click")))
      land(flushEvents())
      run()
      val got = spark.read.parquet(outDir)
        .selectExpr("user_id", "concat_ws(',', step_ids)",
          "concat_ws(',', counts)")
        .as[(Long, String, String)].collect().toSeq
      assert(got === Seq((1L, "1,5", "1,3")),
        "the resumed run must extend the pre-restart absorption and emit once")
    }
  }

  test("streaming chainNot equals batch on random schedules with negations") {
    import graft.streaming.{Cep, CepStep}
    val steps = Seq(CepStep("view"), CepStep("error", negated = true),
      CepStep("click"), CepStep("purchase", negated = true))
    val all = Seq("view", "click", "error", "purchase", "noop")
    val rnd = new scala.util.Random(777)
    val gapUs = 900L * 1000000
    val base = Timestamp.valueOf("2026-06-01 00:00:00").getTime
    val evs = (0 until 400).map { i =>
      FnEv(rnd.nextInt(6).toLong, i.toLong,
        new Timestamp(base + rnd.nextInt(7200) * 1000L),
        all(rnd.nextInt(all.size)))
    }
    withRocksDb {
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingNot(in.toDF(), steps, gapUs)
        .writeStream.format("memory").queryName("chainnot_rand_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        evs.sortBy(e => (e.ts.getTime, e.event_id))
          .grouped(evs.length / 4 + 1).foreach { chunk =>
            in.addData(chunk.toSeq: _*)
            q.processAllAvailable()
          }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("chainnot_rand_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)")
          .as[(Long, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chainNot(evs.toDF(), steps, gapUs)
          .select("user_id", "step_ids").as[(Long, String)].collect().toSet
        assert(got.toSet === want)
      } finally q.stop()
    }
  }

  test("chainRep equals a naive bounded-repetition replay, 12 seeded schedules") {
    import graft.streaming.{Cep, CepRepStep}
    val steps = Seq(CepRepStep("view"), CepRepStep("click", 2, 3),
      CepRepStep("purchase"))
    val all = Seq("view", "click", "purchase", "noop")
    val gapUs = 900L * 1000000
    for (seed <- 601 to 612) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2026-08-01 00:00:00").getTime
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(5).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chainRep(evs.toDF(), steps, gapUs)
        .selectExpr("user_id", "step_ids", "counts")
        .as[(Long, String, String)].collect().toSet
      // naive single-pass replay of the bounded-repetition machine
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var stage = 0; var at = 0L; var aid = 0L
        var absorbing = false; var curN = 0L
        val ids = Seq.newBuilder[Long]; val ns = Seq.newBuilder[Long]
        var done = false; var failed = false
        for (e <- sorted if !done && !failed) {
          val tus = e.ts.getTime * 1000L
          val cur = steps(stage)
          val after = tus > at || (tus == at && e.event_id > aid)
          if (!cur.quantified) {
            if (e.event_type == cur.tpe &&
                (stage == 0 || (after && tus - at <= gapUs))) {
              stage += 1; at = tus; aid = e.event_id
              ids += e.event_id; ns += 1L
              if (stage < steps.size && steps(stage).quantified)
                absorbing = false
              if (stage == steps.size) done = true
            }
          } else if (!absorbing) {
            if (e.event_type == cur.tpe && after && tus - at <= gapUs) {
              absorbing = true; curN = 1; at = tus; aid = e.event_id
            }
          } else {
            if (e.event_type == cur.tpe && after && tus - at <= gapUs &&
                curN < cur.maxN) {
              curN += 1; at = tus; aid = e.event_id
            } else if (stage < steps.size - 1 &&
                e.event_type == steps(stage + 1).tpe && after &&
                tus - at <= gapUs && curN >= cur.minN) {
              ids += aid; ns += curN // close the run at the last absorbed
              at = tus; aid = e.event_id
              ids += e.event_id; ns += 1L
              stage += 2; absorbing = false
              if (stage == steps.size) done = true
            } else if (stage == steps.size - 1 && tus - at > gapUs) {
              if (curN >= cur.minN) {
                ids += aid; ns += curN; done = true
              } else failed = true
            }
          }
        }
        if (!done && !failed && absorbing &&
            stage == steps.size - 1 && curN >= steps(stage).minN) {
          ids += aid; ns += curN; done = true
        }
        if (done)
          Some((u, ids.result().mkString(","), ns.result().mkString(",")))
        else None
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("chainRep optional step B{0,m} equals naive replay, 12 seeds; B{1,m} pins unchanged") {
    import graft.streaming.{Cep, CepRepStep}
    val all = Seq("view", "click", "purchase", "noop")
    val gapUs = 900L * 1000000
    // naive single-pass replay generalized with the zero-min close
    def naive(evs: Seq[FnEv], steps: Seq[CepRepStep])
        : Set[(Long, String, String)] =
      evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var stage = 0; var at = 0L; var aid = 0L
        var absorbing = false; var curN = 0L
        val ids = Seq.newBuilder[Long]; val ns = Seq.newBuilder[Long]
        var done = false; var failed = false
        for (e <- sorted if !done && !failed) {
          val tus = e.ts.getTime * 1000L
          val cur = steps(stage)
          val after = tus > at || (tus == at && e.event_id > aid)
          if (!cur.quantified) {
            if (e.event_type == cur.tpe &&
                (stage == 0 || (after && tus - at <= gapUs))) {
              stage += 1; at = tus; aid = e.event_id
              ids += e.event_id; ns += 1L
              if (stage < steps.size && steps(stage).quantified)
                absorbing = false
              if (stage == steps.size) done = true
            }
          } else if (!absorbing) {
            if (e.event_type == cur.tpe && after && tus - at <= gapUs) {
              absorbing = true; curN = 1; at = tus; aid = e.event_id
            } else if (cur.minN == 0 && stage < steps.size - 1 &&
                e.event_type == steps(stage + 1).tpe && after &&
                tus - at <= gapUs) {
              ids += -1L; ns += 0L // empty run closes at the anchor
              at = tus; aid = e.event_id
              ids += e.event_id; ns += 1L
              stage += 2
              if (stage == steps.size) done = true
            }
          } else {
            if (e.event_type == cur.tpe && after && tus - at <= gapUs &&
                curN < cur.maxN) {
              curN += 1; at = tus; aid = e.event_id
            } else if (stage < steps.size - 1 &&
                e.event_type == steps(stage + 1).tpe && after &&
                tus - at <= gapUs && curN >= cur.minN) {
              ids += aid; ns += curN
              at = tus; aid = e.event_id
              ids += e.event_id; ns += 1L
              stage += 2; absorbing = false
              if (stage == steps.size) done = true
            } else if (stage == steps.size - 1 && tus - at > gapUs) {
              if (curN >= cur.minN) { ids += aid; ns += curN; done = true }
              else failed = true
            }
          }
        }
        if (!done && !failed && absorbing &&
            stage == steps.size - 1 && curN >= steps(stage).minN) {
          ids += aid; ns += curN; done = true
        }
        if (done)
          Some((u, ids.result().mkString(","), ns.result().mkString(",")))
        else None
      }.toSet
    val optSteps = Seq(CepRepStep("view"), CepRepStep("click", 0, 2),
      CepRepStep("purchase"))
    var sawEmpty = false; var sawAbsorbed = false
    for (seed <- 901 to 912) {
      val rnd = new scala.util.Random(seed)
      val base = Timestamp.valueOf("2026-10-01 00:00:00").getTime
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(5).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chainRep(evs.toDF(), optSteps, gapUs)
        .selectExpr("user_id", "step_ids", "counts")
        .as[(Long, String, String)].collect().toSet
      assert(got === naive(evs, optSteps), s"seed $seed")
      sawEmpty ||= got.exists(_._3 == "1,0,1")
      sawAbsorbed ||= got.exists(r => r._3 != "1,0,1")
      // {1,m} must be byte-identical to the pre-optional machine: the
      // zero-min code paths are gated on minN == 0 and the replay here
      // IS the r11 replay when minN >= 1
      val oneSteps = Seq(CepRepStep("view"), CepRepStep("click", 1, 2),
        CepRepStep("purchase"))
      val gotOne = Cep.chainRep(evs.toDF(), oneSteps, gapUs)
        .selectExpr("user_id", "step_ids", "counts")
        .as[(Long, String, String)].collect().toSet
      assert(gotOne === naive(evs, oneSteps), s"seed $seed {1,2}")
    }
    assert(sawEmpty, "schedules must exercise the EMPTY (count-0) close")
    assert(sawAbsorbed, "schedules must exercise absorbed closes too")
    // trailing zero-min is redundant and rejected loudly
    val err = intercept[IllegalArgumentException] {
      Cep.chainRep(Tables(spark, sf, "events"),
        Seq(CepRepStep("view"), CepRepStep("click", 0, 2)))
    }
    assert(err.getMessage.contains("redundant"))
  }

  test("streaming chainRep with optional step equals batch on random schedules") {
    import graft.streaming.{Cep, CepRepStep}
    val steps = Seq(CepRepStep("signup"), CepRepStep("click", 0, 2),
      CepRepStep("purchase"))
    val all = Seq("signup", "click", "purchase", "noop")
    val gapUs = 900L * 1000000
    withRocksDb {
      var anyEmpty = false
      for (seed <- 921 to 924) {
        val rnd = new scala.util.Random(seed)
        val base = Timestamp.valueOf("2026-10-02 00:00:00").getTime
        val evs = (0 until 400).map { i =>
          FnEv(rnd.nextInt(6).toLong, i.toLong,
            new Timestamp(base + rnd.nextInt(7200) * 1000L),
            all(rnd.nextInt(all.size)))
        }
        val in = MemoryStream[FnEv](spark)
        val q = Cep.streamingRep(in.toDF(), steps, gapUs)
          .writeStream.format("memory").queryName(s"chainopt_$seed")
          .outputMode(OutputMode.Append()).start()
        try {
          evs.sortBy(e => (e.ts.getTime, e.event_id))
            .grouped(evs.length / 4 + 1).foreach { chunk =>
              in.addData(chunk.toSeq: _*)
              q.processAllAvailable()
            }
          flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
          val got = spark.table(s"chainopt_$seed")
            .selectExpr("user_id", "concat_ws(',', step_ids)",
              "concat_ws(',', counts)")
            .as[(Long, String, String)].collect()
          assert(got.length === got.toSet.size, "duplicate emissions")
          val want = Cep.chainRep(evs.toDF(), steps, gapUs)
            .selectExpr("user_id", "step_ids", "counts")
            .as[(Long, String, String)].collect().toSet
          assert(got.toSet === want, s"seed $seed")
          anyEmpty ||= want.exists(_._3 == "1,0,1")
        } finally q.stop()
      }
      assert(anyEmpty, "streaming schedules must exercise the EMPTY close")
    }
  }

  test("streaming chainRep equals batch, fixture and random trailing schedules") {
    import graft.streaming.{Cep, CepRepStep}
    val fixtureSteps = Seq(CepRepStep("view"),
      CepRepStep("click", 1, 3), CepRepStep("purchase"))
    withRocksDb {
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingRep(in.toDF(), fixtureSteps)
        .writeStream.format("memory").queryName("chainrep_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("chainrep_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)",
            "concat_ws(',', counts)")
          .as[(Long, String, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chainRep(Tables(spark, sf, "events"), fixtureSteps)
          .selectExpr("user_id", "step_ids", "counts")
          .as[(Long, String, String)].collect().toSet
        assert(got.toSet === want)
        assert(want.nonEmpty, "fixture must contain {1,3} completions")
      } finally q.stop()
      // TRAILING quantifier on random schedules: exercises both the
      // emit path (run reached minN) and the terminal-fail path (gap
      // expired below minN — no emission, matching batch's no-row)
      val trailSteps = Seq(CepRepStep("view"), CepRepStep("click", 2, 4))
      val gapUs = 900L * 1000000
      var anyEmitted = false
      for (seed <- 701 to 704) {
        val rnd = new scala.util.Random(seed)
        val base = Timestamp.valueOf("2026-09-01 00:00:00").getTime
        val evs = (0 until 300).map { i =>
          FnEv(rnd.nextInt(6).toLong, i.toLong,
            new Timestamp(base + rnd.nextInt(7200) * 1000L),
            Seq("view", "click", "noop")(rnd.nextInt(3)))
        }
        val in2 = MemoryStream[FnEv](spark)
        val q2 = Cep.streamingRep(in2.toDF(), trailSteps, gapUs)
          .writeStream.format("memory").queryName(s"chainrep_tr$seed")
          .outputMode(OutputMode.Append()).start()
        try {
          evs.sortBy(e => (e.ts.getTime, e.event_id))
            .grouped(evs.length / 4 + 1).foreach { chunk =>
              in2.addData(chunk.toSeq: _*)
              q2.processAllAvailable()
            }
          flushEvents().foreach { e =>
            in2.addData(e); q2.processAllAvailable() }
          val got2 = spark.table(s"chainrep_tr$seed")
            .selectExpr("user_id", "concat_ws(',', step_ids)",
              "concat_ws(',', counts)")
            .as[(Long, String, String)].collect()
          assert(got2.length === got2.toSet.size, "duplicate emissions")
          val want2 = Cep.chainRep(evs.toDF(), trailSteps, gapUs)
            .selectExpr("user_id", "step_ids", "counts")
            .as[(Long, String, String)].collect().toSet
          assert(got2.toSet === want2, s"seed $seed")
          anyEmitted ||= want2.nonEmpty
        } finally q2.stop()
      }
      assert(anyEmitted, "trailing schedules must produce completions")
    }
  }

  test("chainAlt equals a naive greedy replay, 12 seeded schedules") {
    import graft.streaming.Cep
    val steps = Seq(Seq("view"), Seq("click", "error"), Seq("purchase"))
    val all = Seq("view", "click", "error", "purchase", "noop")
    for (seed <- 401 to 412) {
      val rnd = new scala.util.Random(seed)
      val gapUs = 900L * 1000000
      val base = Timestamp.valueOf("2026-05-01 00:00:00").getTime
      val evs = (0 until 500).map { i =>
        FnEv(rnd.nextInt(5).toLong, i.toLong,
          new Timestamp(base + rnd.nextInt(7200) * 1000L),
          all(rnd.nextInt(all.size)))
      }
      val got = Cep.chainAlt(evs.toDF(), steps, gapUs)
        .select("user_id", "step_ids").as[(Long, String)].collect().toSet
      val want = evs.groupBy(_.user_id).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e.ts.getTime, e.event_id))
        var st = 0; var at = 0L; var aid = 0L
        val ids = Seq.newBuilder[Long]
        var done = false
        for (e <- sorted if !done) {
          val tus = e.ts.getTime * 1000L
          if (st < steps.size && steps(st).contains(e.event_type) &&
              (st == 0 ||
                ((tus > at || (tus == at && e.event_id > aid)) &&
                  tus - at <= gapUs))) {
            st += 1; at = tus; aid = e.event_id; ids += e.event_id
            if (st == steps.size) done = true
          }
        }
        if (done) Some((u, ids.result().mkString(","))) else None
      }.toSet
      assert(got === want, s"seed $seed")
    }
  }

  test("streaming chainAlt equals the batch chainAlt on the fixture") {
    import graft.streaming.Cep
    val steps = Seq(Seq("signup"), Seq("view", "click"), Seq("purchase"))
    withRocksDb {
      val events = fixtureEvents()
      val in = MemoryStream[FnEv](spark)
      val q = Cep.streamingAlt(in.toDF(), steps)
        .writeStream.format("memory").queryName("chainalt_sink")
        .outputMode(OutputMode.Append()).start()
      try {
        events.grouped(events.length / 5 + 1).foreach { chunk =>
          in.addData(chunk.toSeq: _*)
          q.processAllAvailable()
        }
        flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
        val got = spark.table("chainalt_sink")
          .selectExpr("user_id", "concat_ws(',', step_ids)")
          .as[(Long, String)].collect()
        assert(got.length === got.toSet.size, "duplicate emissions")
        val want = Cep.chainAlt(Tables(spark, sf, "events"), steps)
          .select("user_id", "step_ids").as[(Long, String)].collect().toSet
        assert(got.toSet === want)
        assert(want.nonEmpty, "fixture must contain alternation completions")
      } finally q.stop()
    }
  }

  test("streaming chainAlt equals batch on OVERLAPPING sets, 4 seeded schedules") {
    // "view (view|click) purchase": the alternation set shares a type
    // with the previous step — the anchor must not re-bind, and the
    // second step may legally match another view
    import graft.streaming.Cep
    val steps = Seq(Seq("view"), Seq("view", "click"), Seq("purchase"))
    val all = Seq("view", "click", "purchase", "noop")
    val gapUs = 900L * 1000000
    withRocksDb {
      for (seed <- 501 to 504) {
        val rnd = new scala.util.Random(seed)
        val base = Timestamp.valueOf("2026-07-01 00:00:00").getTime
        val evs = (0 until 400).map { i =>
          FnEv(rnd.nextInt(6).toLong, i.toLong,
            new Timestamp(base + rnd.nextInt(7200) * 1000L),
            all(rnd.nextInt(all.size)))
        }
        val in = MemoryStream[FnEv](spark)
        val q = Cep.streamingAlt(in.toDF(), steps, gapUs)
          .writeStream.format("memory").queryName(s"chainalt_ov$seed")
          .outputMode(OutputMode.Append()).start()
        try {
          evs.sortBy(e => (e.ts.getTime, e.event_id))
            .grouped(evs.length / 4 + 1).foreach { chunk =>
              in.addData(chunk.toSeq: _*)
              q.processAllAvailable()
            }
          flushEvents().foreach { e => in.addData(e); q.processAllAvailable() }
          val got = spark.table(s"chainalt_ov$seed")
            .selectExpr("user_id", "concat_ws(',', step_ids)")
            .as[(Long, String)].collect()
          assert(got.length === got.toSet.size, "duplicate emissions")
          val want = Cep.chainAlt(evs.toDF(), steps, gapUs)
            .select("user_id", "step_ids").as[(Long, String)].collect().toSet
          assert(got.toSet === want, s"seed $seed")
        } finally q.stop()
      }
    }
  }
}
