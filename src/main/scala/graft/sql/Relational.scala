package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** One declared operator: the Spark-first plan plus (when SQL-expressible)
  * the DuckDB oracle the driver hash-checks it against (SURVEY.md §2/§5).
  * Column aliases MUST match between `run` and `oracle`.
  */
final case class Declared(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** SURVEY.md §2 relational operator inventory, re-expressed Spark-first.
  *
  * Design notes for 100 TB (the local fixtures only check correctness):
  *  - Dimension tables (region/nation/supplier, scalar aggregates) are
  *    broadcast explicitly — no shuffle of the fact side for those joins.
  *  - Fact-fact joins (lineitem⋈orders) shuffle on the join key once; AQE
  *    (enabled in every session we build) handles skew/coalescing at runtime.
  *  - Aggregates use map-side partial aggregation (Spark default for
  *    groupBy.agg) — the shuffle carries one row per (partition, group).
  *  - Double sums are computed as exact DECIMAL sums then cast back to
  *    double: deterministic under any partitioning/ordering, so results are
  *    reproducible at any parallelism AND hash-match single-threaded DuckDB
  *    (SURVEY.md §7.4 float-summation-order caveat).
  *  - Every query ends in an explicit orderBy so output is deterministic.
  */
object Relational {
  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables(s, dir, n)

  /** Exact distributed sum of a double column: decimal-sum then back to
    * double. Order-insensitive → identical on 1 or 1000 executors. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(s"decimal(30,$scale)")).cast("double")

  // ---------------------------------------------------------------------
  // Scans / projections / sorts (S1, P1, O1, O2)
  // ---------------------------------------------------------------------

  private val s1ScanProjectSort = Declared(
    "s1_scan_project_sort",
    // Bulk-copy read shape: explicit select list + total order
    // (reference replicator/main.go:98-101). Projection reaches the parquet
    // scan (ReadSchema carries only 3 of 5 columns).
    (s, d) => t(s, d)("customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey"""))

  private val o2Topk = Declared(
    "o2_topk",
    // ORDER BY .. LIMIT k → TakeOrderedAndProject: no global sort at scale,
    // each partition keeps k rows, driver merges k*numPartitions.
    (s, d) => t(s, d)("orders")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10),
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin))

  // ---------------------------------------------------------------------
  // Filters (F1, F3, F4)
  // ---------------------------------------------------------------------

  private val f1EqFilter = Declared(
    "f1_eq_filter",
    // Parameterized equality predicate (replicator/main.go:73,237,260).
    // Pushed to the parquet scan (PushedFilters: [EqualTo(o_orderstatus,F)]).
    (s, d) => t(s, d)("orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin))

  private val f3ParityCount = Declared(
    "f3_parity_count",
    // The signature publication row filter `score % 2 = 0`
    // (pubsub/main.go:79,186) over the fact table.
    (s, d) => t(s, d)("lineitem")
      .filter(col("l_partkey") % 2 === 0)
      .agg(count(lit(1)).as("n_even")),
    Some("""SELECT count(*) AS n_even FROM lineitem WHERE l_partkey % 2 = 0"""))

  private val f4CaseDispatch = Declared(
    "f4_case_dispatch",
    // Action-code dispatch (replicator/main.go:195-269 switch I/U/D),
    // as a CASE routing expression + grouped count.
    (s, d) => t(s, d)("orders")
      .withColumn("op_label",
        when(col("o_orderstatus") === "O", lit("insert"))
          .when(col("o_orderstatus") === "F", lit("update"))
          .otherwise(lit("delete")))
      .groupBy("o_orderstatus", "op_label")
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus,
           |  CASE WHEN o_orderstatus='O' THEN 'insert'
           |       WHEN o_orderstatus='F' THEN 'update'
           |       ELSE 'delete' END AS op_label,
           |  count(*) AS n
           |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus""".stripMargin))

  // ---------------------------------------------------------------------
  // Aggregations (A1-A6 + grouped/distinct/rollup/cube)
  // ---------------------------------------------------------------------

  private val a1Count = Declared(
    "a1_count",
    (s, d) => t(s, d)("lineitem").agg(count(lit(1)).as("n_rows")),
    Some("""SELECT count(*) AS n_rows FROM lineitem"""))

  private val a3CountFiltered = Declared(
    "a3_count_filtered",
    // `SELECT COUNT(*) FROM person WHERE score % 2 = 0` (pubsub/main.go:186)
    // analog on the stream-shaped events table.
    (s, d) => t(s, d)("events")
      .filter(col("user_id") % 2 === 0)
      .agg(count(lit(1)).as("n")),
    Some("""SELECT count(*) AS n FROM events WHERE user_id % 2 = 0"""))

  private val a4CoalesceMax = Declared(
    "a4_coalesce_max",
    // Empty-input-safe MAX: `COALESCE(MAX(id), 0)` (replicator/main.go:143-144).
    // The filter is deliberately unsatisfiable so the aggregate sees 0 rows.
    (s, d) => t(s, d)("orders")
      .filter(col("o_totalprice") < 0.0)
      .agg(coalesce(max(col("o_orderkey")), lit(0L)).as("max_id")),
    Some("""SELECT coalesce(max(o_orderkey), 0) AS max_id FROM orders
           |WHERE o_totalprice < 0.0""".stripMargin))

  private val a6LwwWindow = Declared(
    "a6_lww_window",
    // Last-writer-wins per key — THE core CDC reduction (SURVEY §2.4 A6):
    // row_number over (partition by key order by seq desc) = 1.
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("event_id").desc)
      t(s, d)("events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_event_type"), col("value").as("last_value"))
        .orderBy("user_id")
    },
    Some("""SELECT user_id, event_id AS last_event_id,
           |  event_type AS last_event_type, value AS last_value
           |FROM (SELECT *, row_number() OVER
           |        (PARTITION BY user_id ORDER BY event_id DESC) AS rn
           |      FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin))

  private val a6LwwMaxBy = Declared(
    "a6_lww_maxby",
    // Same reduction via max_by: a single hash aggregate (map-side partial
    // combine) — cheaper than the window at scale: no per-partition sort,
    // shuffle carries one row per (partition, key).
    (s, d) => t(s, d)("events")
      .groupBy("user_id")
      .agg(max_by(col("event_type"), col("event_id")).as("last_event_type"),
        max(col("event_id")).as("last_event_id"))
      .orderBy("user_id"),
    Some("""SELECT user_id, max_by(event_type, event_id) AS last_event_type,
           |  max(event_id) AS last_event_id
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  private val q1AggPricing = Declared(
    "q1_agg_pricing",
    // TPC-H Q1 shape: scan-heavy grouped aggregate, the canonical
    // map-side-combine benchmark. Decimal sums → deterministic at any DOP.
    (s, d) => {
      val li = t(s, d)("lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
            .as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
            * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
           |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) / count(*) AS avg_qty,
           |  count(*) AS count_order
           |FROM lineitem
           |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  private val aggDistinct = Declared(
    "agg_distinct",
    // Exact distinct counts: Spark expands to a two-phase aggregate;
    // the 100 TB default is the HLL++ sketch — declared as the
    // `agg_approx_distinct` twin below.
    (s, d) => t(s, d)("lineitem").agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps")),
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps FROM lineitem""".stripMargin))

  private val aggApproxDistinct = Declared(
    "agg_approx_distinct",
    // The scale twin of agg_distinct: HLL++ sketches (rsd 1%) merge in
    // one pass — no per-value expansion, the shuffle carries one sketch
    // per partition. Sketch estimates are engine-specific bit-for-bit,
    // so the RAW estimate has no cross-engine oracle; instead the query
    // emits an ENVELOPE VERDICT (VERDICT r3 #3): the exact counts
    // (hash-matched against DuckDB) plus `within_envelope =
    // |approx − exact| ≤ 3·rsd·exact` — the 3σ bound HLL++ guarantees
    // w.h.p. — which the oracle expects to be literally 1.
    // sketches and exact counts in SEPARATE aggregates: a single agg
    // mixing countDistinct with approx_count_distinct plans as an
    // Expand (one duplicated projection per distinct group) that drags
    // the HLL updates across the expanded rows — 12× slower measured.
    // Two single-pass aggs + a broadcast cross join of 1-row frames.
    (s, d) => {
      val li = t(s, d)("lineitem")
      val exact = li.agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      val approx = li.agg(
        approx_count_distinct(col("l_partkey"), rsd = 0.01).as("ap"),
        approx_count_distinct(col("l_suppkey"), rsd = 0.01).as("asu"))
      exact.crossJoin(broadcast(approx))
        .select(col("n_parts"), col("n_supps"),
          (abs(col("ap") - col("n_parts")) <= lit(0.03) * col("n_parts"))
            .cast("int").as("parts_within_envelope"),
          (abs(col("asu") - col("n_supps")) <= lit(0.03) * col("n_supps"))
            .cast("int").as("supps_within_envelope"))
    },
    Some("""SELECT count(DISTINCT l_partkey) AS n_parts,
           |  count(DISTINCT l_suppkey) AS n_supps,
           |  CAST(1 AS INT) AS parts_within_envelope,
           |  CAST(1 AS INT) AS supps_within_envelope
           |FROM lineitem""".stripMargin))

  /** Shared oracle for the CMS heavy hitters and the streaming twin
    * (one SQL string holds both rows to the same exact counts and the
    * same always-true envelope expectation). */
  private val heavyHittersSql =
    """SELECT l_partkey, count(*) AS cnt,
      |  CAST(1 AS INT) AS within_envelope
      |FROM lineitem GROUP BY 1
      |ORDER BY cnt DESC, l_partkey LIMIT 10""".stripMargin

  private val aggHeavyHitters = Declared(
    "agg_heavy_hitters",
    // Count-min-sketch heavy hitters (Cormode & Muthukrishnan '05):
    // the sketch is built in ONE pass (one mergeable w×d counter grid
    // per partition — at 100 TB, executors emit tiny sketches and the
    // driver merges, never shuffling values), then the exact top-10 hot
    // keys are probed against it. Like the other approx twins, the raw
    // estimates are engine-specific, so the emitted row is the exact
    // count (hash-matched vs DuckDB) plus the CMS envelope verdict:
    // est ≥ exact (CMS never undercounts — the sharp side) and
    // est ≤ exact + ε·N w.p. ≥ 1−δ. Seeded → deterministic. The 10-row
    // collect is bounded by k and documented.
    (s, d) => {
      import s.implicits._
      val li = t(s, d)("lineitem")
      val eps = 1e-4
      val exact = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
        .as[(Long, Long)].collect()
      val cms = li.stat.countMinSketch("l_partkey", eps,
        0.99, 42)
      val slack = (eps * cms.totalCount()).toLong
      exact.toSeq.map { case (k, c) =>
        val est = cms.estimateCount(Long.box(k))
        (k, c, if (est >= c && est <= c + slack) 1 else 0)
      }.toDF("l_partkey", "cnt", "within_envelope")
    },
    Some(heavyHittersSql))

  /** Streaming twin of the CMS heavy hitters — MERGEABLE-SKETCH state
    * across micro-batches, the streaming-state pattern the family was
    * missing next to fold state (LWW replicas), dedup state
    * (watermarked identity), and threshold models (the MAD gate):
    * each arriving batch builds its own seeded count-min sketch (a
    * bounded w×d counter grid) and merges it into the accumulated
    * sketch — counter grids ADD, so the merged sketch is bit-identical
    * to one built over the whole stream, which is exactly how 100 TB
    * deployments sketch per executor/partition and fold upward without
    * ever shuffling values. Rows land as hash-bucketed parquet appends
    * alongside the sketch; the verdict probes the exact top-10 of the
    * landed stream against the merged sketch — equal to the batch row,
    * which is the oracle, verbatim. */
  private val aggHeavyHittersStream = Declared(
    "agg_heavy_hitters_stream",
    (s, d) => {
      import s.implicits._
      val eps = 1e-4
      val keys = t(s, d)("lineitem").select(col("l_partkey"))
        .as[Long].collect()
      // harness feeder through the one audited shim (ADVICE r13 #4:
      // the MemoryStream package is version-brittle — StreamBridge)
      val in = org.apache.spark.sql.graftbridge.StreamBridge
        .memoryStream[Long](s)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft-hh-out").toString
      val ckptDir = java.nio.file.Files
        .createTempDirectory("graft-hh-ckpt").toString
      // the accumulated sketch — bounded model state (w*d counters),
      // mutated only on the driver inside foreachBatch
      var merged: org.apache.spark.util.sketch.CountMinSketch = null
      val q = in.toDF().toDF("l_partkey")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckptDir)
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, bid: Long) =>
            val sk = batch.stat.countMinSketch("l_partkey", eps, 0.99, 42)
            if (merged == null) merged = sk else merged.mergeInPlace(sk)
            batch.withColumn("bucket", pmod(col("l_partkey"), lit(16)))
              .repartition(col("bucket"))
              .write.mode("append").partitionBy("bucket").parquet(outDir)
        }
        .start()
      try keys.grouped(keys.length / 4 + 1).foreach { wave =>
        in.addData(wave.toSeq)
        q.processAllAvailable()
      } finally q.stop()
      // empty-stream guard (ADVICE r13 #4): no batch ever arrived —
      // merged stays null and the parquet dir has no schema to infer;
      // the verdict over nothing is the empty report
      val rows =
        if (merged == null) Seq.empty[(Long, Long, Int)]
        else {
          val exact = s.read.parquet(outDir)
            .groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
            .orderBy(col("cnt").desc, col("l_partkey")).limit(10)
            .as[(Long, Long)].collect()
          val slack = (eps * merged.totalCount()).toLong
          exact.toSeq.map { case (k, c) =>
            val est = merged.estimateCount(Long.box(k))
            (k, c, if (est >= c && est <= c + slack) 1 else 0)
          }
        }
      // the report is a driver-local relation now — the per-run dirs
      // can go (ADVICE r13 #4: no leaked temp dirs)
      Seq(outDir, ckptDir).foreach(removeDir)
      rows.toDF("l_partkey", "cnt", "within_envelope")
    },
    Some(heavyHittersSql))

  /** Best-effort recursive temp-dir removal for the stream harness rows
    * (ADVICE r13 #4 — per-run dirs must not accumulate). */
  private def removeDir(path: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(go))
      f.delete(); ()
    }
    go(new java.io.File(path))
  }

  private val aggRollup = Declared(
    "agg_rollup",
    (s, d) => t(s, d)("orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price"))
      .select(coalesce(col("o_orderstatus"), lit("_all")).as("status"),
        coalesce(col("o_orderpriority"), lit("_all")).as("prio"),
        col("n"), col("sum_price"))
      .orderBy("status", "prio"),
    Some("""SELECT coalesce(o_orderstatus, '_all') AS status,
           |  coalesce(o_orderpriority, '_all') AS prio,
           |  count(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
           |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
           |ORDER BY status, prio""".stripMargin))

  private val aggCube = Declared(
    "agg_cube",
    (s, d) => t(s, d)("customer")
      .cube("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n"), dsum(col("c_acctbal")).as("sum_bal"))
      .select(coalesce(col("c_mktsegment"), lit("_all")).as("segment"),
        coalesce(col("c_nationkey"), lit(-1)).as("nationkey"),
        col("n"), col("sum_bal"))
      .orderBy("segment", "nationkey"),
    Some("""SELECT coalesce(c_mktsegment, '_all') AS segment,
           |  coalesce(c_nationkey, -1) AS nationkey,
           |  count(*) AS n,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
           |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)
           |ORDER BY segment, nationkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Joins (J1-J3 + the standard surface)
  // ---------------------------------------------------------------------

  private val jInnerBroadcast = Declared(
    "j_inner_broadcast",
    // Star-schema rollup: both dims broadcast — zero shuffle of the fact
    // side for the joins; only the final 5-group aggregate shuffles.
    (s, d) => t(s, d)("customer")
      .join(broadcast(t(s, d)("nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, d)("region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("r_name"),
    Some("""SELECT r_name, count(*) AS n_cust,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
           |FROM customer
           |JOIN nation ON c_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |GROUP BY r_name ORDER BY r_name""".stripMargin))

  private val j2SemiExists = Declared(
    "j2_semi_exists",
    // EXISTS probe (replicator/main.go:72-77) → left-semi join; Catalyst
    // plans broadcast-semi when the filtered build side is small.
    (s, d) => t(s, d)("customer")
      .join(t(s, d)("orders").filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name FROM customer c
           |WHERE EXISTS (SELECT 1 FROM orders o
           |              WHERE o.o_custkey = c.c_custkey
           |                AND o.o_totalprice > 400000.0)
           |ORDER BY c_custkey""".stripMargin))

  private val j3AntiJoin = Declared(
    "j3_anti_join",
    // ON CONFLICT DO NOTHING insert-if-absent (replicator/main.go:118-122)
    // → left-anti join: keys with no match on the existing side
    // (orders with no lineitems — non-empty at every sf).
    (s, d) => t(s, d)("orders")
      .join(t(s, d)("lineitem"), col("o_orderkey") === col("l_orderkey"),
        "left_anti")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey FROM orders o
           |WHERE NOT EXISTS (SELECT 1 FROM lineitem l
           |                  WHERE l.l_orderkey = o.o_orderkey)
           |ORDER BY o_orderkey""".stripMargin))

  private val jLeftOuterCount = Declared(
    "j_left_outer_count",
    (s, d) => t(s, d)("customer").as("c")
      .join(t(s, d)("orders").as("o"),
        col("o.o_custkey") === col("c.c_custkey"), "left")
      .groupBy(col("c.c_custkey").as("c_custkey"))
      .agg(count(col("o.o_orderkey")).as("n_orders"))
      .orderBy("c_custkey"),
    Some("""SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
           |FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
           |GROUP BY c.c_custkey ORDER BY c.c_custkey""".stripMargin))

  private val jFullOuter = Declared(
    "j_full_outer",
    (s, d) => {
      val cust = t(s, d)("customer").select(col("c_nationkey").as("ck")).distinct()
      val supp = t(s, d)("supplier").select(col("s_nationkey").as("sk")).distinct()
      cust.join(supp, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"),
          col("ck").isNotNull.as("has_customer"),
          col("sk").isNotNull.as("has_supplier"))
        .orderBy("nationkey")
    },
    Some("""SELECT coalesce(ck, sk) AS nationkey,
           |  ck IS NOT NULL AS has_customer,
           |  sk IS NOT NULL AS has_supplier
           |FROM (SELECT DISTINCT c_nationkey AS ck FROM customer) a
           |FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS sk FROM supplier) b
           |  ON ck = sk
           |ORDER BY nationkey""".stripMargin))

  private val jThetaPairs = Declared(
    "j_theta_pairs",
    // Theta join (equi + inequality): nation pairs within a region. The
    // equi part keys the shuffle; the `<` residual filters post-match.
    (s, d) => {
      val n1 = t(s, d)("nation").as("n1")
      val n2 = t(s, d)("nation").as("n2")
      n1.join(n2, col("n1.n_regionkey") === col("n2.n_regionkey") &&
          col("n1.n_nationkey") < col("n2.n_nationkey"))
        .select(col("n1.n_regionkey").as("region_key"),
          col("n1.n_name").as("a_name"), col("n2.n_name").as("b_name"))
        .orderBy("region_key", "a_name", "b_name")
    },
    Some("""SELECT n1.n_regionkey AS region_key, n1.n_name AS a_name,
           |  n2.n_name AS b_name
           |FROM nation n1 JOIN nation n2
           |  ON n1.n_regionkey = n2.n_regionkey
           | AND n1.n_nationkey < n2.n_nationkey
           |ORDER BY region_key, a_name, b_name""".stripMargin))

  private val jAsofEvents = Declared(
    "j_asof_events",
    // AS-OF join — an operator Spark lacks natively, composed from
    // built-ins the scale-correct way: tag both sides, union, ONE
    // shuffle by key, then a sorted carry-forward window (last error at
    // or before each click). No per-row lookup, no range self-join blowup
    // — cost is sort-within-partition, the same plan kdb/Flink use for
    // temporal joins. Ties (error at the click's exact ts) resolve to
    // the error side first, then max event_id — mirrored in the oracle's
    // ORDER BY ts DESC, event_id DESC.
    (s, d) => {
      val ev = t(s, d)("events")
      val errs = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("err_id"),
          lit(null).cast("long").as("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("err_id"), col("event_id"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), col("err_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errs.unionByName(clicks)
        .withColumn("last_error_id",
          last(col("err_id"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_error_id"))
        .orderBy("event_id")
    },
    Some("""SELECT c.event_id, c.user_id, c.ts,
           |  (SELECT e.event_id FROM events e
           |   WHERE e.user_id = c.user_id AND e.event_type = 'error'
           |     AND e.ts <= c.ts
           |   ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) AS last_error_id
           |FROM events c WHERE c.event_type = 'click'
           |ORDER BY c.event_id""".stripMargin))

  private val aggStats = Declared(
    "agg_stats",
    // Distributed descriptive statistics with EXACT intermediates: the
    // price is fixed-point cents (floor(x·100+0.5), exact in both
    // engines); Σcents is an exact BIGINT sum, and Σcents² — which
    // exceeds 2^63 — is carried as TWO exact BIGINT sums (cents² split
    // at 2^26) recombined with plain IEEE double multiply/add. Every
    // aggregate is order-free, and the recombination avoids any
    // wide-decimal→double cast, whose int128 conversion rounds
    // differently across engines in the last ulp (observed at sf0.1).
    (s, d) => {
      val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")
      val c2 = cents * cents // ≤ ~4e15, exact in long
      t(s, d)("orders")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          (sum(cents).cast("double") / 100.0).as("s"),
          sum(shiftright(c2, 26)).as("hi"),
          sum(c2.bitwiseAND(lit(67108863L))).as("lo"))
        .select(col("o_orderpriority"), col("n"), col("s"),
          ((col("hi").cast("double") * 67108864.0 +
            col("lo").cast("double")) / 10000.0).as("s2"))
        .select(col("o_orderpriority"), col("n"),
          (col("s") / col("n")).as("mean"),
          sqrt((col("s2") - col("s") * col("s") / col("n")) /
            (col("n") - 1)).as("sd"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, n, s / n AS mean,
           |  sqrt((s2 - s * s / n) / (n - 1)) AS sd
           |FROM (
           |  SELECT o_orderpriority, n, s,
           |    (CAST(hi AS DOUBLE) * 67108864.0 + CAST(lo AS DOUBLE))
           |      / 10000.0 AS s2
           |  FROM (
           |    SELECT o_orderpriority, count(*) AS n,
           |      CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |           AS DOUBLE) / 100.0 AS s,
           |      SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |          * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |          >> 26) AS hi,
           |      SUM((CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
           |           * CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
           |          & 67108863) AS lo
           |    FROM orders GROUP BY 1))
           |ORDER BY o_orderpriority""".stripMargin))

  private val jRangePairs = Declared(
    "j_range_pairs",
    // RANGE JOIN (interval self-join) the scale-correct way: band each
    // event into 60 s buckets and equi-join on (user, bucket) with the
    // later side exploded to its bucket and the previous one — every
    // pair within the window shares a banded key, so the O(n²)-per-user
    // range predicate becomes an equi-join + residual filter (the same
    // bucketing trick engines use for interval/temporal joins). Pairs
    // are canonically oriented by (ts, event_id).
    (s, d) => {
      val W = 60000000L // 60 s in µs
      val ev = t(s, d)("events")
        .select(col("event_id"), col("user_id"), col("ts"),
          unix_micros(col("ts")).as("us"))
      val a = ev.withColumn("bk", floor(col("us") / W))
      val b = ev
        .withColumn("bk",
          explode(array(floor(col("us") / W), floor(col("us") / W) - 1)))
      val dt = col("y.us") - col("x.us")
      a.as("x").join(b.as("y"),
          col("x.user_id") === col("y.user_id") &&
            col("x.bk") === col("y.bk") &&
            (col("y.us") > col("x.us") ||
              (col("y.us") === col("x.us") &&
                col("x.event_id") < col("y.event_id"))) &&
            dt < W)
        .select(col("x.event_id").as("id_a"), col("y.event_id").as("id_b"),
          col("x.user_id").as("user_id"), dt.as("dt_us"))
        .orderBy("id_a", "id_b")
    },
    Some("""SELECT a.event_id AS id_a, b.event_id AS id_b,
           |  a.user_id AS user_id,
           |  epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
           |FROM events a JOIN events b
           |  ON a.user_id = b.user_id
           | AND (epoch_us(b.ts) > epoch_us(a.ts)
           |      OR (epoch_us(b.ts) = epoch_us(a.ts)
           |          AND a.event_id < b.event_id))
           | AND epoch_us(b.ts) - epoch_us(a.ts) < 60000000
           |ORDER BY id_a, id_b""".stripMargin))

  private val jQ3Shipping = Declared(
    "j_q3_shipping",
    // TPC-H Q3 shape — the flagship: filtered dim (customer segment)
    // broadcast into orders, then one shuffle join with lineitem on
    // l_orderkey; grouped decimal revenue; top-20 via TakeOrdered.
    (s, d) => {
      val cutoff = to_timestamp(lit("1997-06-30 00:00:00"))
      val cust = t(s, d)("customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, d)("orders").filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, d)("lineitem").filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord.join(broadcast(cust), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(20)
    },
    Some("""SELECT l_orderkey,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           |  o_orderdate, o_orderpriority
           |FROM customer, orders, lineitem
           |WHERE c_mktsegment = 'BUILDING'
           |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
           |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
           |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
           |GROUP BY l_orderkey, o_orderdate, o_orderpriority
           |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 20""".stripMargin))

  // ---------------------------------------------------------------------
  // Window functions (§2.5)
  // ---------------------------------------------------------------------

  private val wRankTopn = Declared(
    "w_rank_topn",
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d)("orders")
        .withColumn("rnk", rank().over(w))
        .filter(col("rnk") <= 3)
        .select(col("o_orderpriority"), col("rnk"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy("o_orderpriority", "rnk", "o_orderkey")
    },
    Some("""SELECT o_orderpriority, rnk, o_orderkey, o_totalprice
           |FROM (SELECT *, rank() OVER (PARTITION BY o_orderpriority
           |        ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           |      FROM orders) WHERE rnk <= 3
           |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin))

  private val wLagPrev = Declared(
    "w_lag_prev",
    (s, d) => {
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      t(s, d)("lineitem")
        .filter(col("l_suppkey") < 10)
        .withColumn("prev_orderkey", lag(col("l_orderkey"), 1).over(w))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("prev_orderkey"))
        .orderBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
    },
    Some("""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
           |  lag(l_orderkey, 1) OVER (PARTITION BY l_suppkey
           |    ORDER BY l_shipdate, l_orderkey, l_linenumber) AS prev_orderkey
           |FROM lineitem WHERE l_suppkey < 10
           |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin))

  private val wRangeHour = Declared(
    "w_range_hour",
    // Time-RANGE sliding frame (vs the rows-based frames above): per
    // user, trailing-hour event count and max over `RANGE BETWEEN 3599
    // PRECEDING AND CURRENT ROW` on epoch seconds. Range frames include
    // every tied ordering value wholly, so the result is deterministic
    // without a tie-break; count/max involve no float arithmetic, so
    // the compare is exact. Scale: one shuffle on user_id + one
    // per-partition sort — the same cost as any window.
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_sec"))
        .rangeBetween(-3599, 0)
      t(s, d)("events")
        .withColumn("ts_sec", unix_timestamp(col("ts")))
        .withColumn("n_hour", count(lit(1)).over(w))
        .withColumn("max_hour", max(col("value")).over(w))
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          col("n_hour"), col("max_hour"))
        .orderBy("user_id", "ts_sec", "event_id")
    },
    Some("""SELECT user_id, event_id, ts_sec, n_hour, max_hour FROM (
           |  SELECT user_id, event_id,
           |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
           |    count(*) OVER w AS n_hour,
           |    max(value) OVER w AS max_hour
           |  FROM events
           |  WINDOW w AS (
           |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
           |    RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW))
           |ORDER BY user_id, ts_sec, event_id""".stripMargin))

  private val wRunningSum = Declared(
    "w_running_sum",
    // Running sum in exact decimal (frame order fixed ⇒ deterministic).
    (s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d)("orders")
        .withColumn("running_spend",
          sum(col("o_totalprice").cast("decimal(30,4)")).over(w).cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("running_spend"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER
           |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           |    AS running_spend
           |FROM orders
           |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Set operations (§2.7)
  // ---------------------------------------------------------------------

  private def custNations(s: SparkSession, d: String): DataFrame =
    t(s, d)("customer").select(col("c_nationkey").as("k"))
  private def suppNations(s: SparkSession, d: String): DataFrame =
    t(s, d)("supplier").select(col("s_nationkey").as("k"))

  private val setUnion = Declared(
    "set_union",
    (s, d) => custNations(s, d).union(suppNations(s, d)).distinct().orderBy("k"),
    Some("""SELECT c_nationkey AS k FROM customer
           |UNION SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin))

  private val setIntersect = Declared(
    "set_intersect",
    (s, d) => custNations(s, d).intersect(suppNations(s, d)).orderBy("k"),
    Some("""SELECT c_nationkey AS k FROM customer
           |INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""".stripMargin))

  private val setExcept = Declared(
    "set_except",
    // Order keys never shipped — non-empty at every sf.
    (s, d) => t(s, d)("orders").select(col("o_orderkey").as("k"))
      .except(t(s, d)("lineitem").select(col("l_orderkey").as("k")))
      .orderBy("k"),
    Some("""SELECT o_orderkey AS k FROM orders
           |EXCEPT SELECT l_orderkey AS k FROM lineitem ORDER BY k""".stripMargin))

  // ---------------------------------------------------------------------
  // Scalar functions & expressions (X1-X13)
  // ---------------------------------------------------------------------

  private val xStringFuncs = Declared(
    "x_string_funcs",
    // String-library surface (§2.8 X8 widened): case, reverse, replace,
    // substring, padding, containment, field split — all codegen'd
    // row-wise projections, zero shuffle beyond the output sort.
    (s, d) => t(s, d)("customer")
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("up"),
        reverse(col("c_name")).as("rev"),
        regexp_replace(col("c_name"), "#", "-").as("repl"),
        substring(col("c_name"), 3, 5).as("sub"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
        col("c_name").contains("1").cast("int").as("has1"),
        split(col("c_name"), "#").getItem(1).as("fld"),
        length(trim(col("c_name"))).cast("long").as("tlen"))
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, upper(c_name) AS up, reverse(c_name) AS rev,
           |  replace(c_name, '#', '-') AS repl,
           |  substr(c_name, 3, 5) AS sub,
           |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
           |  CAST(contains(c_name, '1') AS INT) AS has1,
           |  split_part(c_name, '#', 2) AS fld,
           |  CAST(length(trim(c_name)) AS BIGINT) AS tlen
           |FROM customer ORDER BY c_custkey""".stripMargin))

  private val aggSaltedSkew = Declared(
    "agg_salted_skew",
    // Two-phase SALTED aggregation — the skew-mitigation pattern for
    // heavy keys (here: 3 return flags over the whole fact table):
    // phase 1 aggregates (key, salt) so the hot key's rows spread over
    // 16 reducers; phase 2 combines the 16 partials per key. The decimal
    // partial sums are exact, so the result equals the direct aggregate
    // — which is exactly what the oracle computes.
    (s, d) => {
      val salted = t(s, d)("lineitem")
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy("l_returnflag", "salt")
        .agg(count(lit(1)).as("pn"),
          sum(col("l_quantity").cast("decimal(30,4)")).as("pq"))
      salted.groupBy("l_returnflag")
        .agg(sum(col("pn")).as("n"),
          sum(col("pq")).cast("double").as("sum_qty"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
           |    AS sum_qty
           |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin))

  private val xDateFuncs = Declared(
    "x_date_funcs",
    // Date/time library surface (§2.8 widened): part extraction,
    // ISO weekday (Spark weekday is 0=Monday, DuckDB isodow 1=Monday —
    // alignment is part of the declared semantics), week truncation,
    // day difference, month end. Row-wise codegen projections.
    (s, d) => t(s, d)("events")
      .select(
        col("event_id"),
        year(col("ts")).as("y"),
        month(col("ts")).as("m"),
        dayofmonth(col("ts")).as("dom"),
        (weekday(col("ts")) + 1).as("isodow"),
        date_trunc("week", col("ts")).as("week_start"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .as("days_since"),
        hour(col("ts")).as("h"),
        to_date(col("ts")).as("day"),
        last_day(to_date(col("ts"))).as("month_end"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CAST(extract(year FROM ts) AS INT) AS y,
           |  CAST(extract(month FROM ts) AS INT) AS m,
           |  CAST(extract(day FROM ts) AS INT) AS dom,
           |  CAST(isodow(ts) AS INT) AS isodow,
           |  CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
           |       AS INT) AS days_since,
           |  CAST(extract(hour FROM ts) AS INT) AS h,
           |  CAST(ts AS DATE) AS day,
           |  last_day(CAST(ts AS DATE)) AS month_end
           |FROM events ORDER BY event_id""".stripMargin))

  private val aggQuantiles = Declared(
    "agg_quantiles",
    // EXACT interpolated quantiles (percentile, not the approximate
    // sketch): both engines sort the group and linearly interpolate at
    // p·(n−1) — identical arithmetic on identical doubles. The exact
    // variant shuffles whole groups (fine for bounded groups); the
    // approximate sketch is the 100 TB default — declared as the
    // `agg_approx_quantiles` twin below.
    (s, d) => t(s, d)("orders")
      .groupBy("o_orderpriority")
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |  quantile_cont(o_totalprice, 0.25) AS p25,
           |  quantile_cont(o_totalprice, 0.5) AS p50,
           |  quantile_cont(o_totalprice, 0.75) AS p75
           |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))

  private val aggApproxQuantiles = Declared(
    "agg_approx_quantiles",
    // The scale twin of agg_quantiles: Greenwald-Khanna sketches
    // (accuracy 1e4 ⇒ ε = 1e-4) aggregate in one pass with bounded
    // memory per group instead of shuffling whole groups. GK picks an
    // actual data value near each requested rank (engine-specific), so
    // the raw estimate has no cross-engine oracle; instead the query
    // emits an ENVELOPE VERDICT per group (VERDICT r3 #3):
    // `within_envelope = exact_pctl(p−δ) ≤ approx ≤ exact_pctl(p+δ)`
    // with δ = 0.01. Any data value whose rank is within δ·(n−1) of the
    // target sits inside that bracket; GK's rank error is ε·n plus ≤ 1
    // rank of convention skew vs the interpolated exact percentile —
    // comfortably under δ·(n−1) ≥ 3 at the smallest fixture group
    // (~300 rows). The oracle expects literal 1s alongside the
    // hash-matched group keys.
    (s, d) => {
      val delta = 0.01
      def ok(p: Double, label: String): Column =
        expr(s"approx_percentile(o_totalprice, $p, 10000)")
          .between(expr(s"percentile(o_totalprice, ${p - delta})"),
            expr(s"percentile(o_totalprice, ${p + delta})"))
          .cast("int").as(s"${label}_within_envelope")
      t(s, d)("orders")
        .groupBy("o_orderpriority")
        .agg(ok(0.25, "p25"), ok(0.5, "p50"), ok(0.75, "p75"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |  CAST(1 AS INT) AS p25_within_envelope,
           |  CAST(1 AS INT) AS p50_within_envelope,
           |  CAST(1 AS INT) AS p75_within_envelope
           |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin))

  private val aggPivot = Declared(
    "agg_pivot",
    // PIVOT: per-user event-type counts as columns. The value list is
    // explicit, so no extra distinct pass runs and the output schema is
    // deterministic; same single hash-aggregate shuffle as any grouped
    // count, just with 5 conditional aggregates.
    (s, d) => t(s, d)("events")
      .groupBy("user_id")
      .pivot("event_type",
        Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id"),
    Some("""SELECT user_id,
           |  count(*) FILTER (WHERE event_type = 'click') AS click,
           |  count(*) FILTER (WHERE event_type = 'error') AS error,
           |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           |  count(*) FILTER (WHERE event_type = 'signup') AS signup,
           |  count(*) FILTER (WHERE event_type = 'view') AS view
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  private val xLateralExplode = Declared(
    "x_lateral_explode",
    // Lateral explode with ordinality (the UDTF/table-function shape):
    // posexplode keeps the element index — a narrow Generate, no
    // shuffle before the output sort.
    (s, d) => t(s, d)("customer")
      .select(col("c_custkey"),
        posexplode(split(col("c_name"), "0")).as(Seq("i0", "part")))
      .select(col("c_custkey"), (col("i0") + 1).cast("long").as("i"),
        col("part"))
      .orderBy("c_custkey", "i"),
    Some("""SELECT c_custkey,
           |  generate_subscripts(string_split(c_name, '0'), 1) AS i,
           |  unnest(string_split(c_name, '0')) AS part
           |FROM customer ORDER BY c_custkey, i""".stripMargin))

  private val xScalarFuncs = Declared(
    "x_scalar_funcs",
    // X1 modulo, X2 coalesce/case, X4 cast, X8 concat, X12 date_format —
    // all codegen'd built-ins fused into one projection stage.
    (s, d) => t(s, d)("orders")
      .select(
        col("o_orderkey"),
        (col("o_orderkey") % 7).as("mod7"),
        concat(col("o_orderpriority"), lit("_"),
          (col("o_orderkey") % 10).cast("string")).as("tag"),
        date_format(col("o_orderdate"), "yyyy-MM").as("order_month"),
        col("o_orderkey").cast("string").as("key_str"),
        when(col("o_orderstatus") === "P", lit("PENDING"))
          .otherwise(col("o_orderstatus")).as("status_norm"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_orderkey % 7 AS mod7,
           |  concat(o_orderpriority, '_', CAST(o_orderkey % 10 AS VARCHAR)) AS tag,
           |  strftime(o_orderdate, '%Y-%m') AS order_month,
           |  CAST(o_orderkey AS VARCHAR) AS key_str,
           |  CASE WHEN o_orderstatus = 'P' THEN 'PENDING'
           |       ELSE o_orderstatus END AS status_norm
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  private val xEpochDiff = Declared(
    "x_epoch_diff",
    // X5: EXTRACT(EPOCH FROM (a - b)) (pubsub/main.go:203) as epoch-second
    // subtraction + day diff, computed between two data timestamps so the
    // result is deterministic (no wall clock in verified queries).
    (s, d) => t(s, d)("lineitem").as("l")
      .join(t(s, d)("orders").as("o"),
        col("l.l_orderkey") === col("o.o_orderkey"))
      .select(col("l.l_orderkey").as("l_orderkey"), col("l.l_linenumber").as("l_linenumber"),
        (unix_timestamp(col("l.l_shipdate")) - unix_timestamp(col("o.o_orderdate")))
          .as("delay_secs"),
        datediff(col("l.l_shipdate").cast("date"), col("o.o_orderdate").cast("date"))
          .cast("long").as("delay_days"))
      .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
           |  CAST(epoch(l_shipdate) AS BIGINT) - CAST(epoch(o_orderdate) AS BIGINT)
           |    AS delay_secs,
           |  date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           |    AS delay_days
           |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  private val xJsonExtract = Declared(
    "x_json_extract",
    // X11: JSON decode of the change payload (replicator/main.go:184-188)
    // analog over events.props. get_json_object is the Spark-native path;
    // the k_str column uses the same regexp on both engines.
    (s, d) => t(s, d)("events")
      .select(col("event_id"),
        regexp_extract(col("props"), """"k":\s*(\d+)""", 1).as("k_str"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  regexp_extract(props, '"k":\s*(\d+)', 1) AS k_str,
           |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k
           |FROM events ORDER BY event_id""".stripMargin))

  private val xVariantJson = Declared(
    "x_variant_json",
    // The Spark 4 VARIANT path for the same change-payload decode:
    // parse once into the binary-encoded variant (the shredded
    // semi-structured representation — at 100 TB the parse cost is
    // paid once at ingest and typed extraction happens on the binary
    // form, not by re-tokenizing JSON text per access the way
    // get_json_object does), then typed `variant_get` extraction with
    // an absent-path probe exercising the NULL contract. The oracle
    // re-derives the same values from the JSON text — VARIANT is a
    // representation change, never a semantics change.
    (s, d) => t(s, d)("events")
      .select(col("event_id"),
        variant_get(parse_json(col("props")), "$.k", "int").as("k"),
        variant_get(parse_json(col("props")), "$.missing", "int")
          .as("k_missing"))
      .orderBy("event_id"),
    Some("""SELECT event_id,
           |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER)
           |    AS k,
           |  CAST(NULL AS INTEGER) AS k_missing
           |FROM events ORDER BY event_id""".stripMargin))

  private val xArrayOps = Declared(
    "x_array_ops",
    // X13 array handling over the embeddings list column: size,
    // element access, and an exact-order fold (l2 norm, rounded).
    (s, d) => t(s, d)("embeddings")
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast("double").as("e1"),
        round(sqrt(aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 6).as("l2_norm"))
      .orderBy("vec_id"),
    Some("""SELECT vec_id, CAST(len(embedding) AS INTEGER) AS dim,
           |  CAST(embedding[1] AS DOUBLE) AS e1,
           |  round(sqrt(list_sum(list_transform(embedding,
           |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
           |FROM embeddings ORDER BY vec_id""".stripMargin))

  // ---------------------------------------------------------------------
  // Subqueries
  // ---------------------------------------------------------------------

  private val subScalarAvg = Declared(
    "sub_scalar_avg",
    // Scalar subquery: the 1-row aggregate is broadcast — at scale this is
    // one tiny exchange, never a shuffle of the probe side. The average is
    // computed as exact decimal-sum / count (like q1's avg_qty) so the
    // threshold is identical at any parallelism — a plain double avg sums
    // in partition order and can flip boundary rows between runs.
    (s, d) => {
      val ord = t(s, d)("orders")
      val avgP = ord.agg((dsum(col("o_totalprice")) / count(lit(1))).as("avg_p"))
      ord.crossJoin(broadcast(avgP))
        .filter(col("o_totalprice") > col("avg_p") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
           |WHERE o_totalprice >
           |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
           |     / count(*) FROM orders) * 1.5
           |ORDER BY o_orderkey""".stripMargin))

  private val subInSegment = Declared(
    "sub_in_segment",
    // IN (subquery) → left-semi join against the filtered dim.
    (s, d) => t(s, d)("orders")
      .join(t(s, d)("customer").filter(col("c_mktsegment") === "MACHINERY"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"), col("o_custkey"))
      .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey, o_custkey FROM orders
           |WHERE o_custkey IN (SELECT c_custkey FROM customer
           |                    WHERE c_mktsegment = 'MACHINERY')
           |ORDER BY o_orderkey""".stripMargin))

  // ---------------------------------------------------------------------
  // Event-time bucketing (batch analog of the streaming window — §2.9 T6)
  // ---------------------------------------------------------------------

  private val eventsWindowHour = Declared(
    "events_window_hour",
    (s, d) => t(s, d)("events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("h", "event_type"),
    Some("""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, event_type,
           |  count(*) AS n,
           |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin))

  private val aggGroupingSets = Declared(
    "agg_grouping_sets",
    // Explicit GROUPING SETS — the mixed-granularity rollup CUBE/ROLLUP
    // can't express: ((flag,status), (flag), ()) but never ((status)).
    // Same single-shuffle expansion as cube (each input row fans out to
    // its matching sets map-side, partial agg combines before exchange).
    // grouping() flags (not grouping_id) keep the oracle engine-neutral.
    (s, d) => t(s, d)("lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("_all")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("_all")).as("linestatus"),
        col("g_flag"), col("g_status"), col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus", "g_flag", "g_status"),
    Some("""SELECT coalesce(l_returnflag, '_all') AS returnflag,
           |  coalesce(l_linestatus, '_all') AS linestatus,
           |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           |  count(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
           |  (l_returnflag), ())
           |ORDER BY returnflag, linestatus, g_flag, g_status""".stripMargin))

  private val aggHistogram = Declared(
    "agg_histogram",
    // Equi-width histogram: the profiling primitive behind optimizer
    // stats and data-quality dashboards. Bucket id via explicit floor()
    // over a decimal quotient — floor is engine-neutral, whereas
    // decimal→int CASTs round in DuckDB but truncate in Spark. One
    // map-side-combined shuffle keyed on ~O(buckets) groups.
    (s, d) => t(s, d)("orders")
      .select(floor(col("o_totalprice").cast("decimal(30,4)") / lit(50000))
        .cast("bigint").as("bucket"),
        col("o_totalprice"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket"),
    Some("""SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(30,4)) / 50000)
           |    AS BIGINT) AS bucket,
           |  count(*) AS n,
           |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
           |    AS sum_price,
           |  min(o_totalprice) AS min_price,
           |  max(o_totalprice) AS max_price
           |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin))

  private val jQ18TopOrders = Declared(
    "j_q18_toporders",
    // TPC-H Q18 shape (large-volume customer): HAVING on a fact
    // aggregate, then join back to orders + a broadcast dim, top-k.
    // The lineitem aggregate and the orders join share the orderkey
    // shuffle; customer broadcasts; the final top-20 is TakeOrdered
    // (per-partition k, no global sort).
    (s, d) => {
      val bigOrders = t(s, d)("lineitem")
        .groupBy("l_orderkey")
        .agg(dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      t(s, d)("orders")
        .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(t(s, d)("customer")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""SELECT c_name, o_orderkey, o_custkey, o_totalprice, sum_qty
           |FROM orders
           |JOIN (SELECT l_orderkey,
           |        CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
           |          AS sum_qty
           |      FROM lineitem GROUP BY l_orderkey
           |      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(30,4)))
           |             AS DOUBLE) > 150) big
           |  ON o_orderkey = big.l_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_totalprice DESC, o_orderkey
           |LIMIT 20""".stripMargin))

  private val jQ5Volume = Declared(
    "j_q5_volume",
    // TPC-H Q5 shape (local supplier volume): the six-table chain with
    // the cross-dim "local" constraint (customer and supplier share a
    // nation). Plan discipline: lineitem⋈orders is the one big
    // fact-fact shuffle on orderkey; supplier and customer join on
    // their keys; nation and the filtered region broadcast. The
    // orderdate filter pushes into the orders scan so the fact shuffle
    // carries only the two-year slice. Revenue is the exact decimal
    // sum (order-insensitive at any parallelism).
    (s, d) => {
      val lo = t(s, d)("lineitem")
        .join(t(s, d)("orders").filter(
            col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
      lo.join(t(s, d)("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d)("customer"),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(t(s, d)("nation")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d)("region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM customer, orders, lineitem, supplier, nation, region
           |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
           |  AND r_name = 'ASIA'
           |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY n_name
           |ORDER BY revenue DESC, n_name""".stripMargin))

  private val aggQ12Shipmode = Declared(
    "agg_q12_shipmode",
    // TPC-H Q12 shape (shipping-priority audit): conditional aggregates
    // — one orders⋈lineitem join on the shipdate year slice, then
    // per-group CASE sums. The CASE evaluates map-side inside the
    // partial aggregate, so the shuffle carries 3 groups × 2 longs, not
    // rows. (The fixture has no l_shipmode; l_returnflag plays the
    // grouping role, o_orderpriority the urgency classification —
    // identical shape.)
    (s, d) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d)("orders")
        .join(t(s, d)("lineitem"), col("o_orderkey") === col("l_orderkey"))
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .groupBy("l_returnflag")
        .agg(sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(urgent, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
           |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  private val wNtile = Declared(
    "w_ntile_pctrank",
    // Distribution windows: ntile quartiles + percent_rank per priority
    // class — the histogram-bucketing window family (rows-frame rank
    // functions, not aggregates). Deterministic: the window order has
    // the unique orderkey as tie-break, and percent_rank's
    // (rank-1)/(n-1) is an int/int IEEE division — exact both engines.
    (s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d)("orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          col("o_totalprice"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"))
        .orderBy("o_orderpriority", "pct_rank", "o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderpriority, o_totalprice,
           |  CAST(ntile(4) OVER w AS INT) AS quartile,
           |  percent_rank() OVER w AS pct_rank
           |FROM orders
           |WINDOW w AS (PARTITION BY o_orderpriority
           |             ORDER BY o_totalprice DESC, o_orderkey)
           |ORDER BY o_orderpriority, pct_rank, o_orderkey""".stripMargin))

  private val jQ4Priority = Declared(
    "j_q4_priority",
    // TPC-H Q4 shape (order-priority checking): a quarter of orders,
    // EXISTS-reduced against lineitem with a correlated NON-EQUI
    // predicate (a "late line" — shipped > 90 days after the order;
    // the fixture has no commit/receipt dates, identical shape),
    // counted per priority. Plan discipline: the EXISTS is a left-semi
    // join on orderkey with the date window pushed into the orders
    // scan — never a dedup-after-join; the semi join short-circuits
    // per probe row, so a 100 TB lineitem contributes at most one
    // match probe per order.
    (s, d) => {
      val ord = t(s, d)("orders")
        .filter(
          col("o_orderdate") >= to_timestamp(lit("1997-07-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-10-01 00:00:00")))
      val li = t(s, d)("lineitem").select("l_orderkey", "l_shipdate")
      ord.join(li,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
           |FROM orders
           |WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
           |  AND EXISTS (SELECT 1 FROM lineitem
           |              WHERE l_orderkey = o_orderkey
           |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  private val jQ10Returns = Declared(
    "j_q10_returns",
    // TPC-H Q10 shape (returned-item reporting): which customers
    // returned the most revenue in a quarter. One fact-fact shuffle
    // (lineitem⋈orders on orderkey, both sides filtered IN-SCAN — the
    // quarter on orders, the R flag on lineitem), customer joined on
    // custkey, nation broadcast; exact decimal revenue; top-20
    // TakeOrdered.
    (s, d) => {
      val ord = t(s, d)("orders")
        .filter(
          col("o_orderdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .select("o_orderkey", "o_custkey")
      val li = t(s, d)("lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d)("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d)("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"),
          col("c_acctbal"), col("n_name"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           |  c_acctbal, n_name
           |FROM customer, orders, lineitem, nation
           |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
           |  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
           |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
           |GROUP BY c_custkey, c_name, c_acctbal, n_name
           |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin))

  private val jQ14Promo = Declared(
    "j_q14_promo",
    // TPC-H Q14 shape (promotion effect): the share of one month's
    // revenue carried by promo parts. lineitem's month filter pushes
    // into the scan, part broadcasts, the CASE folds map-side inside
    // the partial aggregate (the shuffle carries two decimals), and
    // the share is ONE IEEE division of two exact decimal sums —
    // deterministic at any parallelism.
    (s, d) => {
      val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d)("lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-02-01 00:00:00")))
        .join(broadcast(t(s, d)("part")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6)
            .as("promo_revenue"),
          dsum(rev, 6).as("total_revenue"))
        .withColumn("promo_share",
          col("promo_revenue") / col("total_revenue"))
    },
    Some("""SELECT
           |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
           |      AS DECIMAL(30,6))) AS DOUBLE) AS promo_revenue,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue,
           |  CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
           |      AS DECIMAL(30,6))) AS DOUBLE) /
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS promo_share
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin))

  private val aggCorr = Declared(
    "agg_corr",
    // Exact Pearson correlation per group. The built-in corr() is a
    // floating Welford fold — order-dependent, so it can never
    // oracle-match nor reproduce across partitionings. Instead the five
    // moments are EXACT sums (centi-quantized values, decimal
    // accumulators — order-free at any parallelism; DuckDB's hugeint
    // sums are the same exact integers) and the single
    // divide-and-sqrt at the end is IEEE on exact integers —
    // bit-identical in both engines.
    (s, d) => {
      val x = expr("CAST(floor(l_quantity * 100 + 0.5) AS DECIMAL(38,0))")
      val y = expr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0))")
      t(s, d)("lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"),
          sum(x * y).as("sxy"))
        .select(col("l_returnflag"), col("n"),
          col("sx").cast("double").as("sx"),
          col("sy").cast("double").as("sy"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
                .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))).as("corr_qty_price"))
        .orderBy("l_returnflag")
    },
    Some("""WITH q AS (
           |  SELECT l_returnflag,
           |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS x,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
           |  FROM lineitem),
           |m AS (
           |  SELECT l_returnflag, count(*) AS n,
           |    sum(x) AS sx, sum(y) AS sy,
           |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
           |  FROM q GROUP BY 1)
           |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           |  CAST(sx AS DOUBLE) AS sx, CAST(sy AS DOUBLE) AS sy,
           |  CAST(n * sxy - sx * sy AS DOUBLE) /
           |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
           |         CAST(n * syy - sy * sy AS DOUBLE)) AS corr_qty_price
           |FROM m ORDER BY l_returnflag""".stripMargin))

  private val aggListagg = Declared(
    "agg_listagg",
    // Spark 4's listagg (SQL:2016 string aggregation): DISTINCT +
    // WITHIN GROUP ordering is the ONLY deterministic form — unordered
    // listagg concatenates in arrival order and can never oracle-match
    // (nor reproduce across partitionings). DuckDB spells the same
    // aggregate string_agg(DISTINCT … ORDER BY …).
    (s, d) => t(s, d)("orders")
      .groupBy("o_orderpriority")
      .agg(expr("listagg(DISTINCT o_orderstatus, ',') " +
          "WITHIN GROUP (ORDER BY o_orderstatus)").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
           |  string_agg(DISTINCT o_orderstatus, ','
           |             ORDER BY o_orderstatus) AS statuses,
           |  CAST(count(*) AS BIGINT) AS n
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  private val wValueFuncs = Declared(
    "w_value_funcs",
    // Value windows: first_value / last_value / nth_value over an
    // explicit running ROWS frame (under the ANSI default RANGE frame
    // last_value degenerates to the current peer group, so the frame
    // is pinned identically in both engines) plus cume_dist over the
    // full partition. The fixture DOES carry duplicate (orderkey,
    // linenumber) pairs, so l_quantity joins the ordering: rows still
    // tied after that are tied on every emitted column (peers share
    // cume_dist; the value picks all resolve to l_quantity), making
    // every output row engine-order-independent. cume_dist is an
    // int/int IEEE division — bit-exact at any parallelism.
    (s, d) => {
      val ord = Seq(col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity"))
      val wf = Window.partitionBy("l_suppkey").orderBy(ord: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wo = Window.partitionBy("l_suppkey").orderBy(ord: _*)
      t(s, d)("lineitem")
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          first(col("l_quantity")).over(wf).as("first_qty"),
          last(col("l_quantity")).over(wf).as("last_qty"),
          nth_value(col("l_quantity"), 2).over(wf).as("second_qty"),
          cume_dist().over(wo).as("cdist"))
        .orderBy(col("l_suppkey") +: ord: _*)
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           |  first_value(l_quantity) OVER wf AS first_qty,
           |  last_value(l_quantity) OVER wf AS last_qty,
           |  nth_value(l_quantity, 2) OVER wf AS second_qty,
           |  cume_dist() OVER wo AS cdist
           |FROM lineitem
           |WINDOW wf AS (PARTITION BY l_suppkey
           |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |  wo AS (PARTITION BY l_suppkey
           |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
           |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
           |  l_quantity""".stripMargin))

  // ---------------------------------------------------------------------
  // Round-9 TPC-H completion wave: the remaining query shapes, adapted
  // where the fixture lacks TPC-H columns (no partsupp table, no
  // l_commitdate/l_receiptdate, no comment/phone columns) — each
  // adaptation keeps the SHAPE (the plan problem) and documents the
  // substitution.
  // ---------------------------------------------------------------------

  private val q6Forecast = Declared(
    "q6_forecast",
    // TPC-H Q6 (forecasting revenue change): the pure scan-side query —
    // three range predicates pushed into the parquet scan, one exact
    // decimal sum, zero joins, zero shuffles beyond the single-row
    // aggregate exchange. At 100 TB this is the query that must read
    // only row groups whose shipdate/discount/quantity stats overlap.
    (s, d) => t(s, d)("lineitem")
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")) &&
          col("l_discount") >= 0.02 && col("l_discount") <= 0.06 &&
          col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6)
        .as("revenue")),
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * l_discount
           |    AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |  AND l_discount >= 0.02 AND l_discount <= 0.06
           |  AND l_quantity < 24""".stripMargin))

  private val jQ7Nations = Declared(
    "j_q7_nations",
    // TPC-H Q7 (volume shipping): the two-nation disjunctive pair —
    // nation joins BOTH fact sides (supplier's and customer's) under
    // aliases, the pair predicate is an OR of two conjunctions over the
    // two broadcast dims, and revenue groups by (supp_nation,
    // cust_nation, year). One fact-fact orderkey shuffle; both nation
    // copies broadcast.
    (s, d) => {
      val n1 = t(s, d)("nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = t(s, d)("nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      t(s, d)("lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(t(s, d)("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d)("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d)("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_12" &&
            col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" &&
            col("cust_nation") === "NATION_12"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
           |    OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
           |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  private val jQ8Share = Declared(
    "j_q8_share",
    // TPC-H Q8 (national market share): the widest dim chain — part
    // filters the fact in-scan-adjacent (broadcast), customer routes
    // through nation→region to scope the MARKET, supplier's nation
    // labels the competitor, and the share per year is ONE IEEE
    // division of two exact decimal sums (the CASE folds map-side).
    (s, d) => {
      val ns = t(s, d)("nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      t(s, d)("lineitem")
        .join(broadcast(t(s, d)("part")
            .filter(col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d)("orders").filter(
            col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d)("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d)("customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d)("nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d)("region").filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .join(broadcast(ns), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_3", vol)
            .otherwise(lit(0.0)), 6).as("nation_volume"),
          dsum(vol, 6).as("total_volume"))
        .withColumn("mkt_share",
          col("nation_volume") / col("total_volume"))
        .orderBy("o_year")
    },
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |  CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_3'
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
           |      AS DECIMAL(30,6))) AS DOUBLE) AS nation_volume,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS total_volume,
           |  CAST(SUM(CAST(CASE WHEN n1.n_name = 'NATION_3'
           |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
           |      AS DECIMAL(30,6))) AS DOUBLE) /
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      AS DECIMAL(30,6))) AS DOUBLE) AS mkt_share
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN nation n2 ON c_nationkey = n2.n_nationkey
           |JOIN region ON n2.n_regionkey = r_regionkey
           |  AND r_name = 'EUROPE'
           |JOIN nation n1 ON s_nationkey = n1.n_nationkey
           |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  private val jQ9Profit = Declared(
    "j_q9_profit",
    // TPC-H Q9 shape (product-type profit). The fixture has no partsupp
    // table, so supply cost substitutes 10% of p_retailprice·quantity —
    // the SHAPE (LIKE-filtered part broadcast, fact-fact orderkey
    // shuffle for the year, supplier nation rollup, a profit expression
    // mixing two tables' columns) is identical; only the cost constant
    // differs.
    (s, d) => {
      val amount = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)
      t(s, d)("lineitem")
        .join(broadcast(t(s, d)("part")
            .filter(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, d)("orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d)("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d)("nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(dsum(amount, 6).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation,
           |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
           |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |      - p_retailprice * l_quantity * 0.1
           |      AS DECIMAL(30,6))) AS DOUBLE) AS sum_profit
           |FROM lineitem
           |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN supplier ON l_suppkey = s_suppkey
           |JOIN nation ON s_nationkey = n_nationkey
           |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin))

  private val jQ13Custdist = Declared(
    "j_q13_custdist",
    // TPC-H Q13 shape (customer order distribution): the FILTERED LEFT
    // OUTER join (the filter lives in the join, so customers whose
    // orders are all excluded still count with 0) feeding a two-level
    // aggregate — per-customer count, then the distribution of counts.
    // The fixture lacks o_comment; the urgent-priority class plays the
    // excluded-order role. Both aggregates shuffle on shrinking keys
    // (custkey, then the tiny count domain).
    (s, d) => t(s, d)("customer")
      .join(t(s, d)("orders").filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc),
    Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
           |FROM (
           |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
           |  FROM customer LEFT OUTER JOIN orders
           |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           |  GROUP BY c_custkey)
           |GROUP BY c_count
           |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  private val jQ15TopSupplier = Declared(
    "j_q15_topsupplier",
    // TPC-H Q15 (top supplier): the revenue "view" (per-supplier
    // quarterly sum) consumed twice — once for the global max (a
    // 1-row broadcastable scalar), once to select the achievers. Ties
    // all emit (the spec's semantics); equality compares the SAME
    // exact-decimal-derived doubles on both sides.
    (s, d) => {
      val rev = t(s, d)("lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-04-01 00:00:00")))
        .groupBy(col("l_suppkey"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("total_revenue"))
      val maxRev = rev.agg(max(col("total_revenue")).as("max_revenue"))
      t(s, d)("supplier")
        .join(rev, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(maxRev), col("total_revenue") === col("max_revenue"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |        AS DECIMAL(30,6))) AS DOUBLE) AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  private val jQ17SmallQty = Declared(
    "j_q17_smallqty",
    // TPC-H Q17 (small-quantity-order revenue): the correlated
    // per-part average threshold (l_quantity < 0.2·avg over the part)
    // decorrelated into one per-part aggregate joined back — and made
    // EXACT by cross-multiplying (5·qty·cnt < sum_qty) instead of an
    // IEEE avg compare; only the final yearly division is floating.
    // The brand/size filter stands in for the missing p_container.
    (s, d) => {
      val pf = broadcast(t(s, d)("part")
        .filter(col("p_brand") === "Brand#3" && col("p_size") <= 10)
        .select("p_partkey"))
      val li = t(s, d)("lineitem").join(pf,
        col("l_partkey") === col("p_partkey"))
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("decimal(30,4)")).as("sum_qty"),
          count(lit(1)).as("cnt"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity").cast("decimal(30,4)") * 5 * col("cnt") <
          col("sum_qty"))
        .agg((dsum(col("l_extendedprice"), 6) / lit(7.0)).as("avg_yearly"))
    },
    Some("""WITH li AS (
           |  SELECT l_partkey, l_quantity, l_extendedprice
           |  FROM lineitem JOIN part ON l_partkey = p_partkey
           |  WHERE p_brand = 'Brand#3' AND p_size <= 10),
           |pp AS (
           |  SELECT l_partkey AS pk,
           |    SUM(CAST(l_quantity AS DECIMAL(30,4))) AS sum_qty,
           |    count(*) AS cnt
           |  FROM li GROUP BY 1)
           |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6)))
           |    AS DOUBLE) / 7.0 AS avg_yearly
           |FROM li JOIN pp ON l_partkey = pk
           |WHERE CAST(l_quantity AS DECIMAL(30,4)) * 5 * cnt < sum_qty"""
      .stripMargin))

  private val jQ19Disjunct = Declared(
    "j_q19_disjunct",
    // TPC-H Q19 (discounted revenue): the OR-of-conjunctions JOIN
    // predicate — three (brand, size band, quantity band) cases — that
    // tests disjunctive pushdown: the common l_partkey = p_partkey
    // equi-half must still plan a broadcast hash join with the
    // disjunction as a post-join filter, never a nested-loop over the
    // fact. p_size bands stand in for the missing p_container.
    (s, d) => {
      val cases =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
      t(s, d)("lineitem")
        .join(broadcast(t(s, d)("part")),
          col("l_partkey") === col("p_partkey") && cases)
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6)
          .as("revenue"))
    },
    Some("""SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           |    AS DECIMAL(30,6))) AS DOUBLE) AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin))

  private val jQ21Waiting = Declared(
    "j_q21_waiting",
    // TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    // EXISTS(another supplier) AND NOT EXISTS(another LATE supplier)
    // pair, rewritten as ONE per-order aggregate joined back on the
    // SAME orderkey shuffle — at 100 TB this replaces two lineitem
    // self-joins with one exchange reused twice (the aggregate-rewrite
    // every engine's decorrelator aims for). The fixture lacks
    // l_commitdate/l_receiptdate, so "late" = shipped more than 90
    // days after the order date.
    (s, d) => {
      val late = col("l_shipdate") >
        (col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      val os = t(s, d)("lineitem")
        .join(t(s, d)("orders").filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
        .agg(max(late.cast("int")).as("late"))
      val perOrder = os.groupBy("ok")
        .agg(count(lit(1)).as("nsupp"), sum(col("late")).as("nlate"))
      os.join(perOrder, "ok")
        .filter(col("late") === 1 && col("nsupp") > 1 && col("nlate") === 1)
        .groupBy("sk")
        .agg(count(lit(1)).as("numwait"))
        .join(t(s, d)("supplier"), col("sk") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    Some("""WITH os AS (
           |  SELECT l_orderkey AS ok, l_suppkey AS sk,
           |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
           |             THEN 1 ELSE 0 END) AS late
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           |  WHERE o_orderstatus = 'F'
           |  GROUP BY 1, 2),
           |po AS (
           |  SELECT ok, count(*) AS nsupp, sum(late) AS nlate
           |  FROM os GROUP BY 1)
           |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
           |FROM os JOIN po ON os.ok = po.ok
           |JOIN supplier ON sk = s_suppkey
           |WHERE late = 1 AND nsupp > 1 AND nlate = 1
           |GROUP BY s_name
           |ORDER BY numwait DESC, s_name""".stripMargin))

  private val jQ22Prospects = Declared(
    "j_q22_prospects",
    // TPC-H Q22 shape (global sales opportunity): the scalar-subquery
    // threshold (above-average positive balance, EXACT via
    // cross-multiply instead of an IEEE avg compare) + the NOT EXISTS
    // anti-join. Every fixture customer has SOME order, so the
    // anti-join scopes to the recent window (customers inactive since
    // 2000) — same shape, the window filter pushes into the orders
    // scan; nationkey plays the country-code grouping role (the
    // fixture has no phone column).
    (s, d) => {
      val posStats = t(s, d)("customer")
        .filter(col("c_acctbal") > 0)
        .agg(sum(col("c_acctbal").cast("decimal(30,4)")).as("sum_bal"),
          count(lit(1)).as("n_bal"))
      val recent = t(s, d)("orders")
        .filter(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
        .select(col("o_custkey"))
      t(s, d)("customer")
        .crossJoin(broadcast(posStats))
        .filter(col("c_acctbal").cast("decimal(30,4)") * col("n_bal") >
          col("sum_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").cast("long").as("cntry"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntry")
    },
    Some("""WITH stats AS (
           |  SELECT SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS sum_bal,
           |         count(*) AS n_bal
           |  FROM customer WHERE c_acctbal > 0)
           |SELECT CAST(c_nationkey AS BIGINT) AS cntry,
           |  CAST(count(*) AS BIGINT) AS numcust,
           |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
           |    AS totacctbal
           |FROM customer, stats
           |WHERE CAST(c_acctbal AS DECIMAL(30,4)) * n_bal > sum_bal
           |  AND NOT EXISTS (
           |    SELECT 1 FROM orders
           |    WHERE o_custkey = c_custkey
           |      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  private val aggQ11Important = Declared(
    "agg_q11_important",
    // TPC-H Q11 shape (important stock identification): the per-key
    // aggregate filtered by a GLOBAL scalar threshold — sum value per
    // part for one nation's suppliers, HAVING > 0.1% of that nation's
    // total. No partsupp in the fixture, so the lineitem flow value
    // (extendedprice) plays supplycost·availqty — the same
    // aggregate + scalar-subquery-threshold plan problem. The
    // threshold compare is EXACT: value·1000 > total in decimal, not
    // an IEEE fraction; the 1-row total broadcasts.
    (s, d) => {
      val natLines = t(s, d)("lineitem")
        .join(t(s, d)("supplier"), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d)("nation")
            .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("l_partkey"),
          col("l_extendedprice").cast("decimal(30,4)").as("v"))
      val perPart = natLines.groupBy("l_partkey")
        .agg(sum(col("v")).as("value_d"))
      val total = natLines.agg(sum(col("v")).as("total_d"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value_d") * 1000 > col("total_d"))
        .select(col("l_partkey"), col("value_d").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("""WITH nl AS (
           |  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(30,4)) AS v
           |  FROM lineitem
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey
           |    AND n_name = 'NATION_3')
           |SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS value
           |FROM nl GROUP BY l_partkey
           |HAVING SUM(v) * 1000 > (SELECT SUM(v) FROM nl)
           |ORDER BY value DESC, l_partkey""".stripMargin))

  private val aggQ16SupplierCnt = Declared(
    "agg_q16_suppcnt",
    // TPC-H Q16 shape (parts/supplier relationship): COUNT DISTINCT
    // suppliers per part attribute group, minus a NOT-IN supplier
    // blacklist. The fixture's part-supplier relation is the distinct
    // (l_partkey, l_suppkey) pairs of lineitem (no partsupp table);
    // negative-balance suppliers play the complaints blacklist. The
    // blacklist is an anti-join BEFORE the distinct aggregate, so the
    // exclusion never rescans the fact. No explicit DISTINCT on the
    // pair stream: count(DISTINCT l_suppkey) dedupes inside the one
    // grouped aggregate (map-side partial on (group, suppkey)), so a
    // separate distinct would shuffle the fact table a second time
    // for nothing.
    (s, d) => {
      val blacklist = t(s, d)("supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      t(s, d)("lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(blacklist),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, d)("part")
            .filter(col("p_brand") =!= "Brand#5")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some("""SELECT p_brand, p_type, p_size,
           |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
           |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
           |JOIN part ON l_partkey = p_partkey AND p_brand <> 'Brand#5'
           |WHERE l_suppkey NOT IN (
           |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
           |GROUP BY p_brand, p_type, p_size
           |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""
      .stripMargin))

  private val jQ20Excess = Declared(
    "j_q20_excess",
    // TPC-H Q20 shape (potential part promotion): the nested-IN chain —
    // suppliers (in one nation) selected because SOME LIKE-named part
    // they ship had more than half its recent-year movement through
    // them. No partsupp availqty in the fixture, so "excess" compares
    // the supplier's 1997 shipped quantity of the part against half of
    // the part's TOTAL 1997 movement — the same decorrelated
    // per-(part, supplier) vs per-part aggregate pair joined on the
    // part key, feeding a semi join into the supplier dim. Quantity
    // compares are exact decimal cross-multiplies (2·supp > total).
    (s, d) => {
      val red = broadcast(t(s, d)("part")
        .filter(col("p_name").like("%red%")).select("p_partkey"))
      val li97 = t(s, d)("lineitem")
        .filter(
          col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        .join(red, col("l_partkey") === col("p_partkey"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("l_quantity").cast("decimal(30,4)").as("q"))
      val perPair = li97.groupBy("l_partkey", "l_suppkey")
        .agg(sum(col("q")).as("sq"))
      val perPart = li97.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("q")).as("tq"))
      val excess = perPair.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("sq") * 2 > col("tq"))
        .select(col("l_suppkey")).distinct()
      t(s, d)("supplier")
        .join(broadcast(t(s, d)("nation")
            .filter(col("n_name") === "NATION_8")),
          col("s_nationkey") === col("n_nationkey"))
        .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some("""WITH li97 AS (
           |  SELECT l_partkey, l_suppkey,
           |    CAST(l_quantity AS DECIMAL(30,4)) AS q
           |  FROM lineitem
           |  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'),
           |pair AS (
           |  SELECT l_partkey, l_suppkey, SUM(q) AS sq
           |  FROM li97 GROUP BY 1, 2),
           |pp AS (SELECT l_partkey AS pk, SUM(q) AS tq
           |       FROM li97 GROUP BY 1)
           |SELECT s_suppkey, s_name
           |FROM supplier
           |JOIN nation ON s_nationkey = n_nationkey
           |  AND n_name = 'NATION_8'
           |WHERE s_suppkey IN (
           |  SELECT l_suppkey FROM pair JOIN pp ON l_partkey = pk
           |  WHERE sq * 2 > tq)
           |ORDER BY s_suppkey""".stripMargin))

  val all: Seq[Declared] = Seq(
    q6Forecast, jQ7Nations, jQ8Share, jQ9Profit, jQ13Custdist,
    jQ15TopSupplier, jQ17SmallQty, jQ19Disjunct, jQ21Waiting, jQ22Prospects,
    aggQ11Important, aggQ16SupplierCnt, jQ20Excess,
    aggGroupingSets, aggHistogram, jQ18TopOrders, jQ5Volume, aggQ12Shipmode,
    wNtile, jQ4Priority, jQ10Returns, wValueFuncs, aggListagg, aggCorr,
    jQ14Promo,
    s1ScanProjectSort, o2Topk,
    f1EqFilter, f3ParityCount, f4CaseDispatch,
    a1Count, a3CountFiltered, a4CoalesceMax, a6LwwWindow, a6LwwMaxBy,
    q1AggPricing, aggDistinct, aggApproxDistinct, aggHeavyHitters, aggHeavyHittersStream, aggRollup, aggCube,
    aggStats,
    jInnerBroadcast, j2SemiExists, j3AntiJoin, jLeftOuterCount, jFullOuter,
    jThetaPairs, jQ3Shipping, jAsofEvents, jRangePairs,
    wRankTopn, wLagPrev, wRunningSum, wRangeHour,
    setUnion, setIntersect, setExcept,
    xScalarFuncs, xStringFuncs, aggSaltedSkew, aggPivot, aggQuantiles,
    aggApproxQuantiles, xLateralExplode, xDateFuncs, xEpochDiff,
    xJsonExtract, xVariantJson, xArrayOps,
    subScalarAvg, subInSegment,
    eventsWindowHour)
}
