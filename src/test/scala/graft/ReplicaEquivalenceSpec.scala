package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Three-way model equivalence (r5 VERDICT ask #7): the SAME generated
  * change schedules drive all three replica implementations — the
  * rename-commit parquet replica ([[Replicate]]), the manifest-commit
  * object-store replica ([[ManifestReplica]]), and the state-store path
  * ([[StatefulReplica]], flatMapGroupsWithState) — and every one must
  * end in the naive sequential replay's state.
  *
  * 100+ seeds at test-suite cost: each seed owns a DISJOINT key range,
  * so all seeds' batch-b slices union into ONE shared micro-batch per
  * path — per-key semantics can't couple across seeds (every fold,
  * window, and state partition is keyed), so this is 100 independent
  * random schedules riding the same constant number of Spark jobs. */
class ReplicaEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("property: rename, manifest, and state-store replicas all equal naive replay over 100 seeds") {
    val Seeds = 100
    val Batches = 4
    // per seed: a distinct op count, a distinct random split into 4
    // (possibly empty) contiguous micro-batches, keys offset into the
    // seed's own range
    val perSeed: Seq[(Int, IndexedSeq[Seq[PersonChange]], Map[Int, PersonRow])] =
      (1 to Seeds).map { seed =>
        val rnd = new scala.util.Random(seed * 7L)
        val ops = ChangeGen.ops(seed, n = 40 + seed % 25)
          .map(o => o.copy(id = o.id + seed * 10000))
        val cuts = IndexedSeq.fill(Batches - 1)(rnd.nextInt(ops.size + 1))
          .sorted
        val bounds = (0 +: cuts :+ ops.size).sliding(2).toIndexedSeq
        val batches = bounds.map { case Seq(a, b) =>
          ChangeGen.toChanges(ops.slice(a, b))
        }
        (seed, batches, ChangeGen.replay(ops))
      }
    val want: Map[Int, (String, String, Int)] =
      perSeed.flatMap(_._3).map { case (id, p) =>
        id -> ((p.name, p.uid, p.score))
      }.toMap

    val sharedBatches: IndexedSeq[Seq[PersonChange]] =
      (0 until Batches).map(b => perSeed.flatMap(_._2(b)))

    // rename-commit path (mid-stream compactions at compactEvery=2)
    val rDir = Files.createTempDirectory("eq-rename").toString
    sharedBatches.zipWithIndex.foreach { case (batch, b) =>
      Replicate.applyBatch(spark, batch.toDS(), rDir, numBuckets = 8,
        batchId = b.toLong, compactEvery = 2)
    }
    val gotRename = Replicate.readReplica(spark, rDir).collect()
      .map(r => r.id -> ((r.name, r.uid, r.score))).toMap

    // manifest-commit path
    val mDir = Files.createTempDirectory("eq-man").toString
    sharedBatches.zipWithIndex.foreach { case (batch, b) =>
      ManifestReplica.applyBatch(spark, batch.toDS(), mDir, numBuckets = 8,
        batchId = b.toLong, compactEvery = 2)
    }
    val gotManifest = ManifestReplica.readReplica(spark, mDir).collect()
      .map(r => r.id -> ((r.name, r.uid, r.score))).toMap

    // state-store path: one stream, real micro-batch boundaries (each
    // addData + processAllAvailable is one epoch through the state
    // store); final state = last update per key
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[PersonChange](spark)
    val state = new java.util.concurrent.ConcurrentHashMap[Int,
      Option[PersonRow]]()
    val q = StatefulReplica.liveUpdates(in.toDS())
      .writeStream
      .outputMode("update")
      .option("checkpointLocation",
        Files.createTempDirectory("eq-state-ckpt").toString)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[ReplicaUpdate], _: Long) =>
          batch.collect().foreach(u => state.put(u.id, u.row))
      }
      .start()
    try {
      sharedBatches.foreach { batch =>
        if (batch.nonEmpty) in.addData(batch)
        q.processAllAvailable()
      }
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val gotState = state.asScala.toMap.collect {
      case (id, Some(p)) => id -> ((p.name, p.uid, p.score))
    }

    assert(gotRename === want, "rename-commit replica diverged from replay")
    assert(gotManifest === want, "manifest replica diverged from replay")
    assert(gotState === want, "state-store replica diverged from replay")
  }
}
