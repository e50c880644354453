package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc.MtDelta
import graft.core.Tables
import graft.ml.{MlFunctions, ShardExport, TextAnalysis, TextIndex}

/** The CDC-maintained dataset export ([[graft.ml.ShardExport]]): the
  * oracle row proves maintained manifest == full re-export end to end
  * through the real stream; these tests pin shard-touch accounting,
  * replay idempotence, the additive manifest-delta identity (the
  * mergeable-manifest theorem), and emptied-shard cleanup. Stream-level
  * checkpoint restart is the applyEpoch replay contract, pinned below
  * (the offset machinery itself is pinned by TextIndexSpec/CdcSpec on
  * the identical stream). */
class ShardExportSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables(spark, sf, "documents")
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkDelta(key: Long, sign: Int, text: String): MtDelta =
    MtDelta("document", key.toString, sign,
      s"""{"doc_id":"$key","text":"$text"}""", None)

  private def fingerprint(path: String): Map[String, Map[String, (Long, Long)]] = {
    val root = new java.io.File(path)
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map { d =>
        d.getName -> d.listFiles().filterNot(_.getName.startsWith("."))
          .map(f => f.getName -> ((f.length(), f.lastModified()))).toMap
      }.toMap
  }

  private def shardsContent(path: String): Set[(Long, String)] =
    spark.read.parquet(path).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  private def manifestRows(path: String): Map[Long, (Long, Long, Long, Long, Long)] =
    ShardExport.readManifest(spark, path).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap

  private def shardOfId(id: Long): Int =
    Seq(id).toDF("doc_id")
      .select(ShardExport.shardOf(col("doc_id")).cast("int"))
      .collect()(0).getInt(0)

  test("maintained export == full re-export after N epochs (naive delta replay)") {
    val snap = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ops = TextIndex.epochScript(snap, epochs = 3)
    val root = tmp("exp-maint")
    val (sh, mf) = (s"$root/shards", s"$root/manifest")
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
      ShardExport.applyEpoch(spark, deltas.toDS(), sh, mf)
    }
    val root2 = tmp("exp-rebuild")
    val (sh2, mf2) = (s"$root2/shards", s"$root2/manifest")
    ShardExport.buildExport(state.toSeq.toDF("doc_id", "text"), sh2, mf2)
    assert(shardsContent(sh) === shardsContent(sh2),
      "incremental shard maintenance must equal the full re-export")
    assert(manifestRows(mf) === manifestRows(mf2),
      "maintained manifest must equal the re-exported manifest")
    assert(ops.exists(_.action == "U") && ops.exists(_.action == "D"))
  }

  test("an epoch touching s shards rewrites exactly s partitions (files and manifest)") {
    val root = tmp("exp-touch")
    val (sh, mf) = (s"$root/shards", s"$root/manifest")
    ShardExport.buildExport(docs.select("doc_id", "text"), sh, mf)
    val beforeS = fingerprint(sh)
    val beforeM = fingerprint(mf)
    assert(beforeS.size === TextAnalysis.NumShards.toInt,
      "fixture must populate every shard")
    val ids = Seq(3L, 990001L)
    val expShards = ids.map(shardOfId).toSet
    assume(expShards.size == 2, "the two ids must land in distinct shards")
    val oldText = docs.filter(col("doc_id") === 3)
      .select("text").collect()(0).getString(0)
    val deltas = Seq(
      mkDelta(3L, -1, oldText), mkDelta(3L, +1, "spark merge window"),
      mkDelta(990001L, +1, "join frame range"))
    val affected = ShardExport.applyEpoch(spark, deltas.toDS(), sh, mf)
    assert(affected.toSet === expShards,
      "affected shards must be exactly the changed docs' shards")
    val afterS = fingerprint(sh)
    val afterM = fingerprint(mf)
    (beforeS.keySet -- expShards.map(s => s"shard=$s")).foreach { s =>
      assert(afterS(s) === beforeS(s), s"shard $s files must be untouched")
      assert(afterM(s) === beforeM(s), s"shard $s manifest must be untouched")
    }
    expShards.foreach { s =>
      assert(afterS(s"shard=$s") !== beforeS(s"shard=$s"),
        s"touched shard=$s must be rewritten")
      assert(afterM(s"shard=$s") !== beforeM(s"shard=$s"),
        s"touched shard=$s manifest row must be re-derived")
    }
  }

  test("replay idempotence + the additive manifest-delta identity") {
    val root = tmp("exp-replay")
    val (sh, mf) = (s"$root/shards", s"$root/manifest")
    ShardExport.buildExport(docs.select("doc_id", "text"), sh, mf)
    val before = manifestRows(mf)
    val oldText = docs.filter(col("doc_id") === 7)
      .select("text").collect()(0).getString(0)
    val newText = "spark merge window frame"
    val insText = "join range interval"
    val deltas = Seq(
      mkDelta(7L, -1, oldText), mkDelta(7L, +1, newText),
      mkDelta(990007L, +1, insText))
    val a1 = ShardExport.applyEpoch(spark, deltas.toDS(), sh, mf)
    val after = manifestRows(mf)
    // additive identity: n_docs/n_chars/checksum advance by the signed
    // delta sums (id_lo/id_hi re-derive — min/max cannot retract)
    def h(t: String): Long =
      Seq(t).toDF("text")
        .select(MlFunctions.hash60(col("text")) % TextAnalysis.ChkMod)
        .collect()(0).getLong(0)
    val sums = deltas
      .map(d => (d.key.toLong, d.sign,
        """"text":"(.*)"\}""".r.findFirstMatchIn(d.img).get.group(1)))
      .groupBy { case (k, _, _) => shardOfId(k) }
      .map { case (s, ds) =>
        s.toLong -> ((ds.map(_._2.toLong).sum,
          ds.map { case (_, sg, t) => sg * t.length.toLong }.sum,
          ds.map { case (_, sg, t) => sg * h(t) }.sum))
      }
    sums.foreach { case (s, (dn, dc, dh)) =>
      val (n0, c0, _, _, k0) = before(s)
      val (n1, c1, _, _, k1) = after(s)
      assert(n1 === n0 + dn, s"shard $s n_docs must advance additively")
      assert(c1 === c0 + dc, s"shard $s n_chars must advance additively")
      assert(k1 === k0 + dh, s"shard $s checksum must advance additively")
    }
    // replay: re-applying the same batch is a no-op
    val c1 = shardsContent(sh)
    val a2 = ShardExport.applyEpoch(spark, deltas.toDS(), sh, mf)
    assert(a1 === a2, "replay must touch the same shards")
    assert(shardsContent(sh) === c1, "replay must not change the shards")
    assert(manifestRows(mf) === after, "replay must not change the manifest")
  }

  test("a batch that empties a shard clears its files and manifest row") {
    val root = tmp("exp-empty")
    val (sh, mf) = (s"$root/shards", s"$root/manifest")
    val t1 = "aa bb cc"
    val t2 = "dd ee ff gg"
    // two keys in distinct shards (8 shards — the second is always
    // found within a handful of probes)
    val id1 = 1L
    val s1 = shardOfId(id1)
    val id2 = (2L to 20L).find(shardOfId(_) != s1).get
    val s2 = shardOfId(id2)
    ShardExport.applyEpoch(spark,
      Seq(mkDelta(id1, +1, t1), mkDelta(id2, +1, t2)).toDS(), sh, mf)
    ShardExport.applyEpoch(spark, Seq(mkDelta(id1, -1, t1)).toDS(), sh, mf)
    assert(!new java.io.File(s"$sh/shard=$s1").exists(),
      "emptied shard files must be cleared")
    assert(!new java.io.File(s"$mf/shard=$s1").exists(),
      "emptied shard manifest row must be cleared")
    assert(manifestRows(mf).keySet === Set(s2.toLong))
  }
}
