package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamHygiene

/** The r16 optimization round's session-hygiene seams: the ref-counted
  * maintain-conf span (the shared pass overlaps maintains on one
  * session, so spans NEST in time — only the last exit may restore)
  * and the explicit release of epoch-local checkpoint blocks (without
  * it, dead blocks wait on a driver GC the quiet heap may never run).
  */
class StreamHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withMaintainConf spans nest (ref-counted): inner exit restores " +
      "nothing, last exit restores the ORIGINAL conf") {
    val w0 = spark.conf.get("spark.sql.shuffle.partitions")
    val a0 = spark.conf.get("spark.sql.adaptive.enabled", "true")
    StreamHygiene.withMaintainConf(spark, 8) {
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
      StreamHygiene.withMaintainConf(spark, 8) {
        assert(spark.conf.get("spark.sql.shuffle.partitions") === "8")
      }
      // the naive capture/restore bug this pins against: an inner span
      // capturing the outer's 8 as "previous" and restoring it early
      // (or, worse, the outer restoring 8 at the very end)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "8",
        "inner exit must not restore while the outer span is live")
      assert(spark.conf.get("spark.sql.adaptive.enabled") === "false")
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === w0)
    assert(spark.conf.get("spark.sql.adaptive.enabled") === a0)
  }

  test("withMaintainConf restores on a body failure, and nested spans " +
      "with DIFFERENT widths are refused") {
    val w0 = spark.conf.get("spark.sql.shuffle.partitions")
    intercept[RuntimeException] {
      StreamHygiene.withMaintainConf(spark, 8) { throw new RuntimeException("boom") }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === w0,
      "a failing span must still restore")
    intercept[IllegalArgumentException] {
      StreamHygiene.withMaintainConf(spark, 8) {
        StreamHygiene.withMaintainConf(spark, 4) { () }
      }
    }
    assert(spark.conf.get("spark.sql.shuffle.partitions") === w0,
      "the refused inner span must not corrupt the outer restore")
  }

  test("releaseBlocks unpersists a checkpointed frame's blocks; " +
      "non-checkpointed frames are a safe no-op") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val ck = Seq(1L, 2L, 3L).toDF("v").localCheckpoint(true)
    val mine = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty, "localCheckpoint(true) must persist blocks")
    StreamHygiene.releaseBlocks(ck)
    assert((spark.sparkContext.getPersistentRDDs.keySet & mine).isEmpty,
      "release must drop the checkpointed RDD from the persistent set")
    // plain (non-checkpointed) frame: nothing to release, no error
    StreamHygiene.releaseBlocks(Seq(1L).toDF("v"))
  }
}
