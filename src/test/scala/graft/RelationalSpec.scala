package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.sql.Relational

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
}

class RelationalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query runs and is non-empty at sf0.001") {
    val empties = Relational.all.filter(_.run(spark, sf).isEmpty).map(_.name)
    assert(empties.isEmpty, s"empty results: $empties")
  }

  test("query names are unique and oracle aliases align") {
    val names = Relational.all.map(_.name)
    assert(names.distinct.size === names.size)
    // every oracle-gated query's output columns appear verbatim in its SQL
    Relational.all.foreach { q =>
      q.oracle.foreach { sql =>
        val cols = q.run(spark, sf).columns
        cols.foreach(c => assert(sql.contains(c), s"${q.name}: '$c' not in oracle SQL"))
      }
    }
  }

  test("a1_count matches fixture row count") {
    val n = Relational.all.find(_.name == "a1_count").get
      .run(spark, sf).collect()(0).getLong(0)
    assert(n === 6000L)
  }

  test("a6 last-writer-wins: window and max_by agree") {
    val w = Relational.all.find(_.name == "a6_lww_window").get.run(spark, sf)
      .select("user_id", "last_event_id", "last_event_type")
    val m = Relational.all.find(_.name == "a6_lww_maxby").get.run(spark, sf)
      .select("user_id", "last_event_id", "last_event_type")
    assert(w.exceptAll(m).isEmpty && m.exceptAll(w).isEmpty)
  }

  test("set algebra invariant: |A∪B| = |A∩B| + |A\\B| + |B\\A| over nation keys") {
    def q(n: String) = Relational.all.find(_.name == n).get.run(spark, sf).count()
    // union/intersect are over customer-vs-supplier nations
    val union = q("set_union"); val inter = q("set_intersect")
    assert(union >= inter)
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
