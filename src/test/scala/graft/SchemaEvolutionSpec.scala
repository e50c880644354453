package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.cdc._

/** Single-table schema evolution driven END TO END (r7 verdict #5): a
  * mid-stream widening — the source database runs `ALTER TABLE account
  * ADD tier`, the envelope starts carrying the new column, the declared
  * spec is widened at the next stream (re)start — through the rename
  * and JDBC commit paths to convergence.
  *
  * Why this lives on the generic (TableSpec) machinery: the typed
  * `person` modules specialize the schema at COMPILE time (the
  * documented r7 trade) — runtime widening needs the runtime-declared
  * row representation, which the engine's generic path provides, and
  * that path runs the SAME bucket/delta/swap machinery (`Replicate`'s,
  * reused verbatim by `MultiTable`) and the same three-phase JDBC batch
  * engine (`JdbcReplica.applyOps`) as the typed modules. The layout
  * carries a declared-schema VERSION LOG (`_schema/v<N>.json`), so the
  * DDL history is auditable and a stale reader sees the widened table.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  System.setProperty("derby.stream.error.file", "/tmp/graft-derby.log")

  private val v1 = MtTestSpecs.account
  private val v2 = v1.copy(rowSchema = StructType(
    v1.rowSchema.fields :+ StructField("tier", StringType)))

  private def tierOf(op: ChangeGen.Op): String =
    if (op.score % 3 == 0) "gold" else "std"

  /** Image-overwrite replay with a per-op tier: the winning image is
    * the key's LAST I/U event (after its last delete), so the expected
    * tier is whatever that event's envelope carried — None for
    * pre-evolution events. Mirrors the engine's whole-image fold. */
  private def expectedTier(ops: Seq[ChangeGen.Op],
      tierAt: ChangeGen.Op => Option[String]): Map[Int, Option[String]] = {
    val live = scala.collection.mutable.Map[Int, Option[String]]()
    ops.sortBy(_.lsn).foreach { op =>
      op.action match {
        case "I" => live(op.id) = tierAt(op)
        case "U" => if (live.contains(op.id)) live(op.id) = tierAt(op)
        case _ => live.remove(op.id)
      }
    }
    live.toMap
  }

  private def phases(seed: Long, n: Int)
      : (Seq[ChangeGen.Op], Seq[ChangeGen.Op], ChangeGen.Op => Option[String]) = {
    val ops = ChangeGen.ops(seed, n)
    val (h1, h2) = ops.splitAt(n / 2)
    val evolveLsn = h2.head.lsn
    (h1, h2, op => if (op.lsn >= evolveLsn) Some(tierOf(op)) else None)
  }

  test("rename path: mid-stream widening through a checkpointed restart converges; layout versions the DDL") {
    val (h1, h2, tierAt) = phases(seed = 211L, n = 600)
    val changeDir = Files.createTempDirectory("evolve-log").toString
    val root = Files.createTempDirectory("evolve-replica").toString
    val ckpt = Files.createTempDirectory("evolve-ckpt").toString

    // phase 1: the original envelope shape under the v1 spec
    ChangeGen.writeLineBatches(changeDir,
      h1.map(o => ChangeGen.toAccountJsonLine(o)), batches = 3)
    val q1 = MultiTable.start(spark, changeDir, root, ckpt, Seq(v1),
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))
    try q1.awaitTermination() finally q1.stop()
    assert(MultiTable.schemaVersions(spark, root, "account").map(_._1)
      === Seq(1))

    // phase 2: the source ran its ALTER — envelopes now carry tier —
    // and the stream restarts on the SAME checkpoint with the widened
    // spec; the restart records schema v2
    ChangeGen.writeLineBatches(changeDir,
      h2.map(o => ChangeGen.toAccountJsonLine(o, Some(tierOf(o)))),
      batches = 3, startIndex = 3)
    val q2 = MultiTable.start(spark, changeDir, root, ckpt, Seq(v2),
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))
    try q2.awaitTermination() finally q2.stop()
    assert(MultiTable.schemaVersions(spark, root, "account").map(_._1)
      === Seq(1, 2))
    // re-recording an unchanged schema burns no version
    assert(MultiTable.recordSchema(spark, root, v2) === 2)
    assert(MultiTable.schemaVersions(spark, root, "account").size === 2)

    // a reader still carrying the v1 spec sees the widened table via
    // the layout's declared schema
    val got = MultiTable.readTableVersioned(spark, root, v1)
    assert(got.schema.fieldNames.toSeq ===
      Seq("id", "owner", "balance", "created_at", "tier"))

    // convergence: pre-evolution columns equal the full replay...
    val all = h1 ++ h2
    val want = ChangeGen.replay(all).map { case (id, p) =>
      id -> ((p.name, p.score)) }
    val gotMap = got.collect()
      .map(r => r.getInt(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(gotMap === want)
    // ...and tier is exactly the winning image's: null for keys whose
    // last image predates the evolution, valued after
    val gotTier = got.collect()
      .map(r => r.getInt(0) -> Option(r.getString(4))).toMap
    assert(gotTier === expectedTier(all, tierAt))
    assert(gotTier.values.exists(_.isEmpty),
      "fixture must include pre-evolution survivors (else the null case is untested)")
    assert(gotTier.values.exists(_.isDefined),
      "fixture must include post-evolution rows")
  }

  test("jdbc path: widening issues ALTER TABLE ADD; pre-evolution rows read SQL NULL; converges") {
    val (h1, h2, tierAt) = phases(seed = 223L, n = 500)
    val url = s"jdbc:derby:${Files.createTempDirectory("evolve-jdbc")}/db;create=true"
    val changeDir = Files.createTempDirectory("evolve-jdbc-log").toString
    val ckpt = Files.createTempDirectory("evolve-jdbc-ckpt").toString

    ChangeGen.writeLineBatches(changeDir,
      h1.map(o => ChangeGen.toAccountJsonLine(o)), batches = 3)
    val q1 = JdbcMultiTable.start(spark, changeDir, url, ckpt, Seq(v1),
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))
    try q1.awaitTermination() finally q1.stop()

    // before the evolution the live table has no tier column
    def selectTier(): Unit = {
      val c = JdbcReplica.connect(url)
      try {
        val st = c.createStatement()
        try st.executeQuery("SELECT tier FROM account").close()
        finally st.close()
      } finally c.close()
    }
    intercept[java.sql.SQLException](selectTier())

    // restart with the widened spec: ensureTable diffs declared vs live
    // columns and issues ALTER TABLE ADD COLUMN before the stream runs
    ChangeGen.writeLineBatches(changeDir,
      h2.map(o => ChangeGen.toAccountJsonLine(o, Some(tierOf(o)))),
      batches = 3, startIndex = 3)
    val q2 = JdbcMultiTable.start(spark, changeDir, url, ckpt, Seq(v2),
      trigger = Trigger.AvailableNow(), maxFilesPerTrigger = Some(1))
    try q2.awaitTermination() finally q2.stop()
    selectTier() // the column exists now

    val c = JdbcReplica.connect(url)
    val gotRows = try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          "SELECT id, owner, balance, tier FROM account")
        val out = scala.collection.mutable.Map
          [Int, (String, Int, Option[String])]()
        while (rs.next()) out(rs.getInt(1)) =
          ((rs.getString(2), rs.getInt(3), Option(rs.getString(4))))
        rs.close(); out.toMap
      } finally st.close()
    } finally c.close()

    val all = h1 ++ h2
    val want = ChangeGen.replay(all).map { case (id, p) =>
      id -> ((p.name, p.score)) }
    assert(gotRows.view.mapValues(v => (v._1, v._2)).toMap === want)
    val wantTier = expectedTier(all, tierAt)
    assert(gotRows.view.mapValues(_._3).toMap === wantTier)
    assert(wantTier.values.exists(_.isEmpty) &&
      wantTier.values.exists(_.isDefined),
      "fixture must exercise both the NULL and the valued tier cases")
  }

  test("rename path: type changes and column drops are rejected loudly at version-record time") {
    // the contract beyond ADD COLUMN (r10 verdict #5): int→long and
    // drops never silently mis-apply — recordSchema throws BEFORE the
    // new spec writes anything, naming the offending column
    val root = Files.createTempDirectory("evolve-reject").toString
    assert(MultiTable.recordSchema(spark, root, v1) === 1)
    val retyped = v1.copy(rowSchema = StructType(v1.rowSchema.fields.map {
      case f if f.name == "balance" => f.copy(dataType = LongType)
      case f => f
    }))
    val e1 = intercept[IllegalArgumentException](
      MultiTable.recordSchema(spark, root, retyped))
    assert(e1.getMessage.contains("balance") &&
      e1.getMessage.contains("type"))
    val droppedSpec = v1.copy(rowSchema = StructType(
      v1.rowSchema.fields.filterNot(_.name == "balance")))
    val e2 = intercept[IllegalArgumentException](
      MultiTable.recordSchema(spark, root, droppedSpec))
    assert(e2.getMessage.contains("balance") &&
      e2.getMessage.contains("drop"))
    // the version log is untouched by rejected transitions; a legal
    // widening still appends
    assert(MultiTable.schemaVersions(spark, root, v1.table).map(_._1)
      === Seq(1))
    assert(MultiTable.recordSchema(spark, root, v2) === 2)
  }

  test("jdbc path: type changes and column drops are rejected loudly by ensureTable") {
    val url =
      s"jdbc:derby:${Files.createTempDirectory("evolve-jdbc-rej")}/db;create=true"
    JdbcMultiTable.ensureTable(url, v1)
    val retyped = v1.copy(rowSchema = StructType(v1.rowSchema.fields.map {
      case f if f.name == "balance" => f.copy(dataType = LongType)
      case f => f
    }))
    val e1 = intercept[IllegalArgumentException](
      JdbcMultiTable.ensureTable(url, retyped))
    assert(e1.getMessage.contains("balance") &&
      e1.getMessage.contains("type"))
    val droppedSpec = v1.copy(rowSchema = StructType(
      v1.rowSchema.fields.filterNot(_.name == "balance")))
    val e2 = intercept[IllegalArgumentException](
      JdbcMultiTable.ensureTable(url, droppedSpec))
    assert(e2.getMessage.contains("balance") &&
      e2.getMessage.contains("drop"))
    // the physical table is untouched by rejected transitions; a legal
    // widening still issues ALTER TABLE ADD
    val c = JdbcReplica.connect(url)
    try {
      def liveCols(): Set[String] = {
        val rs = c.getMetaData.getColumns(null, null,
          v1.table.toUpperCase, null)
        try {
          val b = Set.newBuilder[String]
          while (rs.next()) b += rs.getString("COLUMN_NAME").toLowerCase
          b.result()
        } finally rs.close()
      }
      assert(liveCols() ===
        v1.rowSchema.fieldNames.map(_.toLowerCase).toSet)
      JdbcMultiTable.ensureTable(url, v2)
      assert(liveCols() ===
        v2.rowSchema.fieldNames.map(_.toLowerCase).toSet)
    } finally c.close()
  }
}
