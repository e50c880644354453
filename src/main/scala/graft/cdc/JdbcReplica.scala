package graft.cdc

import java.sql.{Connection, DriverManager, Timestamp}

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** JDBC source/sink for the CDC pipeline — S1's PRODUCTION form
  * (replicator/main.go:98-101 reads `SELECT id, name, uid, score,
  * created_at FROM person` over pgx; main.go:195-269 applies I/U/D with
  * prepared statements), exercised against a REAL SQL database: the
  * Spark distribution ships embedded Derby, so the whole path runs
  * in-sandbox (SURVEY §2.1's `spark.read.jdbc`, previously documented
  * but never executed). A production deployment swaps the URL/driver
  * for Postgres; every statement below is ANSI (update-then-insert
  * upsert, no vendor MERGE).
  *
  * ## Scale design
  *
  *  - **Snapshot reads are partitioned**: `spark.read.jdbc` with
  *    (partitionColumn, bounds, numPartitions) issues N range-predicate
  *    queries in parallel — the standard parallel-extract shape. One
  *    executor-side connection per partition.
  *  - **The sink ships SUMMARIES, not events**: each micro-batch first
  *    reduces to ONE row per key ([[Replicate.summarize]] — the same
  *    commutative algebra the parquet replicas fold), so the JDBC
  *    round-trips are O(distinct keys), not O(events), and each key
  *    needs at most a DELETE plus one upsert regardless of how many
  *    events hit it. The summary maps exactly onto statement shapes:
  *    a batch-final delete → DELETE (+ INSERT if re-inserted after);
  *    inserts with no delete → upsert that PRESERVES the stored
  *    created_at (the ON CONFLICT semantics); updates only → UPDATE,
  *    a miss is a no-op (reference U semantics).
  *  - **Exactly-once**: each partition applies inside ONE transaction
  *    that also records (epoch, partition) in `graft_epochs`; a crash
  *    replay sees the marker and skips — the transactional-sink pattern
  *    (idempotent writes keyed by epoch). Statements are JDBC-batched.
  *  - Embedded Derby is same-JVM by nature — fine under local[n] (and
  *    for tests); a cluster deployment points the same code at a
  *    networked database.
  *
  * **Ordering contract**: like the reference's slot consumer (and
  * unlike the summary-fold replicas, whose commutative algebra absorbs
  * cross-batch disorder), this sink applies destructively and therefore
  * requires micro-batches to arrive in lsn order — the guarantee a
  * replication slot or a single Kafka topic-partition provides. The
  * file-source harness models it by stamping batch files with strictly
  * increasing mtimes ([[ChangeGen.writeBatches]]); Spark's file source
  * breaks equal-mtime ties nondeterministically, which this path (by
  * design) does not tolerate.
  */
object JdbcReplica {
  /** Epoch-marker table DDL (created on demand). */
  private val EpochTable = "graft_epochs"

  /** Bounded-backoff connect across an ordered endpoint list — the
    * reference's connection-retry-with-fallback-address behavior
    * (pubsub/main.go:109-119 retries the failed subscription connect
    * with the docker hostname) generalized: each ROUND tries every
    * endpoint in order (the alternate address is the immediate
    * fallback, as in the reference), rounds are separated by a doubling
    * backoff capped at 2 s, and only connect-level failures
    * (`SQLException`) are retried — a missing driver class or an
    * interrupt propagates. The `open` seam exists for specs (a
    * first-attempt-fails fake); production uses the default
    * `DriverManager`. Throws the LAST failure (earlier ones as its
    * cause chain context) after `rounds` full passes. */
  def connectWithRetry(urls: Seq[String], rounds: Int = 3,
      backoffMs: Long = 50,
      open: String => Connection = DriverManager.getConnection)
      : Connection = {
    require(urls.nonEmpty, "connectWithRetry: empty endpoint list")
    var last: Throwable = null
    var delay = backoffMs
    for (round <- 0 until rounds) {
      if (round > 0) { Thread.sleep(delay); delay = math.min(delay * 2, 2000L) }
      for (u <- urls) {
        try return open(u)
        catch { case e: java.sql.SQLException => last = e }
      }
    }
    throw new java.sql.SQLException(
      s"connect failed after $rounds rounds over ${urls.size} endpoint(s): " +
        urls.mkString(", "), last)
  }

  /** Every source/sink connect (driver-side DDL/bounds probes AND the
    * per-partition executor connects) routes through the retry: a
    * transient refusal — a database restarting mid-stream, the exact
    * failure the reference's fallback exists for — costs a bounded
    * backoff instead of failing the batch. Single-endpoint form; pass
    * alternates via [[connectWithRetry]]. */
  def connect(url: String): Connection = connectWithRetry(Seq(url))

  /** (folded name, pattern-escaper, current schema) for metadata
    * probes. Unquoted identifiers fold per engine — Derby stores them
    * upper-case, Postgres lower-case — so probe with the connection's
    * OWN folding rule (a hard-coded toUpperCase finds nothing on
    * Postgres, r6 review). Metadata calls take SEARCH PATTERNS: an
    * unescaped '_' matches any character and a null schema searches
    * every schema, so names are escaped and scoped to the connection's
    * current schema when the driver reports one (r6 review). */
  private def metaProbe(c: Connection, name: String)
      : (String, String => String, String) = {
    val md = c.getMetaData
    val folded =
      if (md.storesUpperCaseIdentifiers) name.toUpperCase
      else if (md.storesLowerCaseIdentifiers) name.toLowerCase
      else name
    val esc = Option(md.getSearchStringEscape).getOrElse("")
    def escape(n: String): String =
      if (esc.isEmpty) n
      else n.replace(esc, esc + esc).replace("_", esc + "_")
        .replace("%", esc + "%")
    val schema =
      try c.getSchema catch { case _: Throwable => null }
    (folded, escape, schema)
  }

  private def hasTable(c: Connection, name: String): Boolean = {
    val (folded, escape, schema) = metaProbe(c, name)
    def probe(n: String): Boolean = {
      val rs = c.getMetaData.getTables(null, schema, escape(n), null)
      try rs.next() finally rs.close()
    }
    probe(folded) || (folded != name && probe(name))
  }

  /** The live table's column names, lower-cased — the
    * declared-vs-actual diff that drives schema widening
    * ([[JdbcMultiTable.ensureTable]]'s ALTER TABLE ADD). */
  private[cdc] def tableColumns(c: Connection, name: String)
      : Set[String] = tableColumnTypes(c, name).keySet

  /** The live table's columns with their JDBC type codes
    * (`java.sql.Types`) — the physical side of the schema-evolution
    * contract check ([[JdbcMultiTable.ensureTable]]). */
  private[cdc] def tableColumnTypes(c: Connection, name: String)
      : Map[String, Int] = {
    val (folded, escape, schema) = metaProbe(c, name)
    def probe(n: String): Map[String, Int] = {
      val rs = c.getMetaData.getColumns(null, schema, escape(n), null)
      try {
        val b = Map.newBuilder[String, Int]
        while (rs.next())
          b += rs.getString("COLUMN_NAME").toLowerCase ->
            rs.getInt("DATA_TYPE")
        b.result()
      } finally rs.close()
    }
    val s = probe(folded)
    if (s.nonEmpty || folded == name) s else probe(name)
  }

  private[cdc] def tableExists(c: Connection, name: String): Boolean =
    hasTable(c, name)

  /** Create the shared epoch-marker table if absent. */
  private[cdc] def ensureEpochTable(url: String): Unit = {
    val c = connect(url)
    try {
      if (!hasTable(c, EpochTable)) {
        val st = c.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $EpochTable (
             |  target VARCHAR(128), epoch BIGINT, part INT,
             |  PRIMARY KEY (target, epoch, part))""".stripMargin)
        finally st.close()
      }
    } finally c.close()
  }

  /** Create the person target + epoch-marker tables if absent. The id
    * is `GENERATED BY DEFAULT AS IDENTITY` — the Derby spelling of the
    * reference target's SERIAL id (its `person_id_seq`): replicated
    * rows carry explicit ids straight through, while rows inserted
    * directly AT the target draw from the identity generator (the
    * failover-write scenario the sequence restart below exists for). */
  def ensureTables(url: String, table: String): Unit = {
    val c = connect(url)
    try {
      if (!hasTable(c, table)) {
        val st = c.createStatement()
        try st.executeUpdate(
          s"""CREATE TABLE $table (
             |  id INT GENERATED BY DEFAULT AS IDENTITY PRIMARY KEY,
             |  name VARCHAR(200), uid VARCHAR(36),
             |  score INT, created_at TIMESTAMP)""".stripMargin)
        finally st.close()
      }
    } finally c.close()
    ensureEpochTable(url)
  }

  /** Re-seat the target's id generator above the replicated key space —
    * the reference's post-snapshot `ALTER SEQUENCE person_id_seq
    * RESTART WITH max+1` (replicator/main.go:143-150) in its Derby
    * form (`ALTER TABLE … ALTER COLUMN id RESTART WITH n`; identity
    * state lives on the column, not a named sequence). Without it, the
    * first direct insert at the target draws id 1 and collides with a
    * replicated row. Best-effort like the reference (a warning, never
    * fatal: replication itself never draws from the generator).
    * Returns the restart value, 0 if nothing was done. */
  def restartIdentity(url: String, table: String): Long = {
    val c = connect(url)
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT COALESCE(MAX(id), 0) FROM $table")
        val maxId = try { rs.next(); rs.getLong(1) } finally rs.close()
        if (maxId > 0) {
          st.executeUpdate(
            s"ALTER TABLE $table ALTER COLUMN id RESTART WITH ${maxId + 1}")
          maxId + 1
        } else 0L
      } finally st.close()
    } catch {
      case e: java.sql.SQLException =>
        System.err.println(s"[jdbc] could not restart identity: $e")
        0L
    } finally c.close()
  }

  /** Exactly-once markers: (target, epoch, partition) rows committing
    * atomically with the data they guard. */
  private[cdc] def epochSeen(c: Connection, target: String, epoch: Long,
      part: Int): Boolean = {
    val ps = c.prepareStatement(
      s"SELECT 1 FROM $EpochTable WHERE target=? AND epoch=? AND part=?")
    try {
      ps.setString(1, target); ps.setLong(2, epoch); ps.setInt(3, part)
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  private[cdc] def markEpoch(c: Connection, target: String, epoch: Long,
      part: Int): Unit = {
    val ps = c.prepareStatement(s"INSERT INTO $EpochTable VALUES (?, ?, ?)")
    try {
      ps.setString(1, target); ps.setLong(2, epoch); ps.setInt(3, part)
      ps.executeUpdate()
    } finally ps.close()
  }

  /** Marker retention: Structured Streaming replays at most the
    * CURRENT epoch (batch N re-runs only before N+1 starts), so markers
    * below this epoch can never be consulted again — prune them in the
    * same transaction to keep the table O(partitions), not O(stream
    * lifetime). */
  private[cdc] def pruneEpochs(c: Connection, target: String,
      epoch: Long): Unit = {
    val ps = c.prepareStatement(
      s"DELETE FROM $EpochTable WHERE target=? AND epoch<?")
    try {
      ps.setString(1, target); ps.setLong(2, epoch); ps.executeUpdate()
    } finally ps.close()
  }

  /** Partitioned JDBC snapshot — the parallel bulk extract
    * (replicator/main.go:98-140 as N range queries instead of one
    * cursor). */
  def snapshot(spark: SparkSession, url: String, table: String,
      numPartitions: Int = 4): Dataset[PersonRow] = {
    import spark.implicits._
    val bounds = {
      val c = connect(url)
      try {
        val st = c.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT COALESCE(MIN(id), 0), COALESCE(MAX(id), 0) FROM $table")
          rs.next(); (rs.getLong(1), rs.getLong(2))
        } finally st.close()
      } finally c.close()
    }
    spark.read
      .option("partitionColumn", "id")
      .option("lowerBound", bounds._1)
      .option("upperBound", math.max(bounds._2, bounds._1 + 1))
      .option("numPartitions", numPartitions)
      .jdbc(url, table, new java.util.Properties)
      .select("id", "name", "uid", "score", "created_at")
      .as[PersonRow]
  }

  /** Apply one micro-batch: reduce to per-key summaries, then apply
    * each partition in one marker-guarded transaction. Safe to replay
    * with the same `batchId` (the marker skips); `batchId` must be the
    * streaming epoch. */
  def applyBatch(batch: Dataset[PersonChange], url: String, table: String,
      batchId: Long, parallelism: Int = 4): Unit = {
    val summaries = Replicate.summarize(batch.toDF(), parallelism)
      .select(col("id"),
        col("last_img.lsn").as("img_lsn"), col("last_img.name").as("name"),
        col("last_img.uid").as("uid"), col("last_img.score").as("score"),
        col("first_ins.lsn").as("ins_lsn"),
        col("first_ins.created_at").as("created_at"),
        col("last_d_lsn"))
    summaries.foreachPartition { (rows: Iterator[Row]) =>
      val buf = rows.toArray
      if (buf.nonEmpty) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val c = connect(url)
        try {
          c.setAutoCommit(false)
          // exactly-once: the (target, epoch, partition) marker commits
          // atomically WITH the rows; a replayed epoch short-circuits
          if (!epochSeen(c, table, batchId, pid)) {
            applyPartition(c, table, buf)
            markEpoch(c, table, batchId, pid)
            pruneEpochs(c, table, batchId)
            c.commit()
          } else c.rollback()
        } catch { case e: Throwable => c.rollback(); throw e }
        finally c.close()
      }
    }
  }

  /** One decoded per-key summary, ready for statement binding. */
  private final case class KeyOp(id: Int, name: String, uid: String,
      score: Option[Int], cAt: Timestamp, hasDel: Boolean, hasIns: Boolean,
      hasImg: Boolean) {
    /** SQL NULL when the winning image carried no score — matching the
      * parquet/state-store cells, which preserve null (a 0 coercion
      * here silently diverged the matrix for null-score events). */
    def bindScore(ps: java.sql.PreparedStatement, at: Int): Unit =
      score match {
        case Some(s) => ps.setInt(at, s)
        case None    => ps.setNull(at, java.sql.Types.INTEGER)
      }
  }

  /** Keys per executeBatch round-trip (bounds driver-side batch
    * memory; 1k × 3 phases ≈ 3 round-trips per 1k keys). */
  private val JdbcBatchSize = 1000

  /** One per-key summary in binder form — the shape-independent input
    * to [[applyOps]], so the typed single-table sink and the generic
    * multi-table sink ([[JdbcMultiTable]]) share one batch engine. */
  private[cdc] final case class RowOp(
      bindDel: java.sql.PreparedStatement => Unit,
      bindUpd: java.sql.PreparedStatement => Unit,
      bindIns: java.sql.PreparedStatement => Unit,
      hasDel: Boolean, hasIns: Boolean, hasImg: Boolean)

  /** The three-phase chunked batch engine (see [[applyPartition]]'s
    * scaladoc for the round-trip and ordering argument): per
    * [[JdbcBatchSize]] chunk — delete batch, update batch (counts
    * drive insert-on-miss; SUCCESS_NO_INFO resolved with one exact
    * single-row update), insert batch (rebirths + misses). */
  private[cdc] def applyOps(c: Connection, delSql: String, updSql: String,
      insSql: String, ops: Iterator[RowOp]): Unit = {
    val del = c.prepareStatement(delSql)
    val upd = c.prepareStatement(updSql)
    val ins = c.prepareStatement(insSql)
    try {
      ops.grouped(JdbcBatchSize).foreach { chunk =>
        val dels = chunk.filter(_.hasDel)
        if (dels.nonEmpty) {
          dels.foreach { k => k.bindDel(del); del.addBatch() }
          del.executeBatch()
        }
        val upds = chunk.filter(k => !k.hasDel && (k.hasIns || k.hasImg))
        val counts =
          if (upds.isEmpty) Array.empty[Int]
          else { upds.foreach { k => k.bindUpd(upd); upd.addBatch() }
                 upd.executeBatch() }
        val missed = upds.iterator.zip(counts.iterator).collect {
          case (k, n) if k.hasIns &&
              (n == 0 || (n == java.sql.Statement.SUCCESS_NO_INFO &&
                { k.bindUpd(upd); upd.executeUpdate() == 0 })) => k
        }.toSeq
        val toInsert = dels.filter(_.hasIns) ++ missed
        if (toInsert.nonEmpty) {
          toInsert.foreach { k => k.bindIns(ins); ins.addBatch() }
          ins.executeBatch()
        }
      }
    } finally { del.close(); upd.close(); ins.close() }
  }

  /** Statement shapes for one partition of per-key summaries, executed
    * as THREE JDBC batches per [[JdbcBatchSize]] chunk — delete, then
    * update, then insert — instead of one round-trip per key (r6
    * review: the scaladoc claimed batching the code didn't do; against
    * a networked database at ~1 ms RTT, 50k keys was ~50-100 s of
    * serialized executeUpdate). Phase order preserves per-key statement
    * order (each key is one summary row): its delete lands before its
    * rebirth insert, its update before its insert-on-miss. The update
    * batch's per-statement counts drive the upsert's insert-on-miss; a
    * driver reporting SUCCESS_NO_INFO (some drivers under batch
    * rewrite) is resolved exactly with one follow-up single-row update
    * for that key. */
  private def applyPartition(c: Connection, table: String,
      rows: Array[Row]): Unit =
    applyOps(c,
      s"DELETE FROM $table WHERE id=?",
      s"UPDATE $table SET name=?, uid=?, score=? WHERE id=?",
      s"INSERT INTO $table (id, name, uid, score, created_at) VALUES (?,?,?,?,?)",
      rows.iterator.map { r =>
        val k = KeyOp(
          id = r.getInt(r.fieldIndex("id")),
          name = r.getString(r.fieldIndex("name")),
          uid = r.getString(r.fieldIndex("uid")),
          score = if (r.isNullAt(r.fieldIndex("score"))) None
                  else Some(r.getInt(r.fieldIndex("score"))),
          cAt = r.getAs[Timestamp](r.fieldIndex("created_at")),
          hasDel = !r.isNullAt(r.fieldIndex("last_d_lsn")),
          hasIns = !r.isNullAt(r.fieldIndex("ins_lsn")),
          hasImg = !r.isNullAt(r.fieldIndex("img_lsn")))
        RowOp(
          bindDel = del => del.setInt(1, k.id),
          bindUpd = upd => {
            // a HIT preserves the stored created_at by never touching
            // the column (reference ON CONFLICT semantics)
            upd.setString(1, k.name); upd.setString(2, k.uid)
            k.bindScore(upd, 3); upd.setInt(4, k.id)
          },
          bindIns = ins => {
            ins.setInt(1, k.id); ins.setString(2, k.name)
            ins.setString(3, k.uid); k.bindScore(ins, 4)
            ins.setTimestamp(5, k.cAt)
          },
          hasDel = k.hasDel, hasIns = k.hasIns, hasImg = k.hasImg)
      })

  /** Bulk-load rows into the JDBC target (snapshot phase of the
    * replicator): distributed append through Spark's JDBC writer, then
    * the identity restart the reference runs right after its bulk copy
    * so direct target-side inserts can never collide with the
    * replicated key space. */
  def load(rows: Dataset[PersonRow], url: String, table: String): Unit = {
    ensureTables(url, table)
    rows.toDF().write.mode("append")
      .jdbc(url, table, new java.util.Properties)
    restartIdentity(url, table)
  }

  /** The continuous pipeline against a JDBC target: change log →
    * parse → per-key summaries → transactional JDBC apply. */
  def start(spark: SparkSession, changeDir: String, url: String,
      table: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("2 seconds"),
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    ensureTables(url, table)
    ChangeSource.readStream(spark, changeDir, maxFilesPerTrigger)
      .writeStream
      .queryName("graft-replicate-jdbc")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[PersonChange], epochId: Long) =>
        applyBatch(batch, url, table, batchId = epochId)
      }
      .start()
  }

  /** The reference monitor's parity probe (pubsub/main.go:131-209) in
    * its production form: source count, target count, and the filtered
    * expectation over JDBC. */
  def parity(url: String, sourceTable: String, targetTable: String)
      : (Long, Long) = {
    val c = connect(url)
    try {
      val st = c.createStatement()
      try {
        def one(q: String): Long = {
          val rs = st.executeQuery(q)
          try { rs.next(); rs.getLong(1) } finally rs.close()
        }
        (one(s"SELECT COUNT(*) FROM $sourceTable"),
          one(s"SELECT COUNT(*) FROM $targetTable"))
      } finally st.close()
    } finally c.close()
  }
}
