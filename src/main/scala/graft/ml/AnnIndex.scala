package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}

import graft.cdc.{ChangeGen, ChangeSource, Ivm, MtDelta, MultiTable, TableSpec}

/** CDC-MAINTAINED IVFADC serving index (VERDICT r13 next #1 — the
  * maintained-vector-index shape a 100 TB pipeline actually runs):
  * embedding rows arrive/update/delete through the SAME replica stream
  * machinery every CDC table uses ([[graft.cdc.ChangeSource]] slot scan
  * → [[graft.cdc.MultiTable.parseAll]] envelope decode →
  * [[graft.cdc.Ivm.mtDeltas]] full-image retraction deltas), changed
  * keys re-encode against the FROZEN model (coarse centroids + residual
  * PQ codebooks — never retrained per epoch; re-training is a separate,
  * rare, full-rebuild event), and each epoch rewrites ONLY the cell
  * partitions its changes touch — the [[graft.cdc.Ivm.applyJoinBatch]]
  * identity applied to the serving index, so per-epoch work is
  * change-volume-sized + touched-cells-sized, independent of index
  * size.
  *
  * Cell assignment here is the QUANTIZER's (nearest frozen coarse
  * centroid by integer L2, ties to the lowest cell — Jégou et al.,
  * IVFADC, TPAMI'11 §III), not the fixture label: arriving vectors
  * have no label, and a self-consistent assignment rule is what makes
  * "incremental == full rebuild" a theorem rather than a coincidence.
  *
  * Epoch apply is REPLAY-IDEMPOTENT by construction: a rewritten cell's
  * next content is (current content minus the batch's keys) ∪ (the
  * batch's +new encodings) — keyed set algebra, so re-applying a batch
  * after a checkpoint-restart recomputes the identical partitions
  * (spec-pinned, the restart contract every foreachBatch sink needs).
  *
  * Scale: the delta side is change-volume-sized; the state side reads
  * are PARTITION-PRUNED to the touched cells (the -old/+new retraction
  * images carry both the departing and the arriving cell, so no index
  * lookup is needed to find a moved key's old partition); the write is
  * a dynamic partition overwrite of exactly the touched cells. The
  * probed search then reads the maintained artifact through the same
  * pruning [[Similarity.ivfAdcIndexScan]] pins.
  */
object AnnIndex {
  import Similarity.{IvfAdcProbe, PqM, PqTopK, QueryStride}

  /** The embedding table's change-stream contract: key `vec_id`; image
    * column `emb` carries the comma-joined QUANTIZED components — exact
    * integer round-trip, floats never cross the wire (the same
    * fixed-point doctrine as [[MlFunctions.quantize]]). */
  val EmbSpec: TableSpec = TableSpec("embedding", "vec_id", None,
    StructType(Seq(StructField("vec_id", LongType),
      StructField("emb", StringType))))

  /** Fresh-key namespace for the synthetic epoch script's inserts. */
  val InsertIdBase = 1000000L

  /** Shuffle width for change-volume-sized maintenance work (see
    * [[TextIndex.MicroShuffle]] — same rationale): a micro-batch's
    * exchanges must not inherit the corpus-sized session width. */
  val MicroShuffle: Int = TextIndex.MicroShuffle

  // ---- frozen-model encode / assign ------------------------------------

  /** Nearest frozen coarse cell by integer L2, ties to the LOWEST cell —
    * the packed `d2·C + c` argmin ([[Similarity.pqCode]]'s tie-break),
    * one codegen'd per-row expression against literal centroids. */
  def cellOf(q: Column, cents: Seq[Seq[Long]]): Column = {
    val n = cents.length
    val keys = transform(sequence(lit(0), lit(n - 1)),
      c => Similarity.pqD2(q, element_at(typedLit(cents), c + 1))
        * n + c)
    (array_min(keys) % n).cast("int")
  }

  /** Residual PQ codes against the frozen codebooks for rows that
    * already carry their assigned `cell`. */
  private def codesFor(cb: Seq[Seq[Seq[Long]]], cents: Seq[Seq[Long]])
      : Column = {
    val r = Similarity.residual(col("q"), col("cell"), cents)
    transform(sequence(lit(0), lit(PqM - 1)),
      m => Similarity.pqCode(typedLit(cb), Similarity.subCol(r, m), m))
  }

  /** Encode (vec_id, q) rows against the FROZEN model: assigned cell +
    * residual codes — one codegen'd projection, no shuffle. */
  def encode(rows: DataFrame, cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]]): DataFrame =
    rows.withColumn("cell", cellOf(col("q"), cents))
      .select(col("vec_id"), col("cell"), codesFor(cb, cents).as("codes"))

  // ---- build / append / apply-epoch ------------------------------------

  /** Full build: encode every row, one file per cell. The rebuild this
    * module's incremental path is proven equal to. */
  def buildIndex(rows: DataFrame, indexPath: String,
      cents: Seq[Seq[Long]], cb: Seq[Seq[Seq[Long]]]): Unit =
    encode(rows, cents, cb).repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .parquet(indexPath)

  /** Insert-only fast path (VERDICT r13 next #4): encode NEW rows
    * against the frozen model and APPEND to their cell partitions —
    * files land only under the appended cells' dirs, every other
    * partition is untouched (spec-pinned), and no existing file is
    * rewritten. Returns the touched cells. */
  def appendToIndex(rows: DataFrame, indexPath: String,
      cents: Seq[Seq[Long]], cb: Seq[Seq[Seq[Long]]]): Seq[Int] = {
    val enc = encode(rows, cents, cb).localCheckpoint(true)
    val cells = enc.select("cell").distinct().collect()
      .map(_.getInt(0)).toSeq.sorted
    enc.repartition(col("cell"))
      .write.mode(SaveMode.Append).partitionBy("cell").parquet(indexPath)
    graft.streaming.StreamHygiene.releaseBlocks(enc)
    cells
  }

  /** Apply ONE micro-batch of full-image retraction deltas
    * ([[graft.cdc.Ivm.mtDeltas]]' rows for [[EmbSpec]]) to the
    * maintained index. Affected cells = departing (−old) ∪ arriving
    * (+new) cells — both derivable from the delta images alone, no
    * index lookup; the rewrite reads ONLY those cells (partition
    * pruning), drops the batch's keys, adds the +new encodings, and
    * dynamic-partition-overwrites exactly those cells. A cell the
    * batch empties entirely is cleared explicitly (dynamic overwrite
    * writes no partition for it). Returns the affected cells —
    * |returned| == |rewritten partitions| is the spec pin.
    *
    * After a [[splitCell]], pass the genealogy (`root` = the pre-split
    * centroid list, `splits` = the split nodes in order): assignment
    * then descends the split tree ([[treeCellOf]]) for BOTH signs, so
    * a changed key's −old image derives the key's ACTUAL sticky
    * partition — a global argmin over the extended list would miss
    * moved members' homes and leave stale rows (spec-pinned). */
  /** The embedding table's rows of a parsed delta batch:
    * (vec_id, sign, q) — both signs carry the full image, so every
    * derived location (cell, replica partition) is computable without
    * a state lookup. */
  private def vecDeltaRows(batch: Dataset[MtDelta]): DataFrame = {
    val qCol = transform(
      split(element_at(from_json(col("img"),
        MapType(StringType, StringType)), "emb"), ","),
      x => x.cast("long"))
    batch.toDF().filter(col("tbl") === EmbSpec.table)
      .select(col("key").cast("long").as("vec_id"), col("sign"),
        qCol.as("q"))
  }

  def applyEpoch(spark: SparkSession, batch: Dataset[MtDelta],
      indexPath: String, cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]], root: Seq[Seq[Long]] = null,
      splits: Seq[Split] = Nil): Seq[Int] =
    applyEpochCounts(spark, batch, indexPath, cents, cb, root, splits)._1

  /** [[applyEpoch]] that ALSO returns the touched cells' post-write
    * row counts — the content of the rewritten partitions is exactly
    * the `next` frame this method just materialized, so the counts
    * come from the same one aggregate job that finds emptied cells;
    * [[applyEpochRebalanced]]'s hot-cell policy reads them instead of
    * re-scanning the index it just wrote (r16 optimization round,
    * guide §1.2 — one index-scan job per epoch removed, the cost of
    * the maintain pass being job count, not data). */
  private[graft] def applyEpochCounts(spark: SparkSession,
      batch: Dataset[MtDelta], indexPath: String, cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]], root: Seq[Seq[Long]] = null,
      splits: Seq[Split] = Nil): (Seq[Int], Seq[(Int, Long)]) = {
    val rootCents = Option(root).getOrElse(cents)
    // change-volume-sized: both signs carry their cell so moved keys'
    // OLD partitions are known without an index probe. Checkpointed
    // ONCE: inside foreachBatch every action re-executes the trigger's
    // stateful plan (state-store reads included), so the batch must be
    // materialized before the multi-action apply.
    val rows = vecDeltaRows(batch)
      .withColumn("cell", treeCellOf(col("q"), rootCents, splits))
      .localCheckpoint(true)
    val affected = rows.select("cell")
      .repartition(MicroShuffle, col("cell")).distinct().collect()
      .map(_.getInt(0)).toSeq.sorted
    if (affected.isEmpty) {
      graft.streaming.StreamHygiene.releaseBlocks(rows)
      (affected, Nil)
    } else {
      val newEnc = rows.filter(col("sign") === 1)
        .select(col("vec_id"), col("cell"), codesFor(cb, cents).as("codes"))
      // hasPartitions, not root-exists: an all-cells-emptied artifact
      // must read as absent (ADVICE r14 #2)
      val hasIndex = IndexFs.hasPartitions(spark, indexPath, "cell")
      val current =
        if (hasIndex) Similarity.ivfAdcIndexScan(spark, indexPath, affected)
        else newEnc.limit(0)
      // keyed set algebra — idempotent under replay; the changed-key
      // list is change-volume-sized, hence the broadcast anti-join
      val next = current
        .join(broadcast(rows.select("vec_id").distinct()),
          Seq("vec_id"), "left_anti")
        .unionByName(newEnc)
        // materialize BEFORE the write: the overwrite must not scan the
        // very partitions it is replacing
        .localCheckpoint(true)
      next.repartition(MicroShuffle, col("cell"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(indexPath)
      // one aggregate job: per-cell counts give BOTH the emptied-cell
      // set (a cell absent from `next` was emptied) and the hot-policy
      // sizes (post-write content of every affected cell == `next`)
      val counts = next.groupBy("cell").count().collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      val nonEmpty = counts.map(_._1).toSet
      affected.filterNot(nonEmpty).foreach(c =>
        IndexFs.deleteDir(spark, s"$indexPath/cell=$c"))
      // epoch-local checkpoints are dead once the write committed
      graft.streaming.StreamHygiene.releaseBlocks(rows, next)
      (affected, counts)
    }
  }

  /** Probed serve over a maintained/built index: partition-pruned read
    * of the probed cells, ADC, exact rerank against `corpusQ` (at
    * 100 TB: the replica table the stream maintains next to the
    * index). */
  def searchIndex(spark: SparkSession, indexPath: String,
      corpusQ: DataFrame, qs: DataFrame, cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]], k: Int = PqTopK,
      nprobe: Int = IvfAdcProbe): DataFrame = {
    val probed = Similarity.ivfAdcProbesOn(qs, cents, nprobe)
      .localCheckpoint()
    val cells = probed.select("pcell").distinct().collect()
      .map(_.getInt(0)).toSeq.sorted
    Similarity.ivfAdcRankOn(corpusQ, qs,
      Similarity.ivfAdcIndexScan(spark, indexPath, cells), probed, cb, k)
  }

  // ---- adaptive cell split (re-balance maintenance) ---------------------

  /** Deterministic distributed 2-means over ONE cell's members —
    * farthest-point init (Gonzalez '85: seed A = the lowest-vec_id
    * member, seed B = the member farthest from A, ties to the lowest
    * vec_id) + `iters` Lloyd steps in the integer algebra
    * (floorDiv means, ties to side A). Every pass is one aggregate
    * over the cell's members; the collected state is 2 × 64 longs —
    * bounded model state, never corpus-sized. */
  def trainSplit(members: DataFrame, iters: Int = 3)
      : (Seq[Long], Seq[Long]) =
    trainSplitOpt(members, iters).getOrElse {
      // degenerate cell (all members identical): reproduce the
      // pre-r16 fixed point — both children at the lone member value
      val a0 = members.orderBy("vec_id").limit(1)
        .collect()(0).getSeq[Long](1).toSeq
      (a0, a0)
    }

  /** [[trainSplit]] that reports degeneracy instead of training it:
    * returns None when every member vector is identical (max d2 from
    * seed A is 0 ⟺ fewer than 2 distinct vectors — the splittability
    * guard's condition, folded into seed selection so the policy pays
    * NO separate distinct-count job per hot cell; r16 optimization
    * round, guide §1.2 — the maintain pass was 684 tiny jobs and the
    * per-job overhead, not the data, was the cost). */
  private[ml] def trainSplitOpt(members: DataFrame, iters: Int = 3)
      : Option[(Seq[Long], Seq[Long])] = {
    val dims = PqM * Similarity.PqDims
    val a0 = members.orderBy("vec_id").limit(1)
      .collect()(0).getSeq[Long](1).toSeq
    val b0row = members
      .select(col("vec_id"), col("q"),
        Similarity.pqD2(col("q"), typedLit(a0)).as("d2"))
      .orderBy(col("d2").desc, col("vec_id")).limit(1)
      .collect()(0)
    if (b0row.getLong(2) == 0L) return None
    val b0 = b0row.getSeq[Long](1).toSeq
    var (ca, cbV) = (a0, b0)
    for (_ <- 0 until iters) {
      val da = Similarity.pqD2(col("q"), typedLit(ca))
      val db = Similarity.pqD2(col("q"), typedLit(cbV))
      val sums = members
        .select(when(da <= db, 0).otherwise(1).as("side"),
          posexplode(col("q")).as(Seq("d", "v")))
        .groupBy("side", "d")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      def mean(side: Int, fallback: Seq[Long]): Seq[Long] =
        if (!sums.contains((side, 0))) fallback
        else (0 until dims).map { d =>
          val (s, n) = sums((side, d)); Math.floorDiv(s, n)
        }
      ca = mean(0, ca); cbV = mean(1, cbV)
    }
    Some((ca, cbV))
  }

  /** One node of the split GENEALOGY: `parent` was split into child A
    * (which keeps the parent's position in the centroid list) and
    * child B (appended at a new position), with the child centroid
    * values AS OF the split frozen here. The genealogy is the
    * quantizer after maintenance splits: a vector's sticky home is
    * found by descending it ([[treeCellOf]]), NOT by a global argmin
    * over the extended list — the two differ, and the difference is
    * exactly the stale-retraction bug the composition spec pins. */
  final case class Split(parent: Int, childB: Int,
      centA: Seq[Long], centB: Seq[Long])

  /** Sticky assignment through the split tree: argmin over the ROOT
    * centroid list, then each [[Split]] (in split order) re-routes a
    * vector currently at `parent` to the nearer of its two children
    * (ties → child A, the lower label). With no splits this IS
    * [[cellOf]] over the root.
    *
    * The descent folds at RUNTIME over an array literal of split
    * records (`aggregate` — the genealogy is data, not expression
    * structure), so the plan is constant-size in |splits|. The first
    * cut folded when() columns at PLAN time instead — and each step
    * references the accumulated column TWICE (the re-route condition
    * and its otherwise), so the expression tree DOUBLED per split:
    * exponential, not the text layout's quadratic — at ~25 genealogy
    * nodes plan construction alone exhausted a 16 GB heap (caught by
    * the in-loop policy's cascade spec, AnnIndexSpec). The text
    * layout's residue table does not transfer (cell ids aren't
    * modular), but the same principle does: descend data, not plan. */
  def treeCellOf(q: Column, root: Seq[Seq[Long]],
      splits: Seq[Split]): Column =
    if (splits.isEmpty) cellOf(q, root)
    else {
      val recs = splits.map(s => (s.parent, s.childB, s.centA, s.centB))
      aggregate(typedLit(recs), cellOf(q, root), (cur, s) =>
        when(cur === s.getField("_1"),
          when(Similarity.pqD2(q, s.getField("_3"))
              <= Similarity.pqD2(q, s.getField("_4")),
            s.getField("_1")).otherwise(s.getField("_2")))
          .otherwise(cur))
    }

  /** Maintenance encode through the split tree: sticky cell via
    * [[treeCellOf]], residual against that cell's CURRENT centroid
    * (the extended list), frozen codebooks. */
  def encodeTree(rows: DataFrame, root: Seq[Seq[Long]],
      cents: Seq[Seq[Long]], splits: Seq[Split],
      cb: Seq[Seq[Seq[Long]]]): DataFrame =
    rows.withColumn("cell", treeCellOf(col("q"), root, splits))
      .select(col("vec_id"), col("cell"), codesFor(cb, cents).as("codes"))

  /** Split one cell of a maintained index into two children — the
    * re-balance maintenance every serving index eventually needs
    * between the cheap append path and the rare full re-train (a hot
    * cell degrades probe cost: every query probing it scans all its
    * members). Assignment is STICKY (the FAISS/DiskANN convention):
    * ONLY the split cell's members reassign, each to the nearer child
    * (ties → the lower label); every other vector keeps its cell, so
    * exactly TWO partitions are touched — the split cell's (child A
    * reuses its position in the centroid list) and the appended child
    * B's (position |cents|). A global re-assignment would touch every
    * partition for marginal recall — that IS the full rebuild, a
    * different (rare) event. Members re-encode against their child's
    * centroid with the FROZEN codebooks. Returns the extended centroid
    * list AND the genealogy node: LATER EPOCHS MUST ASSIGN THROUGH THE
    * TREE ([[applyEpoch]]'s `splits` parameter) — a global argmin over
    * the extended list would mis-derive changed keys' old partitions
    * and leave stale rows (spec-pinned). [[searchIndex]] probes over
    * all |cents|+1 cells unchanged. */
  def splitCell(spark: SparkSession, indexPath: String,
      corpusQ: DataFrame, cell: Int, cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]], iters: Int = 3)
      : (Seq[Seq[Long]], Split) = {
    val members = Similarity.ivfAdcIndexScan(spark, indexPath, Seq(cell))
      .select("vec_id")
      .join(corpusQ.select(col("vec_id"), col("q")), Seq("vec_id"))
      .localCheckpoint(true)
    val (a, b) = trainSplit(members, iters)
    val newIdx = cents.length
    val newCents = cents.updated(cell, a) :+ b
    val da = Similarity.pqD2(col("q"), typedLit(a))
    val db = Similarity.pqD2(col("q"), typedLit(b))
    val enc = members
      .withColumn("cell", when(da <= db, lit(cell)).otherwise(lit(newIdx)))
      .select(col("vec_id"), col("cell"), codesFor(cb, newCents).as("codes"))
      .localCheckpoint(true)
    enc.repartition(col("cell"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(indexPath)
    // a child left empty (degenerate split) keeps no partition dir
    val nonEmpty = enc.select("cell").distinct().collect()
      .map(_.getInt(0)).toSet
    Seq(cell, newIdx).filterNot(nonEmpty).foreach(c =>
      IndexFs.deleteDir(spark, s"$indexPath/cell=$c"))
    graft.streaming.StreamHygiene.releaseBlocks(members, enc)
    (newCents, Split(cell, newIdx, a, b))
  }

  /** Size-triggered cell-split policy IN the maintenance loop (VERDICT
    * r15 next #4 — the [[TextIndex.splitIfHot]] contract on the IVF
    * layout): after an epoch lands, split any TOUCHED cell whose
    * member count exceeds `maxRows` — a hot cell's probe cost is its
    * member count, so row count IS the heat metric. Touched-only by
    * design (the check reads only the epoch's own cells,
    * partition-pruned; an epoch touching nothing checks nothing); one
    * split per hot cell per call, so repeated epochs converge without
    * a rebalance storm (a still-hot child is caught the next time an
    * epoch touches it — at most one doubling per cell per epoch).
    *
    * SPLITTABILITY GUARD: a cell is split only if it holds at least
    * two DISTINCT member vectors. 2-means over identical points is
    * degenerate (both seeds coincide, every member ties to child A,
    * child B lands empty) — the unguarded policy would re-pick the
    * same cell every epoch and grow the genealogy forever, the exact
    * cascade the hash layouts' one-hot-term guard blocks. Such a cell
    * is maximally compact already; no quantizer refinement can shrink
    * it.
    *
    * `corpusQ` is the live (vec_id, q) replica the maintainer keeps
    * next to the index (the [[searchIndex]] rerank side — already a
    * standing dependency of serving). Callers persist the returned
    * genealogy with [[saveQuantizer]] and thread it into the next
    * [[applyEpoch]]; [[TextIndex.splitIfHot]]'s REPLAY-SAFETY
    * PRECONDITION applies verbatim (run outside the stream's
    * checkpoint window, or adopt the epoch-keyed genealogy log the
    * hash layouts carry). Returns (extended centroid list, extended
    * genealogy). */
  def splitIfHot(spark: SparkSession, indexPath: String,
      corpusQ: DataFrame, touched: Seq[Int], cents: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]], splits: Seq[Split], maxRows: Long)
      : (Seq[Seq[Long]], Seq[Split]) = {
    if (touched.isEmpty) return (cents, splits)
    if (!IndexFs.hasPartitions(spark, indexPath, "cell"))
      return (cents, splits)
    val hot = Similarity.ivfAdcIndexScan(spark, indexPath, touched)
      .groupBy("cell").count()
      .filter(col("count") > maxRows)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy { case (c, n) => (-n, c) }.map(_._1)
    hot.foldLeft((cents, splits)) { case ((cs, ss), cell) =>
      val distinct2 = Similarity.ivfAdcIndexScan(spark, indexPath,
          Seq(cell))
        .select("vec_id")
        .join(corpusQ.select("vec_id", "q"), Seq("vec_id"))
        .select("q").distinct().limit(2).count()
      if (distinct2 < 2) (cs, ss)
      else {
        val (nc, sp) = splitCell(spark, indexPath, corpusQ, cell, cs, cb)
        (nc, ss :+ sp)
      }
    }
  }

  // ---- epoch-keyed genealogy log (in-stream re-balance) -----------------

  /** Bound on the genealogy length — the [[TextIndex.MaxDescentEntries]]
    * contract on the IVF layout: [[treeCellOf]]'s runtime fold carries
    * one record of 2·dims longs per split in a `typedLit` array riding
    * every task binary, so the genealogy must stay bounded model state.
    * 1024 splits × 2 × 64 longs ≈ 1 MiB of literal — already generous
    * (a layout needing a thousand in-place doublings wants a re-train
    * with more coarse cells, not more splits). The automated policies
    * SKIP at-bound ([[splitIfHot]], [[applyEpochRebalanced]] — a
    * maintenance loop must degrade, not crash the stream); the serve
    * path's [[loadSplitLog]] re-checks so a foreign-written log cannot
    * smuggle an unbounded literal into the plan. */
  val MaxGenealogy: Int = 1024

  /** Extend a centroid list by one genealogy node. The appended child
    * must land at position `childB` — the invariant [[splitCell]]'s
    * `newIdx = cents.length` establishes and every descent relies on. */
  def centsStep(cents: Seq[Seq[Long]], s: Split): Seq[Seq[Long]] = {
    require(s.childB == cents.length,
      s"genealogy out of order: child ${s.childB} must extend a list " +
        s"of ${s.childB} centroids, got ${cents.length}")
    cents.updated(s.parent, s.centA) :+ s.centB
  }

  /** The extended centroid list a genealogy prefix reaches from the
    * frozen root — the quantizer is (root, log) everywhere the log
    * protocol runs; the mutable `cents` dump is the OFFLINE form. */
  def centsAfter(root: Seq[Seq[Long]], splits: Seq[Split])
      : Seq[Seq[Long]] = splits.foldLeft(root)(centsStep)

  /** Write one epoch's genealogy entries to the epoch-keyed split LOG —
    * [[TextIndex.saveSplitLogEpoch]]'s doctrine on the IVF layout, with
    * the split centroids as payload (they are data the 2-means derived
    * from the epoch's members; a replay must read them back, not
    * re-derive them against post-crash state). Dynamic overwrite of
    * exactly this epoch's partition; the caller always passes its
    * cumulative entry list for the epoch. */
  def saveSplitLogEpoch(spark: SparkSession, path: String, epoch: Long,
      entries: Seq[Split]): Unit = {
    import spark.implicits._
    if (entries.isEmpty) return
    entries.zipWithIndex
      .map { case (s, i) => (i, s.parent, s.childB, s.centA, s.centB,
        epoch) }
      .toDF("ord", "parent", "child_b", "cent_a", "cent_b", "epoch")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch").parquet(path)
  }

  /** Reload the genealogy log in commit order: (epoch asc, ord asc).
    * Absent/empty log reads as the empty genealogy; an over-long log
    * fails loudly ([[MaxGenealogy]]). */
  def loadSplitLog(spark: SparkSession, path: String)
      : Seq[(Long, Split)] = {
    if (!IndexFs.hasPartitions(spark, path, "epoch")) return Seq.empty
    val out = spark.read.parquet(path)
      .select(col("epoch").cast("long"), col("ord"), col("parent"),
        col("child_b"), col("cent_a"), col("cent_b"))
      .collect()
      .map(r => ((r.getLong(0), r.getInt(1)),
        Split(r.getInt(2), r.getInt(3), r.getSeq[Long](4).toSeq,
          r.getSeq[Long](5).toSeq)))
      .sortBy(_._1).map { case ((e, _), s) => (e, s) }.toSeq
    require(out.size <= MaxGenealogy,
      s"genealogy log at $path carries ${out.size} splits (bound " +
        s"$MaxGenealogy) — the descent literal rides every task " +
        "binary; re-train the quantizer instead of splitting further")
    out
  }

  // ---- the (vec_id, q) replica next to the index ------------------------

  /** Partition count for the maintained vector replica — key-hash
    * partitioning so an epoch's touched-partition set is derivable
    * from its keys alone (no replica lookup), the same
    * change-volume-pruning contract as the index's cell partitions. */
  val ReplicaBuckets: Int = 16

  /** Apply ONE micro-batch to the (vec_id, q) replica the maintainer
    * keeps next to the index — [[searchIndex]]'s exact-rerank side and
    * the split protocol's member-vector source. At deployment scale
    * this is the embedding table's ordinary CDC replica (the S5 shape);
    * here it is maintained by the same keyed set algebra as
    * [[applyEpoch]]: read ONLY the touched `rb = pmod(vec_id, B)`
    * partitions, drop the batch's keys, add the +new images, dynamic
    * overwrite — change-volume-sized, replay-idempotent. */
  def applyReplicaEpoch(spark: SparkSession, batch: Dataset[MtDelta],
      replicaPath: String): Unit = {
    val rows = vecDeltaRows(batch)
      .withColumn("rb", pmod(col("vec_id"), lit(ReplicaBuckets))
        .cast("int"))
      .localCheckpoint(true)
    val touched = rows.select("rb")
      .repartition(MicroShuffle, col("rb")).distinct().collect()
      .map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) {
      graft.streaming.StreamHygiene.releaseBlocks(rows)
      return
    }
    val newRows = rows.filter(col("sign") === 1)
      .select("vec_id", "q", "rb")
    val current =
      if (IndexFs.hasPartitions(spark, replicaPath, "rb"))
        spark.read.parquet(replicaPath)
          .filter(col("rb").isin(touched: _*))
          .select("vec_id", "q", "rb")
      else newRows.limit(0)
    val next = current
      .join(broadcast(rows.select("vec_id").distinct()),
        Seq("vec_id"), "left_anti")
      .unionByName(newRows)
      .localCheckpoint(true)
    next.repartition(MicroShuffle, col("rb"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("rb").parquet(replicaPath)
    val nonEmpty = next.select("rb")
      .repartition(MicroShuffle, col("rb")).distinct().collect()
      .map(_.getInt(0)).toSet
    touched.filterNot(nonEmpty).foreach(b =>
      IndexFs.deleteDir(spark, s"$replicaPath/rb=$b"))
    // epoch-local checkpoints are dead once the write committed
    graft.streaming.StreamHygiene.releaseBlocks(rows, next)
  }

  /** The maintained replica as a (vec_id, q) relation; empty-but-typed
    * when absent. */
  def readReplica(spark: SparkSession, replicaPath: String): DataFrame =
    if (!IndexFs.hasPartitions(spark, replicaPath, "rb"))
      spark.range(0).select(col("id").as("vec_id"),
        array().cast("array<long>").as("q"))
    else spark.read.parquet(replicaPath).select("vec_id", "q")

  /** HEAL one logged split's physical move — and, because it is
    * idempotent from every intermediate state, also the move EXECUTOR
    * the write-ahead protocol uses on the crash-free path (one code
    * path, so heal ≡ move is true by construction, not by parallel
    * maintenance). Reads BOTH of the split's partitions (the child may
    * not exist yet), re-derives each member's side from the LOGGED
    * child centroids (ties → child A, [[splitCell]]'s rule),
    * re-encodes against `centsNow` with the frozen codebooks, and
    * dynamic-overwrites the two partitions; a side left empty is
    * cleared. `corpusQ` must be the epoch's own replica state — the
    * protocol orders [[applyReplicaEpoch]] first for exactly this
    * reason. */
  private[ml] def healSplit(spark: SparkSession, indexPath: String,
      corpusQ: DataFrame, s: Split, centsNow: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]],
      knownMembers: Option[DataFrame] = None): Unit = {
    if (!IndexFs.hasPartitions(spark, indexPath, "cell")) return
    // `knownMembers` (r16 optimization round): on the crash-free path
    // the CALLER just derived this exact frame — indexScan(parent) ⋈
    // replica, already materialized for split training; at that point
    // childB has no partition yet, so indexScan(parent, childB) ≡
    // indexScan(parent) and reusing the frame is the same derivation,
    // not a parallel one (heal ≡ move holds by construction). The
    // replay/heal path passes None and derives from the index as
    // before. Saves one index-scan + join + checkpoint job per split
    // (guide §1.2 — the split loop's cost is job count, not data).
    val members = knownMembers.getOrElse(
      Similarity.ivfAdcIndexScan(spark, indexPath,
          Seq(s.parent, s.childB))
        .select("vec_id")
        .join(corpusQ.select("vec_id", "q"), Seq("vec_id")))
    val da = Similarity.pqD2(col("q"), typedLit(s.centA))
    val db = Similarity.pqD2(col("q"), typedLit(s.centB))
    val enc0 = members
      .withColumn("cell",
        when(da <= db, lit(s.parent)).otherwise(lit(s.childB)))
      .select(col("vec_id"), col("cell"),
        codesFor(cb, centsNow).as("codes"))
    // materialize BEFORE the write: the overwrite must not scan the
    // very partitions it is replacing. A passed-in members frame is
    // already checkpointed by the caller, so the derived projection
    // never touches the index and needs no second materialization.
    val enc =
      if (knownMembers.isDefined) enc0 else enc0.localCheckpoint(true)
    val nonEmpty = enc.select("cell")
      .repartition(MicroShuffle, col("cell")).distinct().collect()
      .map(_.getInt(0)).toSet
    if (nonEmpty.nonEmpty)
      enc.repartition(MicroShuffle, col("cell"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(indexPath)
    Seq(s.parent, s.childB).filterNot(nonEmpty).foreach(c =>
      IndexFs.deleteDir(spark, s"$indexPath/cell=$c"))
    // the heal's own checkpoint (if it made one) is dead post-write;
    // a caller-passed members frame is the caller's to release
    if (knownMembers.isEmpty)
      graft.streaming.StreamHygiene.releaseBlocks(enc)
  }

  /** Apply ONE micro-batch WITH the in-stream re-balance protocol on
    * the IVF layout — [[TextIndex.applyEpochRebalanced]]'s write-ahead
    * contract, with two vector-layout specifics. (1) The REPLICA lands
    * first: healing and splitting need member VECTORS (the index rows
    * carry only lossy codes), so the epoch's replica state must be
    * durable before any split work — the crash-free run orders it the
    * same way, making replay see what the first attempt saw. (2) A
    * split entry carries its child CENTROIDS: they are 2-means output
    * over the epoch's members, so a replay must read them from the log
    * rather than re-derive them (the healed post-split membership
    * would train subtly different children and the log trace would
    * diverge). Per epoch: heal this epoch's logged-unmoved splits →
    * [[applyEpoch]] through root + (prefix ∪ mine) → the
    * [[splitIfHot]] policy with write-ahead ordering (entry durable in
    * the epoch's log partition BEFORE [[healSplit]] executes the
    * move) and replay pacing (buckets a crashed attempt already split
    * freeze until the next epoch). Returns the genealogy after this
    * epoch. */
  def applyEpochRebalanced(spark: SparkSession, batch: Dataset[MtDelta],
      indexPath: String, replicaPath: String, logPath: String,
      root: Seq[Seq[Long]], cb: Seq[Seq[Seq[Long]]], batchId: Long,
      maxRows: Long): Seq[Split] = {
    val log = loadSplitLog(spark, logPath)
    require(log.forall(_._1 <= batchId),
      s"genealogy log at $logPath carries entries from epochs past " +
        s"$batchId — refusing to derive against a future layout")
    val prefix = log.filter(_._1 < batchId).map(_._2)
    val mine = log.filter(_._1 == batchId).map(_._2)
    applyReplicaEpoch(spark, batch, replicaPath)
    val corpusQ = readReplica(spark, replicaPath)
    var cents = centsAfter(root, prefix)
    mine.foreach { s =>
      cents = centsStep(cents, s)
      healSplit(spark, indexPath, corpusQ, s, cents, cb)
    }
    val gen0 = prefix ++ mine
    val (touched, counts) = applyEpochCounts(spark, batch, indexPath,
      cents, cb, root, gen0)
    if (touched.isEmpty ||
        !IndexFs.hasPartitions(spark, indexPath, "cell")) return gen0
    // replay pacing: one doubling per cell per epoch must hold under
    // replay too ([[TextIndex.applyEpochRebalanced]])
    val frozen = mine.flatMap(s => Seq(s.parent, s.childB)).toSet
    // hot list from the epoch's own post-write counts (the rewritten
    // partitions' content IS the `next` frame applyEpochCounts
    // aggregated) — same sizes the former post-write index scan read,
    // without the scan job
    val hot = counts
      .filter { case (_, n) => n > maxRows }
      .sortBy { case (c, n) => (-n, c) }.map(_._1)
      .filterNot(frozen)
    var logged = mine
    hot.foldLeft(gen0) { (gen, cell) =>
      // genealogy bound checked FIRST (driver-side, free) — the
      // pre-r16 order paid a members scan + distinct-count job before
      // a check that needs neither; same outcome, two fewer jobs per
      // hot cell (the splittability guard now rides trainSplitOpt's
      // seed-B selection: max d2 == 0 ⟺ < 2 distinct vectors)
      if (gen.size >= MaxGenealogy) gen
      else {
        val members = Similarity.ivfAdcIndexScan(spark, indexPath,
            Seq(cell))
          .select("vec_id")
          .join(corpusQ.select("vec_id", "q"), Seq("vec_id"))
          .select("vec_id", "q")
          .localCheckpoint(true)
        val out = trainSplitOpt(members) match {
          case None => gen // degenerate: identical members, unsplittable
          case Some((a, b)) =>
            val s = Split(cell, cents.length, a, b)
            logged = logged :+ s
            // WAL: durable in this epoch's partition BEFORE the move
            saveSplitLogEpoch(spark, logPath, batchId, logged)
            cents = centsStep(cents, s)
            healSplit(spark, indexPath, corpusQ, s, cents, cb,
              knownMembers = Some(members))
            gen :+ s
        }
        graft.streaming.StreamHygiene.releaseBlocks(members)
        out
      }
    }
  }

  /** Compact fragmented cells: [[appendToIndex]] lands one file per
    * append wave, so an append-heavy cell accumulates small files and
    * the probed read amplifies. Rewrites ONLY cells holding more than
    * `maxFiles` files, each back to its one-file form; every other
    * partition stays byte-identical, and the index CONTENT is
    * untouched by construction (a pure layout rewrite — spec-pinned).
    * Returns the compacted cells. */
  def compactIndex(spark: SparkSession, indexPath: String,
      maxFiles: Int = 4): Seq[Int] = {
    val frag = IndexFs.partitionValues(spark, indexPath, "cell")
      .filter(c =>
        IndexFs.dataFileCount(spark, s"$indexPath/cell=$c") > maxFiles)
    if (frag.nonEmpty) {
      val rows = Similarity.ivfAdcIndexScan(spark, indexPath, frag)
        .localCheckpoint(true)
      rows.repartition(col("cell"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("cell").parquet(indexPath)
      graft.streaming.StreamHygiene.releaseBlocks(rows)
    }
    frag
  }

  /** The declared re-balance row: freeze the model on the corpus
    * (pre-split centroids + codebooks dumped), build the index, split
    * the LARGEST cell (ties → lowest label — re-derivable in SQL, so
    * the oracle picks the same one), dump the post-split centroid
    * list, and serve the stride workload off the re-balanced index.
    * The oracle re-derives pre-split assignment from the pre-split
    * centroid dump, applies the same sticky two-child override, and
    * rebuilds encoding, probing, ADC, and the exact rerank — the
    * split's whole downstream algebra is verified; only the 2-means
    * training itself is model state (the same status every ANN row
    * gives its centroids). */
  def splitAndServe(spark: SparkSession, emb: DataFrame,
      cent0Path: String, cent1Path: String, cbPath: String,
      k: Int = PqTopK, nprobe: Int = IvfAdcProbe): DataFrame = {
    import spark.implicits._
    // build + split are memoized per (session, fixture paths) — the
    // build/serve split every indexed row follows ([[MaintainedMemo]]):
    // the timed row is the post-re-balance SERVE, the one-time build
    // and 2-means train ride the shared accounting
    val (indexPath, newCents, cb) = MaintainedMemo.maintained(
        (spark, "cellsplit", cent0Path, cent1Path, cbPath)) {
      val (cents, cb0) = Similarity.ivfAdcModel(emb, cent0Path, cbPath)
      val idxRoot = MaintainedMemo.keepUntilExit(
        Files.createTempDirectory("graft-split-idx").toString)
      val idx = s"$idxRoot/index"
      val corpusQ = Similarity.quantized(emb).select("vec_id", "q")
      buildIndex(corpusQ, idx, cents, cb0)
      val big = spark.read.parquet(idx)
        .groupBy("cell").count().collect()
        .map(r => (r.getInt(0), r.getLong(1)))
        .sortBy { case (c, n) => (-n, c) }.head._1
      val (nc, _) = splitCell(spark, idx, corpusQ, big, cents, cb0)
      nc.zipWithIndex.map { case (c, l) => (l, c) }
        .toDF("label", "centroid").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(cent1Path)
      (idx, nc, cb0)
    }
    val corpusQ = Similarity.quantized(emb).select("vec_id", "q")
    val qs = corpusQ.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    searchIndex(spark, indexPath, corpusQ, qs, newCents, cb, k, nprobe)
      .orderBy("query_id", "rank")
  }

  // ---- quantizer persistence ---------------------------------------------

  /** Persist the FULL quantizer state — root centroids, current
    * (post-split) centroid list, the split genealogy in order, and the
    * PQ codebooks — as four parquet tables. The maintained index is
    * only operationally real if a NEW session (a serving job, a
    * restarted maintainer) can reload the exact model: the genealogy
    * is part of the quantizer, not an in-memory convenience
    * (spec-pinned round-trip). */
  def saveQuantizer(spark: SparkSession, path: String,
      root: Seq[Seq[Long]], cents: Seq[Seq[Long]], splits: Seq[Split],
      cb: Seq[Seq[Seq[Long]]]): Unit = {
    import spark.implicits._
    def dump(xs: Seq[Seq[Long]], name: String): Unit =
      xs.zipWithIndex.map { case (c, l) => (l, c) }
        .toDF("label", "centroid").coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(s"$path/$name")
    dump(root, "root")
    dump(cents, "cents")
    splits.zipWithIndex
      .map { case (s, i) => (i, s.parent, s.childB, s.centA, s.centB) }
      .toDF("ord", "parent", "child_b", "cent_a", "cent_b")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/splits")
    (for { m <- 0 until PqM; c <- 0 until Similarity.PqK }
      yield (m, c, cb(m)(c)))
      .toDF("m", "code", "centroid").coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/cb")
  }

  /** Reload a [[saveQuantizer]] dump — bounded model state, one small
    * collect per table. */
  def loadQuantizer(spark: SparkSession, path: String)
      : (Seq[Seq[Long]], Seq[Seq[Long]], Seq[Split], Seq[Seq[Seq[Long]]]) = {
    def slurp(name: String): Seq[Seq[Long]] =
      spark.read.parquet(s"$path/$name").collect()
        .map(r => (r.getInt(0), r.getSeq[Long](1).toSeq))
        .sortBy(_._1).map(_._2).toSeq
    val splits = spark.read.parquet(s"$path/splits").collect()
      .map(r => (r.getInt(0), Split(r.getInt(1), r.getInt(2),
        r.getSeq[Long](3).toSeq, r.getSeq[Long](4).toSeq)))
      .sortBy(_._1).map(_._2).toSeq
    val cbRows = spark.read.parquet(s"$path/cb").collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Long](2).toSeq))
      .toMap
    val cb = Seq.tabulate(PqM, Similarity.PqK)((m, c) => cbRows((m, c)))
    (slurp("root"), slurp("cents"), splits, cb)
  }

  // ---- the declared end-to-end row --------------------------------------

  /** One synthetic change op (harness-side, the [[graft.cdc.ChangeGen]]
    * doctrine — the ENGINE consumes these only as a parsed stream). */
  final case class VecOp(epoch: Int, lsn: Long, action: String,
      vecId: Long, emb: Option[String])

  /** Deterministic N-epoch change script over the snapshot: epoch 0 is
    * the initial load (the reference's snapshot-then-stream shape,
    * replicator/main.go:95-140); each later epoch e UPDATES
    * vec_id ≡ e (mod 10) to the NEGATED vector (guaranteed cell
    * movement for most rows — the moved-key case), DELETES
    * vec_id ≡ e (mod 17), and INSERTS a fresh key [[InsertIdBase]]+id
    * with the REVERSED vector for vec_id ≡ e (mod 13). lsns increase
    * globally; a key hit by U and D in one epoch folds by lsn (U then
    * D → dead), and a U on a key an earlier epoch deleted is a no-op —
    * both engines' folds agree by construction. */
  def epochScript(snap: Seq[(Long, Array[Long])], epochs: Int)
      : Seq[VecOp] = {
    val s = snap.sortBy(_._1)
    var lsn = 0L
    def next(): Long = { lsn += 1; lsn }
    val load = s.map { case (id, q) =>
      VecOp(0, next(), "I", id, Some(q.mkString(","))) }
    val incr = (1 to epochs).flatMap { e =>
      val ups = s.collect { case (id, q) if id % 10 == e =>
        VecOp(e, next(), "U", id, Some(q.map(-_).mkString(","))) }
      val dels = s.collect { case (id, _) if id % 17 == e =>
        VecOp(e, next(), "D", id, None) }
      val ins = s.collect { case (id, q) if id % 13 == e =>
        VecOp(e, next(), "I", InsertIdBase + id,
          Some(q.reverse.mkString(","))) }
      ups ++ dels ++ ins
    }
    load ++ incr
  }

  /** Render a [[VecOp]] as the wal2json-v2 envelope line the embedding
    * slot emits (the emb payload is digits/commas/minus — no JSON
    * escaping needed). */
  def toLine(op: VecOp): String = {
    val head = s""""lsn":${op.lsn},"action":"${op.action}","timestamp":"2026-01-01 00:00:00.000000+00","schema":"public","table":"${EmbSpec.table}""""
    op.action match {
      case "D" =>
        s"""{$head,"identity":[{"name":"vec_id","type":"bigint","value":${op.vecId}}]}"""
      case _ =>
        s"""{$head,"columns":[{"name":"vec_id","type":"bigint","value":${op.vecId}},{"name":"emb","type":"text","value":"${op.emb.get}"}]}"""
    }
  }

  /** Exact replica fold of the raw ops dump to the final live
    * (vec_id, q) state — liveness gated on an I after the last D, the
    * latest image wins; the oracle runs the same fold in SQL. One
    * keyed aggregation over the change log. */
  def foldOps(ops: DataFrame): DataFrame = {
    val lastD = ops.filter(col("action") === "D")
      .groupBy("vec_id").agg(max("lsn").as("dlsn"))
    ops.filter(col("action") =!= "D")
      .join(lastD, Seq("vec_id"), "left")
      .filter(col("lsn") > coalesce(col("dlsn"), lit(-2L)))
      .groupBy("vec_id")
      .agg(max_by(col("emb"), col("lsn")).as("emb"),
        max(when(col("action") === "I", 1).otherwise(0)).as("has_i"))
      .filter(col("has_i") === 1)
      .select(col("vec_id"),
        transform(split(col("emb"), ","), x => x.cast("long")).as("q"))
  }

  /** The declared row's full composition: freeze the model on the
    * snapshot (dumped for the oracle), script N epochs of changes (raw
    * ops dumped for the oracle), run them through the real streaming
    * path (slot scan → envelope parse → retraction deltas →
    * [[applyEpoch]] per trigger, checkpointed), then serve the stride
    * query workload (drawn from the FINAL live state) off the
    * maintained index. The oracle re-derives the identical search from
    * a FULL REBUILD of the replica fold — equality after N epochs is
    * the maintained-index correctness theorem. Temp dirs are removed
    * after the result materializes (no per-run leaks). */
  def cdcMaintainAndSearch(spark: SparkSession, emb: DataFrame,
      centroidPath: String, codebookPath: String, opsDumpPath: String,
      epochs: Int = 3, k: Int = PqTopK, nprobe: Int = IvfAdcProbe)
      : DataFrame = {
    val m = cdcMaintain(spark, emb, centroidPath, codebookPath,
      opsDumpPath, epochs)
    val live = foldOps(spark.read.parquet(opsDumpPath))
    val qs = live.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    searchIndex(spark, m.indexPath, live, qs, m.cents, m.cb, k, nprobe)
      .orderBy("query_id", "rank")
  }

  /** Handle to a session's maintained artifact — the serve phase's
    * whole dependency. */
  final case class MaintainedAnn(indexPath: String,
      cents: Seq[Seq[Long]], cb: Seq[Seq[Seq[Long]]])

  /** The stream-and-maintain pass, memoized per (session, ops path) —
    * [[MaintainedMemo]]'s doctrine: the fixture stream is
    * deterministic, so one pass per JVM serves every later invocation
    * (Bench's warm + timed passes; its timed `cdc_maint_shared_pass`
    * line pays this cost explicitly after the reset). The change-log
    * and checkpoint temp dirs are removed (with the provider unload)
    * as soon as the stream finishes; the index artifact lives until
    * JVM exit. */
  def cdcMaintain(spark: SparkSession, emb: DataFrame,
      centroidPath: String, codebookPath: String, opsDumpPath: String,
      epochs: Int = 3): MaintainedAnn =
    MaintainedMemo.maintained((spark, "anncdc", opsDumpPath)) {
      import spark.implicits._
      val (cents, cb) = Similarity.ivfAdcModel(emb, centroidPath,
        codebookPath)
      // harness-side script rendering (bounded: the fixture snapshot);
      // the engine sees only the change-log files
      val snap: Seq[(Long, Array[Long])] =
        Similarity.quantized(emb).select("vec_id", "q").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
      val ops = epochScript(snap, epochs)
      ops.map(o => (o.lsn, o.action, o.vecId, o.emb.orNull))
        .toDF("lsn", "action", "vec_id", "emb")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(opsDumpPath)
      val changeDir = Files.createTempDirectory("graft-anncdc-log").toString
      val ckptDir = Files.createTempDirectory("graft-anncdc-ckpt").toString
      val idxRoot = MaintainedMemo.keepUntilExit(
        Files.createTempDirectory("graft-anncdc-idx").toString)
      val indexPath = s"$idxRoot/index"
      try {
        ops.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (e, group) =>
          ChangeGen.writeLineBatches(changeDir,
            group.sortBy(_.lsn).map(toLine), batches = 1, startIndex = e)
        }
        // maintenance width + AQE off for the whole span
        // (StreamHygiene.withMaintainConf — TextIndex's rationale)
        graft.streaming.StreamHygiene.withMaintainConf(spark,
            MicroShuffle) {
          val q = Ivm.mtDeltas(MultiTable.parseAll(
              ChangeSource.rawLines(spark, changeDir, Some(1)), Seq(EmbSpec)))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckptDir)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: Dataset[MtDelta], _: Long) =>
              applyEpoch(spark, batch, indexPath, cents, cb); ()
            }
            .start()
          try q.awaitTermination() finally q.stop()
        }
        MaintainedAnn(indexPath, cents, cb)
      } finally graft.streaming.StreamHygiene.cleanupRun(
        Seq(changeDir, ckptDir), owner = Some(spark))
    }

  /** Handle to a re-balanced maintained artifact: the quantizer is
    * (frozen root, genealogy LOG) — the serving state includes the
    * log and the engine-maintained replica. */
  final case class MaintainedAnnLog(indexPath: String,
      replicaPath: String, logPath: String, root: Seq[Seq[Long]],
      cb: Seq[Seq[Seq[Long]]])

  /** The declared in-stream re-balance composition on the IVF layout
    * (`ml_ann_stream_split`): the [[cdcMaintain]] stream with
    * [[applyEpochRebalanced]] as the trigger body — hot TOUCHED cells
    * split INSIDE their epoch via the write-ahead genealogy log, and
    * the epoch's replica lands first so split training reads real
    * member vectors. The split threshold is 1.05× the snapshot's mean
    * cell mass: fixture cluster masses are near-uniform (unlike the
    * Zipf term skew the text row rides), so the margin is thin by
    * design — the snapshot epoch pushes the fuller clusters over it,
    * later epochs' churn re-triggers at most a handful of times, and
    * split children (~half the parent) fall safely below. Serves the
    * stride workload (drawn from the maintained REPLICA — the engine's
    * own state, not a harness fold) through the quantizer
    * reconstructed from root + LOG. */
  def cdcMaintainAndSearchRebalanced(spark: SparkSession,
      emb: DataFrame, centroidPath: String, codebookPath: String,
      opsDumpPath: String, logDumpPath: String, epochs: Int = 3,
      k: Int = PqTopK, nprobe: Int = IvfAdcProbe): DataFrame = {
    val m = cdcMaintainRebalanced(spark, emb, centroidPath,
      codebookPath, opsDumpPath, logDumpPath, epochs)
    val cents = centsAfter(m.root,
      loadSplitLog(spark, m.logPath).map(_._2))
    val live = readReplica(spark, m.replicaPath)
    val qs = live.filter(col("vec_id") % QueryStride === 0)
      .select(col("vec_id").as("query_id"), col("q").as("qq"))
    searchIndex(spark, m.indexPath, live, qs, cents, m.cb, k, nprobe)
      .orderBy("query_id", "rank")
  }

  /** The re-balanced stream-and-maintain pass, memoized per (session,
    * ops path). The genealogy log lives AT the dump path (it IS the
    * oracle's input — wiped at build start so a previous JVM's log
    * cannot leak into this run's epochs 0..N). */
  def cdcMaintainRebalanced(spark: SparkSession, emb: DataFrame,
      centroidPath: String, codebookPath: String, opsDumpPath: String,
      logDumpPath: String, epochs: Int = 3): MaintainedAnnLog =
    MaintainedMemo.maintained((spark, "annss", opsDumpPath)) {
      import spark.implicits._
      val (root, cb) = Similarity.ivfAdcModel(emb, centroidPath,
        codebookPath)
      val snap: Seq[(Long, Array[Long])] =
        Similarity.quantized(emb).select("vec_id", "q").collect()
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray)).toSeq
      // 1.05× the snapshot's mean cell mass (see Scaladoc above)
      val maxRows = snap.size.toLong * 105 / (100 * root.length)
      val ops = epochScript(snap, epochs)
      ops.map(o => (o.lsn, o.action, o.vecId, o.emb.orNull))
        .toDF("lsn", "action", "vec_id", "emb")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(opsDumpPath)
      IndexFs.deleteDir(spark, logDumpPath)
      val changeDir = Files.createTempDirectory("graft-annss-log").toString
      val ckptDir = Files.createTempDirectory("graft-annss-ckpt").toString
      val idxRoot = MaintainedMemo.keepUntilExit(
        Files.createTempDirectory("graft-annss-idx").toString)
      val indexPath = s"$idxRoot/index"
      val replicaPath = s"$idxRoot/replica"
      try {
        ops.groupBy(_.epoch).toSeq.sortBy(_._1).foreach { case (e, group) =>
          ChangeGen.writeLineBatches(changeDir,
            group.sortBy(_.lsn).map(toLine), batches = 1, startIndex = e)
        }
        // maintenance width + AQE off for the whole span
        // (StreamHygiene.withMaintainConf — TextIndex's rationale)
        graft.streaming.StreamHygiene.withMaintainConf(spark,
            MicroShuffle) {
          val q = Ivm.mtDeltas(MultiTable.parseAll(
              ChangeSource.rawLines(spark, changeDir, Some(1)), Seq(EmbSpec)))
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckptDir)
            .trigger(Trigger.AvailableNow())
            .foreachBatch { (batch: Dataset[MtDelta], bid: Long) =>
              applyEpochRebalanced(spark, batch, indexPath, replicaPath,
                logDumpPath, root, cb, bid, maxRows); ()
            }
            .start()
          try q.awaitTermination() finally q.stop()
        }
        MaintainedAnnLog(indexPath, replicaPath, logDumpPath, root, cb)
      } finally graft.streaming.StreamHygiene.cleanupRun(
        Seq(changeDir, ckptDir), owner = Some(spark))
    }

}
