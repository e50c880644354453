package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout for the curated corpus — Z-order
  * (Morton-curve) clustering, the standard lakehouse technique (public
  * Delta `OPTIMIZE ZORDER BY` / Iceberg sort-order design; Morton '66)
  * for making parquet min/max statistics prune on SEVERAL columns at
  * once.
  *
  * Why it matters at 100 TB: a corpus written sorted by one column
  * skips row groups only for filters on that column. Training-data
  * reads slice by several at once (`lang = 'en' AND n_chars BETWEEN …`)
  * — interleaving the bits of the filter columns into one sort key
  * gives every file a tight min/max envelope in ALL of them, so each
  * dimension's selectivity multiplies into the scan's file-skip rate.
  *
  * Everything here is exact integer bit arithmetic (codegen'd shifts
  * and masks, no hashing, no sampling), so the z-values are
  * bit-identical on any engine — the declared query is oracle-checked
  * against DuckDB computing the same interleave in SQL. Only the FILE
  * BOUNDARIES depend on Spark's range-partitioner sampling; the spec
  * asserts the property that matters (per-file z-ranges are disjoint)
  * rather than the sampled cut points.
  */
object Layout {
  /** Bits per dimension in the interleave (16-bit z-values from two
    * 8-bit lanes: 256 buckets per dimension bounds the rank tables and
    * is plenty to steer file-level skipping). */
  val LaneBits = 8

  /** Morton-interleave two `bits`-wide non-negative lanes: bit i of `a`
    * lands at position 2i, bit i of `b` at 2i+1. One codegen'd
    * shift/mask expression per bit — no UDF, no shuffle. */
  def morton2(a: Column, b: Column, bits: Int = LaneBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL over column expressions `a`/`b` —
    * generated from the SAME loop so Spark and the oracle cannot
    * drift. */
  def morton2Sql(a: String, b: String, bits: Int = LaneBits): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) + ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")

  /** Dictionary rank for the (tiny, known) language dimension. At scale
    * this is a broadcast dictionary; for the fixture langs a CASE chain
    * both engines evaluate identically.
    *
    * The rank is SCALED across the whole lane (`rank · ⌊255/6⌋`): a
    * low-cardinality dimension left in a lane's low bits would never
    * reach the interleave's significant positions, and the curve would
    * degenerate to a plain sort on the other dimension — scaling is
    * monotone, so dimension order is preserved while its bits land
    * where they steer file boundaries. */
  val LangRanks: Seq[(String, Int)] =
    Seq("de" -> 0, "en" -> 1, "es" -> 2, "fr" -> 3, "zh" -> 4)

  val LangLaneStep: Long = ((1L << LaneBits) - 1) / (LangRanks.size + 1)

  def langLane(lang: Column): Column =
    LangRanks.foldRight(lit(LangRanks.size * LangLaneStep)) {
      case ((l, r), els) => when(lang === l, lit(r * LangLaneStep))
        .otherwise(els)
    }

  def langLaneSql(lang: String): String =
    "CASE " + LangRanks.map { case (l, r) =>
      s"WHEN $lang = '$l' THEN ${r * LangLaneStep}" }.mkString(" ") +
      s" ELSE ${LangRanks.size * LangLaneStep} END"

  /** Cap-and-scale a non-negative numeric column into an 8-bit lane:
    * power-of-two bucket width (a shift — exact integer arithmetic on
    * both engines, no sampled quantiles), capped at the lane maximum. */
  def numLane(v: Column, stepBits: Int): Column =
    least(shiftright(v.cast("long"), stepBits), lit((1L << LaneBits) - 1))

  def numLaneSql(v: String, stepBits: Int): String =
    s"least(CAST($v AS BIGINT) >> $stepBits, ${(1L << LaneBits) - 1})"

  /** Z-values for the documents table over (lang, n_chars/16):
    * (doc_id, lang, n_chars, zval). The declared-query surface —
    * ordered by the curve so the oracle compare also pins the curve's
    * total order. */
  val NCharsStepBits = 4

  def zOrder(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
        morton2(langLane(col("lang")),
          numLane(col("n_chars"), NCharsStepBits)).as("zval"))
      .orderBy("zval", "doc_id")

  /** Write `docs` z-clustered: range-partition by z-value (each output
    * file owns one contiguous, DISJOINT z-range ⇒ a tight min/max
    * envelope in every interleaved dimension), sort within partitions,
    * write parquet. `numFiles` is the target file count — at 100 TB,
    * size it to ~1 GB files; the range exchange is the one shuffle and
    * doubles as the write partitioning. */
  def zOrderWrite(docs: DataFrame, outDir: String, numFiles: Int): Unit =
    docs.withColumn("zval",
        morton2(langLane(col("lang")),
          numLane(col("n_chars"), NCharsStepBits)))
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  // ---- Hilbert-curve layout (the locality upgrade over Morton) -------

  /** Hilbert position over the same (lang, n_chars) lanes as [[zOrder]]
    * — the native [[graft.functions.HilbertIndex2]] kernel. Where the
    * Morton curve JUMPS (adjacent z-positions can sit a quadrant
    * apart, so a file's rows can spread over a Z-shaped union), every
    * consecutive Hilbert step is unit-adjacent (spec-pinned
    * exhaustively over the full 2^16-cell grid), so range-partitioned
    * files cover tight rectangles — the reason lakehouse clustering
    * moved from z-order to Hilbert. Identical scale contract: one
    * codegen'd scalar per row, exact integer arithmetic, no shuffle. */
  def hilbertVal(lang: Column, nChars: Column): Column =
    graft.functions.VectorFunctions.hilbert2(
      langLane(lang).cast("long"),
      numLane(nChars, NCharsStepBits).cast("long"), LaneBits)

  def hilbertOrder(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"),
        hilbertVal(col("lang"), col("n_chars")).as("hval"))
      .orderBy("hval", "doc_id")

  /** [[zOrderWrite]]'s Hilbert twin: range-partition by curve position
    * → each file owns one contiguous, disjoint h-range. */
  def hilbertWrite(docs: DataFrame, outDir: String, numFiles: Int): Unit =
    docs.withColumn("hval", hilbertVal(col("lang"), col("n_chars")))
      .repartitionByRange(numFiles, col("hval"))
      .sortWithinPartitions("hval")
      .write.mode(SaveMode.Overwrite).parquet(outDir)

  def hilbertWriteWithStats(docs: DataFrame, outDir: String,
      numFiles: Int): Unit = {
    hilbertWrite(docs, outDir, numFiles)
    writeStats(docs.sparkSession, outDir)
  }

  /** The Hilbert walk as ANSI SQL — the oracle twin of
    * [[graft.functions.HilbertIndex2]], generated from the SAME loop
    * constants so the engines cannot drift. The per-level rotation
    * rewrites both lanes, so a single-expression unroll would grow
    * exponentially; instead each level is ONE chained subquery that
    * re-projects (hx, hy, hd) — `bits` levels, linear text. The XOR in
    * d's accumulator is arithmetic (3rx + ry − 2·rx·ry — equal on the
    * {0,3}×{0,1} domain) so the statement never needs an engine's xor
    * spelling. `keep` columns ride through every level untouched. */
  def hilbert2Sql(xSql: String, ySql: String, keep: Seq[String],
      from: String, bits: Int = LaneBits): String = {
    val n = 1L << bits
    val keepSel = keep.mkString(", ")
    var q = s"SELECT $keepSel, CAST($xSql AS BIGINT) AS hx, " +
      s"CAST($ySql AS BIGINT) AS hy, CAST(0 AS BIGINT) AS hd FROM $from"
    var s = n >> 1
    while (s > 0) {
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      q = s"""SELECT $keepSel,
             |  CASE WHEN $ry = 1 THEN hx
             |       ELSE CASE WHEN $rx = 1 THEN ${n - 1} - hy
             |            ELSE hy END END AS hx,
             |  CASE WHEN $ry = 1 THEN hy
             |       ELSE CASE WHEN $rx = 1 THEN ${n - 1} - hx
             |            ELSE hx END END AS hy,
             |  hd + $s * $s * (3 * $rx + $ry - 2 * $rx * $ry) AS hd
             |FROM ($q)""".stripMargin
      s >>= 1
    }
    q
  }

  /** Per-file (min, max) z-envelopes of a [[zOrderWrite]] output — the
    * skipping evidence: disjoint envelopes mean a reader's z-range
    * predicate prunes whole files. */
  def fileEnvelopes(docs: DataFrame): DataFrame =
    docs.groupBy(input_file_name().as("file"))
      .agg(min("zval").as("z_min"), max("zval").as("z_max"),
        count(lit(1)).as("rows"))

  /** Sidecar stats table colocated with the data. The `_`-prefixed name
    * keeps it invisible to a plain `spark.read.parquet(dataDir)` (the
    * default Hadoop path filter hides `_*`/`.*`), exactly like Spark's
    * own `_SUCCESS`. */
  def statsDir(dataDir: String): String = dataDir + "/_stats"

  /** Write per-file, per-DIMENSION min/max stats for an already-written
    * layout — the Delta add-file-stats / Iceberg manifest-metrics analog
    * built on plain parquet. One row per data file with the (lang,
    * n_chars) envelopes; a z-clustered write makes those envelopes tight
    * in BOTH dimensions at once, which is the whole point of the curve.
    *
    * Scale: the sidecar is O(files) rows (a 100 TB corpus at 1 GB files
    * is ~100k rows — kilobytes per thousand files), so reading it is a
    * metadata operation, not a data scan. */
  /** Bit-space of the per-file doc_id membership filter (two md5 hash
    * families over [[BloomBits]] positions). The sidecar stores each
    * file's SET bit positions as a sorted int array — an explicit-bit
    * bloom filter; production packs the same positions into a bitset,
    * the semantics (no false negatives, rare false positives) are
    * identical. Sized so fixture-scale files (~10²–10³ rows) stay far
    * from saturation; scale it with rows-per-file in production. */
  val BloomBits = 4096L

  def writeStats(spark: org.apache.spark.sql.SparkSession,
      dataDir: String): Unit =
    spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("file"))
      .agg(min("lang").as("lang_min"), max("lang").as("lang_max"),
        min("n_chars").as("n_chars_min"), max("n_chars").as("n_chars_max"),
        count(lit(1)).as("rows"),
        // doc_id membership filter: min/max can't prune a point lookup
        // on a column the layout scatters (z-order clusters (lang,
        // n_chars), so doc_id spans every file) — set-bit positions can
        sort_array(collect_set(
          MlFunctions.hash60Seeded(lit("bf0"), col("doc_id")) % BloomBits))
          .as("bf0"),
        sort_array(collect_set(
          MlFunctions.hash60Seeded(lit("bf1"), col("doc_id")) % BloomBits))
          .as("bf1"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(statsDir(dataDir))

  /** [[zOrderWrite]] + the stats sidecar in one call — the full
    * write-side of the skipping story. */
  def zOrderWriteWithStats(docs: DataFrame, outDir: String,
      numFiles: Int): Unit = {
    zOrderWrite(docs, outDir, numFiles)
    writeStats(docs.sparkSession, outDir)
  }

  /** File-skipping read: the predicate is applied to a scan whose file
    * listing is a [[SidecarFileIndex]], so the sidecar envelopes prune
    * the file list INSIDE query planning (r7 verdict #4 — previously
    * this helper collected the surviving paths itself and handed Spark
    * an explicit list; now `FileSourceScanExec` asks the index with the
    * pushed-down filters, the lakehouse `TahoeFileIndex`/manifest
    * model, and no user-level `collect()` of file lists exists). Plain
    * Spark's parquet path prunes ROW GROUPS from footer stats but still
    * opens every file; manifest-level skipping turns a multi-dimension
    * predicate into `numFiles read ≪ numFiles written` — and it only
    * bites when the layout gives files tight envelopes, i.e. after
    * [[zOrderWrite]]. The scan's own FileSourceScanExec `numFiles`
    * metric records the survivors (spec-asserted). */
  def prunedRead(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      lang: String, nCharsLo: Long, nCharsHi: Long): DataFrame =
    SidecarFileIndex.read(spark, dataDir)
      .filter(col("lang") === lang &&
        col("n_chars").between(nCharsLo, nCharsHi))

  /** [[binPackPlan]] slice budget (chars per planned file). At 100 TB
    * this is the ~1 GB OPTIMIZE target; 16 KiB keeps tens of planned
    * files at fixture scale so the plan structure is exercised. */
  val BinPackTargetChars = 1L << 14

  /** Bin-pack compaction PLAN — [[binPack]]'s deterministic file
    * assignment as a declared, oracle-checkable row (L52, r11 verdict
    * #6): documents lay end-to-end in (hval, doc_id) curve order and
    * slice at [[BinPackTargetChars]] boundaries — a doc belongs to the
    * file its first char lands in (`floor(cum_before / target)`), the
    * same concat-and-slice rule as [[graft.ml.TextAnalysis.sequencePack]]
    * but in CURVE order, which is exactly the discipline [[binPack]]
    * preserves (`repartitionByRange(ceil(total/target), hval)`). Emits
    * the per-file plan: doc count, char mass, and the [h_min, h_max]
    * envelope — contiguous slicing of the curve order makes envelopes
    * DISJOINT by construction, the OPTIMIZE-must-not-undo-clustering
    * contract made visible per file.
    *
    * Scale: hval-range blocks (`hval div 256` — at most 2^(2·[[LaneBits]])
    * /256 = 256 blocks at ANY corpus size, since hval is bounded by the
    * curve geometry, not by n_docs) aggregate in parallel; the bounded block
    * list prefix-sums INSIDE one row via sort_array + posexplode +
    * aggregate() (no global window → no SinglePartition gather of the
    * doc stream); the document-scale window keys on the
    * high-cardinality blk. */
  def binPackPlan(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"),
        col("n_chars").cast("long").as("n_chars"),
        hilbertVal(col("lang"), col("n_chars")).as("hval"))
      .withColumn("blk", expr("hval div 256L"))
    // bounded block subtotals → cumulative offsets, computed inside a
    // single collected-list row (≤512 elements by curve geometry)
    val offsets = h.groupBy("blk")
      .agg(sum(col("n_chars")).as("blk_chars"))
      .agg(sort_array(collect_list(struct(col("blk"), col("blk_chars"))))
        .as("bs"))
      .select(col("bs"), posexplode(col("bs")))
      .select(col("col.blk").as("blk"),
        expr("aggregate(slice(bs, 1, pos), CAST(0 AS BIGINT), " +
          "(a, x) -> a + x.blk_chars)").as("blk_offset"))
    val wLocal = Window.partitionBy("blk").orderBy("hval", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    h.join(broadcast(offsets), Seq("blk"))
      .withColumn("cum_before", col("blk_offset") +
        coalesce(sum(col("n_chars")).over(wLocal), lit(0L)))
      .withColumn("file_id",
        // integral `div`, not Divide: Spark's `/` casts both sides to
        // double, which floors correctly ONLY while the target is a
        // power of two and cum_before < 2^53 — `div` shares DuckDB's
        // integer `//` semantics for ANY constant (ADVICE r12 #2)
        expr(s"cum_before div ${BinPackTargetChars}L"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("file_chars"),
        min(col("hval")).as("h_min"),
        max(col("hval")).as("h_max"))
      .orderBy("file_id")
  }

  /** Small-file compaction — the lakehouse `OPTIMIZE` bin-pack: rewrite
    * a directory whose file population has degraded (streaming appends,
    * per-trigger commits, over-parallel writes) into ~`targetBytes`
    * files. The output file count derives from ACTUAL on-disk bytes
    * (`ceil(totalBytes / targetBytes)`), not row counts, so compressed
    * width skew doesn't produce lopsided files.
    *
    * A [[zOrderWrite]] layout (detected by its `zval` column) is
    * re-packed with the SAME range-partition-by-z discipline, so
    * compaction preserves disjoint per-file z-envelopes — OPTIMIZE must
    * not undo clustering. An existing `_stats` sidecar is recomputed
    * over the new files.
    *
    * Contract: a batch maintenance op over a FLAT directory (no
    * hive-partition subdirs — those need per-partition compaction and
    * this throws on them) with no concurrent writer (the
    * corpus-curation lake path; the CDC replicas have their own
    * fold/lock lifecycle and never use this). The rewrite stages into
    * `<dir>.compact-tmp` and swaps via two renames: the populations
    * never MIX, but a crash between the two renames leaves `dataDir`
    * briefly absent with the old population parked at
    * `<dir>.compact-old` (restore by renaming it back), and readers
    * racing the swap window fail transiently. Rename-atomicity is an
    * HDFS/local-FS contract — object-store deployments should publish
    * via a manifest pointer (the [[graft.cdc.ManifestReplica]] commit
    * shape) instead of directory renames. Returns (filesBefore,
    * filesAfter), both counted from actual on-disk listings.
    *
    * Scale: one job — a read of every small file and one exchange
    * (range by z, or round-robin) sized to the target; at 100 TB with
    * 1 GB targets this is the nightly book-keeping pass every serious
    * lake runs, and its cost is exactly one pass over the compacted
    * partition's bytes. */
  def binPack(spark: org.apache.spark.sql.SparkSession, dataDir: String,
      targetBytes: Long = 1L << 30): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path(dataDir)
    val fs = dir.getFileSystem(hconf)
    val entries = fs.listStatus(dir).toSeq
    // non-recursive listing by contract: a hive-partitioned layout
    // (data files under subdirs) would size to 0 bytes and silently
    // flatten the partition structure — refuse it instead
    val partDirs = entries.filter { st =>
      val n = st.getPath.getName
      st.isDirectory && !n.startsWith("_") && !n.startsWith(".")
    }
    if (partDirs.nonEmpty) throw new IllegalArgumentException(
      s"binPack: $dataDir is not flat (subdir ${partDirs.head.getPath.getName}/) — " +
        "compact hive partitions one directory at a time")
    val dataFiles = entries.filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    val totalBytes = dataFiles.map(_.getLen).sum
    val numFiles = math.max(1L,
      (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dataDir)
    // a curve-clustered layout (Morton zval or Hilbert hval) is
    // re-packed range-by-curve so compaction preserves disjoint
    // per-file envelopes — OPTIMIZE must not undo clustering
    val curveCol = Seq("zval", "hval").find(df.columns.contains)
    val packed = curveCol match {
      case Some(c) =>
        df.repartitionByRange(numFiles, col(c)).sortWithinPartitions(c)
      case None => df.repartition(numFiles)
    }
    val tmp = new org.apache.hadoop.fs.Path(dataDir + ".compact-tmp")
    val old = new org.apache.hadoop.fs.Path(dataDir + ".compact-old")
    fs.delete(tmp, true); fs.delete(old, true)
    packed.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val hadStats = fs.exists(new org.apache.hadoop.fs.Path(statsDir(dataDir)))
    if (!fs.rename(dir, old))
      throw new java.io.IOException(s"compact swap: cannot move $dir aside")
    if (!fs.rename(tmp, dir)) {
      fs.rename(old, dir) // roll back — old population restored
      throw new java.io.IOException(s"compact swap: cannot publish $tmp")
    }
    fs.delete(old, true)
    if (hadStats) writeStats(spark, dataDir)
    // report the ACTUAL post-swap population, not the computed target:
    // range-partitioning by zval can leave empty partitions that write
    // no file, so numFiles can overstate under z-value skew
    val filesAfter = fs.listStatus(dir).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    (dataFiles.size, filesAfter)
  }

}
