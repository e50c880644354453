package graft.ml

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan,
  LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation,
  PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Planning-time manifest pruning over the [[Layout.writeStats]] stats
  * sidecar — the r7 verdict #4 upgrade: instead of collecting a
  * surviving-file list in user code and handing Spark explicit paths,
  * the sidecar becomes a [[FileIndex]], so pruning happens INSIDE query
  * planning: `FileSourceScanExec` calls [[listFiles]] with the
  * already-pushed-down data filters, each file's per-dimension min/max
  * envelope is tested against them, and the scan's own `numFiles`
  * metric records the survivors. This is exactly how the lakehouse
  * formats (Delta's `TahoeFileIndex`, Iceberg's manifest evaluator)
  * wire file skipping into Spark — the engine never sees pruned files
  * at all, and the same DataFrame works for ANY pushable predicate on
  * the stat'd dimensions, not just the one a helper was called with.
  *
  * Scale: the index holds one `(path, envelopes)` row per data file —
  * the same O(files) driver metadata Spark's own `InMemoryFileIndex`
  * keeps for ANY scan (a 100 TB corpus at 1 GB files ≈ 10⁵ rows). The
  * sidecar itself is read once, lazily, through a distributed parquet
  * scan whose result is file-count-sized; no DATA file is opened to
  * plan the query.
  *
  * Envelope logic is conservative: a filter shape the evaluator does
  * not understand keeps the file (correctness never depends on
  * pruning), `null`-intolerant shapes (`IsNotNull`) keep the file, and
  * files missing a stats row are kept. Only a provable
  * cannot-match-this-envelope verdict prunes.
  */
object SidecarFileIndex {
  /** One data file's stat envelopes: column → (min, max), both
    * inclusive, as the sidecar recorded them — plus per-column
    * membership filters (column → set-bit positions of the two md5
    * hash families, [[Layout.BloomBits]] bit-space). */
  final case class FileStats(status: FileStatus,
      bounds: Map[String, (Any, Any)],
      blooms: Map[String, (Set[Long], Set[Long])] = Map.empty)

  /** Build the index for a [[Layout.writeStats]]-described directory.
    * One fs listing (the same metadata op any Spark scan performs) +
    * one tiny sidecar read. */
  def apply(spark: SparkSession, dataDir: String): SidecarFileIndex = {
    val dir = new Path(dataDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byName: Map[String, FileStatus] = fs.listStatus(dir).iterator
      .filter { st =>
        val n = st.getPath.getName
        st.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      .map(st => st.getPath.getName -> st).toMap
    // input_file_name() recorded full URIs; match on the basename
    val sidecar = spark.read.parquet(Layout.statsDir(dataDir))
    // membership filters arrived with the r8 sidecar format; older
    // sidecars (none in-repo, but external dirs may lag) just lose
    // equality pruning, never correctness
    val hasBloom = sidecar.columns.contains("bf0")
    val cols = Seq("file", "lang_min", "lang_max", "n_chars_min",
      "n_chars_max") ++ (if (hasBloom) Seq("bf0", "bf1") else Nil)
    val statRows = sidecar.select(cols.head, cols.tail: _*).collect()
    val stats = statRows.flatMap { r =>
      val name = new Path(r.getString(0)).getName
      byName.get(name).map { st =>
        val blooms = if (hasBloom)
          Map("doc_id" -> ((r.getSeq[Long](5).toSet,
            r.getSeq[Long](6).toSet)))
        else Map.empty[String, (Set[Long], Set[Long])]
        FileStats(st, Map(
          "lang" -> ((r.getString(1), r.getString(2))),
          "n_chars" -> ((r.getLong(3), r.getLong(4)))), blooms)
      }
    }
    // files the sidecar doesn't describe (e.g. written after the last
    // stats refresh) stay scannable with an unbounded envelope
    val described = stats.map(_.status.getPath.getName).toSet
    val undescribed = byName.collect {
      case (n, st) if !described(n) => FileStats(st, Map.empty)
    }
    new SidecarFileIndex(dataDir, stats ++ undescribed)
  }

  /** DataFrame over `dataDir` whose scan prunes files through the
    * sidecar at planning time. Filters applied to the result push into
    * [[SidecarFileIndex.listFiles]] like any file-source scan. */
  def read(spark: SparkSession, dataDir: String): DataFrame = {
    val index = apply(spark, dataDir)
    // schema from the first data file's footer — one metadata read
    val dataSchema = spark.read.parquet(
      index.allFiles.head.getPath.toString).schema
    val relation = HadoopFsRelation(index, StructType(Nil), dataSchema,
      None, new ParquetFileFormat, Map.empty)(spark)
    // the running session is always the classic implementation; the
    // bridge method lives there
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation)
  }
}

final class SidecarFileIndex private (dataDir: String,
    stats: Array[SidecarFileIndex.FileStats]) extends FileIndex {
  import SidecarFileIndex.FileStats

  private[ml] def allFiles: Array[FileStatus] = stats.map(_.status)

  override def rootPaths: Seq[Path] = Seq(new Path(dataDir))
  override def partitionSchema: StructType = StructType(Nil)
  override def sizeInBytes: Long = stats.map(_.status.getLen).sum
  override def inputFiles: Array[String] =
    stats.map(_.status.getPath.toString)
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val surviving = stats.filter(st =>
      dataFilters.forall(f => mayMatch(st, f)))
    Seq(PartitionDirectory(InternalRow.empty,
      surviving.map(_.status)))
  }

  /** Conservative envelope test: false ONLY when the filter provably
    * cannot hold anywhere in the file's (min, max) ranges. */
  private def mayMatch(st: FileStats, e: Expression): Boolean = e match {
    case And(l, r) => mayMatch(st, l) && mayMatch(st, r)
    case Or(l, r) => mayMatch(st, l) || mayMatch(st, r)
    case EqualTo(a: Attribute, Literal(v, _)) =>
      overlaps(st, a.name, v, v) && bloomMayContain(st, a.name, v)
    case EqualTo(Literal(v, _), a: Attribute) =>
      overlaps(st, a.name, v, v) && bloomMayContain(st, a.name, v)
    case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
      aboveMin(st, a.name, v) // [v, ∞) ∩ envelope ≠ ∅ ⇔ max ≥ v
    case GreaterThan(a: Attribute, Literal(v, _)) => aboveMin(st, a.name, v)
    case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
      belowMax(st, a.name, v) // (-∞, v] ∩ envelope ≠ ∅ ⇔ min ≤ v
    case LessThan(a: Attribute, Literal(v, _)) => belowMax(st, a.name, v)
    case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
      belowMax(st, a.name, v) // v ≥ col ⇔ col ≤ v
    case GreaterThan(Literal(v, _), a: Attribute) => belowMax(st, a.name, v)
    case LessThanOrEqual(Literal(v, _), a: Attribute) =>
      aboveMin(st, a.name, v)
    case LessThan(Literal(v, _), a: Attribute) => aboveMin(st, a.name, v)
    case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
      list.exists { case Literal(v, _) =>
        overlaps(st, a.name, v, v) && bloomMayContain(st, a.name, v) }
    case IsNotNull(_) => true
    case _ => true // unknown shape: keep the file, never lose rows
  }

  /** Membership-filter test for equality predicates: false ONLY when
    * the file's filter provably excludes the value (no false
    * negatives by construction — both hash families must agree on
    * containment to keep the file). Columns without a filter, and
    * non-integral literals, keep the file. */
  private def bloomMayContain(st: FileStats, col: String, v: Any)
      : Boolean =
    st.blooms.get(col) match {
      case Some((s0, s1)) => norm(v) match {
        case x: Long =>
          s0.contains(Hash60.of(s"bf0:$x") % Layout.BloomBits) &&
            s1.contains(Hash60.of(s"bf1:$x") % Layout.BloomBits)
        case _ => true
      }
      case None => true
    }

  // sidecar values are String (lang) or Long (n_chars); Catalyst
  // literals arrive as UTF8String / integral — normalize then compare
  private def norm(v: Any): Any = v match {
    case s: UTF8String => s.toString
    case i: Int => i.toLong
    case other => other
  }
  private def cmp(a: Any, b: Any): Option[Int] = (norm(a), norm(b)) match {
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case _ => None // incomparable (unexpected type): caller keeps file
  }
  private def overlaps(st: FileStats, col: String, lo: Any, hi: Any)
      : Boolean =
    st.bounds.get(col) match {
      case Some((mn, mx)) =>
        // [lo, hi] ∩ [mn, mx] ≠ ∅ ⇔ lo ≤ mx ∧ hi ≥ mn
        (for { a <- cmp(lo, mx); b <- cmp(hi, mn) }
          yield a <= 0 && b >= 0).getOrElse(true)
      case None => true
    }
  private def aboveMin(st: FileStats, col: String, v: Any): Boolean =
    st.bounds.get(col) match {
      case Some((_, mx)) => cmp(v, mx).forall(_ <= 0)
      case None => true
    }
  private def belowMax(st: FileStats, col: String, v: Any): Boolean =
    st.bounds.get(col) match {
      case Some((mn, _)) => cmp(v, mn).forall(_ >= 0)
      case None => true
    }
}
