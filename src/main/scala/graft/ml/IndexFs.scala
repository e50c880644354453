package graft.ml

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The ONE filesystem seam for maintained-index housekeeping
  * (VERDICT r14 #6). The maintained artifacts — ANN cells, inverted
  * text buckets, LSH band/signature stores, export shards, the dedup
  * gate — all do the same three chores between epochs: decide whether
  * an artifact exists yet (the replay-safe read guard), enumerate
  * partition dirs / count their data files (compaction candidacy),
  * and remove a partition an epoch emptied. Before this module each
  * chore went straight at `java.io.File` in five files (17 sites) —
  * fine on the sandbox's local FS, but the deployment story those
  * modules' Scaladocs tell (object store / HDFS behind the same
  * paths) then needs 17 coordinated edits. Routing through Hadoop
  * `FileSystem` (resolved per-path from the session's Hadoop conf,
  * exactly like the replica protocols' rename machinery) makes the
  * object-store swap a configuration change, not a code hunt.
  *
  * Also the home of the empty-root read guard (ADVICE r14 #2):
  * [[hasPartitions]] treats "root exists but holds zero partition
  * dirs" as ABSENT. The previous `new File(path).exists()` guard let
  * an artifact whose every partition an earlier epoch emptied (cleanup
  * deletes partition dirs, keeps the root) reach
  * `spark.read.parquet(root)`, which throws on schema inference over
  * an empty directory.
  */
object IndexFs {
  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Read guard for a maintained artifact: true iff `path` exists AND
    * holds at least one `prefix=` partition dir. */
  def hasPartitions(spark: SparkSession, path: String,
      prefix: String): Boolean = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith(s"$prefix="))
  }

  /** Names of the child dirs directly under `path` (empty if absent). */
  def childDirs(spark: SparkSession, path: String): Seq[String] = {
    val p = new Path(path)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Int values of the `prefix=<int>` partition dirs under `path`,
    * sorted. */
  def partitionValues(spark: SparkSession, path: String,
      prefix: String): Seq[Int] =
    childDirs(spark, path)
      .filter(_.startsWith(s"$prefix="))
      .map(_.stripPrefix(s"$prefix=").toInt).sorted

  /** Data files (hidden/underscore names excluded) directly under
    * `dir`; empty if the dir is absent. */
  def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filterNot(n => n.startsWith(".") || n.startsWith("_")).toSeq
  }

  /** Count of data files directly under `dir` (0 if absent). */
  def dataFileCount(spark: SparkSession, dir: String): Int =
    dataFiles(spark, dir).size

  /** Remove `dir` recursively if present — the emptied-partition
    * cleanup after an epoch retracts a partition's last row. */
  def deleteDir(spark: SparkSession, dir: String): Unit = {
    val p = new Path(dir)
    val fs = fsOf(spark, p)
    if (fs.exists(p)) fs.delete(p, true)
  }
}
