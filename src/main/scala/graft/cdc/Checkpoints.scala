package graft.cdc

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Checkpoint-directory lifecycle — the replication-slot lifecycle
  * re-expressed (S11: check-exists → drop → create,
  * replicator/main.go:71-93). A Structured Streaming checkpoint plays
  * the slot's role: it pins the resume position of the change stream;
  * dropping it and re-creating means "start capture fresh".
  */
object Checkpoints {
  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `SELECT EXISTS (... pg_replication_slots ...)` analog
    * (replicator/main.go:72-77): a checkpoint exists once the stream has
    * committed its first offsets. */
  def exists(spark: SparkSession, dir: String): Boolean = {
    val f = fs(spark, dir)
    f.exists(new Path(dir, "offsets")) || f.exists(new Path(dir, "metadata"))
  }

  /** `pg_drop_replication_slot` analog (replicator/main.go:79-85). */
  def drop(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).delete(new Path(dir), true)

  /** `pg_create_logical_replication_slot` analog
    * (replicator/main.go:87-93): ensure a clean capture point — drop any
    * previous checkpoint and create the directory fresh. */
  def recreate(spark: SparkSession, dir: String): Unit = {
    drop(spark, dir)
    fs(spark, dir).mkdirs(new Path(dir))
  }
}
