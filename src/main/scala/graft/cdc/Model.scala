package graft.cdc

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** The replicated user table row (reference `person`,
  * writer/main.go:34-41). UUIDs are canonical 36-char strings — Spark has
  * no UUID type (SURVEY.md §1.2). */
final case class PersonRow(
    id: Int,
    name: String,
    uid: String,
    score: Int,
    created_at: Timestamp)

/** One parsed row-level change, already pivoted from the wal2json v2
  * envelope (replicator/main.go:23-37) to typed columns.
  *
  * `lsn` is the explicit monotonic ordering the reference gets implicitly
  * from single-threaded slot-read order (replicator/main.go:175) — Spark's
  * parallel execution needs it to be a column (SURVEY.md §1.3).
  * New-image fields are None for deletes.
  */
final case class PersonChange(
    lsn: Long,
    action: String, // "I" | "U" | "D"
    id: Int,
    name: Option[String],
    uid: Option[String],
    score: Option[Int],
    created_at: Option[Timestamp])

object Wal2JsonSchema {
  /** wal2json format-version 2 change envelope, one JSON object per line
    * (replicator/main.go:23-37), plus the generator-stamped `lsn`.
    * `value` is declared StringType: Spark's JSON parser copies non-string
    * scalars through as their raw JSON text, which is exactly the
    * "value: any" behavior of the reference's Go struct. */
  val envelope: StructType = {
    val colStruct = ArrayType(StructType(Seq(
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("value", StringType))))
    StructType(Seq(
      StructField("lsn", LongType),
      StructField("action", StringType),
      StructField("timestamp", StringType),
      StructField("schema", StringType),
      StructField("table", StringType),
      StructField("columns", colStruct),
      StructField("identity", colStruct)))
  }

  /** Timestamp format the generator emits and the parser expects — must
    * match exactly (SURVEY.md §7.4). */
  val tsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"
}
