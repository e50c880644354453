package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Parse wal2json v2 change lines into typed [[PersonChange]] rows.
  *
  * Reference dataflow: `pg_logical_slot_get_changes` → `json.Unmarshal` →
  * route/filter → apply (replicator/main.go:159-193). Here the whole parse
  * + pivot + filter is ONE narrow codegen'd stage — no shuffle until the
  * keyed apply, so at 100 TB/day of change volume it scales linearly with
  * executors reading the source partitions.
  *
  * Malformed JSON lines parse to null and are dropped, mirroring the
  * reference's log-and-continue (replicator/main.go:186-188); count them
  * with [[malformedCount]] in batch audits.
  */
object ChangeSource {
  import Wal2JsonSchema._

  /** Batch read of a change-log directory. */
  def readBatch(spark: SparkSession, dir: String): Dataset[PersonChange] =
    parse(spark.read.text(dir))

  /** Streaming read — the S2 slot-scan analog. File source here; in
    * production swap `.format("kafka")` + the Debezium envelope, the
    * downstream plan is identical. Checkpointed offsets upgrade the
    * reference's destructive at-most-once slot read to exactly-once
    * (SURVEY.md §2.9 T2). */
  def readStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): Dataset[PersonChange] =
    parse(rawLines(spark, dir, maxFilesPerTrigger))

  /** Raw change-log lines as an unparsed streaming frame — the ONE
    * reader every pipeline variant shares (single-table, multi-table,
    * both commit protocols), so a new source option or the documented
    * Kafka swap lands in one place instead of drifting across three
    * hand-rolled copies (r6 review). */
  def rawLines(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream.format("text")
    maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .load(dir)
  }

  /** Lines that failed to parse (batch-side audit). */
  def malformedCount(spark: SparkSession, dir: String): Long =
    spark.read.text(dir)
      .select(from_json(col("value"), envelope).as("c"))
      .filter(col("c").isNull || col("c.action").isNull)
      .count()

  /** Envelope extended with a corrupt-record capture column: Spark's
    * PERMISSIVE from_json never nulls the struct (a malformed line
    * yields all-null FIELDS, indistinguishable from a valid object
    * missing them) — the corrupt column is the reliable malformed
    * signal. */
  private val quarantineSchema =
    envelope.add(org.apache.spark.sql.types.StructField("_corrupt",
      org.apache.spark.sql.types.StringType))

  /** T9 upgraded from drop-and-count to full dead-letter routing: every
    * raw line gets a verdict — `malformed_json` (unparseable),
    * `bad_action` (action missing or ∉ I/U/D), `unknown_table` (routing
    * reject, replicator/main.go:191-193), `missing_id` (no PK in either
    * image), or `ok`. One narrow codegen'd projection, no shuffle; a
    * production pipeline writes the non-ok rows to a quarantine sink and
    * feeds the `ok` rows to [[parse]]. */
  def classify(lines: DataFrame): DataFrame = {
    val c = from_json(col("value"), quarantineSchema,
      Map("columnNameOfCorruptRecord" -> "_corrupt"))
    // existence check, NOT a map build: map_from_arrays throws
    // DUPLICATED_MAP_KEY on a hostile line with repeated column names —
    // a classifier must never be crashable by the input it routes. Also
    // keeps the verdict aligned with the DuckDB oracle, which tests for
    // a column NAMED id (value castability is the parser's concern).
    def hasId(arr: Column): Column =
      coalesce(exists(arr, x => x.getField("name") === "id"), lit(false))
    lines.select(col("value"), c.as("c"))
      .select(col("value"),
        when(col("c._corrupt").isNotNull, lit("malformed_json"))
          .when(coalesce(col("c.action").isin("I", "U", "D"), lit(false))
            === false, lit("bad_action"))
          .when(coalesce(col("c.table"), lit("")) =!= "person",
            lit("unknown_table"))
          .when(!hasId(col("c.columns")) && !hasId(col("c.identity")),
            lit("missing_id"))
          .otherwise(lit("ok")).as("verdict"))
  }

  /** Quarantine audit: line counts by verdict. */
  def quarantineSummary(lines: DataFrame): DataFrame =
    classify(lines).groupBy("verdict").agg(count(lit(1)).as("n"))
      .orderBy("verdict")

  /** envelope JSON → filter table='person' (F2) → pivot columns/identity
    * arrays to a map (X13, map_from_arrays) → typed columns. */
  def parse(lines: DataFrame): Dataset[PersonChange] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .select(from_json(col("value"), envelope).as("c"))
      .filter(col("c").isNotNull && col("c.action").isin("I", "U", "D"))
      .filter(col("c.table") === "person") // replicator/main.go:191-193
      .select(
        col("c.lsn").as("lsn"),
        col("c.action").as("action"),
        map_from_arrays(col("c.columns.name"), col("c.columns.value"))
          .as("cols"),
        map_from_arrays(col("c.identity.name"), col("c.identity.value"))
          .as("ident"))
      .select(
        col("lsn"), col("action"),
        coalesce(element_at(col("cols"), "id"),
          element_at(col("ident"), "id")).cast("int").as("id"),
        element_at(col("cols"), "name").as("name"),
        element_at(col("cols"), "uid").as("uid"),
        element_at(col("cols"), "score").cast("int").as("score"),
        to_timestamp(element_at(col("cols"), "created_at"), tsFormat)
          .as("created_at"))
      .filter(col("id").isNotNull)
      .as[PersonChange]
  }
}
