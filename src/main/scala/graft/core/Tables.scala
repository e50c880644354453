package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet fixtures (repo:TESTDATA.md).
  *
  * Every operator takes an `sfDir` so the identical logical plan runs at any
  * scale factor. At cluster scale these become catalog tables; the physical
  * path (vectorized parquet scan + column pruning + predicate pushdown) is
  * unchanged, so plans validated here transfer to the 100 TB layout.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two fixture generations: TIMESTAMP(NANOS)
      // parquet (which Spark 4 rejects outright — read as long via the
      // legacy conf and rebuild; nanos are µs-aligned so `DIV 1000` is
      // exact) and, since the 2026-08-13 regeneration, plain
      // timestamp[us] (isAdjustedToUTC=false → TIMESTAMP_NTZ under
      // Spark 4's inferTimestampNTZ). Normalize BOTH to session-TZ
      // TimestampType (session TZ pinned UTC — wall-clock preserving)
      // so every downstream plan sees one type regardless of which
      // fixture generation is on disk.
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      val ts = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)")
        case org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType =>
          org.apache.spark.sql.functions.col("ts")
            .cast(org.apache.spark.sql.types.TimestampType)
        // fail fast on any other type: a future fixture regeneration
        // shipping ts as e.g. string/double must not silently cast
        // (possibly to nulls) — re-check all fixture schemas instead
        case other => throw new IllegalStateException(
          s"events.ts: unexpected fixture type $other — fixture " +
            "generation changed again; re-check schemas (TESTDATA.md)")
      }
      raw.withColumn("ts", ts)
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
