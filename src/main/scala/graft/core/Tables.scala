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
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects
      // outright; read it as a long and rebuild a TimestampType column.
      // Fixture nanos are µs-aligned (TESTDATA), so `DIV 1000` is exact.
      // ParquetOptions has no per-read key for this, so the legacy conf is
      // the only lever; guard it so the session conf is written at most
      // once (the driver may run these queries in a session it built).
      if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}
