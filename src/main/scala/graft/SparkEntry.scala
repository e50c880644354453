package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cdc.CdcQueries
import graft.ml.MlQueries
import graft.sql.{Declared, Relational, SqlQueries}
import graft.streaming.WindowQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every declared operator (SURVEY.md §2 inventory +
  * beyond-reference ML/data-pipeline ops); `oracleSql` carries the DuckDB
  * equivalent for each SQL-expressible one.
  */
object SparkEntry {
  private def declared: Seq[Declared] =
    Relational.all ++ SqlQueries.all ++ CdcQueries.all ++ MlQueries.all ++
      WindowQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "j_q3_shipping").get
      .run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(d => d.name -> d.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    declared.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
