package graft

import org.apache.spark.sql.types._
import graft.cdc.TableSpec

/** The shared two-table fixture for every multi-table suite — one
  * definition so a schema change cannot silently diverge across
  * suites (r6 review: the pair had been copy-pasted into four files). */
object MtTestSpecs {
  val person = TableSpec("person", "id", Some("created_at"),
    StructType(Seq(StructField("id", IntegerType),
      StructField("name", StringType), StructField("uid", StringType),
      StructField("score", IntegerType),
      StructField("created_at", TimestampType))))
  val account = TableSpec("account", "id", Some("created_at"),
    StructType(Seq(StructField("id", IntegerType),
      StructField("owner", StringType),
      StructField("balance", IntegerType),
      StructField("created_at", TimestampType))))
  val both = Seq(person, account)
}
