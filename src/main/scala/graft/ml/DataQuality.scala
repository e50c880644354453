package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the unit-test-for-data
  * gate (Deequ: Schelter et al., VLDB'18) a training-data pipeline runs
  * before promoting a corpus snapshot, and the batch generalization of
  * the reference's own convergence oracle (verify/main.go's
  * source/target count parity is exactly a two-metric suite; see
  * [[graft.cdc.Monitor]] for the streaming twin).
  *
  * Each constraint row reports its metric as an exact integer rational
  * (`metric_num` / `metric_den`) plus the IEEE quotient (`value` — one
  * int/int double division, bit-identical across engines) and an
  * integer `passed` verdict, so a failed gate is auditable: the metric
  * that tripped it ships WITH the verdict. The suite is intentionally
  * not all-green on the fixtures — `max_n_chars` has a real failing
  * bound so both verdict polarities are exercised end-to-end.
  *
  * Scale: ONE corpus scan — every metric is an aggregate of the same
  * `agg` (map-side combined; the two COUNT DISTINCTs expand the scan
  * 2×, the standard exact-uniqueness cost — at 100 TB swap in the HLL
  * sketch declared as `agg_approx_distinct` and gate on the estimate
  * envelope instead), then a constant 8-row `stack`. No joins, no
  * window, nothing driver-side: the result is CONSTANT-sized regardless
  * of corpus size.
  */
object DataQuality {
  /** min(n_chars) lower bound: shortest acceptable document. */
  val MinChars = 32L
  /** max(n_chars) upper bound — tighter than the fixture's tail, so the
    * constraint FAILS (the suite demonstrates a tripped gate). */
  val MaxChars = 512L
  /** mean n_chars acceptance band (num/den cross-multiplied — exact). */
  val MeanLo = 64L
  val MeanHi = 512L
  /** Source-cardinality ceiling (a mixture sanity bound). */
  val MaxSources = 32L
  /** The allowed language set (the corpus contract). */
  val Langs: Seq[String] = Seq("de", "en", "es", "fr", "zh")

  /** Run the suite over `documents`. Emits one row per constraint:
    * (constraint_name, metric_num, metric_den, metric_value, passed). */
  def suite(docs: DataFrame): DataFrame = {
    val agg = docs.agg(
      count(lit(1)).as("n"),
      count(when(col("text").isNotNull && length(col("text")) > 0, 1))
        .as("txt_ok"),
      countDistinct(col("doc_id")).as("ids"),
      countDistinct(col("source")).as("srcs"),
      min(col("n_chars")).as("min_c"),
      max(col("n_chars")).as("max_c"),
      sum(col("n_chars")).as("sum_c"),
      count(when(col("lang").isin(Langs: _*), 1)).as("lang_ok"),
      count(when(col("doc_id") >= 0, 1)).as("id_ok"))
    agg.selectExpr(
      s"""stack(8,
         |  'completeness_text', txt_ok, n, CAST(txt_ok = n AS INT),
         |  'doc_id_non_negative', id_ok, n, CAST(id_ok = n AS INT),
         |  'lang_in_set', lang_ok, n, CAST(lang_ok = n AS INT),
         |  'max_n_chars', max_c, CAST(1 AS BIGINT),
         |    CAST(max_c <= $MaxChars AS INT),
         |  'max_sources', srcs, CAST(1 AS BIGINT),
         |    CAST(srcs <= $MaxSources AS INT),
         |  'mean_n_chars_band', sum_c, n,
         |    CAST($MeanLo * n <= sum_c AND sum_c <= $MeanHi * n AS INT),
         |  'min_n_chars', min_c, CAST(1 AS BIGINT),
         |    CAST(min_c >= $MinChars AS INT),
         |  'uniqueness_doc_id', ids, n, CAST(ids = n AS INT)
         |) AS (constraint_name, metric_num, metric_den, passed)""".stripMargin)
      .select(col("constraint_name"), col("metric_num"), col("metric_den"),
        (col("metric_num").cast("double") / col("metric_den"))
          .as("metric_value"),
        col("passed"))
      .orderBy("constraint_name")
  }
}
