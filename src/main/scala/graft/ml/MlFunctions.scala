package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level primitives for the LLM-data-pipeline operators.
  *
  * Everything here is designed to be **bit-identical between Spark and
  * the DuckDB oracle** (the driver's compare is exact equality, not
  * approximate):
  *
  *  - [[hash60]]: 60-bit integer hash via md5 hex — both engines compute
  *    standard md5 over UTF-8 and parse the same 15 hex chars, so the
  *    values agree exactly. 60 bits < 63 keeps it positive in an int64.
  *  - [[quantize]]: embeddings (float32) are mapped to fixed-point int64
  *    at scale 2^20. Scaling a float32 by a power of two is exact in
  *    double arithmetic, so the rounded integer is engine-independent,
  *    and all downstream dot products / norms are *integer* sums —
  *    order-free, hence identical under any partitioning AND equal to
  *    DuckDB's single-threaded result. The final `int / (sqrt·sqrt)` is
  *    IEEE-deterministic given equal integer inputs. (This is also the
  *    standard production trick — int8/int16 quantized ANN — scaled up.)
  *
  * All expressions are Spark built-ins → whole-stage codegen, no UDFs.
  */
/** JVM-side twin of [[MlFunctions.hash60]] for deriving plan-time
  * constants (hash-family coefficients) from the same primitive. */
object Hash60 {
  def of(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
}

object MlFunctions {
  /** Fixed-point scale for embedding quantization (2^20). */
  val QScale = 1048576L

  /** 60-bit non-negative hash of a string column, reproducible in ANSI
    * SQL as `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash families from one md5 by prefixing
    * the seed (`h:payload`). */
  def hash60Seeded(seed: Column, payload: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), payload))

  /** Round-robin repartition to the session's core count, placed before
    * a per-doc derivation whose HEAVY work (md5 chains, sliding-window
    * hashing) runs BEFORE the plan's first exchange. The doc rows are
    * the small payload of those ops — each doc amplifies to hundreds of
    * derived rows and thousands of md5s — so balancing cores costs
    * doc-bytes and removes input-layout skew; without it a
    * single-row-group parquet input (small files, hot fixtures) pins the
    * whole derivation to ONE core (measured 4.8× on winnowing at
    * sf0.1). Applies to winnowing AND (since its round-5 native
    * rewrite moved all hashing scan-side) simhash. Do NOT apply where
    * the first aggregation's exchange already sits upstream of the
    * heavy work (TF-IDF's hash after its token agg): there the extra
    * exchange is pure cost (measured ~25% slower). At 100 TB the same
    * tradeoff holds per-partition. */
  def spread(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)

  /** Array[Float] → Array[Long] fixed-point quantization.
    * `floor(x + 0.5)` rather than `round` so both engines share one
    * rounding rule regardless of their round-half conventions. */
  def quantize(c: Column): Column =
    transform(c,
      v => floor(v.cast("double") * QScale + lit(0.5)).cast("long"))

  /** Exact integer dot product of two quantized vectors, via the native
    * fused-loop expression ([[graft.functions.DotProductLong]]). Integer
    * sums are order-free, so the value is identical to a fold at any
    * parallelism — and to the DuckDB oracle's SQL sum. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotLong(a, b)

  /** Cosine similarity from quantized vectors: integer dot and norms,
    * one double division at the end. The quantization error (~1e-5 on
    * unit-ish vectors) is irrelevant for dedup/ANN semantics and buys
    * exact cross-engine reproducibility. */
  def cosQ(a: Column, b: Column): Column =
    dotQ(a, b).cast("double") /
      (sqrt(dotQ(a, a).cast("double")) * sqrt(dotQ(b, b).cast("double")))

  /** Whitespace tokens of a document (fixture texts are single-spaced
    * `[a-z0-9 ]`). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word k-shingles as an array column: positions 1..n-k+1, each the
    * space-joined window of k tokens. Empty for docs shorter than k. */
  def shingles(text: Column, k: Int = 3): Column =
    shinglesOf(tokens(text), k)

  private[ml] def shinglesOf(toks: Column, k: Int): Column =
    // sequence(1, n) counts DOWN when n < 1 — guard short docs explicitly
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** (doc_id, sh) shingle rows with the tokenization HOISTED into its own
    * projection. Building shingles straight off `text` splices
    * `split(text)` into every element_at — k re-tokenizations per shingle,
    * ~8× slower end-to-end (measured at sf0.1). Catalyst keeps the
    * intermediate Project, so the split runs once per doc. */
  def shingleRows(docs: org.apache.spark.sql.DataFrame, k: Int = 3)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(shinglesOf(col("tk"), k)).as("sh"))
}
