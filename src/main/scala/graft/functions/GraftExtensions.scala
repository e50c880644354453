package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.RegistryBridge
import org.apache.spark.sql.types.IntegerType

/** SQL-surface registration for the native codegen kernels — the
  * `SparkSessionExtensions` entry point that makes the seven custom
  * Catalyst expressions (six scalar kernels + the [[NgramWindows]]
  * generator) first-class SQL functions:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions …
  * spark.sql("SELECT doc_id FROM docs ORDER BY cosine_sim_f(embedding, q) DESC")
  * }}}
  *
  * or, on an already-running session (notebooks, tests):
  * `GraftExtensions.register(spark)`.
  *
  * Both paths share one registration table, so the DataFrame Column API
  * ([[VectorFunctions]]), the SQL extension path, and the in-session
  * registrar cannot drift. The functions resolve to the SAME expression
  * instances the declared queries use — whole-stage-codegen'd, null-safe,
  * with the interpreted fallback as semantic reference.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach(ext.injectFunction)
}

object GraftExtensions {
  // applyOrElse (not try/catch MatchError): only the ARGUMENT-pattern
  // mismatch maps to the usage error — a genuine MatchError raised inside
  // an expression constructor must propagate as the defect it is
  private def one(name: String, usage: String)(
      builder: PartialFunction[Seq[Expression], Expression])
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name),
      args => builder.applyOrElse(args, (_: Seq[Expression]) =>
        throw new IllegalArgumentException(s"$name usage: $usage")))

  /** name → (info, builder) for every native kernel. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    one("cosine_sim_f", "cosine_sim_f(array<float>, array<float>)") {
      case Seq(a, b) => CosineSimFloat(a, b)
    },
    one("dot_product_long", "dot_product_long(array<bigint>, array<bigint>)") {
      case Seq(a, b) => DotProductLong(a, b)
    },
    one("sliding_min_long",
        "sliding_min_long(array<bigint>, <int literal window>)") {
      case Seq(c, Literal(w: Int, IntegerType)) => SlidingMinLong(c, w)
    },
    one("gram_stats", "gram_stats(array<string>)") {
      case Seq(c) => GramStats(c)
    },
    one("simhash_tokens", "simhash_tokens(array<string>)") {
      case Seq(c) => SimHashTokens(c)
    },
    one("ngram_windows", "ngram_windows(array<string>, <int literal n>)") {
      case Seq(c, Literal(n: Int, IntegerType)) => NgramWindows(c, n)
    },
    one("hilbert2", "hilbert2(bigint, bigint, <int literal bits>)") {
      case Seq(a, b, Literal(bits: Int, IntegerType)) =>
        HilbertIndex2(a, b, bits)
    })

  /** Register every kernel into an already-running session's function
    * registry (the extensions conf only applies at session build). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      RegistryBridge.registerFunction(spark, id, info, builder)
    }
}
