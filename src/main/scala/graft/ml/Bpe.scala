package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import MlFunctions._

/** In-engine BPE vocabulary induction + subword encoding (Sennrich et
  * al., ACL'16 §3) — the tokenizer-training step every LLM data
  * pipeline runs before token counting, packing, and sharding.
  *
  * Training follows the paper exactly: start from the character
  * segmentation of the corpus' word-frequency table, then repeat k
  * times — count adjacent symbol pairs (weighted by word frequency),
  * merge the most frequent pair everywhere it occurs. The learned
  * artifact is the ordered merge list; encoding any text = applying
  * the merges in rank order.
  *
  * Scale design (the part that matters at 100 TB):
  *
  *  - The ONLY corpus-scale steps are (a) the word-frequency aggregate
  *    (one map-side-combined shuffle of (word, count) pairs — the
  *    classic word-count) and (b) the final encode pass (one scan).
  *  - The training LOOP never touches the corpus again: it iterates on
  *    the word-frequency table, which is bounded by VOCABULARY, not
  *    corpus size (Heaps' law: ~10⁶ rows at web scale, laptop-sized).
  *    Each round is a pair-count aggregate over that table plus a
  *    1-row argmax collect — the bounded-model-state doctrine
  *    ([[Similarity.kmeansTrain]]'s centroids, PQ's codebooks), with
  *    `localCheckpoint` per round for O(1) lineage.
  *  - Encoding bakes the k merges into a chained literal `replace`
  *    projection — codegen'd string ops, zero joins, zero shuffles
  *    before the per-doc aggregate.
  *
  * Determinism (the oracle contract): segmentations are represented as
  * delimited strings — each symbol wrapped in single commas, adjacent
  * symbols separated by `,,` (corpus text is `[a-z0-9 ]`, so the
  * delimiter never collides). Merging pair (a,b) is then the literal
  * string replace `,a,,b,` → `,ab,`, whose left-to-right non-overlap
  * semantics are identical in Spark and DuckDB AND are exactly BPE's
  * within-word merge convention (`aaa` + merge(a,a) → `aa·a`). Pair
  * counts are integer sums (order-free), ties break lexicographically
  * — so the learned merges, and every encoded token count, are
  * bit-identical to the single-threaded oracle, which re-derives the
  * whole training run as k unrolled SQL CTEs.
  */
object Bpe {
  /** Merge rounds — enough to learn real structure on the fixture
    * corpus while keeping the unrolled oracle SQL reviewable. */
  val Merges = 8

  final case class BpeMerge(merge_rank: Int, lhs: String, rhs: String,
      pair_count: Long)

  /** `[a-z0-9]` chars of `w`, wrapped into the delimited segmentation
    * string `,c1,,c2,,…,cn,`. */
  private val WrapSql =
    "concat(',', array_join(regexp_extract_all(w, '[a-z0-9]', 0), ',,'), ',')"

  /** The word-frequency model — the one corpus-scale training step. */
  private def wordTable(docs: DataFrame): DataFrame =
    docs.select(explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .selectExpr(s"$WrapSql AS s", "freq")

  /** Train k merges on the corpus. Returns them in rank order. */
  def train(docs: DataFrame, k: Int = Merges): Seq[BpeMerge] = {
    var words = wordTable(docs).localCheckpoint()
    val out = Seq.newBuilder[BpeMerge]
    for (rank <- 1 to k) {
      val top = words
        .select(split(expr("trim(BOTH ',' FROM s)"), ",,").as("syms"),
          col("freq"))
        .filter(size(col("syms")) >= 2)
        .selectExpr(
          "explode(transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS lhs, " +
            "element_at(syms, i + 1) AS rhs))) AS p",
          "freq")
        .groupBy("p.lhs", "p.rhs").agg(sum("freq").as("pair_count"))
        .orderBy(col("pair_count").desc, col("lhs"), col("rhs"))
        .head()
      val (l, r, c) =
        (top.getString(0), top.getString(1), top.getLong(2))
      out += BpeMerge(rank, l, r, c)
      val next = words
        .selectExpr(s"replace(s, ',$l,,$r,', ',$l$r,') AS s", "freq")
        .localCheckpoint()
      words.unpersist()
      words = next
    }
    out.result()
  }

  /** The learned merge table as a DataFrame (rank, lhs, rhs, count). */
  def mergeTable(spark: SparkSession, docs: DataFrame,
      k: Int = Merges): DataFrame =
    spark.createDataFrame(train(docs, k)).orderBy("merge_rank")

  /** Encode the corpus with the learned merges: per doc, word count,
    * char-token count, BPE-token count, and the compression ratio
    * (an int/int IEEE division — exact both engines). */
  def encode(docs: DataFrame, k: Int = Merges): DataFrame = {
    val chain = train(docs, k).foldLeft(WrapSql) { (e, m) =>
      s"replace($e, ',${m.lhs},,${m.rhs},', ',${m.lhs}${m.rhs},')"
    }
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .selectExpr("doc_id", "length(w) AS wlen",
        s"size(split(trim(BOTH ',' FROM $chain), ',,')) AS wtoks")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum("wlen").cast("long").as("char_tokens"),
        sum("wtoks").cast("long").as("bpe_tokens"))
      .withColumn("compression",
        col("char_tokens").cast("double") / col("bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Per-language tokenizer fertility report — the disparity metric a
    * multilingual tokenizer review runs before committing a merge
    * table: merges train on the WHOLE corpus, so majority-language
    * byte pairs win the frequency contest and minority languages pay
    * more tokens per word (fertility) and fewer chars per token —
    * the compute-tax / context-budget skew (cf. the fertility analyses
    * of mBERT/XLM-R tokenizers). Per lang: word/char/BPE-token totals,
    * fertility = bpe_tokens/n_words, chars_per_token — counts exact,
    * two IEEE divisions.
    *
    * Scale: same single corpus explode as [[encode]] with the merge
    * chain applied scan-side; the aggregate is map-side combined onto
    * ≤ |langs| groups — model-sized output, no join. */
  def fertility(docs: DataFrame, k: Int = Merges): DataFrame = {
    val chain = train(docs, k).foldLeft(WrapSql) { (e, m) =>
      s"replace($e, ',${m.lhs},,${m.rhs},', ',${m.lhs}${m.rhs},')"
    }
    docs.select(col("lang"), explode(tokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .selectExpr("lang", "length(w) AS wlen",
        s"size(split(trim(BOTH ',' FROM $chain), ',,')) AS wtoks")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum("wlen").cast("long").as("n_chars"),
        sum("wtoks").cast("long").as("bpe_tokens"))
      .withColumn("fertility",
        col("bpe_tokens").cast("double") / col("n_words"))
      .withColumn("chars_per_token",
        col("n_chars").cast("double") / col("bpe_tokens"))
      .orderBy("lang")
  }
}
