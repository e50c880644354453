package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link analysis over the k-NN embedding graph — PageRank (Brin & Page,
  * WWW'98) as the hubness diagnostic a training-data pipeline runs on
  * its similarity structure: vectors that sit in many top-k lists
  * (embedding-space hubs) score high, and hub inflation is a standard
  * symptom of degenerate embeddings / duplicate clusters. Completes the
  * iterative-graph family next to connected components (L27).
  *
  * Exactness: ranks are integer fixed-point at [[PrScale]] — each
  * update is `base + (85 · Σ floor(pr(u)/deg(u))) div 100` with every
  * division a positive-integer floor, so the whole iteration is
  * order-free integer arithmetic, bit-identical at any parallelism and
  * to the DuckDB oracle, which re-runs the SAME [[PrIters]] iterations
  * as unrolled CTEs (the L60 BPE oracle pattern).
  *
  * Scale: edges = one corpus-scan top-k (the [[Similarity.cosineTopK]]
  * plan — queries broadcast, corpus never exchanges) + a union;
  * each iteration is one keyed join pr⋈edges on src and one dst
  * aggregate — the standard two-shuffle PageRank round, with
  * `localCheckpoint` per round for O(1) lineage. The graph cardinality
  * enters only as a COUNT (one scalar job, no collect of nodes). */
object GraphOps {
  /** Fixed-point scale for rank mass (10^9). */
  val PrScale = 1000000000L

  /** Damping d = 85/100 (the canonical 0.85, kept rational). */
  val PrDampNum = 85L

  /** Power-iteration rounds (unrolled verbatim in the oracle). */
  val PrIters = 4

  /** Undirected k-NN edge list: each query's top-k neighbor pairs plus
    * their reverses (symmetrized so every node has outdegree ≥ 1 — no
    * dangling-mass special case). */
  def knnEdges(emb: DataFrame): DataFrame = {
    val e = Similarity.cosineTopK(emb)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** PageRank over [[knnEdges]]. Emits (vec_id, deg, pr_fp) ordered by
    * rank mass descending. */
  def pageRank(emb: DataFrame): DataFrame = {
    val edges = knnEdges(emb).localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val nodes = edges.select(col("src").as("id")).distinct()
      .localCheckpoint()
    val n = nodes.count()
    val base = (15L * PrScale) / (100L * n)
    var pr = nodes.select(col("id"), lit(PrScale / n).as("pr"))
    for (_ <- 1 to PrIters) {
      val inflow = edges
        .join(pr.withColumnRenamed("id", "src"), "src")
        .join(deg, "src")
        .selectExpr("dst AS id", "pr div deg AS share")
        .groupBy("id").agg(sum("share").as("inflow"))
      pr = nodes.join(inflow, Seq("id"), "left")
        .selectExpr("id",
          s"$base + ($PrDampNum * coalesce(inflow, 0L)) div 100 AS pr")
        .localCheckpoint()
    }
    pr.join(deg.withColumnRenamed("src", "id"), "id")
      .select(col("id").as("vec_id"), col("deg"), col("pr").as("pr_fp"))
      .orderBy(col("pr_fp").desc, col("vec_id"))
  }
}
