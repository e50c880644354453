package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{array, col, explode, filter, struct}

/** SQL-text entry point (SURVEY.md §2.1 S10): fixtures are declared via
  * Spark SQL DDL (`CREATE TEMPORARY VIEW ... USING parquet` — the
  * engine-native analog of the reference's `CREATE TABLE IF NOT EXISTS`,
  * replicator/main.go:56-65) and the flagship queries are submitted as
  * plain SQL TEXT through `spark.sql` — proving the SQL-first user
  * surface end to end.
  *
  * Every query string here is dialect-neutral ANSI: the exact same text
  * is the DuckDB oracle, so the check is maximally strict — no
  * "equivalent" re-phrasing on either side. Four are the SQL twins of
  * flagship DataFrame queries (same oracle string by construction —
  * looked up from [[Relational.all]], zero drift possible); the fifth,
  * `j_q2_mincost`, is the TPC-H Q2-shaped min-cost-supplier query over
  * the `part` fixture: a correlated scalar aggregate subquery per part
  * (Catalyst decorrelates it to an aggregate + join) with the
  * region/nation dims broadcast on both the outer and inner sides.
  */
object SqlQueries {
  /** Tables the SQL surface declares (events excluded: its TIMESTAMP_NANOS
    * parquet needs the typed rebuild in [[graft.core.Tables]]). */
  private val SqlTables =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings")

  /** S10 DDL path: one `CREATE OR REPLACE TEMPORARY VIEW` per fixture.
    * Temp views over parquet are the idiomatic external-table analog;
    * `saveAsTable` would copy read-only fixtures into a warehouse dir
    * for no semantic gain.
    *
    * Registration is memoized per (session, dir): `CREATE ... USING`
    * resolves the datasource eagerly (one parquet footer read per
    * table), and a real SQL user declares the schema once per session —
    * re-running the DDL before every query statement charged ~0.5 s of
    * pure re-registration to each SQL-text query. */
  private val registeredDir = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]()) // weak: a stopped
  // session must stay collectable, not pinned by this memo

  def registerViews(s: SparkSession, dir: String): Unit =
    registeredDir.synchronized {
      if (registeredDir.get(s) != dir) {
        SqlTables.foreach { n =>
          s.sql(s"CREATE OR REPLACE TEMPORARY VIEW $n " +
            s"USING parquet OPTIONS (path '$dir/$n.parquet')")
        }
        registeredDir.put(s, dir)
      }
    }

  private def sqlDeclared(name: String, sql: String): Declared =
    Declared(name, (s, d) => { registerViews(s, d); s.sql(sql) }, Some(sql))

  /** The DataFrame query's oracle string, reused verbatim as SQL text. */
  private def oracleOf(name: String): String =
    Relational.all.find(_.name == name)
      .getOrElse(sys.error(s"no declared query $name")).oracle
      .getOrElse(sys.error(s"$name has no oracle"))

  /** TPC-H Q2 shape on the available fixtures (no partsupp table, so
    * "supply cost" = the minimum sale price of the (part, supplier) pair
    * in lineitem — min over doubles is arithmetic-free, hence bit-exact
    * across engines). For each small part, the European suppliers whose
    * cost equals the region-wide minimum for that part. */
  private val q2Sql =
    """SELECT p.p_partkey, p.p_name, s.s_name, n.n_name, pc.cost
      |FROM part p
      |JOIN (SELECT l_partkey, l_suppkey, min(l_extendedprice) AS cost
      |      FROM lineitem GROUP BY l_partkey, l_suppkey) pc
      |  ON pc.l_partkey = p.p_partkey
      |JOIN supplier s ON s.s_suppkey = pc.l_suppkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |JOIN region r ON r.r_regionkey = n.n_regionkey
      |WHERE r.r_name = 'EUROPE' AND p.p_size <= 5
      |  AND pc.cost = (
      |    SELECT min(l2.l_extendedprice)
      |    FROM lineitem l2
      |    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      |    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
      |    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      |    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY p.p_partkey, s.s_name""".stripMargin

  /** S10 persistent-catalog path (VERDICT r3 missing #5): CTAS a real
    * catalog table (external parquet, temp location — the fixtures stay
    * read-only) through the session catalog, then query it BY NAME via
    * SQL text. The oracle recomputes the same aggregate straight from
    * the fixture, so the round-trip through the catalog + table files is
    * value-checked end to end. */
  private val catalogCtas = Declared(
    "sql_catalog_ctas",
    (s, d) => {
      registerViews(s, d)
      val loc = java.nio.file.Files
        .createTempDirectory("graft-catalog").toString
      s.sql("DROP TABLE IF EXISTS lineitem_stats_cat")
      s.sql(
        s"""CREATE TABLE lineitem_stats_cat USING parquet
           |LOCATION '$loc/lineitem_stats' AS
           |SELECT l_returnflag, l_linestatus, count(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
           |    AS sum_qty
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus""".stripMargin)
      s.sql(
        """SELECT l_returnflag, l_linestatus, n, sum_qty
          |FROM lineitem_stats_cat
          |WHERE n > 0
          |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    },
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE)
           |    AS sum_qty
           |FROM lineitem
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin))

  /** Recursive CTE (Spark 4's `WITH RECURSIVE` / `UnionLoop`): walk
    * each customer's order-successor chain from their first order,
    * numbering hops recursively. Every order is reached exactly once
    * and `hop` must equal the window `row_number` — the recursion is
    * cross-checked against the non-recursive formulation inside the
    * same result. Dialect-neutral text; DuckDB runs it verbatim.
    *
    * Scale: each recursion level is one keyed join on the successor
    * edge (Catalyst plans `UnionLoop` as iterated micro-plans, the
    * same shape as the CC label-propagation loop in L27); depth is the
    * longest chain, not table size.
    *
    * Measured depth/cost at sf0.1 (r8 verdict #8): max depth 24
    * (150k orders, one customer's longest order chain), total 8.65 s
    * in the clean r8 record ⇒ ~0.36 s per recursion level — each
    * level pays a fixed micro-plan launch plus a keyed join whose
    * probe side SHRINKS as chains terminate, so cost is
    * O(depth · level-launch + Σ live-chain rows); at 100× the data
    * depth grows ~log-slowly with per-customer order counts while the
    * per-level join stays one keyed exchange. The `c.hop < 100` guard
    * is the runaway bound: a pathological/cyclic successor edge
    * truncates at 100 levels IDENTICALLY in both engines (the guard
    * is in the dialect-neutral text, not an engine conf), instead of
    * looping to the engine's recursion ceiling; at 4× the measured
    * depth it is unreachable on real data. */
  private val recursiveChainSql =
    """WITH RECURSIVE nxt AS (
      |  SELECT o_custkey, o_orderkey,
      |         lead(o_orderkey) OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey) AS next_key,
      |         CAST(row_number() OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
      |  FROM orders),
      |chain AS (
      |  SELECT o_custkey, o_orderkey, next_key, seq, 1 AS hop
      |  FROM nxt WHERE seq = 1
      |  UNION ALL
      |  SELECT n.o_custkey, n.o_orderkey, n.next_key, n.seq, c.hop + 1
      |  FROM chain c JOIN nxt n ON n.o_orderkey = c.next_key
      |  WHERE c.hop < 100)
      |SELECT o_custkey, o_orderkey, hop, seq
      |FROM chain ORDER BY o_custkey, hop""".stripMargin

  /** The `nxt` successor-edge table as standalone SQL (the first CTE of
    * [[recursiveChainSql]], verbatim). */
  private val nxtSql =
    """SELECT o_custkey, o_orderkey,
      |       lead(o_orderkey) OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS next_key,
      |       CAST(row_number() OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate, o_orderkey) AS INT) AS seq
      |FROM orders""".stripMargin

  /** The 4-hop successor edge over the materialized `nxt_mat`: one row
    * per order `o1`, carrying its next three successors (LEFT joins —
    * a chain tail keeps its unpaired last orders as NULLs) and the
    * fourth order's own successor as the next frontier key. Built once
    * with three keyed self-joins; quarters the recursion depth. */
  private val nxt4Sql =
    """SELECT a.o_custkey,
      |       a.o_orderkey AS o1, a.seq AS o1_seq,
      |       b.o_orderkey AS o2, b.seq AS o2_seq,
      |       c.o_orderkey AS o3, c.seq AS o3_seq,
      |       d.o_orderkey AS o4, d.seq AS o4_seq, d.next_key AS o4_next
      |FROM nxt_mat a
      |LEFT JOIN nxt_mat b ON b.o_orderkey = a.next_key
      |LEFT JOIN nxt_mat c ON c.o_orderkey = b.next_key
      |LEFT JOIN nxt_mat d ON d.o_orderkey = c.next_key""".stripMargin

  /** [[recursiveChainSql]] rewritten over the 4-hop edge: each level
    * advances FOUR hops (frontier doubling, doubled), so the ~24
    * sequential dependent jobs become ~6. Hop arithmetic stays exact:
    * a quad row at `hop1` (always ≡ 1 mod 4) covers hops `hop1` …
    * `hop1 + 3`; `hop1 < 97` reproduces the original `hop < 100` cap
    * precisely (max emitted hop is 100 in both). The per-hop rows are
    * exploded from the quads OUTSIDE the loop — a single pass, no
    * second reference to the recursive relation (which Catalyst would
    * replay). */
  private val recursiveQuadsSql =
    """WITH RECURSIVE chain4 AS (
      |  SELECT o_custkey, o1, o1_seq, o2, o2_seq, o3, o3_seq,
      |         o4, o4_seq, o4_next, 1 AS hop1
      |  FROM nxt4_mat WHERE o1_seq = 1
      |  UNION ALL
      |  SELECT n.o_custkey, n.o1, n.o1_seq, n.o2, n.o2_seq, n.o3,
      |         n.o3_seq, n.o4, n.o4_seq, n.o4_next, c.hop1 + 4
      |  FROM chain4 c JOIN nxt4_mat n ON n.o1 = c.o4_next
      |  WHERE c.hop1 < 97)
      |SELECT o_custkey, o1, o1_seq, o2, o2_seq, o3, o3_seq,
      |       o4, o4_seq, hop1 FROM chain4""".stripMargin

  /** Engine-side execution strategy for the recursive chain: Catalyst
    * inlines non-recursive CTEs into every `UnionLoop` step, so running
    * [[recursiveChainSql]] verbatim recomputes the successor-edge WINDOW
    * over the whole orders table at each recursion level. Two fixes
    * compose here: (1) `nxt` is materialized once (localCheckpoint →
    * temp view), so a level touches only live chain frontiers; (2) the
    * loop advances over the 4-hop edge [[nxt4Sql]] (frontier
    * quadrupling), cutting the ~24 sequential dependent jobs whose
    * fixed scheduler latency — not data volume — dominates this
    * query's cost to ~6 (VERDICT r12 next #5: it was the slowest
    * declared query and the most contention-amplifying). That is how a
    * recursive query should run at 100 TB: edge relation built once,
    * per-level work proportional to the frontier, and the level COUNT
    * itself engineered down. The ORACLE stays the original
    * single-statement text (DuckDB materializes the CTE itself), so
    * the correctness check is unchanged and maximally strict;
    * RelationalSpec additionally pins the strided execution equal to
    * the verbatim text through Spark. */
  private val recursiveChain = Declared(
    "sql_recursive_chain",
    (s, d) => {
      registerViews(s, d)
      s.sql(nxtSql).localCheckpoint().createOrReplaceTempView("nxt_mat")
      s.sql(nxt4Sql).localCheckpoint().createOrReplaceTempView("nxt4_mat")
      val quads = s.sql(recursiveQuadsSql)
      // split each quad into its one-to-four per-hop rows: struct
      // k/h/s = (orderkey, hop, seq); the filter drops the missing
      // tail of a chain that ends mid-quad
      quads.select(col("o_custkey"),
          explode(filter(array(
            struct(col("o1").as("k"), col("hop1").as("h"),
              col("o1_seq").as("s")),
            struct(col("o2").as("k"), (col("hop1") + 1).as("h"),
              col("o2_seq").as("s")),
            struct(col("o3").as("k"), (col("hop1") + 2).as("h"),
              col("o3_seq").as("s")),
            struct(col("o4").as("k"), (col("hop1") + 3).as("h"),
              col("o4_seq").as("s"))),
            x => x.getField("k").isNotNull)).as("e"))
        .select(col("o_custkey"), col("e.k").as("o_orderkey"),
          col("e.h").as("hop"), col("e.s").as("seq"))
        .orderBy("o_custkey", "hop")
    },
    Some(recursiveChainSql))

  val all: Seq[Declared] = Seq(
    recursiveChain,
    sqlDeclared("sql_q1_pricing", oracleOf("q1_agg_pricing")),
    sqlDeclared("sql_q3_shipping", oracleOf("j_q3_shipping")),
    sqlDeclared("sql_exists_semi", oracleOf("j2_semi_exists")),
    sqlDeclared("sql_topk", oracleOf("o2_topk")),
    sqlDeclared("sql_window_rank", oracleOf("w_rank_topn")),
    sqlDeclared("sql_rollup", oracleOf("agg_rollup")),
    sqlDeclared("sql_set_except", oracleOf("set_except")),
    sqlDeclared("j_q2_mincost", q2Sql),
    catalogCtas)
}
