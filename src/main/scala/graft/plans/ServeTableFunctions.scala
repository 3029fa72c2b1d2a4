package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL-native entry points for the store-served retrieval tier
  * (VERDICT r11 #7): a pure-SQL user — a BI tool, a notebook session
  * with no Scala — invokes the y55-class serves as TABLE FUNCTIONS,
  *
  *   SELECT * FROM graft_exact_topk('/stores/vec', 'my_queries', 20, 4)
  *   SELECT * FROM graft_hybrid_rrf('/stores/idx', '/stores/vec',
  *                                  'my_queries', 50, 20)
  *   SELECT * FROM graft_ivfadc_topk('/stores/ivfadc', 'embeddings',
  *                                   'my_probes', 6, 100, 10, 8, 64)
  *   SELECT * FROM graft_bm25_topk('/stores/idx', 'spark, shuffle', 10)
  *   SELECT * FROM graft_store_audit('/stores/idx')   -- the fsck
  *
  * where the query/probe argument names a registered VIEW (the
  * query-table discipline: the query side enters the plan as a
  * relation, never a literal list). Each builder resolves the active
  * session, drives the SAME DataFrame serving code the graded queries
  * run — DPP cell pruning, auto-chunking, store resolution through the
  * generation pointer — and splices the resulting analyzed plan in
  * place of the function call, so the SQL form is plan-identical to
  * the DataFrame form by construction (same code path, not a
  * re-implementation).
  *
  * Arguments must be literals (paths, view names, integers): a table
  * function's arguments are resolved at analysis time.
  *
  * COST CONTRACT — these functions PLAN A SERVE at analysis time, and
  * the serve's planning itself runs bounded Spark jobs (the query-table
  * count that decides auto-chunking, the probe-presence check, the
  * ≤ nCells cells read) and pins the serve's scoped caches. `EXPLAIN`
  * over a graft_* call therefore executes those bounded jobs, and
  * repeated analysis without execution accumulates scoped caches until
  * the session's next `Caches.releaseAll()` sweep. That is the price of
  * one shared implementation (plan-identical SQL and DataFrame
  * surfaces); callers who need plan-only inspection should EXPLAIN the
  * DataFrame form inside a managed cache scope. The store geometry
  * (m, dim) is still passed explicitly rather than sniffed from data —
  * geometry must come from the caller's contract, not a data peek. */
object ServeTableFunctions {

  private def litVal(e: Expression, what: String): Any = {
    require(e.foldable, s"$what must be a literal, got $e")
    val v = e.eval()
    require(v != null, s"$what must not be NULL")
    v
  }

  private def str(e: Expression, what: String): String =
    litVal(e, what).toString

  private def int(e: Expression, what: String): Int = litVal(e, what) match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def dbl(e: Expression, what: String): Double = litVal(e, what) match {
    // a SQL `1.2` parses as a DECIMAL literal, whose eval is Spark's
    // own Decimal — not a java.lang.Number subclass
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: java.lang.Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }

  /** graft_exact_topk(vecStorePath, queriesView, k, nprobe0) →
    * (query_id, vec_id, dot, rk). `queriesView` must expose
    * (query_id, probe_id). */
  def exactTopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4,
      "graft_exact_topk(vecStorePath, queriesView, k, nprobe0)")
    val spark = SparkSession.active
    graft.operators.ExactIvf.topDotBatchFromStore(spark,
        str(args(0), "vecStorePath"),
        spark.table(str(args(1), "queriesView")),
        int(args(2), "k"), int(args(3), "nprobe0"))
      .queryExecution.analyzed
  }

  /** graft_hybrid_rrf(indexPath, vecPath, queriesView, kList, kOut
    * [, k1, b, nprobe0]) → (query_id, doc_id, lex_rk, sem_rk, rrf, rk).
    * `queriesView` must expose (query_id, terms ARRAY&lt;STRING&gt;,
    * probe_id); the BM25 constants default to (1.2, 0.75), nprobe0
    * to 4. */
  def hybridRrf(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5 || args.length == 8,
      "graft_hybrid_rrf(indexPath, vecPath, queriesView, kList, kOut" +
        "[, k1, b, nprobe0])")
    val spark = SparkSession.active
    val (k1, b, nprobe0) =
      if (args.length == 8)
        (dbl(args(5), "k1"), dbl(args(6), "b"), int(args(7), "nprobe0"))
      else (1.2, 0.75, 4)
    graft.operators.Retrieval.hybridRrfBatchFromStores(spark,
        str(args(0), "indexPath"), str(args(1), "vecPath"),
        spark.table(str(args(2), "queriesView")),
        int(args(3), "kList"), int(args(4), "kOut"), k1, b, nprobe0)
      .queryExecution.analyzed
  }

  /** graft_bm25_topk(indexPath, termsCsv, k [, k1, b]) →
    * (term, doc_id, tf, score, rk): the store-served BM25 top-k per
    * term. Terms are a comma-separated literal (the lexical analog of
    * the path argument — the distinct-term pushdown genuinely needs
    * literals; a query TABLE belongs to graft_hybrid_rrf). */
  def bm25TopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3 || args.length == 5,
      "graft_bm25_topk(indexPath, termsCsv, k[, k1, b])")
    val spark = SparkSession.active
    val terms = str(args(1), "termsCsv").split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, "termsCsv must name at least one term")
    val (k1, b) =
      if (args.length == 5) (dbl(args(3), "k1"), dbl(args(4), "b"))
      else (1.2, 0.75)
    graft.operators.Retrieval.bm25TopKFromStore(spark,
        str(args(0), "indexPath"), terms, int(args(2), "k"), k1, b)
      .queryExecution.analyzed
  }

  /** graft_store_audit(storeDir [, subDirsCsv]) → the [[graft.streaming
    * .StoreAudit]] findings table (store, check, level, detail) — the
    * store fsck reachable from pure SQL, so an operator dashboard can
    * UNION ALL the estate's stores into one health table without a
    * Scala session. */
  def storeAudit(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 1 || args.length == 2,
      "graft_store_audit(storeDir[, subDirsCsv])")
    val spark = SparkSession.active
    val subs = if (args.length == 2)
      str(args(1), "subDirsCsv").split(",").map(_.trim)
        .filter(_.nonEmpty).toSeq
    else Seq.empty[String]
    graft.streaming.StoreAudit.audit(spark, str(args(0), "storeDir"), subs)
      .queryExecution.analyzed
  }

  /** graft_ivfadc_topk(storePath, embView, probesView, nprobe, kShort,
    * k, m, dim [, vecCol]) → (probe_id, neighbor_id, d2, rk).
    * `probesView` must expose probe_id; `embView` the (vec_id, vecCol)
    * embedding relation used for the exact re-rank. */
  def ivfadcTopK(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 8 || args.length == 9,
      "graft_ivfadc_topk(storePath, embView, probesView, nprobe, " +
        "kShort, k, m, dim[, vecCol])")
    val spark = SparkSession.active
    val vecCol = if (args.length == 9) str(args(8), "vecCol") else "embedding"
    graft.operators.Pq.ivfadcTopKFromStore(spark,
        str(args(0), "storePath"),
        spark.table(str(args(1), "embView")),
        spark.table(str(args(2), "probesView")),
        int(args(3), "nprobe"), int(args(4), "kShort"), int(args(5), "k"),
        int(args(6), "m"), int(args(7), "dim"), vecCol)
      .queryExecution.analyzed
  }
}
