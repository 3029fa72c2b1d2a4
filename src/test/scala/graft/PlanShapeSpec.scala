package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties the scale review graded
  * (no all-pairs joins in graded queries, no partition-less windows, scans
  * keep pushdown, custom top-k actually plans) asserted on the REAL
  * inventory queries, so a refactor can't silently reintroduce an
  * anti-pattern while staying value-correct. */
class PlanShapeSpec extends AnyFunSuite with SparkTest {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("x04 near-dup is a bucket equi-join, not an all-pairs cross join") {
    val p = plan("x04_neardup_embedding")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q15 scoring has no partition-less window (single-partition collapse)") {
    val p = plan("q15_scoring_weights")
    assert(!p.contains("Window"), p)
  }

  test("x27 cadence derives steps arithmetically — no global window") {
    val p = plan("x27_sink_cadence")
    assert(!p.contains("Window"), p)
  }

  test("q01 scan pushes its filters into the parquet source") {
    val p = plan("q01_scan_filter_project")
    assert(p.contains("PushedFilters: ["), p)
    assert(!p.contains("PushedFilters: []"), p)
  }

  test("q17/x05 top-k plans through the two-phase TopKPerKey operator") {
    for (q <- Seq("q17_similarity_topk", "x05_similarity_lsh")) {
      val p = plan(q)
      assert(p.contains("TopKPerKey"), s"$q lost the custom operator:\n$p")
      assert(p.indexOf("TopKPerKey") != p.lastIndexOf("TopKPerKey"),
        s"$q is not two-phase:\n$p")
    }
  }

  test("x01 minhash pipeline has no pre-aggregation distinct exchange") {
    // signature derivation = explode → project(md5) → partial agg →
    // ONE exchange keyed by doc_id; a reintroduced distinct would add a
    // second exchange keyed by (doc_id, s) upstream of the signature agg.
    val p = plan("x25_minhash_agg")
    val exchanges = "Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size
    assert(exchanges == 1, s"expected one doc_id exchange, got $exchanges:\n$p")
  }
}
