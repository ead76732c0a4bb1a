package graft

/** Plan-shape regression guards: the properties the 100 TB design
  * depends on must survive future refactors — filter/projection
  * pushdown into the parquet scan, broadcast joins for bounded dims,
  * top-k without a full sort, and no shuffle on the fact side of the
  * flagship enrichment.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)

  test("q_filter_project pushes both predicates into the parquet scan") {
    val p = plan("q_filter_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount)")
      || p.contains("LessThan(l_shipdate"), s"missing pushdown:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.02)"), s"missing range pushdown:\n$p")
  }

  test("q_filter_project scan reads only the referenced columns") {
    val p = plan("q_filter_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_tax"),
      s"scan reads unreferenced columns: $readSchema")
  }

  test("q_star_join plans every dimension join as a broadcast hash join") {
    val p = plan("q_star_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"unexpected shuffle join in star:\n$p")
  }

  test("q_topk plans as TakeOrderedAndProject (no full sort)") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("q_enrich fact side has no shuffle before the join (broadcast only)") {
    val p = plan("q_enrich")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    // the ONLY shuffle Exchange allowed is the rangepartitioning for
    // the final deterministic ORDER BY (+ the broadcast exchange)
    val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(p).length
    assert(shuffles == 1, s"expected exactly 1 shuffle (the sort), got $shuffles:\n$p")
    assert(p.contains("rangepartitioning"), s"the one shuffle should be the sort:\n$p")
  }
}
