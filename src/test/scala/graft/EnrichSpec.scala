package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Enrich
import graft.sources.Tables

/** Pins the flagship enrichment semantics (SURVEY.md §2.3-2.4, §2.7):
  * orphan retention on the left join, null-guarded ratio metric,
  * malformed/missing JSON → null, and per-row metric arithmetic.
  */
class EnrichSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rows: Seq[(Long, String, Long, String, Double, String)]) =
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")

  private val dim = Seq(
    (1L, "Customer#1", "BUILDING", 200.0),
    (2L, "Customer#2", "MACHINERY", -5.0),
    (3L, "Customer#3", "HOUSEHOLD", 0.0)
  ).toDF("c_custkey", "c_name", "c_mktsegment", "c_acctbal")

  test("left join keeps orphan events (J1 semantics)") {
    val ev = mkEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "play", 50.0, """{"k": 1}"""),
      (2L, "2024-01-01 00:00:01", 99L, "play", 10.0, """{"k": 2}""")))
    val out = Enrich.transform(ev, dim).collect().sortBy(_.getAs[Long]("event_id"))
    assert(out.length == 2)
    val orphan = out(1)
    assert(orphan.getAs[Any]("c_custkey") == null)
    assert(orphan.getAs[Any]("engagement_pct") == null)
    assert(orphan.getAs[Double]("engagement_seconds") == 0.01)
  }

  test("engagement_pct null-guard: null, zero and negative denominators (F5)") {
    val ev = mkEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "play", 50.0, "{}"),   // 200.0 → 25.0
      (2L, "2024-01-01 00:00:00", 2L, "play", 50.0, "{}"),   // negative → null
      (3L, "2024-01-01 00:00:00", 3L, "play", 50.0, "{}")))  // zero → null
    val out = Enrich.transform(ev, dim).collect().sortBy(_.getAs[Long]("event_id"))
    assert(out(0).getAs[Double]("engagement_pct") == 25.0)
    assert(out(1).getAs[Any]("engagement_pct") == null)
    assert(out(2).getAs[Any]("engagement_pct") == null)
  }

  test("JSON extraction: missing key and malformed JSON → null (P2 permissive)") {
    val ev = mkEvents(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "play", 1.0, """{"k": 7}"""),
      (2L, "2024-01-01 00:00:00", 1L, "play", 1.0, """{"other": 7}"""),
      (3L, "2024-01-01 00:00:00", 1L, "play", 1.0, """not json at all""")))
    val out = Enrich.parseEvents(ev).collect().sortBy(_.getAs[Long]("event_id"))
    assert(out(0).getAs[Long]("prop_k") == 7L)
    assert(out(1).getAs[Any]("prop_k") == null)
    assert(out(2).getAs[Any]("prop_k") == null)
  }

  test("flagship runs on real testdata with rows > 0 and broadcast join in plan") {
    val df = Enrich.qEnrich(spark, Sf0001)
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }
}
