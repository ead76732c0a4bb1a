package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Flagship enrichment pipeline — the Spark-native re-expression of the
  * reference's one continuously-running query (EP1,
  * `/root/reference/processing-layer/stream-processor.py:326-345`):
  * parse JSON engagement events, enrich with a broadcast dimension
  * left-join, derive per-event engagement metrics.
  *
  * Mapping onto the driver testdata (FIXTURES.md role mapping):
  * `events` plays the Kafka `engagement_events` stream (`props` is the
  * JSON payload, `value` the duration-like measure) and `customer`
  * plays the `content` dimension (`c_acctbal` the `length_seconds`-like
  * denominator for the null-guarded ratio metric,
  * `stream-processor.py:275-278`).
  *
  * `transform` is a pure DataFrame→DataFrame function shared verbatim
  * between this batch query and the Structured Streaming pipeline
  * (graft.streaming.EventPipeline) — Spark's unified batch/stream
  * semantics mean one definition serves both (SURVEY.md §7.1 M3).
  *
  * Scale notes (100 TB posture): the dimension side is bounded (a
  * customer/content catalogue), so it is explicitly `broadcast()` —
  * the join is a BroadcastHashJoin with NO shuffle of the 100 TB fact
  * stream; all derived columns are plain Catalyst expressions inside
  * one WholeStageCodegen stage; JSON extraction uses the codegen'd
  * `get_json_object` (Jackson-based, no UDF boundary).
  */
object Enrich {

  /** Parse + typed-cast stage (reference P1-P4,
    * `stream-processor.py:241-248`): extract the JSON prop, normalize
    * types. Works on both batch and streaming DataFrames.
    */
  def parseEvents(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      col("ts"),
      col("user_id"),
      col("event_type"),
      col("value"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k")
    )

  /** Dimension snapshot, pruned to the columns the serving projection
    * needs (reference P5, `stream-processor.py:264`). Pruning here is
    * belt-and-braces: Catalyst's ColumnPruning pushes the projection
    * into the parquet scan regardless.
    */
  def customerDim(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))

  /** Enrichment transform (reference J1 + F4-F6,
    * `stream-processor.py:268-279`): broadcast left-outer equi-join so
    * orphan events survive, then derive
    *  - engagement_seconds = value / 1000 (F4, raw double — IEEE
    *    division is deterministic, no rounding in compared output),
    *  - engagement_pct     = null-guarded ratio (F5) against the
    *    dimension's denominator column.
    */
  def transform(events: DataFrame, dim: DataFrame): DataFrame = {
    parseEvents(events)
      .join(broadcast(dim), col("user_id") === dim("c_custkey"), "left_outer")
      .withColumn("engagement_seconds", col("value") / lit(1000.0))
      .withColumn(
        "engagement_pct",
        when(
          col("c_acctbal").isNotNull && (col("c_acctbal") > lit(0.0)) && col("value").isNotNull,
          col("value") * lit(100.0) / col("c_acctbal")
        )
      )
  }

  /** q_enrich — the flagship as a named batch query (SparkEntry
    * contract). Deterministic ORDER BY on the unique event id for the
    * DuckDB hash compare.
    */
  def qEnrich(spark: SparkSession, sfDir: String): DataFrame =
    transform(Tables.events(spark, sfDir), customerDim(spark, sfDir))
      .orderBy(col("event_id"))

  /** q_enrich_rounded — pins the reference's F6 semantics: the
    * engagement metrics rounded to 2 decimals
    * (`stream-processor.py:275-278` uses `round(x, 2)`). A raw
    * `round()` on doubles is NOT cross-engine comparable (Spark rounds
    * the shortest-repr string, DuckDB the binary value), but a
    * DECIMAL(38,2) cast is: both engines round HALF_UP to the same
    * exact decimal, and the cast back to double is exact. The raw
    * column rides along to show the pre-rounding value survives.
    */
  def qEnrichRounded(spark: SparkSession, sfDir: String): DataFrame =
    transform(Tables.events(spark, sfDir), customerDim(spark, sfDir))
      .select(
        col("event_id"), col("user_id"),
        col("engagement_seconds"),
        col("engagement_seconds").cast("decimal(38,2)").cast("double")
          .as("engagement_seconds_r2"),
        col("engagement_pct"),
        col("engagement_pct").cast("decimal(38,2)").cast("double")
          .as("engagement_pct_r2"))
      .orderBy(col("event_id"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich" -> (qEnrich _),
    "q_enrich_rounded" -> (qEnrichRounded _)
  )

  val oracle: Map[String, String] = Map(
    "q_enrich" ->
      """SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value,
        |       CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS prop_k,
        |       c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
        |       e.value / 1000.0 AS engagement_seconds,
        |       CASE WHEN c.c_acctbal IS NOT NULL AND c.c_acctbal > 0.0 AND e.value IS NOT NULL
        |            THEN e.value * 100.0 / c.c_acctbal END AS engagement_pct
        |FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin,
    "q_enrich_rounded" ->
      """WITH t AS (
        |  SELECT e.event_id, e.user_id,
        |         e.value / 1000.0 AS engagement_seconds,
        |         CASE WHEN c.c_acctbal IS NOT NULL AND c.c_acctbal > 0.0 AND e.value IS NOT NULL
        |              THEN e.value * 100.0 / c.c_acctbal END AS engagement_pct
        |  FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
        |)
        |SELECT event_id, user_id,
        |       engagement_seconds,
        |       CAST(CAST(engagement_seconds AS DECIMAL(38,2)) AS DOUBLE) AS engagement_seconds_r2,
        |       engagement_pct,
        |       CAST(CAST(engagement_pct AS DECIMAL(38,2)) AS DOUBLE) AS engagement_pct_r2
        |FROM t
        |ORDER BY event_id""".stripMargin
  )
}
