package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K3 golden-format fidelity (SURVEY.md §2.2 K3 / §7.3.5): the
  * reference hand-assembles the Redis-fallback JSON from 16 chained
  * concat/lit fragments (`/root/reference/processing-layer/
  * stream-processor.py:135-144` — quoted ids/time/type, unquoted
  * numerics). The engine's idiomatic form is `to_json(struct(...))`.
  * Golden equivalence is on PARSED JSON, not raw strings (the concat
  * form has no spaces; to_json quotes differently) — both parse to the
  * same typed record.
  *
  * Also pins the divergence that motivates the idiomatic form: with
  * any null field the concat chain nulls the ENTIRE payload (concat
  * null-propagates), while to_json simply omits the null field.
  */
class ServingFormatSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (event_id, content_id, user_id, event_time, duration_ms, content_type, engagement_seconds, engagement_pct)
    ("1", "c-9", "u-7", "2024-01-01 10:00:00", 4500L, "video", 4.5, 12.25),
    ("2", "c-3", "u-2", "2024-01-02 11:30:00", 900L, "podcast", 0.9, 1.5))

  private def df = rows.toDF("event_id", "content_id", "user_id", "event_time_s",
      "duration_ms", "content_type", "engagement_seconds", "engagement_pct")
    .withColumn("event_time", col("event_time_s").cast("timestamp"))
    .drop("event_time_s")

  // the reference's exact concat-chain format, re-expressed
  private def refStyle = concat(
    lit("{\"event_id\":\""), col("event_id"), lit("\","),
    lit("\"content_id\":\""), col("content_id"), lit("\","),
    lit("\"user_id\":\""), col("user_id"), lit("\","),
    lit("\"event_time\":\""), col("event_time").cast("string"), lit("\","),
    lit("\"duration_ms\":"), col("duration_ms"), lit(","),
    lit("\"content_type\":\""), col("content_type"), lit("\","),
    lit("\"engagement_seconds\":"), col("engagement_seconds"), lit(","),
    lit("\"engagement_pct\":"), col("engagement_pct"), lit("}"))

  private def idiomatic = to_json(struct(
    col("event_id"), col("content_id"), col("user_id"),
    col("event_time").cast("string").as("event_time"),
    col("duration_ms"), col("content_type"),
    col("engagement_seconds"), col("engagement_pct")))

  private val parsed = StructType(Seq(
    StructField("event_id", StringType), StructField("content_id", StringType),
    StructField("user_id", StringType), StructField("event_time", StringType),
    StructField("duration_ms", LongType), StructField("content_type", StringType),
    StructField("engagement_seconds", DoubleType), StructField("engagement_pct", DoubleType)))

  test("manual-concat and to_json payloads parse to identical records (K3 golden)") {
    val both = df.select(
      from_json(refStyle, parsed).as("ref"),
      from_json(idiomatic, parsed).as("idio"))
    assert(both.filter(col("ref") =!= col("idio")).count() == 0)
    assert(both.filter(col("ref").isNull || col("idio").isNull).count() == 0)
  }

  test("null field: concat chain nulls the whole payload, to_json omits the field (documented divergence)") {
    val withNull = df.withColumn("duration_ms", lit(null).cast("long"))
    val out = withNull.select(refStyle.as("ref"), idiomatic.as("idio")).collect()
    out.foreach { r =>
      assert(r.getAs[Any]("ref") == null) // reference form: payload lost
      val idio = r.getAs[String]("idio")
      assert(idio != null && !idio.contains("duration_ms")) // ours: field omitted
    }
  }
}
