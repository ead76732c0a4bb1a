package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic ID normalization — the engine's replacement for the
  * reference's `ensure_uuid` Python UDF (SURVEY.md §2.8 U1;
  * `/root/reference/processing-layer/stream-processor.py:33-38`,
  * applied at `:43-46`).
  *
  * The reference normalizes parseable UUIDs and mints a RANDOM
  * `uuid4()` for anything else — non-deterministic and non-idempotent,
  * so sink replays write new identities every attempt (SURVEY §2.9
  * T7). The engine's documented divergence: unparseable values get a
  * DETERMINISTIC content-derived ID (md5 digest laid out in the
  * 8-4-4-4-12 UUID shape), so replays are idempotent and the DuckDB
  * oracle can hash-compare the output. (RFC-4122 version/variant bits
  * are deliberately not patched in — the id is a stable key, not a
  * claim of RFC randomness.)
  *
  * Pure string/digest Catalyst expressions — codegen'd, no UDF, no
  * Python-worker row-pickling boundary (the reference pays that per
  * row per column, SURVEY §4.2).
  */
object IdOps {

  private val UuidRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"

  /** Normalize-or-mint: parseable UUID → lowercased as-is; anything
    * else → md5(value) in UUID layout. */
  def uuidNormalize(c: Column): Column = {
    val h = md5(c)
    when(c.rlike(UuidRe), lower(c))
      .otherwise(concat_ws("-",
        substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
        substring(h, 17, 4), substring(h, 21, 12)))
  }

  // U1 applied the way the reference applies it: to the stringified
  // event/user ids ahead of the serving sink, plus a passthrough
  // column proving the already-a-UUID branch.
  private def qUuidNormalize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      uuidNormalize(col("event_id").cast("string")).as("event_uuid"),
      uuidNormalize(col("user_id").cast("string")).as("user_uuid"),
      uuidNormalize(lit("A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11")).as("passthrough_uuid"))
      .orderBy("event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_uuid_normalize" -> (qUuidNormalize _)
  )

  val oracle: Map[String, String] = Map(
    "q_uuid_normalize" ->
      """SELECT event_id,
        |       CASE WHEN regexp_full_match(CAST(event_id AS VARCHAR), '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}')
        |            THEN lower(CAST(event_id AS VARCHAR))
        |            ELSE substr(md5(CAST(event_id AS VARCHAR)), 1, 8) || '-' ||
        |                 substr(md5(CAST(event_id AS VARCHAR)), 9, 4) || '-' ||
        |                 substr(md5(CAST(event_id AS VARCHAR)), 13, 4) || '-' ||
        |                 substr(md5(CAST(event_id AS VARCHAR)), 17, 4) || '-' ||
        |                 substr(md5(CAST(event_id AS VARCHAR)), 21, 12) END AS event_uuid,
        |       CASE WHEN regexp_full_match(CAST(user_id AS VARCHAR), '[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}')
        |            THEN lower(CAST(user_id AS VARCHAR))
        |            ELSE substr(md5(CAST(user_id AS VARCHAR)), 1, 8) || '-' ||
        |                 substr(md5(CAST(user_id AS VARCHAR)), 9, 4) || '-' ||
        |                 substr(md5(CAST(user_id AS VARCHAR)), 13, 4) || '-' ||
        |                 substr(md5(CAST(user_id AS VARCHAR)), 17, 4) || '-' ||
        |                 substr(md5(CAST(user_id AS VARCHAR)), 21, 12) END AS user_uuid,
        |       lower('A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11') AS passthrough_uuid
        |FROM events
        |ORDER BY event_id""".stripMargin
  )
}
