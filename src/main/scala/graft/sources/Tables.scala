package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Parquet table loaders for the driver testdata (TESTDATA.md).
  *
  * All engine queries read through here so that source-level concerns
  * (format, pushdown, partitioning hints) live in one place. At cluster
  * scale these would be catalog tables (partitioned parquet / Iceberg);
  * the parquet scan is natively splittable, so filters and projections
  * composed on top are pushed into the scan by Catalyst (verify via
  * `.explain("formatted")` — `PushedFilters` / `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** `events.ts` arrives in whatever precision the generator chose, so
    * adapt to the schema actually on disk rather than assuming one:
    *  - TIMESTAMP(NANOS) parquet (early testdata drops) exceeds
    *    Spark's µs timestamp — read it as a long (legacy conf) and
    *    convert with exact integer division to a µs timestamp
    *    (lossless: the testdata carries no sub-µs component);
    *  - TIMESTAMP(MICROS) without UTC adjustment reads as
    *    TIMESTAMP_NTZ — cast to the session-zone timestamp (the
    *    session zone is pinned to UTC everywhere, so values are
    *    identical and match DuckDB's µs view of the same column).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", expr("CAST(ts AS TIMESTAMP)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
