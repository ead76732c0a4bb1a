package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC dimension-scan configuration (reference S2:
  * `/root/reference/processing-layer/stream-processor.py:254-266`
  * reads the Postgres `content` dimension over JDBC).
  *
  * No database exists in the build sandbox, so the READ itself cannot
  * execute here (the parquet path in `Tables` stands in for tests and
  * oracles) — but the option surface a 100 TB deployment needs is
  * pinned as code, not prose:
  *
  *  - `fetchsize`: rows per round-trip; the JDBC default (10-100) adds
  *    a network round-trip per handful of rows on a bulk dimension
  *    read.
  *  - `partitionColumn/lowerBound/upperBound/numPartitions`: without
  *    them a JDBC scan is ONE task on ONE executor — the whole
  *    dimension serializes through a single connection. With them
  *    Spark issues numPartitions range-bounded queries in parallel.
  *  - `pushDownPredicate` stays enabled (default) so dimension filters
  *    run in the database, not in Spark.
  *
  * A caller supplies real url/table/credentials; `configure` applies
  * the scan-shape options and is unit-tested against the reference's
  * values.
  */
object JdbcSource {

  /** The reference's dimension-scan shape, made scale-safe. */
  final case class ScanConfig(
      fetchSize: Int = 10000,
      partitionColumn: String = "content_id",
      lowerBound: Long = 0L,
      upperBound: Long = 1000000L,
      numPartitions: Int = 16)

  /** The exact option map handed to the JDBC reader — exposed so the
    * scan shape is unit-testable without a database. */
  def scanOptions(url: String, table: String,
      cfg: ScanConfig = ScanConfig()): Map[String, String] = Map(
    "url" -> url,
    "dbtable" -> table,
    "fetchsize" -> cfg.fetchSize.toString,
    "partitionColumn" -> cfg.partitionColumn,
    "lowerBound" -> cfg.lowerBound.toString,
    "upperBound" -> cfg.upperBound.toString,
    "numPartitions" -> cfg.numPartitions.toString)

  /** Apply the scan options to a reader — pure configuration, no
    * connection is opened until `.load()`. */
  def configure(reader: DataFrameReader, url: String, table: String,
      cfg: ScanConfig = ScanConfig()): DataFrameReader =
    reader.format("jdbc").options(scanOptions(url, table, cfg))

  /** The dimension read a deployment would run (unreachable in the
    * sandbox; parquet stands in — see `Tables.customer`). */
  def readDim(spark: SparkSession, url: String, table: String,
      cfg: ScanConfig = ScanConfig()): DataFrame =
    configure(spark.read, url, table, cfg).load()
}
