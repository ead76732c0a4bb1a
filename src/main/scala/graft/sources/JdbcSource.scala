package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

/** JDBC dimension-scan configuration (reference S2:
  * `/root/reference/processing-layer/stream-processor.py:254-266`
  * reads the Postgres `content` dimension over JDBC).
  *
  * No NETWORK database exists in the build sandbox, but embedded
  * Derby ships with Spark, so both directions of the JDBC surface
  * execute for real here: `q_jdbc_dim` (partitioned read with
  * pushdown, oracled against the parquet dimension) and
  * `upsertServing` (the keyed serving sink StreamingSpec drives).
  * The option surface a 100 TB deployment needs is pinned as code:
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

  /** The dimension read a deployment would run (against any JDBC
    * database; `q_jdbc_dim` below runs it for real against embedded
    * Derby — see [[derbyUrl]]). */
  def readDim(spark: SparkSession, url: String, table: String,
      cfg: ScanConfig = ScanConfig()): DataFrame =
    configure(spark.read, url, table, cfg).load()

  // ---- real JDBC end-to-end via embedded Derby --------------------
  //
  // Derby ships in Spark's jar directory (it backs the Hive
  // metastore), so the sandbox CAN run a genuine JDBC scan with zero
  // network: seed the dimension into a Derby database through
  // Spark's JDBC WRITER, then read it back through [[readDim]] with
  // the production scan options (bulk fetchsize + partitioned range
  // scan). This turns the S2 row from "option surface only" into an
  // executed read path: the plan is a real JDBCRelation with the
  // acctbal predicate pushed into the database and numPartitions
  // range-bounded queries issued in parallel.

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** Embedded single-JVM URL — exactly what a deployment swaps for
    * `jdbc:postgresql://...`; everything else stays the same. */
  def derbyUrl(dbDir: String): String = s"jdbc:derby:$dbDir;create=true"

  private def derbyDirFor(sfDir: String): String = {
    // keep derby.log out of the repo working directory
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", "/tmp/graft-derby")
    new java.io.File("/tmp/graft-derby").mkdirs()
    "/tmp/graft-derby/db_" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")
  }

  /** Seed `customer_dim` from the parquet dimension (overwrite — the
    * write side of the JDBC surface, exercised per call; the table is
    * dimension-sized by definition). VARCHARs are sized explicitly:
    * Spark's Derby dialect otherwise maps StringType to CLOB, which
    * Derby won't compare or push predicates against. */
  def seedCustomerDim(spark: SparkSession, sfDir: String, dbDir: String): Unit =
    Tables.customer(spark, sfDir).write
      .mode("overwrite")
      .format("jdbc")
      .option("url", derbyUrl(dbDir))
      .option("driver", DerbyDriver)
      .option("dbtable", "customer_dim")
      .option("createTableColumnTypes",
        "c_name VARCHAR(64), c_mktsegment VARCHAR(32)")
      .save()

  /** S2 executed for real: parquet → Derby (JDBC write) → partitioned
    * JDBC read with predicate pushdown → the same rows the parquet
    * scan yields (the oracle compares against parquet `customer`).
    * Range bounds derive from the seeded table's key space so the
    * stripes stay balanced at any SF. */
  def qJdbcDim(spark: SparkSession, sfDir: String): DataFrame = {
    val dbDir = derbyDirFor(sfDir)
    seedCustomerDim(spark, sfDir, dbDir)
    val maxKey = Tables.customer(spark, sfDir)
      .agg(org.apache.spark.sql.functions.max("c_custkey")).head().getLong(0)
    val cfg = ScanConfig(fetchSize = 10000, partitionColumn = "c_custkey",
      lowerBound = 0L, upperBound = maxKey + 1, numPartitions = 8)
    configure(spark.read, derbyUrl(dbDir), "customer_dim", cfg)
      .option("driver", DerbyDriver)
      .load()
      .filter(org.apache.spark.sql.functions.col("c_acctbal") > 1000.0)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
  }

  // ---- real JDBC serving sink (K2/K3 executable analog) -----------
  //
  // The reference serves per-key state to Cassandra/Redis; the
  // executable stand-in is a keyed table in embedded Derby written
  // through plain JDBC. Upsert = DELETE+INSERT per key inside a
  // per-partition transaction: replays of the same (deduped) batch
  // converge to the same table state, which is the at-least-once
  // contract the parquet view sink already proves — here it holds
  // against a real database with a PRIMARY KEY.

  /** Create the serving table on first use (key + stringified payload
    * — the reference's KV-fallback projection). */
  def ensureServingTable(url: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "SERVING_KV", null)
      val exists = try rs.next() finally rs.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(
          "CREATE TABLE serving_kv (\"event_id\" BIGINT PRIMARY KEY, " +
            "\"payload\" VARCHAR(2048) NOT NULL)")
        finally st.close()
      }
    } finally conn.close()
  }

  /** Idempotent keyed upsert of a (event_id, payload) frame. The
    * caller guarantees one row per key per call; each partition runs
    * one transaction of chunked DELETE+INSERT batches, so a replayed
    * batch rewrites identical rows and a mid-write failure rolls the
    * partition back untouched. */
  def upsertServing(rows: DataFrame, url: String, chunk: Int = 500): Unit = {
    ensureServingTable(url)
    rows.select("event_id", "payload").foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val del = conn.prepareStatement(
              "DELETE FROM serving_kv WHERE \"event_id\" = ?")
            val ins = conn.prepareStatement(
              "INSERT INTO serving_kv (\"event_id\", \"payload\") VALUES (?, ?)")
            var n = 0
            it.foreach { r =>
              val key = r.getLong(0)
              del.setLong(1, key); del.addBatch()
              ins.setLong(1, key); ins.setString(2, r.getString(1)); ins.addBatch()
              n += 1
              if (n % chunk == 0) { del.executeBatch(); ins.executeBatch() }
            }
            del.executeBatch(); ins.executeBatch()
            conn.commit()
            del.close(); ins.close()
          } catch {
            case e: Throwable => conn.rollback(); throw e
          } finally conn.close()
        }
    }
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_jdbc_dim" -> (qJdbcDim _))

  /** The oracle reads the SAME dimension from parquet — identity up
    * to the pushed predicate, which is the point: the JDBC path must
    * be lossless. */
  val oracle: Map[String, String] = Map(
    "q_jdbc_dim" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer
        |WHERE c_acctbal > 1000.0
        |ORDER BY c_custkey""".stripMargin)
}
