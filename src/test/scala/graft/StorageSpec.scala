package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Storage-layout levers for the 100 TB posture: hive-style partition
  * pruning (the #1 scan-cost lever — a partition filter must skip
  * whole directories, not rows) and range-clustered files (sorted
  * writes give parquet min/max stats that row-group-skip range
  * predicates). Complements BucketingSpec's co-located-join layout.
  */
class StorageSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("JSONL and CSV round-trip the documents schema losslessly") {
    // source-format breadth: the engine's queries are format-agnostic
    // behind Tables, and an interchange dump (JSONL for pipelines, CSV
    // for spreadsheets) must reload bit-identically under an explicit
    // schema — the silent-coercion traps are schema inference and CSV
    // quoting, both pinned here
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val jdir = tmp("jsonl")
    docs.write.mode("overwrite").json(jdir)
    val backJ = spark.read.schema(docs.schema).json(jdir)
    assert(backJ.exceptAll(docs).count() == 0 && docs.exceptAll(backJ).count() == 0)
    val cdir = tmp("csv")
    docs.write.mode("overwrite").option("header", "true")
      .option("quoteAll", "true").csv(cdir)
    val backC = spark.read.schema(docs.schema).option("header", "true").csv(cdir)
    assert(backC.exceptAll(docs).count() == 0 && docs.exceptAll(backC).count() == 0)
  }

  test("GraftCatalog: the whole operator surface is consumable from pure SQL") {
    val n = graft.GraftCatalog.registerAll(spark, Sf0001)
    assert(n == SparkEntry.queries.size)
    // a pure-SQL consumer gets the same rows as the Scala call site
    val viaSql = spark.sql("SELECT * FROM q_topk").collect()
    val direct = SparkEntry.queries("q_topk")(spark, Sf0001).collect()
    assert(viaSql.toSeq == direct.toSeq)
    // SQL composition over views works: filter + aggregate on top of
    // the composed manifest
    val sel = spark.sql(
      "SELECT split, COUNT(*) AS n FROM q_training_manifest WHERE selected GROUP BY split")
      .collect()
    assert(sel.length == 1 && sel.head.getString(0) == "train")
    // a predicate written in SQL on top of a view still reaches the
    // parquet scan (pushdown through views is ordinary optimization)
    val p = spark.sql("SELECT doc_id FROM q_split_assign WHERE doc_id < 10")
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("LessThan(doc_id,10)"),
      s"view lost the pushdown:\n$p")
  }

  test("ORC round-trips the documents schema and pushes predicates into the scan") {
    // the other columnar interchange format Spark ships natively —
    // a lakehouse neighbor often hands ORC over; the engine must read
    // it losslessly AND keep the pushdown/pruning properties the
    // parquet path is pinned to
    val docs = graft.sources.Tables.documents(spark, Sf0001)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = tmp("orc")
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
    // predicate + projection reach the ORC scan like they do parquet
    val p = back.filter(org.apache.spark.sql.functions.col("n_chars") > 200L)
      .select("doc_id", "n_chars").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PushedFilters") && p.contains("GreaterThan(n_chars,200)"),
      s"ORC scan lost the pushdown:\n$p")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("text"), s"ORC scan reads pruned columns: $readSchema")
  }

  test("spark.sql over registered views matches the DataFrame formulation") {
    // the SQL entry point a reference user migrates through: the same
    // relational shape expressed as ANSI SQL text over temp views must
    // produce exactly the DataFrame API's rows
    graft.sources.Tables.lineitem(spark, Sf0001).createOrReplaceTempView("li")
    val sql = spark.sql(
      """SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM li GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val df = graft.sources.Tables.lineitem(spark, Sf0001)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)").as("sum_qty"))
      .orderBy($"l_returnflag")
    assert(sql.collect().toSeq == df.collect().toSeq)
  }

  test("hive-partitioned write prunes non-matching partitions at scan") {
    val dir = tmp("part")
    Tables.events(spark, Sf0001)
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter($"event_type" === "click")
    val p = back.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters"), s"no partition filter in scan:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("PartitionFilters") && l.contains("event_type")),
      s"event_type not in PartitionFilters:\n$p")
    // pruning must also be CORRECT, not just present
    val expected = Tables.events(spark, Sf0001)
      .filter($"event_type" === "click").count()
    assert(back.count() == expected)
    // and the scan must touch only the one matching directory
    val scanned = back.queryExecution.executedPlan.collectLeaves()
    val clickOnly = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("event_type=")).map(_.getName).sorted
    assert(clickOnly.contains("event_type=click"), clickOnly.mkString(","))
    assert(scanned.nonEmpty)
  }

  test("JDBC dimension-scan options pin the reference's S2 shape, made parallel") {
    // the option SURFACE a deployment hands any JDBC database: bulk
    // fetchsize and a partitioned range scan (a bare JDBC read is one
    // task through one connection)
    val opts = graft.sources.JdbcSource.scanOptions(
      "jdbc:postgresql://dbhost/engagement", "content")
    assert(opts("dbtable") == "content")
    assert(opts("fetchsize").toInt >= 1000, "bulk reads need a bulk fetchsize")
    assert(opts("numPartitions").toInt > 1, "JDBC scan must parallelize")
    assert(opts.contains("partitionColumn")
      && opts.contains("lowerBound") && opts.contains("upperBound"))
  }

  test("embedded-Derby JDBC read is a real partitioned JDBCRelation with pushdown") {
    // the executed S2 path: Derby ships with Spark, so the scan runs
    // for real — seed, then assert the READ plan (not the harness)
    // splits into the configured stripes and ships the predicate to
    // the database
    import graft.sources.JdbcSource
    val dim = JdbcSource.qJdbcDim(spark, Sf0001)
    val p = dim.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("JDBCRelation"), s"expected a JDBC scan:\n$p")
    assert(p.contains("numPartitions=8"), s"expected 8 range stripes:\n$p")
    assert(p.contains("GreaterThan(c_acctbal,1000.0)"),
      s"acctbal predicate must push into the database:\n$p")
    // and the rows are exactly the parquet dimension's, over JDBC
    val viaParquet = Tables.customer(spark, Sf0001)
      .filter($"c_acctbal" > 1000.0)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey").collect()
    assert(dim.collect().sameElements(viaParquet))
  }

  test("range-clustered write yields per-file sorted data for min/max skipping") {
    val dir = tmp("range")
    Tables.events(spark, Sf0001)
      .repartitionByRange(4, $"ts")
      .sortWithinPartitions($"ts")
      .write.mode("overwrite").parquet(dir)
    // every output file covers a disjoint, internally-sorted ts range
    val perFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), $"ts")
      .groupBy($"f").agg(min($"ts").as("lo"), max($"ts").as("hi"))
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("lo"), r.getAs[java.sql.Timestamp]("hi")))
      .sortBy(_._1.getTime)
    assert(perFile.length >= 2)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(!hi1.after(lo2), s"file ranges overlap: $hi1 vs $lo2")
      case _ =>
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the second half of the stats/bloom skipping story: when a dim
    // carries a selective predicate and the join must shuffle (no
    // broadcast), Spark can inject a bloom filter built from the dim
    // keys and push it into the fact scan — at 100 TB this is the
    // difference between shuffling the whole fact table and shuffling
    // only might-match rows. Thresholds are tuned down because the
    // test tables are far below the production defaults.
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevBloom = spark.conf.getOption(
      "spark.sql.optimizer.runtime.bloomFilter.enabled")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val l = Tables.lineitem(spark, Sf001)
      val o = Tables.orders(spark, Sf001)
        .filter($"o_orderpriority" === "1-URGENT")
      val j = l.join(o, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").count()
      val p = j.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.toLowerCase.contains("bloomfilter") || p.contains("might_contain"),
        s"no runtime bloom filter in plan:\n$p")
      assert(j.collect().head.getLong(1) > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      prevBloom match {
        case Some(v) =>
          spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", v)
        case None =>
          spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      }
    }
  }

  test("min/max stats on a range-clustered write skip row groups at scan time") {
    // THE data-layout lever a 100 TB deployment leans on hardest:
    // range-cluster on the filter column, and a selective range
    // predicate is answered by parquet footer min/max — whole row
    // groups (here: whole files) never decompress. Proven via the
    // scan's own numOutputRows metric, not the plan text.
    val dir = tmp("skip")
    val ev = Tables.events(spark, Sf0001)
    val total = ev.count()
    ev.repartitionByRange(4, $"event_id")
      .sortWithinPartitions($"event_id")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter($"event_id" < 100)
    val matched = back.count()
    assert(matched > 0 && matched < total / 4 + 1)
    val df = spark.read.parquet(dir).filter($"event_id" < 100)
      .select("event_id", "event_type")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, s"no FileSourceScanExec leaf:\n$plan")
    val scanRows = scans.map(_.metrics("numOutputRows").value).sum
    // stats skipping means the scan DECODED only the one file whose
    // [min,max] intersects the predicate — not the whole table
    assert(scanRows <= total / 4 + 1,
      s"scan decoded $scanRows of $total rows — row-group stats not skipping")
    assert(scanRows >= matched)
  }

  private def decodedRows(dir: String, pred: org.apache.spark.sql.Column): Long = {
    val df = spark.read.parquet(dir).filter(pred).select("p_partkey")
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.metrics("numOutputRows").value
    }.sum
  }

  test("z-order layout skips files on BOTH interleaved dimensions") {
    // The q_zorder key exists to be SORTED ON: a z-clustered write
    // confines each file to a quadrant of (p_size, pmod) space, so
    // min/max footer stats prune selective filters on EITHER column.
    // A 1-D sort on p_size gives pruning on p_size only — pmod stays
    // scattered across every file, and the same pmod filter decodes
    // the full table. Both behaviors asserted from scan metrics.
    val rows = SparkEntry.queries("q_zorder")(spark, Sf001) // 2000 parts
    val total = rows.count()
    val zDir = tmp("zorder")
    rows.repartitionByRange(16, $"z")
      .sortWithinPartitions($"z")
      .write.mode("overwrite").parquet(zDir)
    val sizeDir = tmp("sizesort")
    rows.repartitionByRange(16, $"p_size")
      .sortWithinPartitions($"p_size")
      .write.mode("overwrite").parquet(sizeDir)

    val zOnSize = decodedRows(zDir, $"p_size" < 8)
    val zOnPmod = decodedRows(zDir, $"pmod" < 8)
    // z-layout: both single-dimension filters skip most files
    assert(zOnSize <= total / 2,
      s"z layout decoded $zOnSize/$total on p_size — no multi-dim skipping")
    assert(zOnPmod <= total / 2,
      s"z layout decoded $zOnPmod/$total on pmod — no multi-dim skipping")
    // 1-D layout: great on its own column, useless on the other
    val sOnSize = decodedRows(sizeDir, $"p_size" < 8)
    val sOnPmod = decodedRows(sizeDir, $"pmod" < 8)
    assert(sOnSize <= total / 4)
    assert(sOnPmod >= total * 9 / 10,
      s"p_size sort unexpectedly skipped pmod files ($sOnPmod/$total)")
  }
}
