package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing surface: every engine operator as a queryable view.
  *
  * The reference's users drive everything through SQL; this registers
  * each `SparkEntry.queries` entry as a temporary view under its own
  * name (plus the base tables under theirs), so `spark.sql("SELECT *
  * FROM q_training_manifest WHERE selected")` is a complete way to
  * consume the engine — no Scala call sites required. Registration
  * cost and freshness are NOT uniform: a purely declarative query
  * registers lazily (the view holds the logical plan; nothing runs
  * until it is queried), but builders that use `localCheckpoint()`
  * (eager by default: the CC/k-core/LPA loops, pinned ground-truth
  * frames) or driver-side model loops (Lloyd, power iteration)
  * EXECUTE those stages at registration time, and the resulting view
  * serves data snapshotted then — it does not re-read the source dir
  * on later queries. Registering all ~240 views therefore runs the
  * heavy dedup/graph/ANN chains up front (minutes at sf0.1, the same
  * work a pipeline-shaped run pays once) and pins their snapshots;
  * re-run `registerAll` to refresh. Catalyst folds any post-filter/projection a SQL user
  * writes on top of a view into the underlying plan (pushdown through
  * views is ordinary optimization), so the view surface loses none of
  * the scan-pruning behavior the plan pins assert.
  */
object GraftCatalog {

  /** Base fixture tables, by their canonical names. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    import graft.sources.Tables
    Seq(
      "region" -> Tables.region _, "nation" -> Tables.nation _,
      "customer" -> Tables.customer _, "supplier" -> Tables.supplier _,
      "part" -> Tables.part _, "orders" -> Tables.orders _,
      "lineitem" -> Tables.lineitem _, "events" -> Tables.events _,
      "documents" -> Tables.documents _, "embeddings" -> Tables.embeddings _
    ).foreach { case (name, load) =>
      load(spark, dir).createOrReplaceTempView(name)
    }
  }

  /** Every operator/query as a view named exactly like its
    * `SparkEntry.queries` key. Returns the number registered. */
  def registerAll(spark: SparkSession, dir: String): Int = {
    registerTables(spark, dir)
    SparkEntry.queries.foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
    SparkEntry.queries.size
  }
}
