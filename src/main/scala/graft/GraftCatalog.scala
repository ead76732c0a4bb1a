package graft

import org.apache.spark.sql.SparkSession

/** SQL-facing surface: every engine operator as a queryable view.
  *
  * The reference's users drive everything through SQL; this registers
  * each `SparkEntry.queries` entry as a temporary view under its own
  * name (plus the base tables under theirs), so `spark.sql("SELECT *
  * FROM q_training_manifest WHERE selected")` is a complete way to
  * consume the engine — no Scala call sites required. Registration is
  * LAZY: a view holds the logical plan only; nothing executes until a
  * view is actually queried, so registering all ~236 costs parse time,
  * not compute. Catalyst folds any post-filter/projection a SQL user
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
