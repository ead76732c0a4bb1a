package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Deterministic sampling / split assignment for training-data
  * pipelines (driver north-star family): every operation derives its
  * "randomness" from md5 of the row key — reproducible across runs,
  * engines, partitionings, and cluster sizes, which is exactly what a
  * 100 TB corpus needs (a `rand()` sample is neither re-runnable nor
  * oracle-comparable). md5's hex is lowercase in both engines, and
  * '0'-'9' < 'a'-'f' in ASCII, so lexicographic threshold comparisons
  * agree everywhere.
  *
  * Scale: all three queries are narrow maps + hash aggregates — no
  * joins, no windows over the full corpus, no driver-side state.
  */
object Sampling {

  /** First two hex chars of md5(key) — 256 deterministic buckets. */
  private[operators] def hexKey(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** train/val/test by first hex char: '0'-'b' → train (12/16),
    * 'c'-'d' → val (2/16), 'e'-'f' → test (2/16). */
  private[operators] def splitOf(hex2: Column): Column =
    when(substring(hex2, 1, 1) <= "b", "train")
      .when(substring(hex2, 1, 1) <= "d", "val")
      .otherwise("test")

  // Per-document split assignment — the row-level view (a training
  // job filters on `split`; the assignment must never move a doc
  // between splits across reruns or engines).
  private def qSplitAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("hex2", hexKey(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("hex2"),
        splitOf(col("hex2")).as("split"))
      .orderBy("doc_id")

  // Stratified accounting: docs and token mass per (lang, split), with
  // the within-stratum ratio — the check a pipeline runs before
  // trusting a split (one IEEE division per row: deterministic).
  private def qSplitStats(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
    Tables.documents(s, d)
      .withColumn("split", splitOf(hexKey(col("doc_id"))))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
      .withColumn("lang_total", sum(col("n_docs")).over(w))
      .withColumn("frac",
        col("n_docs").cast("double") / col("lang_total").cast("double"))
      .orderBy("lang", "split")
  }

  // Deterministic 1/8 corpus sample: hex2 < '20' keeps exactly the
  // 32/256 bucket prefix — reproducible sampling for eval sets and
  // debugging slices.
  private def qSampleHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("hex2", hexKey(col("doc_id")))
      .filter(col("hex2") < "20")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("hex2"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_assign" -> (qSplitAssign _),
    "q_split_stats" -> (qSplitStats _),
    "q_sample_hash" -> (qSampleHash _)
  )

  private[operators] val splitSql =
    """CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'b' THEN 'train'
      |     WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'd' THEN 'val'
      |     ELSE 'test' END""".stripMargin.replace("\n", " ")

  val oracle: Map[String, String] = Map(
    "q_split_assign" ->
      s"""SELECT doc_id, lang,
         |       substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hex2,
         |       $splitSql AS split
         |FROM documents
         |ORDER BY doc_id""".stripMargin,
    "q_split_stats" ->
      s"""WITH assigned AS (
         |  SELECT lang, $splitSql AS split,
         |         len(string_split(text, ' ')) AS n_toks
         |  FROM documents
         |), g AS (
         |  SELECT lang, split, COUNT(*) AS n_docs,
         |         CAST(SUM(n_toks) AS BIGINT) AS n_tokens
         |  FROM assigned GROUP BY lang, split
         |)
         |SELECT lang, split, n_docs, n_tokens,
         |       CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS lang_total,
         |       CAST(n_docs AS DOUBLE)
         |         / CAST(SUM(n_docs) OVER (PARTITION BY lang) AS DOUBLE) AS frac
         |FROM g
         |ORDER BY lang, split""".stripMargin,
    "q_sample_hash" ->
      """SELECT doc_id, lang, source, n_chars,
        |       substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS hex2
        |FROM documents
        |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '20'
        |ORDER BY doc_id""".stripMargin
  )
}
