package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranks / ntiles WITHOUT a corpus-sized single-partition
  * sort.
  *
  * The classic scale-killer in quantile queries is `row_number()` /
  * `ntile(k)` `OVER (ORDER BY …)`: Spark satisfies the global order by
  * moving EVERY row to one partition — at 100 TB that is one executor
  * sorting the corpus. This helper computes the identical 1-based
  * global rank with the two-level technique q_concurrency introduced
  * (Windows.scala): a DETERMINISTIC coarse bucket, monotone in the
  * sort key, splits the corpus into parallel groups; each bucket ranks
  * locally (a WindowExec PARTITIONED by bucket — parallel); and the
  * per-bucket row counts — bucket-grain, ≤ `buckets` rows, i.e. model
  * state like the IVF codebooks — are collected once, prefix-summed on
  * the driver, and broadcast back as each bucket's rank offset:
  *
  *   global_rank = offset(bucket) + local_rank_within_bucket
  *
  * Correctness does NOT depend on partition placement: the bucket is a
  * pure function of the row value (no spark_partition_id, no sampled
  * RangePartitioner boundaries), so the counts pass and the rank pass
  * agree under any scheduling, and re-computation of a multi-consumer
  * plan can never skew. Equal-width buckets over [min, max] keep the
  * expected bucket size at N/B for value-uniform columns; a skewed
  * column degrades to its biggest bucket's size, never to N.
  */
object ScaleRank {

  /** Adds `rankCol` = exact 1-based global rank of each row under the
    * ascending total order `order` (pass `.desc` columns for a
    * descending metric — then `value` must be the NEGATED metric so
    * the bucket stays monotone with the order), and `nCol` = total row
    * count. `value` must be non-null and numeric (orderable through a
    * double cast — monotone for ints/decimals); `order` must be a full
    * tie-broken key so the rank is deterministic.
    *
    * Cost: two column-pruned partial-agg passes (min/max, bucket
    * counts) + one bucket-partitioned window pass. No global sort, no
    * unpartitioned WindowExec anywhere in the plan.
    */
  def withGlobalRank(df: DataFrame, value: Column, order: Seq[Column],
      rankCol: String, nCol: String, buckets: Int = 256): DataFrame = {
    val spark = df.sparkSession
    val mm = df.agg(min(value.cast("double")).as("lo"),
      max(value.cast("double")).as("hi")).collect()(0)
    if (mm.isNullAt(0))
      return df.withColumn(rankCol, lit(0L)).withColumn(nCol, lit(0L))
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    val bExpr =
      if (hi == lo) lit(0L)
      else least(
        floor((value.cast("double") - lit(lo)) / lit((hi - lo) / buckets)),
        lit(buckets - 1L)).cast("long")
    val withB = df.withColumn("__b", bExpr)
    val cnt = withB.groupBy(col("__b")).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offRows = cnt.map { case (bId, c) => val o = acc; acc += c; (bId, o) }
    val offDf = spark.createDataFrame(offRows.toIndexedSeq).toDF("__b", "__off")
    withB.join(broadcast(offDf), Seq("__b"))
      .withColumn(rankCol,
        col("__off") + row_number().over(
          Window.partitionBy(col("__b")).orderBy(order: _*)).cast("long"))
      .withColumn(nCol, lit(acc))
      .drop("__b", "__off")
  }

  /** SQL NTILE(k) from an exact 1-based rank column and a total-count
    * column: the first (n mod k) tiles get one extra row — the same
    * uneven-bucket rule Spark and DuckDB implement, so a two-level
    * rank + this expression is bit-identical to
    * `ntile(k) OVER (ORDER BY …)` on the same tie-broken order.
    * (When n < k the ELSE branch is unreachable, so its DIV by zero
    * never evaluates.) */
  def ntileExpr(k: Int, rank: String, n: String): Column = expr(
    s"""CASE WHEN $rank <= ($n % $k) * (($n DIV $k) + 1L)
             THEN ($rank + ($n DIV $k)) DIV (($n DIV $k) + 1L)
             ELSE ($n % $k) + ($rank - ($n % $k) * (($n DIV $k) + 1L)
                               + ($n DIV $k) - 1L) DIV ($n DIV $k)
        END""")
}
